"""Property-based matcher correctness: the compiled Catalyst predicates vs an
independent pure-Python evaluator of Prometheus matcher semantics
(SURVEY §5.1 — adversarial labelsets: missing labels, values containing
``=``/regex metacharacters, empty values).

The Python evaluator is deliberately written from the *semantics* (anchored
fullmatch over the joined ``k=v`` string, vacuous matches on missing labels,
ignore-label drop on EQ only), not from the implementation, so agreement is
evidence rather than tautology.
"""

from __future__ import annotations

import re as pyre

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from remote_tsdb_clickhouse_spark.model import DEFAULT_READ_IGNORE_LABEL
from remote_tsdb_clickhouse_spark.plans.matchers import (
    LabelMatcher,
    MatcherType,
    compile_matchers,
)

# -- adversarial corpus ------------------------------------------------------
# (metric_name, labels) — values include '=', '^', '$', '.', '*', empties,
# and series missing each label entirely.
CORPUS = [
    ("up", ["job=api", "env=prod"]),
    ("up", ["job=api", "env=dev"]),
    ("up", ["job=db"]),  # no env label
    ("up", []),  # no labels at all
    ("down", ["job=a=b", "env=prod"]),  # value containing '='
    ("down", ["job=a.c", "env=pr.d"]),  # values that look like regexes
    ("d.wn", ["job=^anchor$", "env="]),  # name with metachar; empty value
    ("up2", ["job=api2", "remote=clickhouse"]),  # the ignore label
    ("误差", ["job=非ascii"]),  # non-ASCII
]


def _py_eval(name: str, labels: list[str], ms: list[LabelMatcher]) -> bool:
    """Independent Prometheus-semantics evaluator (Python re ~ Java dialect
    for the generated subset)."""
    for m in ms:
        v = m.value
        if m.name == "__name__":
            if m.type == MatcherType.EQ and not name == v:
                return False
            if m.type == MatcherType.NEQ and not name != v:
                return False
            if m.type == MatcherType.RE and not pyre.fullmatch(v, name):
                return False
            if m.type == MatcherType.NRE and pyre.fullmatch(v, name):
                return False
        else:
            joined = f"{m.name}={v}"
            if m.type == MatcherType.EQ:
                if joined == DEFAULT_READ_IGNORE_LABEL:
                    continue  # F8: dropped, matches everything
                if joined not in labels:
                    return False
            if m.type == MatcherType.NEQ and joined in labels:
                return False
            if m.type == MatcherType.RE and not any(
                pyre.fullmatch(f"{m.name}={v}", x) for x in labels
            ):
                return False
            if m.type == MatcherType.NRE and any(
                pyre.fullmatch(f"{m.name}={v}", x) for x in labels
            ):
                return False
    return True


# -- strategies --------------------------------------------------------------
_literal = st.sampled_from(
    ["api", "db", "prod", "dev", "a=b", "a.c", "", "up", "down", "^anchor$", "pr.d", "非ascii"]
)
# safe common-dialect regexes (identical meaning in RE2 / Java / Python re)
_regex = st.sampled_from(
    ["a.*", ".*", "(api|db)", "[a-z]+", "pr.d", "a=b", ".*=.*", "(?:a|d).*", "u?p", "d.wn"]
)
_name = st.sampled_from(["job", "env", "remote", "missing", "__name__"])
_type = st.sampled_from(list(MatcherType))


@st.composite
def matcher(draw):
    t = draw(_type)
    n = draw(_name)
    v = draw(_regex if t in (MatcherType.RE, MatcherType.NRE) else _literal)
    if n == "remote" and t == MatcherType.EQ and draw(st.booleans()):
        v = "clickhouse"  # exercise the F8 drop
    return LabelMatcher(t, n, v)


@pytest.fixture(scope="module")
def corpus_df(spark):
    df = spark.createDataFrame(
        [(n, ls) for n, ls in CORPUS], "metric_name STRING, labels ARRAY<STRING>"
    ).cache()
    df.count()
    return df


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(ms=st.lists(matcher(), min_size=1, max_size=3))
def test_matchers_agree_with_reference_semantics(spark, corpus_df, ms):
    cond = compile_matchers(ms)
    got = {
        (r.metric_name, tuple(r.labels))
        for r in corpus_df.where(cond).select("metric_name", "labels").collect()
    }
    expected = {
        (n, tuple(ls)) for n, ls in CORPUS if _py_eval(n, ls, ms)
    }
    assert got == expected, f"matchers={ms}"


def test_named_group_translation(spark, corpus_df):
    """RE2 spells named groups (?P<g>...); Java rejects the P — the compiler
    must translate, not crash (a valid Prometheus matcher)."""
    ms = [LabelMatcher(MatcherType.RE, "__name__", "(?P<g>up|down)")]
    got = {r.metric_name for r in corpus_df.where(compile_matchers(ms)).collect()}
    assert got == {"up", "down"}

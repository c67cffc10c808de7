"""Matcher algebra F1-F12 (SURVEY §2.2) against adversarial labelsets."""

from __future__ import annotations

import pytest

from remote_tsdb_clickhouse_spark.plans.matchers import (
    LabelMatcher,
    MatcherType,
    UnsupportedMatcherError,
    check_re2_portable,
    compile_matcher,
    compile_matchers,
)

EQ, NEQ, RE, NRE = MatcherType.EQ, MatcherType.NEQ, MatcherType.RE, MatcherType.NRE


def names(samples_df, *matchers, ignore_label="remote=clickhouse"):
    cond = compile_matchers(list(matchers), ignore_label=ignore_label)
    return sorted(
        r["metric_name"] for r in samples_df.where(cond).select("metric_name").distinct().collect()
    )


def test_name_eq(samples_df):
    assert names(samples_df, LabelMatcher(EQ, "__name__", "go_goroutines")) == ["go_goroutines"]


def test_name_neq(samples_df):
    got = names(samples_df, LabelMatcher(NEQ, "__name__", "go_goroutines"))
    assert "go_goroutines" not in got and "up" in got


def test_name_regex_anchored(samples_df):
    # 'go_.*' matches both go_ metrics; anchoring means 'go_go' alone must NOT
    # match go_goroutines ('^go_go$')
    assert names(samples_df, LabelMatcher(RE, "__name__", "go_.*")) == [
        "go_gc_duration",
        "go_goroutines",
    ]
    assert names(samples_df, LabelMatcher(RE, "__name__", "go_go")) == []


def test_name_nre(samples_df):
    got = names(samples_df, LabelMatcher(NRE, "__name__", "go_.*"))
    assert got == ["http_requests_total", "up"]


def test_label_eq_has(samples_df):
    got = names(samples_df, LabelMatcher(EQ, "job", "omada"))
    assert got == ["go_goroutines", "up"]


def test_label_eq_value_containing_equals(samples_df):
    # label value contains '=' — joined-string probe still exact
    got = names(samples_df, LabelMatcher(EQ, "path", "/api/v1?x=1"))
    assert got == ["go_gc_duration"]


def test_label_neq_matches_missing_label(samples_df):
    # F9: series WITHOUT label job also match job!="omada"
    got = names(samples_df, LabelMatcher(NEQ, "job", "omada"))
    assert "http_requests_total" in got  # one series has no job label at all
    assert "go_goroutines" in got  # job=node series survives
    assert "up" not in got


def test_label_regex(samples_df):
    got = names(samples_df, LabelMatcher(RE, "instance", "10\\.0\\.0\\..*"))
    assert got == ["go_goroutines", "up"]
    # unanchored fragment must not match ('^instance=0\.0\.0.*$' fails)
    assert names(samples_df, LabelMatcher(RE, "instance", "0\\.0\\.0.*")) == []


def test_label_nre_vacuous_on_missing(samples_df):
    # F11: series lacking 'job' matches job!~"om.*"
    got = names(samples_df, LabelMatcher(NRE, "job", "om.*"))
    assert "http_requests_total" in got
    assert "up" not in got


def test_regex_metachars_in_stored_value(samples_df):
    # stored label re=a.b*c — EQ probe is literal, so exact string only
    assert names(samples_df, LabelMatcher(EQ, "re", "a.b*c")) == ["http_requests_total"]
    assert names(samples_df, LabelMatcher(EQ, "re", "axbc")) == []


def test_ignore_label_dropped_only_for_eq(samples_df):
    # F8: EQ on remote=clickhouse is silently skipped -> no filtering
    all_names = names(samples_df)
    assert names(samples_df, LabelMatcher(EQ, "remote", "clickhouse")) == all_names
    # but NEQ on the same label is still applied: no series stores it -> all match
    assert names(samples_df, LabelMatcher(NEQ, "remote", "clickhouse")) == all_names
    # and RE is applied too (matches nothing stored)
    assert names(samples_df, LabelMatcher(RE, "remote", "clickhouse")) == []


def test_matchers_are_anded(samples_df):
    got = names(
        samples_df,
        LabelMatcher(EQ, "__name__", "go_goroutines"),
        LabelMatcher(EQ, "job", "omada"),
    )
    assert got == ["go_goroutines"]


def test_unsupported_type_raises():
    m = LabelMatcher(99, "job", "x")  # type: ignore[arg-type]
    with pytest.raises(UnsupportedMatcherError):
        compile_matcher(m)


def test_re2_portability_guard():
    with pytest.raises(ValueError):
        check_re2_portable(r"(a)\1")
    with pytest.raises(ValueError):
        check_re2_portable(r"foo(?=bar)")
    assert check_re2_portable(r"go_.*|up") == r"go_.*|up"


@pytest.mark.parametrize(
    "pattern",
    [
        r"a*+",          # possessive star
        r"a++",          # possessive plus
        r"a?+",          # possessive question
        r"a{2,3}+",      # possessive bounded repeat
        r"a{2}+",        # possessive exact repeat
        r"a{2,}+",       # possessive open repeat
        r"(?>ab)c",      # atomic group
        r"x(?>a|b)*y",   # atomic group, nested quantifier
        r"\\*+",         # possessive on a literal-backslash atom (RE2:
                         # "bad repetition operator" — was a documented
                         # false negative before the parity scan)
        r"\\{2}+",       # possessive bounded repeat of a literal backslash
        r"\\\1",         # literal backslash + backreference \1 (RE2:
                         # "invalid escape sequence")
        r"\\(?=x)",      # REAL lookahead after a literal backslash — the
                         # pair collapse must leave the '(' unescaped
        r"\\(?<!y)x",    # real lookbehind after a literal backslash
    ],
)
def test_re2_guard_rejects_java_only_quantifiers(pattern):
    """RE2 errors on possessive quantifiers / atomic groups ("bad
    repetition operator" / "invalid perl operator"); Java accepts them
    with backtracking-pruning semantics — reference parity
    (``read.go:113,115,130,132``) requires rejecting, not diverging."""
    with pytest.raises(ValueError, match="RE2"):
        check_re2_portable(pattern)


@pytest.mark.parametrize(
    "pattern",
    [
        r"a+",            # plain greedy quantifiers stay accepted
        r"a*?",           # lazy quantifiers are valid RE2
        r"a{2,3}",        # bounded repeat without possessive suffix
        r"\*+",           # one-or-more literal asterisks
        r"\++",           # one-or-more literal plus signs
        r"a}+",           # '}' with no opening brace is a literal in RE2
        r"[*+]+",         # quantifier chars inside a class are literals
        r"[?+]{2}",       # same, bounded
        r"v[0-9]+\.[0-9]+",  # realistic version-label pattern
        r"(?:a|b)+",      # non-capturing groups are fine
        r"\\[*+]+",       # class + quantifier after a LITERAL backslash —
                          # the pair scan must see '[' as unescaped
                          # (confirmed false positive, ADVICE r11)
        r"\\[*+]",        # same, unquantified
        r"[\\*]+",        # class containing an escaped backslash
        r"\\1",           # literal backslash + digit, NOT a backreference
        r"\\k<x>",        # literal backslash + 'k<x>', NOT a named backref
        r"\{2}+",         # literal '{2}' then '+' quantifying '}' — valid
        r"\(?=x",         # optional ESCAPED paren + literal '=x', NOT
                          # lookahead (ADVICE r12: the lookaround
                          # alternatives lacked the parity guard)
        r"\(?!x",         # optional escaped paren + literal '!x'
        r"\(?<=x",        # optional escaped paren + literal '<=x'
        r"\(?<!x",        # optional escaped paren + literal '<!x'
        r"a\(?>b",        # optional escaped paren + literal '>b' (the
                          # atomic-group alternative's guard, pre-existing)
    ],
)
def test_re2_guard_accepts_valid_re2(pattern):
    assert check_re2_portable(pattern) == pattern


def test_re2_guard_never_rejects_valid_re2_randomized():
    """Soundness sweep against a real RE2 engine (DuckDB's regexp_matches
    is RE2): the guard may accept Java-isms RE2 would reject (those fail
    loudly server-side), but it must NEVER reject a pattern RE2 accepts —
    a false positive here turns a valid Prometheus matcher into an error.
    Patterns are drawn from a grammar mixing atoms, escapes, classes,
    groups, and quantifiers (plain / lazy / possessive suffixes)."""
    import random

    import duckdb

    rng = random.Random(0x2E_2026)
    con = duckdb.connect()
    atoms = ["a", "b", ".", r"\.", r"\*", r"\+", "[*+]", "[0-9]", "[^x]",
             "(a|b)", "(?:xy)", "}", r"\}",
             # backslash-parity atoms (ADVICE r11): escaped literal
             # backslashes, alone and in front of classes/digits, where a
             # single-char lookbehind misreads which char is escaped
             r"\\", r"\\[*+]", r"[\\*]", r"\\1",
             # escaped-paren-then-lookaround-spelling atoms (ADVICE r12):
             # valid RE2 the unguarded lookaround alternatives rejected
             r"\(?=x", r"\(?!x", r"\(?<=x"]
    quants = ["", "*", "+", "?", "{2}", "{2,3}", "{2,}",
              "*?", "+?", "*+", "++", "?+", "{2,3}+", "(?=b)", "(?>a)"]
    checked = 0
    for _ in range(400):
        pat = "".join(
            rng.choice(atoms) + rng.choice(quants)
            for _ in range(rng.randint(1, 4))
        )
        try:
            con.execute("SELECT regexp_matches('zz', ?)", [pat]).fetchall()
        except duckdb.Error:
            continue  # RE2 rejects it: the guard may do either
        checked += 1
        assert check_re2_portable(pat) == pat, pat
    assert checked > 100  # the grammar must actually exercise the accept leg


def test_backslash_parity_scan_is_noop_without_escaped_pairs():
    """Scoped-diff proof for the r12 parity fix: the pair collapse only
    rewrites ``\\\\`` sequences, so on any pattern WITHOUT an escaped
    literal backslash the guard's decision is bit-identical to the
    pre-parity scan (reimplemented here verbatim).  Patterns are drawn
    from the full quantifier/class/escape grammar minus the ``\\\\``
    atoms — 600 of them, both accept and reject legs exercised."""
    import random

    from remote_tsdb_clickhouse_spark.plans.matchers import (
        _CHAR_CLASS,
        _NON_RE2_CONSTRUCTS,
    )

    def old_decision(p: str) -> bool:
        return bool(_NON_RE2_CONSTRUCTS.search(_CHAR_CLASS.sub("C", p)))

    def new_decision(p: str) -> bool:
        try:
            check_re2_portable(p)
            return False
        except ValueError:
            return True

    rng = random.Random(0x12_2026)
    atoms = ["a", "b", ".", r"\.", r"\*", r"\+", "[*+]", "[0-9]", "[^x]",
             "(a|b)", "(?:xy)", "}", r"\}", r"\1", r"\k<x>", "(a)"]
    quants = ["", "*", "+", "?", "{2}", "{2,3}", "{2,}",
              "*?", "+?", "*+", "++", "?+", "{2,3}+", "(?=b)", "(?>a)"]
    accepts = rejects = 0
    for _ in range(600):
        pat = "".join(
            rng.choice(atoms) + rng.choice(quants)
            for _ in range(rng.randint(1, 4))
        )
        assert r"\\" not in pat
        old, new = old_decision(pat), new_decision(pat)
        assert old == new, pat
        accepts += not new
        rejects += new
    assert accepts > 50 and rejects > 50  # both legs genuinely exercised


def test_lookaround_parity_guard_only_shrinks_rejections():
    """Scoped-diff proof for the r13 lookaround-guard fix (ADVICE r12):
    adding ``(?<!\\)`` to the lookaround alternatives can only turn
    rejections into acceptances — a lookbehind restricts where an
    alternative matches, never widens it — so every pattern the pre-r13
    guard accepted (including every driver row's regex, pinned by
    test_entry_contract) keeps its decision.  Checked mechanically against
    the pre-r13 scan reimplemented verbatim, over the full grammar
    including the new escaped-paren atoms."""
    import random
    import re

    from remote_tsdb_clickhouse_spark.plans.matchers import (
        _CHAR_CLASS,
        _ESCAPED_BACKSLASH,
    )

    pre_r13 = re.compile(
        r"""
        \\[1-9] | \\k<
      | \(\?= | \(\?! | \(\?<[=!]
      | (?<!\\)[*+?]\+ | (?<!\\)\{\d+(?:,\d*)?\}\+ | (?<!\\)\(\?>
        """,
        re.VERBOSE,
    )

    def old_rejects(p: str) -> bool:
        return bool(pre_r13.search(_CHAR_CLASS.sub("C", _ESCAPED_BACKSLASH.sub("B", p))))

    def new_rejects(p: str) -> bool:
        try:
            check_re2_portable(p)
            return False
        except ValueError:
            return True

    rng = random.Random(0x13_2026)
    atoms = ["a", "b", ".", r"\.", r"\*", r"\+", "[*+]", "[0-9]", "[^x]",
             "(a|b)", "(?:xy)", "}", r"\}", r"\1", r"\k<x>", "(a)",
             r"\\", r"\\[*+]", r"[\\*]", r"\\1",
             r"\(?=x", r"\(?!x", r"\(?<=x"]
    quants = ["", "*", "+", "?", "{2}", "{2,3}", "{2,}",
              "*?", "+?", "*+", "++", "?+", "{2,3}+", "(?=b)", "(?>a)"]
    flipped = 0
    for _ in range(800):
        pat = "".join(
            rng.choice(atoms) + rng.choice(quants)
            for _ in range(rng.randint(1, 4))
        )
        old, new = old_rejects(pat), new_rejects(pat)
        if new:
            assert old, f"guard WIDENED rejections on {pat!r}"
        flipped += old and not new
    assert flipped > 10  # the diff's accept-leg widening is exercised


def test_to_java_dialect_respects_backslash_parity():
    """``(?P<`` after a literal backslash (``\\\\(?P<n>x)``, valid RE2) IS
    a group opener and must be rewritten for Java; after an escaping
    backslash (``\\(?P<``) it is not.  Parity decides, exactly like the
    construct scan (ADVICE r11 fix applied consistently)."""
    from remote_tsdb_clickhouse_spark.plans.matchers import _to_java_dialect

    assert _to_java_dialect(r"(?P<n>x)") == r"(?<n>x)"
    assert _to_java_dialect(r"a(?P<n>x)b") == r"a(?<n>x)b"
    assert _to_java_dialect(r"\(?P<") == r"\(?P<"          # escaped paren
    assert _to_java_dialect(r"\\(?P<n>x)") == r"\\(?<n>x)"  # literal backslash
    assert _to_java_dialect(r"\\\(?P<") == r"\\\(?P<"       # literal + escape
    assert _to_java_dialect(r"no groups") == r"no groups"


@pytest.mark.parametrize("mtype", [RE, NRE])
@pytest.mark.parametrize("name", ["__name__", "job"])
def test_possessive_rejected_on_both_matcher_branches(mtype, name):
    """The guard must fire from all four regex compile branches: name
    RE/NRE (F5/F6) and label RE/NRE (F10/F11)."""
    with pytest.raises(ValueError, match="RE2"):
        compile_matcher(LabelMatcher(mtype, name, r"om.*+"))
    with pytest.raises(ValueError, match="RE2"):
        compile_matcher(LabelMatcher(mtype, name, r"(?>om)ada"))


def test_top_level_alternation_anchors_like_reference(spark):
    """``read.go:104`` anchors by bare string concat, so ``'^'+'a|b'+'$'``
    is ``^a|b$`` — '|' binds looser than the anchors, and under RE2's
    partial-match ``match()`` that is prefix-``a`` OR suffix-``b``, NOT
    the full-match-of-either that genuine Prometheus gets from its
    ``^(?:a|b)$`` wrap.  The assignment is reference parity: every case
    here is verified against DuckDB's real RE2 evaluating the exact
    concat-anchored pattern the reference would ship to ClickHouse, and
    the final assertion proves the quirk is live (reference and upstream
    Prometheus disagree on at least one case)."""
    import duckdb
    from pyspark.sql import functions as F

    con = duckdb.connect()
    cases = [
        ("up", "x|y*?"),     # y*?$ matches the empty suffix -> reference hits
        ("upper", "up|db"),  # ^up prefix branch hits 'upper'
        ("xdb", "up|db"),    # db$ suffix branch hits 'xdb'
        ("aabb", "a|b"),     # ^a prefix hits
        ("up", "(x|y*?)"),   # group-wrapped: both dialects agree (no hit)
        ("up", "up|down"),   # exact hit under both
        ("zz", "a|b"),       # miss under both
    ]
    df = spark.createDataFrame(
        [(i, n) for i, (n, _) in enumerate(cases)],
        "id INT, metric_name STRING",
    )
    cols = [
        F.when(
            compile_matchers([LabelMatcher(RE, "__name__", p)]), 1
        ).otherwise(0).alias(f"c{i}")
        for i, (_, p) in enumerate(cases)
    ]
    got = {r["id"]: r for r in df.select("id", *cols).collect()}
    divergences = 0
    for i, (name, p) in enumerate(cases):
        ref = con.execute(
            "SELECT regexp_matches(?, ?)", [name, "^" + p + "$"]
        ).fetchone()[0]
        prom = con.execute(
            "SELECT regexp_full_match(?, ?)", [name, p]
        ).fetchone()[0]
        assert got[i][f"c{i}"] == (1 if ref else 0), (name, p, ref)
        divergences += ref != prom
    assert divergences >= 3  # the quirk is real, not a vacuous pin


def test_regex_matchers_agree_with_re2_engine_randomized(spark):
    """Cross-dialect differential for the regex matcher branches
    (F5/F6/F10/F11): for random guard-accepted patterns, the compiled
    Catalyst predicates (Java regex via rlike) must classify an
    adversarial corpus exactly like a real RE2 engine (DuckDB's
    regexp_matches, partial-match like ClickHouse's match()) evaluating
    the reference's concat-anchored algebra (read.go:104,113-135 —
    '^'+pattern+'$' by bare concat, so top-level alternations anchor
    per-branch; see test_top_level_alternation_anchors_like_reference).
    This is the property the RE2 guard exists to protect: on the accepted
    common dialect, Java and RE2 semantics coincide."""
    import random

    import duckdb
    from pyspark.sql import functions as F

    rng = random.Random(0x2E2_11)
    corpus = [
        ("up", ["job=api", "env=prod"]),
        ("up", ["job=api2", "env=dev"]),
        ("upper", ["job=db"]),
        ("down", []),
        ("down", ["job=a.c"]),
        ("d.wn", ["job=^anchor$", "env="]),
        ("ab", ["job=aab"]),
        ("aab", ["job=ab"]),
        ("a+b", ["job=a+b"]),
        ("xyz", ["job=", "env=x"]),
    ]
    atoms = ["a", "b", "p", ".", "[a-z]", "[0-9]", "(a|b)", r"\.", "up", "j",
             # r13 widening (the soak sweep's grammar): top-level
             # alternation, inner anchors, escapes, classes with literal
             # quantifier chars, perl classes — 18k-cell soak-clean
             "x|y", "(a|)", "[-a]", "[*+]", "[^x]", r"\\", r"\(?=x",
             r"\d", r"\w", "^a", "b$"]
    quants = ["", "*", "+", "?", "{1,2}", "*?", "??"]

    def pat():
        return "".join(
            rng.choice(atoms) + rng.choice(quants)
            for _ in range(rng.randint(1, 3))
        )

    patterns = []
    while len(patterns) < 60:
        p = pat()
        try:
            check_re2_portable(p)  # guard must accept (common dialect)
            # RE2 must parse it too — the widened grammar can compose
            # spellings RE2 rejects (e.g. quantified anchors), which the
            # guard deliberately lets fail loudly server-side
            duckdb.execute("SELECT regexp_matches('z', ?)", [p]).fetchone()
        except (ValueError, duckdb.Error):
            continue
        patterns.append(p)

    df = spark.createDataFrame(
        [(i, n, ls) for i, (n, ls) in enumerate(corpus)],
        "id INT, metric_name STRING, labels ARRAY<STRING>",
    )
    cols, specs = [], []
    for j, p in enumerate(patterns):
        for mt in (RE, NRE):
            for key in ("__name__", "job"):
                cond = compile_matchers([LabelMatcher(mt, key, p)])
                cols.append(F.when(cond, 1).otherwise(0).alias(f"c{len(specs)}"))
                specs.append((p, mt, key))
    got = {
        r["id"]: [r[f"c{k}"] for k in range(len(specs))]
        for r in df.select("id", *cols).collect()
    }

    con = duckdb.connect()

    def re2_eval(name, labels, p, mt, key):
        # reference semantics: RE2 PARTIAL match() of the bare concat
        # '^'+pattern+'$' (read.go:104), not Prometheus's ^(?:...)$ wrap
        if key == "__name__":
            hit = con.execute(
                "SELECT regexp_matches(?, ?)", [name, "^" + p + "$"]
            ).fetchone()[0]
        else:
            hit = any(
                con.execute(
                    "SELECT regexp_matches(?, ?)",
                    [lab, "^" + f"{key}=" + p + "$"],
                ).fetchone()[0]
                for lab in labels
            )
        return (1 if hit else 0) if mt == RE else (0 if hit else 1)

    for i, (name, labels) in enumerate(corpus):
        for k, (p, mt, key) in enumerate(specs):
            want = re2_eval(name, labels, p, mt, key)
            assert got[i][k] == want, (name, labels, p, mt, key)

"""Unit tests for operators/scrub.py: PII scan/redaction semantics, chunk
arithmetic edge cases, and the no-shuffle plan shape of both passes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from remote_tsdb_clickhouse_spark.operators import scrub


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestPiiScan:
    def test_counts_and_redaction(self, spark):
        df = _docs(
            spark,
            [
                (1, "mail a.b-c_d@ex-ample.co.uk and 10.0.0.1 then 555-0199"),
                (2, "no pii here at all"),
                (3, "two mails x@y.io z@w.dev one ip 192.168.1.254"),
            ],
        )
        out = {r["doc_id"]: r for r in scrub.pii_scan(df).collect()}
        assert (out[1]["n_emails"], out[1]["n_ipv4"], out[1]["n_phones"]) == (1, 1, 1)
        assert out[1]["redacted"] == "mail <EMAIL> and <IP> then <PHONE>"
        assert (out[2]["n_emails"], out[2]["n_ipv4"], out[2]["n_phones"]) == (0, 0, 0)
        assert out[2]["redacted"] == out[2]["text"]
        assert (out[3]["n_emails"], out[3]["n_ipv4"]) == (2, 1)

    def test_email_host_not_double_counted_as_ip(self, spark):
        # a digits-and-dots email host must not also count as an IPv4 span:
        # the IPv4 scan runs on the email-redacted text
        df = _docs(spark, [(1, "odd but valid a@10.0.0.1.example.com mail")])
        row = scrub.pii_scan(df).collect()[0]
        assert row["n_emails"] == 1
        assert row["n_ipv4"] == 0
        assert row["redacted"] == "odd but valid <EMAIL> mail"

    def test_bare_ip_at_ip_counts_as_two_ips(self, spark):
        # no alphabetic TLD -> not an email; both dotted quads count as IPs
        df = _docs(spark, [(1, "odd 10.0.0.1@10.0.0.2 string")])
        row = scrub.pii_scan(df).collect()[0]
        assert row["n_emails"] == 0
        assert row["n_ipv4"] == 2
        assert row["redacted"] == "odd <IP>@<IP> string"

    def test_redact_helper_agrees_with_pii_scan_order(self, spark):
        """Mutation screen M75 (survived batch 14 unmutated): redact()
        walks REDACTIONS while pii_scan stages the same order inline, so
        the tuple's order could drift without any test noticing.
        Differential on a fixture where order MATTERS: an email whose
        host is an IPv4 plus an alphabetic TLD — IP-first redaction
        leaves a mangled u@<IP>.co behind instead of one <EMAIL>."""
        df = _docs(
            spark,
            [
                (1, "contact u@1.2.3.4.co now"),
                (2, "mail a@ex.co and 10.0.0.1 then 555-0100"),
            ],
        )
        out = {
            r["doc_id"]: r
            for r in scrub.pii_scan(df)
            .withColumn("helper", scrub.redact(F.col("text")))
            .collect()
        }
        for r in out.values():
            assert r["helper"] == r["redacted"], r
        assert out[1]["redacted"] == "contact <EMAIL> now"

    def test_phone_guard_only_matches_test_prefix(self, spark):
        """Mutation screen M76 (survived batch 14 unmutated): the phone
        pattern is deliberately scoped to the 555 test prefix — generic
        ddd-dddd spans (dates, part numbers, room codes) must pass
        through unredacted, which no fixture asserted."""
        df = _docs(spark, [(1, "meeting 123-4567 and 555-0100 room 10")])
        row = scrub.pii_scan(df).collect()[0]
        assert row["n_phones"] == 1
        assert row["redacted"] == "meeting 123-4567 and <PHONE> room 10"

    def test_pure_projection_no_exchange(self, spark):
        df = _docs(spark, [(1, "x@y.io")])
        plan = scrub.pii_scan(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "BatchEvalPython" not in plan, plan


class TestChunkTokenWindows:
    def chunks(self, spark, text, window=8, overlap=2):
        df = _docs(spark, [(1, text)])
        return sorted(
            scrub.chunk_token_windows(df, window=window, overlap=overlap).collect(),
            key=lambda r: r["chunk_idx"],
        )

    def test_single_window_doc(self, spark):
        rows = self.chunks(spark, "a b c")  # 3 tokens < window 8
        assert len(rows) == 1
        assert (rows[0]["start_tok"], rows[0]["n_tok_chunk"]) == (0, 3)

    def test_exact_window_boundary(self, spark):
        rows = self.chunks(spark, " ".join(f"t{i}" for i in range(8)))
        assert len(rows) == 1  # exactly window tokens -> one chunk

    def test_one_past_window_starts_second_chunk(self, spark):
        rows = self.chunks(spark, " ".join(f"t{i}" for i in range(9)))
        # stride = 6: chunks at 0..7 and 6..8
        assert len(rows) == 2
        assert (rows[1]["start_tok"], rows[1]["n_tok_chunk"]) == (6, 3)

    def test_overlap_covers_every_token(self, spark):
        n = 50
        rows = self.chunks(spark, " ".join(f"t{i}" for i in range(n)))
        covered = set()
        for r in rows:
            covered.update(range(r["start_tok"], r["start_tok"] + r["n_tok_chunk"]))
        assert covered == set(range(n))
        # consecutive chunks overlap by exactly `overlap` tokens
        for a, b in zip(rows, rows[1:]):
            assert a["start_tok"] + a["n_tok_chunk"] - b["start_tok"] >= 2

    def test_empty_doc_one_empty_chunk(self, spark):
        rows = self.chunks(spark, "")
        assert len(rows) == 1
        assert (rows[0]["n_tokens"], rows[0]["n_tok_chunk"]) == (0, 0)

    def test_bad_overlap_rejected(self, spark):
        with pytest.raises(ValueError):
            scrub.chunk_token_windows(_docs(spark, [(1, "a")]), window=4, overlap=4)

    def test_generator_only_no_exchange(self, spark):
        df = _docs(spark, [(1, "a b c d e f g h i j")])
        plan = (
            scrub.chunk_token_windows(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan, plan
        assert "Generate explode" in plan, plan


def test_pii_randomized_sweep(spark):
    """Seeded 150-document sweep of pii_scan vs a Python re reference
    applying the same progressive redaction order, over texts assembled
    from real PII spans and near-miss decoys (no-TLD emails, three-octet
    dotted numbers, non-555 phone shapes, PII glued to punctuation)."""
    import random
    import re as pyre

    from remote_tsdb_clickhouse_spark.operators.scrub import (
        EMAIL_PATTERN,
        IPV4_PATTERN,
        PHONE_PATTERN,
        pii_scan,
    )

    rng = random.Random(37)
    pieces = [
        "hello", "world,", "x.", "(note)", "a@b", "user@host",  # decoys
        "1.2.3", "999.12", "556-1234", "55-1234",
        "bob@mail.example.com", "a.b-c@x-1.org;",  # emails
        "10.0.300.1", "8.8.8.8,",  # ipv4 (octet range not validated)
        "555-0199", "555-1234.",  # phones
    ]
    rows = [(d, " ".join(rng.choice(pieces) for _ in range(rng.randint(1, 25))))
            for d in range(150)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")

    def ref(text):
        n_em = len(pyre.findall(EMAIL_PATTERN, text))
        t1 = pyre.sub(EMAIL_PATTERN, "<EMAIL>", text)
        n_ip = len(pyre.findall(IPV4_PATTERN, t1))
        t2 = pyre.sub(IPV4_PATTERN, "<IP>", t1)
        n_ph = len(pyre.findall(PHONE_PATTERN, t2))
        return n_em, n_ip, n_ph, pyre.sub(PHONE_PATTERN, "<PHONE>", t2)

    texts = dict(rows)
    for r in pii_scan(df).collect():
        want = ref(texts[r.doc_id])
        got = (r.n_emails, r.n_ipv4, r.n_phones, r.redacted)
        assert got == want, (texts[r.doc_id], got, want)


def test_chunk_windows_randomized_sweep(spark):
    """Seeded sweep of chunk_token_windows across four (window, overlap)
    configs and 120 random document lengths vs closed-form Python
    references, checking chunk indices, offsets, partial-final sizes,
    full token coverage, and (one config) the materialized chunk text."""
    import math
    import random

    from remote_tsdb_clickhouse_spark.operators.scrub import chunk_token_windows

    rng = random.Random(41)
    lens = {d: rng.randint(0, 100) for d in range(120)}
    rows = [(d, " ".join(f"w{i}" for i in range(n))) for d, n in lens.items()]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")

    def ref(n, w, o):
        stride = w - o
        n_chunks = 1 + math.ceil(max(0, n - w) / stride)
        return [(i, i * stride, min(w, n - i * stride)) for i in range(n_chunks)]

    for w, o, with_text in [(32, 8, True), (10, 0, False), (5, 4, False), (7, 3, False)]:
        got = {}
        for r in chunk_token_windows(df, window=w, overlap=o, with_text=with_text).collect():
            assert r.n_tokens == lens[r.doc_id]
            got.setdefault(r.doc_id, []).append(r)
        for d, n in lens.items():
            want = ref(n, w, o)
            chunks = sorted(got[d], key=lambda r: r.chunk_idx)
            assert [(r.chunk_idx, r.start_tok, r.n_tok_chunk) for r in chunks] == want, (
                d, n, w, o)
            covered = set()
            for r in chunks:
                covered.update(range(r.start_tok, r.start_tok + r.n_tok_chunk))
            assert covered == set(range(n)), (d, n, w, o)
            if with_text:
                for r in chunks:
                    assert r.chunk_text == " ".join(
                        f"w{i}" for i in range(r.start_tok, r.start_tok + r.n_tok_chunk)
                    ), (d, r)

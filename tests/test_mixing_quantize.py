"""Dataset mixing (water-filling mixture sample) + int8 embedding
quantization — unit-level checks beneath the oracle rows."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from remote_tsdb_clickhouse_spark.operators import mixing, similarity


@pytest.fixture()
def corpus(spark):
    # 3 sources with unequal sizes: src0 x 12, src1 x 6, src2 x 18
    rows = []
    did = 0
    for k, n in [(0, 12), (1, 6), (2, 18)]:
        for _ in range(n):
            rows.append((did, f"src{k}", "en" if did % 2 else "de"))
            did += 1
    return spark.createDataFrame(rows, "doc_id LONG, source STRING, lang STRING")


def test_mixture_take_counts_water_filling(corpus):
    # weights 2/1/3 for src0/1/2; W=6
    w = F.when(F.col("source") == "src0", 2).when(F.col("source") == "src1", 1).otherwise(3)
    takes = {r["source"]: r for r in mixing.mixture_take_counts(corpus, w).collect()}
    # N* = min(12*6//2, 6*6//1, 18*6//3) = min(36, 36, 36) = 36
    assert takes["src0"]["n_take"] == 12  # 2*36//6
    assert takes["src1"]["n_take"] == 6
    assert takes["src2"]["n_take"] == 18
    # shrink src1: it becomes the binding constraint
    smaller = corpus.where((F.col("source") != "src1") | (F.col("doc_id") < 15))
    takes = {r["source"]: r for r in mixing.mixture_take_counts(smaller, w).collect()}
    # src1 now has 3 docs -> N* = 3*6//1 = 18 -> takes 6/3/9
    assert (takes["src0"]["n_take"], takes["src1"]["n_take"], takes["src2"]["n_take"]) == (6, 3, 9)


def test_mixture_sample_deterministic_and_sized(corpus):
    w = F.lit(1)  # uniform: N* = 3 * min(c_k) = 18 -> take 6 each
    sel = mixing.mixture_sample(corpus, w)
    got = sorted(r["doc_id"] for r in sel.collect())
    assert len(got) == 18
    per_src = sel.groupBy("source").count().collect()
    assert {r["source"]: r["count"] for r in per_src} == {"src0": 6, "src1": 6, "src2": 6}
    # pure function of the ids: same selection on a reshuffled frame
    again = mixing.mixture_sample(corpus.repartition(7), w)
    assert sorted(r["doc_id"] for r in again.collect()) == got


def test_quantize_int8_histogram(spark):
    emb = spark.createDataFrame(
        [(i, [float(i) / 10.0, float(i % 3)]) for i in range(10)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    out = similarity.quantize_int8_histogram(emb, codes=256).collect()
    by_dim = {}
    for r in out:
        by_dim.setdefault(r["dim"], []).append(r)
    # dim 0: values 0.0..0.9 -> micro-units 0..900000 (float32 rounding
    # aside), 10 distinct codes; dim 1: 3 distinct values -> 3 codes
    assert len(by_dim[0]) == 10
    assert len(by_dim[1]) == 3
    assert sum(r["n"] for r in by_dim[0]) == 10
    assert sum(r["n"] for r in by_dim[1]) == 10
    for r in out:
        assert 0 <= r["qcode"] <= 255
        assert r["mn_micro"] <= r["mx_micro"]
    # min maps to code 0, max to the top occupied code
    d0 = sorted(by_dim[0], key=lambda r: r["qcode"])
    assert d0[0]["qcode"] == 0
    assert d0[-1]["qcode"] == 255


def test_mixture_randomized_water_filling_sweep(spark):
    """Seeded randomized sweep of the water-filling math and the rank
    selection: random source counts (including size-1 and heavily skewed)
    and random integer weights, checked against an independent Python
    model of N* = min_k floor(c_k*W/w_k), take_k = floor(w_k*N*/W).  The
    selected ids must equal the Python reference selection exactly — the
    md5-rank tie-broken by id — so the sample is reproducible down to the
    document level, not just the counts."""
    import hashlib
    import random

    rng = random.Random(911)
    for _ in range(8):
        n_sources = rng.randint(1, 5)
        counts = [rng.choice([1, 2, 3, rng.randint(4, 40)]) for _ in range(n_sources)]
        weights = {f"s{k}": rng.randint(1, 9) for k in range(n_sources)}
        rows, did = [], 0
        for k, c in enumerate(counts):
            for _ in range(c):
                rows.append((did, f"s{k}"))
                did += 1
        docs = spark.createDataFrame(rows, "doc_id LONG, source STRING").repartition(5)

        w = F.lit(None).cast("long")
        expr = None
        for src, wt in weights.items():
            expr = (F.when(F.col("source") == src, wt) if expr is None
                    else expr.when(F.col("source") == src, wt))
        w = expr

        # independent Python model
        bigw = sum(weights.values())
        n_star = min((c * bigw) // weights[f"s{k}"] for k, c in enumerate(counts))
        want_take = {f"s{k}": (weights[f"s{k}"] * n_star) // bigw
                     for k in range(len(counts))}

        got_take = {r["source"]: r["n_take"]
                    for r in mixing.mixture_take_counts(docs, w).collect()}
        assert got_take == want_take, (counts, weights)

        # reference selection: md5(str(id)) rank within source, tie by id
        by_src = {}
        for i, src in rows:
            by_src.setdefault(src, []).append(i)
        want_ids = set()
        for src, ids in by_src.items():
            ranked = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
            want_ids.update(ranked[: want_take[src]])

        got_ids = {r["doc_id"] for r in mixing.mixture_sample(docs, w).collect()}
        assert got_ids == want_ids, (counts, weights)
        # take never exceeds availability and hits the exact mixture floor
        for k, c in enumerate(counts):
            assert 0 <= want_take[f"s{k}"] <= c

"""Vector column expressions: sequential-fold dot/norm/cosine and the
sign-bucket LSH quantizer vs Python references, including the exact
left-to-right fold order (IEEE addition is not associative, and the
oracle's list_dot_product folds sequentially too)."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from remote_tsdb_clickhouse_spark.functions import vecfuncs as vf


def test_vecfuncs_randomized_sweep(spark):
    rng = random.Random(2309)
    rows = []
    for i in range(40):
        d = rng.choice([1, 2, 8, 33])
        a = [rng.uniform(-10, 10) for _ in range(d)]
        b = [rng.uniform(-10, 10) for _ in range(d)]
        if rng.random() < 0.1:
            a = [0.0] * d  # zero norm -> cosine 0 by contract
        rows.append((i, d, a, b))

    df = spark.createDataFrame(
        rows, "i LONG, d LONG, a ARRAY<DOUBLE>, b ARRAY<DOUBLE>"
    )
    got = {
        r.i: (r.dp, r.na, r.cos, r.bkt)
        for r in df.select(
            "i",
            vf.dot(F.col("a"), F.col("b")).alias("dp"),
            vf.norm(F.col("a")).alias("na"),
            vf.cosine(F.col("a"), F.col("b")).alias("cos"),
            vf.sign_bucket(F.col("a"), 8).alias("bkt"),
        ).collect()
    }
    for i, d, a, b in rows:
        # sequential left-to-right fold, exactly like the Catalyst aggregate
        dp = 0.0
        for x, y in zip(a, b):
            dp = dp + x * y
        sq = 0.0
        for x in a:
            sq = sq + x * x
        na = math.sqrt(sq)
        sqb = 0.0
        for y in b:
            sqb = sqb + y * y
        nb = math.sqrt(sqb)
        cos = dp / (na * nb) if na > 0 and nb > 0 else 0.0
        # axis-aligned sign bucket over the first 8 dims (slice pads with
        # nothing when d < 8: transform runs over the existing elements)
        bkt = sum((1 << j) for j, x in enumerate(a[:8]) if x >= 0)
        want = (dp, na, cos, bkt)
        assert got[i] == want, (i, got[i], want)


def test_dot_unrolled_dims_bit_identical_to_fold(spark):
    """r21 optimization pin: for the statically-unrolled dims (16/64 —
    vecfuncs._UNROLL_DIMS) the codegen-able element chain must be
    BIT-identical to the sequential fold (same left-to-right addition
    order from the same 0.0 seed), including sign-flip/zero/adversarial
    magnitude mixes where IEEE addition order matters most."""
    import struct

    rng = random.Random(97)
    rows = []
    i = 0
    for d in list(vf._UNROLL_DIMS) + [63, 65]:  # off-by-one dims take the fold
        for _ in range(25):
            a = [rng.uniform(-10, 10) * 10 ** rng.randint(-8, 8) for _ in range(d)]
            b = [rng.uniform(-10, 10) * 10 ** rng.randint(-8, 8) for _ in range(d)]
            rows.append((i, a, b))
            i += 1
    df = spark.createDataFrame(rows, "i LONG, a ARRAY<DOUBLE>, b ARRAY<DOUBLE>")
    unrolled = vf.dot(F.col("a"), F.col("b"), unroll=True)
    # r21 plan-construction memo: an identical (a, b) pair must return the
    # CACHED Column object (the ~620 ms py4j build happens once), and the
    # cached expression must stay value-correct below
    assert vf.dot(F.col("a"), F.col("b"), unroll=True) is unrolled
    got = {
        r.i: (r.dp, r.dpu)
        for r in df.select(
            "i",
            vf.dot(F.col("a"), F.col("b")).alias("dp"),
            unrolled.alias("dpu"),
        ).collect()
    }
    for i, a, b in rows:
        dp = 0.0
        for x, y in zip(a, b):
            dp = dp + x * y
        assert struct.pack("d", got[i][0]) == struct.pack("d", dp), (i, got[i], dp)
        # the unrolled chain (taken for _UNROLL_DIMS, the fold otherwise)
        # must be bit-identical to the fold on every dim
        assert struct.pack("d", got[i][1]) == struct.pack("d", dp), (i, got[i], dp)

"""Similarity search over embedding columns (``array<float>``).

Two ANN strategies:

- :func:`brute_force_topk` — exact cosine top-k.  The query side is tiny
  and **broadcast**, so the big side streams through one codegen'd stage
  with zero shuffle of the corpus; top-k is a per-query window on the
  (small) scored output.  At 100 TB the corpus never moves.
- :func:`bucketed_topk` — LSH/IVF-style: corpus and queries are bucketed by
  a deterministic sign-pattern quantizer; scoring happens only within the
  query's bucket.  This is the scale path when the query side is itself
  large: the join is an equi-join on bucket id (hash shuffle, linear), not
  a cross product.

Cosine near-dup pairing (:func:`cosine_pairs`) completes the dedup family
in ``operators/dedup.py``.

Norms are always pre-computed per row before pairing (O(n) not O(n²)).
For wide vectors a numpy Pandas-UDF scorer would add SIMD; at 64-dim the
Catalyst fold (``functions/vecfuncs.py``) is already JVM-vectorized by
codegen and avoids all Arrow transfer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from remote_tsdb_clickhouse_spark.functions.vecfuncs import (
    as_double,
    cosine_with_norms,
    norm,
    sign_bucket,
)


def _with_norm(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    from remote_tsdb_clickhouse_spark.util import spread

    v = as_double(vec_col)
    return spread(emb).select(F.col(id_col).alias("vid"), v.alias("vec")).withColumn(
        "nrm", norm(F.col("vec"))
    )


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query vector.

    Output: (query_id, neighbor_id, cos, rank) with rank 1..k, ties broken
    by neighbor id for determinism; self-matches excluded.
    """
    corpus = _with_norm(emb, id_col, vec_col)
    qs = _with_norm(queries, id_col, vec_col).select(
        F.col("vid").alias("query_id"), F.col("vec").alias("qvec"), F.col("nrm").alias("qnrm")
    )
    scored = (
        corpus.join(F.broadcast(qs), F.col("vid") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vid").alias("neighbor_id"),
            cosine_with_norms(F.col("qvec"), F.col("vec"), F.col("qnrm"), F.col("nrm")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 4).alias("cos"), "rank")
    )


def bucketed_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed approximate top-k: search only the query's sign-bucket.

    The quantizer (:func:`~...vecfuncs.sign_bucket`) is deterministic, so
    results are reproducible and oracle-checkable.  Recall is traded for a
    linear equi-join; multi-probe (flipping low-confidence bits) is the
    standard recall knob, left as the documented extension.
    """
    corpus = _with_norm(emb, id_col, vec_col).withColumn("bucket", sign_bucket(F.col("vec"), n_bits))
    qs = (
        _with_norm(queries, id_col, vec_col)
        .withColumn("bucket", sign_bucket(F.col("vec"), n_bits))
        .select(
            F.col("vid").alias("query_id"),
            F.col("vec").alias("qvec"),
            F.col("nrm").alias("qnrm"),
            "bucket",
        )
    )
    scored = (
        corpus.join(qs, "bucket")
        .where(F.col("vid") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vid").alias("neighbor_id"),
            cosine_with_norms(F.col("qvec"), F.col("vec"), F.col("qnrm"), F.col("nrm")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 4).alias("cos"), "rank")
    )


def cosine_pairs(
    emb: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs: all (a < b) with cosine >= threshold.

    Exact all-pairs — the verification baseline.  At corpus scale the
    bucketed variant restricts pairing to same-bucket candidates first
    (compose ``sign_bucket`` into the join key exactly as in
    :func:`bucketed_topk`).
    """
    base = _with_norm(emb, id_col, vec_col)
    a = base.select(F.col("vid").alias("id_a"), F.col("vec").alias("va"), F.col("nrm").alias("na"))
    b = base.select(F.col("vid").alias("id_b"), F.col("vec").alias("vb"), F.col("nrm").alias("nb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine_with_norms(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 4).alias("cos"))
    )

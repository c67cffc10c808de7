"""Dataset mixing: deterministic source-weighted sampling for training runs.

Pre-training data recipes are specified as *mixture weights* over sources
(web / code / books / ...), e.g. GPT-3 Table 2.2, The Pile §1, Llama "data
mixes".  Given per-source weights ``w_k`` and available counts ``c_k``, the
largest corpus achievable at the EXACT mixture without upsampling any
source is

    N* = min_k floor(c_k * W / w_k)        (W = sum of weights)
    take_k = floor(w_k * N* / W)

— the water-filling bound: the scarcest source relative to its weight caps
the whole corpus.  Selection within a source is by md5-hash rank of the
document id, so the sample is a pure function of the ids (reproducible
across runs/partitionings — ``df.sample`` is neither).

Scale shape: counts are one map-side-combinable aggregate; the weight
arithmetic happens on the tiny per-source frame (a scalar window over ~10s
of rows); the per-source take is a broadcast join back to the corpus.  The
exact-rank selection is one shuffle-and-sort per source — the
reproducibility contract.  At 100 TB, if an approximate take is acceptable,
swap the rank for a hash-threshold acceptance (``hash % M < take/c * M``):
shuffle-free, same determinism, counts off by O(sqrt(c)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def mixture_take_counts(
    docs: DataFrame, weight: Column, source_col: str = "source"
) -> DataFrame:
    """Per-source water-filling take: ``(source, n_docs, w, n_take)``.

    ``weight`` is an integer target-weight expression over the source
    column (relative proportions; they need not sum to anything).  All
    arithmetic is integer (exact on every engine).
    """
    counts = docs.groupBy(source_col).agg(F.count("*").alias("n_docs"))
    counts = counts.withColumn("w", weight.cast("long"))
    # the per-source frame is tiny (one row per source): scalar windows are
    # a driver-free way to get corpus-level constants next to each row
    everything = Window.partitionBy()
    counts = counts.withColumn("bigw", F.sum("w").over(everything))
    counts = counts.withColumn(
        "n_star", F.min(F.expr("(n_docs * bigw) div w")).over(everything)
    )
    return counts.select(
        source_col,
        "n_docs",
        "w",
        F.expr("(w * n_star) div bigw").alias("n_take"),
    )


def mixture_sample(
    docs: DataFrame,
    weight: Column,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rows of ``docs`` selected into the mixture (all columns preserved).

    A document is selected iff its md5-rank within its source is at most
    the source's water-filling take.  Deterministic in the ids alone.
    """
    takes = mixture_take_counts(docs, weight, source_col)
    rank = F.row_number().over(
        Window.partitionBy(source_col).orderBy(
            F.md5(F.col(id_col).cast("string")), id_col
        )
    )
    return (
        docs.join(F.broadcast(takes.select(source_col, "n_take")), source_col)
        .withColumn("__rk", rank)
        .where(F.col("__rk") <= F.col("n_take"))
        .drop("__rk", "n_take")
    )

"""Benchmark decontamination: n-gram overlap between a training corpus and
a held-out evaluation set.

The standard pre-training hygiene pass (GPT-3 §B, PaLM §7, Llama eval
cards): a training document is *contaminated* if it shares any verbatim
word n-gram (n typically 8-13) with a benchmark document.  Contaminated
docs are dropped or flagged before training.

Scale shape: tokenize both sides, explode n-grams, equi-join on the
64-bit n-gram hash — the benchmark side is orders of magnitude smaller
than the training corpus, so Spark's auto-broadcast promotes it when it
fits and AQE falls back to a shuffle join when it doesn't; the training
side is never shuffled more than once.  No cross join, no driver-side
state — linear in corpus size at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from remote_tsdb_clickhouse_spark.functions.textfuncs import tokens, word_shingles
from remote_tsdb_clickhouse_spark.util import spread


def ngram_frame(
    docs: DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, ngram) — distinct word n-grams per document, exploded.

    Same tokenize->shingle pipeline as the dedup family (normalized_docs)
    with a configurable n; the repartition barrier keeps the token
    expression out of the shingle lambdas (see normalized_docs docstring).
    """
    par = docs.sparkSession.sparkContext.defaultParallelism
    return (
        spread(docs)
        .select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("toks"))
        .repartition(par, "doc_id")
        .withColumn("ng", word_shingles(F.col("toks"), n))
        .select("doc_id", F.explode("ng").alias("ngram"))
    )


def ngram_contamination(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per contaminated training doc: how many distinct n-grams it shares
    with the benchmark set, and how many benchmark docs it collides with.

    Output: ``(doc_id, n_shared_ngrams, n_benchmark_docs)`` — only docs
    with at least one shared n-gram appear (clean docs produce no row, so
    the output is collision-sized, not corpus-sized).
    """
    t = ngram_frame(train, n, id_col, text_col)
    b = ngram_frame(benchmark, n, id_col, text_col).select(
        F.col("doc_id").alias("bench_id"), "ngram"
    )
    # join on the raw n-gram string: exact (no hash-collision caveat); at
    # scale swap in xxhash64 keys exactly as ngram_jaccard_pairs does
    return (
        t.join(b, "ngram")
        .groupBy("doc_id")
        .agg(
            F.count_distinct("ngram").alias("n_shared_ngrams"),
            F.count_distinct("bench_id").alias("n_benchmark_docs"),
        )
    )

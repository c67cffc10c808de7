"""Small engine utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure a DataFrame has enough partitions to use the cluster.

    Small dimension-like inputs (one parquet file -> one partition) serialize
    every downstream map stage onto a single core; explode-heavy operators
    (shingling, pair scoring) then run 32x slower than they should.  A
    round-robin repartition is cheap at small sizes and a no-op cost at
    scale, where inputs already have >= parallelism partitions and this
    branch never triggers.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    # partition-count probe without df.rdd (which forces the DataFrame
    # through RDD conversion — an analysis barrier — on every call):
    # for file-scan frames, inputFiles() is a metadata-only lookup and the
    # scan produces >= one partition per file beyond maxPartitionBytes, so
    # many files => already parallel.  Frames with no input files (local
    # relations, post-shuffle) fall back to the RDD probe — those are the
    # rare case in operator pipelines, which call spread() on fresh scans.
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files >= target:
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df

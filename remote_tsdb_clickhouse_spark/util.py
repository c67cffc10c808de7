"""Small engine utilities."""

from __future__ import annotations

from weakref import WeakKeyDictionary

from pyspark.sql import DataFrame


class ExprMemo:
    """Bounded, context-aware memo for driver-side expression trees
    (Columns / WindowSpecs / tuples of either) keyed by their frozen build
    inputs — the r21 ``_EXPR_MEMO`` precedents unified and hardened
    (guide §5 driver latency; expressions only, never data: sharing an
    immutable expression tree across plans is semantics-free, every query
    still executes from its own inputs).

    Hardening over the r21 plain dicts (r21 verdict item 3, ADVICE r21):

    - **Bounded**: at most ``maxsize`` entries, oldest-inserted evicted
      first.  Bench/oracle key sets are tiny and fixed, but the long-lived
      ``/read`` server path builds one filter per distinct remote-read
      request — an unbounded dict is a slow driver-memory leak there.
    - **Gateway-aware**: cached objects wrap py4j JavaObjects.  If the
      SparkContext (and with it the JVM gateway) is torn down and
      relaunched, a cached expression would be a stale JavaObject raising
      confusing py4j errors far from the cause; the memo tracks the active
      SparkContext and self-clears when it changes.
    - **TypeError-safe**: an unhashable key component falls back to direct
      construction (read_plan had this; tsfuncs did not — ADVICE r21).
    """

    def __init__(self, maxsize: int = 256):
        self._maxsize = maxsize
        self._data: dict = {}
        self._ctx = None

    def __len__(self) -> int:
        return len(self._data)

    def get(self, key, build):
        from pyspark import SparkContext

        ctx = SparkContext._active_spark_context
        if ctx is not self._ctx:
            self._data.clear()
            self._ctx = ctx
        try:
            val = self._data.get(key)
        except TypeError:  # unhashable component in the key
            return build()
        if val is None:
            val = build()
            if len(self._data) >= self._maxsize:
                self._data.pop(next(iter(self._data)))
            self._data[key] = val
        return val


def _bytes_conf(spark, key: str, default: int) -> int:
    """Read a byte-size conf, tolerating '128m'-style suffixed values."""
    try:
        raw = str(spark.conf.get(key)).strip().lower()
    except Exception:
        return default
    mult = 1
    for suffix, m in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30)):
        if raw.endswith(suffix + "b"):
            raw, mult = raw[:-2], m
            break
        if raw.endswith(suffix):
            raw, mult = raw[:-1], m
            break
    if raw.endswith("b"):
        raw = raw[:-1]
    try:
        return int(float(raw) * mult)
    except ValueError:
        return default


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure a DataFrame has enough partitions to use the cluster.

    Small dimension-like inputs (one parquet file -> one partition) serialize
    every downstream map stage onto a single core; explode-heavy operators
    (shingling, pair scoring) then run 32x slower than they should.  A
    round-robin repartition is cheap at small sizes and a no-op cost at
    scale, where inputs already have >= parallelism partitions.

    Probe strategy: ``n_files >= target`` alone is NOT enough — Spark
    bin-packs small files into FilePartitions (maxPartitionBytes /
    openCostInBytes), so 16 tiny files can scan as ONE partition.  The
    packing does give a guaranteed lower bound: every file contributes at
    least ``openCostInBytes`` padded bytes and no partition exceeds
    ``maxPartitionBytes`` of padded cost, so the scan yields at least
    ``n_files * openCost / maxPartitionBytes`` partitions; with a 2x safety
    factor for greedy-packing slack this short-circuits the probe exactly
    where it matters (real tables at scale: thousands of files), while small
    inputs fall through to the exact ``df.rdd.getNumPartitions()`` probe —
    driver-only plan conversion, cheap at the sizes where it runs.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files:
        open_cost = _bytes_conf(spark, "spark.sql.files.openCostInBytes", 4 << 20)
        max_bytes = _bytes_conf(spark, "spark.sql.files.maxPartitionBytes", 128 << 20)
        if max_bytes > 0 and n_files * open_cost >= 2 * target * max_bytes:
            return df
    if _num_partitions(df) < target:
        return df.repartition(target)
    return df


#: session -> {semanticHash: partition count}.  The RDD probe forces
#: physical planning (driver-only but ~tens of ms); operator entrypoints call
#: spread() on the same scans once per query, so memoize by plan semantics —
#: semantically-equal plans are guaranteed equal hashes, and the hash covers
#: the relation's file listing, so an appended table re-probes.  Weak-keyed
#: by the session object so entries die with their session: a dict keyed by
#: ``id(session)`` could serve stale counts after the id is reused by a new
#: session (e.g. bench's stopped suite session followed by the cold-pass
#: one), and would also grow without bound.
_NPART_CACHE: WeakKeyDictionary = WeakKeyDictionary()


def _num_partitions(df: DataFrame) -> int:
    try:
        sess = df.sparkSession
        h = df.semanticHash()
    except Exception:
        return df.rdd.getNumPartitions()
    per = _NPART_CACHE.setdefault(sess, {})
    n = per.get(h)
    if n is None:
        n = per[h] = df.rdd.getNumPartitions()
    return n

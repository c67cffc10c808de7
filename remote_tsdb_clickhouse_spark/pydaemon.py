"""Python-worker daemon with heavy imports preloaded before forking.

Spark's Python worker pool is elastic: idle workers are culled after ~1
minute, so a query suite that alternates JVM-only stretches with
Arrow/Pandas stages re-spawns whole worker waves — and every fresh worker
pays the numpy/pandas/pyarrow import chain (~1 s each) at first task
deserialization.  Measured here: a 3-python-stage query needing 96 workers
ran 14.8 s after a JVM-only stretch vs 2.9 s with a warm pool — ~12 s of
nothing but import storms.

The standard fix (``spark.python.daemon.module``): import the heavy
libraries in the DAEMON process, before any fork.  Every worker then
inherits the already-initialized modules via copy-on-write and spawning
returns to fork-cost (~1 ms).  On a 1000-executor cluster this same knob
removes the import storm from every executor's first Python stage and
from every pool re-expansion after idle culls.

This module must stay import-safe under any interpreter the workers use:
every preload is individually best-effort.
"""

import importlib

for _m in (
    "numpy",
    "pandas",
    "pyarrow",
    # worker-side hot modules of this engine (decoders, ANN kernels):
    # importing them here also pulls in their stdlib deps (zlib, struct,
    # hashlib, wave) so forked workers deserialize UDFs instantly
    "remote_tsdb_clickhouse_spark.operators.multimodal",
    "remote_tsdb_clickhouse_spark.operators.similarity",
):
    try:
        importlib.import_module(_m)
    except Exception:  # pragma: no cover - absent lib: worker imports lazily
        pass

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()

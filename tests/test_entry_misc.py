"""Entry-module hardening tests: the cached-samples spread scale guard and
the streaming-dedup staging trust checks (r8/r9 advisor findings)."""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from conftest import SF_SMOKE

import __spark_entry__ as entry


def test_samples_spread_guard(spark):
    # pure guard: the measured local knee at or below local-bench
    # parallelism, spread()'s own defaultParallelism target beyond it —
    # a mid-scale deployment whose events table is a handful of large
    # files must NOT be capped at 4 partitions (r8 advisor)
    assert entry._samples_spread(1) == entry._SAMPLES_SPREAD
    assert entry._samples_spread(8) == entry._SAMPLES_SPREAD
    assert entry._samples_spread(entry._LOCAL_BENCH_PARALLELISM) == entry._SAMPLES_SPREAD
    assert entry._samples_spread(entry._LOCAL_BENCH_PARALLELISM + 1) is None
    assert entry._samples_spread(400) is None
    # provable local no-op: at local parallelism the cached samples frame
    # still holds exactly the knee partition count the r8 sweep measured
    # (this is what keeps the r8-hashed tsdb cohort's driver rows valid)
    df = entry._samples(spark, SF_SMOKE)
    assert df.rdd.getNumPartitions() == entry._SAMPLES_SPREAD


def _published_staging_path(sf_dir: str) -> str:
    uid = os.getuid() if hasattr(os, "getuid") else 0
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"graft_dedup_stream2_u{uid}_{tag}")


def _drop_published(spark, sf_dir: str) -> str:
    """Forget the session memo and remove any published staging dir."""
    entry._DEDUP_STREAM_STAGING.setdefault(spark, {}).pop(sf_dir, None)
    final = _published_staging_path(sf_dir)
    if os.path.islink(final):
        os.unlink(final)
    elif os.path.lexists(final):
        shutil.rmtree(final, ignore_errors=True)
    return final


def test_staging_rejects_symlink_alias(spark, tmp_path):
    """A symlink planted at the published staging name must never be
    trusted, even when it points at a directory this uid legitimately
    owns (os.stat would pass the uid check on the TARGET's owner — the
    r8 advisor's aliasing variant of the staging-poisoning class)."""
    final = _drop_published(spark, SF_SMOKE)
    decoy = tmp_path / "decoy"
    decoy.mkdir()
    (decoy / "_STAGED").write_text(os.path.abspath(SF_SMOKE))  # even a "right" marker
    os.symlink(decoy, final)
    try:
        got = entry.stage_dedup_stream_input(spark, SF_SMOKE)
        assert not os.path.islink(got)
        assert os.path.realpath(got) != os.path.realpath(str(decoy))
        with open(os.path.join(got, "_STAGED")) as fh:
            assert fh.read() == os.path.abspath(SF_SMOKE)
        assert sorted(os.listdir(os.path.join(got, "in"))) == [
            f"chunk{i}.parquet" for i in range(2)
        ]
    finally:
        _drop_published(spark, SF_SMOKE)


def test_staging_marker_binds_dataset(spark):
    """An owned REAL directory under the published name whose marker names
    a different dataset must be rebuilt around, not served (the marker is
    the dataset identity, not a mere existence flag)."""
    final = _drop_published(spark, SF_SMOKE)
    os.makedirs(final)
    with open(os.path.join(final, "_STAGED"), "w") as fh:
        fh.write("/somewhere/else")
    try:
        got = entry.stage_dedup_stream_input(spark, SF_SMOKE)
        assert got != final
        with open(os.path.join(got, "_STAGED")) as fh:
            assert fh.read() == os.path.abspath(SF_SMOKE)
    finally:
        _drop_published(spark, SF_SMOKE)


def test_staging_reuses_published_dir(spark):
    """The happy path must still share across processes/sessions: a prior
    publication with the right marker is reused verbatim."""
    final = _drop_published(spark, SF_SMOKE)
    first = entry.stage_dedup_stream_input(spark, SF_SMOKE)
    assert first == final and os.path.isfile(os.path.join(final, "_STAGED"))
    # a fresh "session" view: clear only the memo, keep the dir
    entry._DEDUP_STREAM_STAGING.setdefault(spark, {}).pop(SF_SMOKE, None)
    again = entry.stage_dedup_stream_input(spark, SF_SMOKE)
    assert again == final

"""Lineage checkpointing: resumable backfill, idempotent partition writes,
parallelism-invariant checksums."""

import tempfile

import pytest
from pyspark.sql import functions as F

from deep_ner_spark import datagen
from deep_ner_spark.plans.checkpoint import (
    CheckpointTable,
    lineage_metrics,
    resumable_backfill,
)


@pytest.fixture(scope="module")
def tdf(spark):
    t, _, _ = datagen.gen_transcripts(n_convs=8, mean_turns=6, seed=5)
    return spark.createDataFrame(t)


def test_checksum_invariant_to_partitioning(tdf, spark):
    a = lineage_metrics(tdf.repartition(1), ["text"], "ts")
    b = lineage_metrics(tdf.repartition(7, "conv_id"), ["text"], "ts")
    assert a["row_count"] == b["row_count"]
    assert a["feature_checksum"] == b["feature_checksum"]
    assert a["watermark_us"] == b["watermark_us"]


def test_resumable_backfill_skips_completed(tdf, spark):
    units = [f"conv{i:07d}" for i in range(4)]  # real datagen conv ids
    calls = []

    def run_unit(u):
        calls.append(u)
        return tdf.where(F.col("conv_id") == u)

    with tempfile.TemporaryDirectory() as d:
        ckpt = CheckpointTable(spark, f"{d}/lineage")
        done1 = resumable_backfill(
            spark, units[:2], run_unit, f"{d}/out", ckpt, "run1", ["text"], "ts"
        )
        assert done1 == units[:2]
        # resume with the full unit list: first two are skipped
        done2 = resumable_backfill(
            spark, units, run_unit, f"{d}/out", ckpt, "run1", ["text"], "ts"
        )
        assert done2 == units[2:]
        assert calls == units  # each unit executed exactly once
        # lineage records carry counts that match the data actually written
        lineage = {r["unit"]: r for r in ckpt.read().collect()}
        assert set(lineage) == set(units)
        for u in units:
            n = spark.read.parquet(f"{d}/out/__unit={u}").count()
            assert n > 0 and lineage[u]["row_count"] == n
        # a different run_id re-executes everything (idempotent overwrite)
        done3 = resumable_backfill(
            spark, units[:1], run_unit, f"{d}/out", ckpt, "run2", ["text"], "ts"
        )
        assert done3 == units[:1]


def test_resumable_backfill_survives_driver_death(tdf, spark, tmp_path):
    """Fault injection for the north_star mid-backfill scenario: a REAL
    driver process is hard-killed (os._exit, no cleanup, JVM dies) after
    unit 2's parquet data is written but BEFORE its lineage record lands —
    the worst-case window, leaving orphan data with no checkpoint.  The
    resumed run (fresh session, state only from the checkpoint table +
    output dir) must re-do exactly the unfinished units, overwrite the
    orphan idempotently, and produce output and lineage metrics identical
    to an unbroken run."""
    import os
    import subprocess
    import sys
    import textwrap

    d = str(tmp_path / "crash")
    units = [f"conv{i:07d}" for i in range(4)]
    script = textwrap.dedent(
        """
        import os, sys
        sys.path.insert(0, %(repo)r)
        from pyspark.sql import functions as F
        from deep_ner_spark.session import get_spark
        from deep_ner_spark import datagen
        from deep_ner_spark.plans.checkpoint import CheckpointTable, resumable_backfill

        spark = get_spark("crashdrv", master="local[2]", shuffle_partitions=2)
        t, _, _ = datagen.gen_transcripts(n_convs=8, mean_turns=6, seed=5)
        tdf = spark.createDataFrame(t)
        units = %(units)r
        d = %(dir)r

        class DyingCheckpoint(CheckpointTable):
            def append(self, record):
                if record["unit"] == units[2]:
                    os._exit(17)  # hard death: data written, record not
                super().append(record)

        ckpt = DyingCheckpoint(spark, f"{d}/lineage")
        resumable_backfill(
            spark, units, lambda u: tdf.where(F.col("conv_id") == u),
            f"{d}/out", ckpt, "run1", ["text"], "ts",
        )
        os._exit(0)  # not reached
        """
    ) % {"repo": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
         "units": units, "dir": d}
    proc = subprocess.run([sys.executable, "-c", script], timeout=300,
                          capture_output=True, text=True)
    assert proc.returncode == 17, proc.stderr[-2000:]
    # post-mortem: units 0-1 checkpointed; unit 2's data is orphaned on disk
    ckpt = CheckpointTable(spark, f"{d}/lineage")
    assert ckpt.completed_units("run1") == set(units[:2])
    assert spark.read.parquet(f"{d}/out/__unit={units[2]}").count() > 0

    def run_unit(u):
        return tdf.where(F.col("conv_id") == u)

    executed = resumable_backfill(
        spark, units, run_unit, f"{d}/out", ckpt, "run1", ["text"], "ts"
    )
    assert executed == units[2:]  # orphan unit redone, completed units skipped

    # unbroken control run into a separate dir
    d2 = str(tmp_path / "clean")
    ckpt2 = CheckpointTable(spark, f"{d2}/lineage")
    resumable_backfill(
        spark, units, run_unit, f"{d2}/out", ckpt2, "run1", ["text"], "ts"
    )
    crashed = sorted(map(tuple, spark.read.parquet(f"{d}/out").collect()))
    clean = sorted(map(tuple, spark.read.parquet(f"{d2}/out").collect()))
    assert crashed == clean and len(clean) > 0
    lin1 = {r["unit"]: (r["row_count"], r["feature_checksum"], r["watermark_us"])
            for r in ckpt.read().collect()}
    lin2 = {r["unit"]: (r["row_count"], r["feature_checksum"], r["watermark_us"])
            for r in ckpt2.read().collect()}
    assert lin1 == lin2 and set(lin1) == set(units)


def test_table_io_parquet_fallback_roundtrip(spark, tmp_path):
    """Iceberg-or-Parquet seam: path locations round-trip through the
    Parquet fallback with partition layout intact; catalog-style names
    fail loudly when no Iceberg runtime is present; snapshot_id is
    deterministic and tracks data changes."""
    import pytest

    from deep_ner_spark.sources import table_io

    df = spark.createDataFrame(
        [("c1", 0, "hello", "2024-01-01"), ("c1", 1, "world", "2024-01-02")],
        ["conv_id", "turn_idx", "text", "day"],
    )
    loc = str(tmp_path / "tbl")
    table_io.write_table(df, loc, mode="overwrite", partition_by=["day"])
    back = table_io.read_table(spark, loc)
    assert back.count() == 2 and set(back.columns) == set(df.columns)
    # partition layout on disk (metadata-compatible with an Iceberg import)
    assert any(p.name.startswith("day=") for p in (tmp_path / "tbl").iterdir())

    s1 = table_io.snapshot_id(spark, loc)
    s2 = table_io.snapshot_id(spark, loc)
    assert s1 == s2 and len(s1) == 32
    table_io.write_table(df, loc, mode="append", partition_by=["day"])
    assert table_io.snapshot_id(spark, loc) != s1

    if not table_io._iceberg_available(spark):
        with pytest.raises(ValueError, match="Iceberg"):
            table_io.read_table(spark, "db.transcripts")
        with pytest.raises(RuntimeError, match="Iceberg"):
            table_io.read_table(spark, str(tmp_path / "tbl"), fmt="iceberg")


def test_table_io_snapshot_lineage_roundtrip(spark, tmp_path, tdf):
    """SURVEY §4.2 layout end-to-end: write with the engine's partition
    spec (day + conv_id bucket, the Parquet stand-in for Iceberg's
    days(ts)/bucket(conv_id)), read back through the seam, and record the
    input snapshot id in a backfill lineage row.  The snapshot id must
    survive mtime churn (content-based fingerprint) and change on append."""
    import os
    import time

    from deep_ner_spark.sources import table_io

    loc = str(tmp_path / "transcripts")
    laid = tdf.withColumn("day", F.to_date("ts")).withColumn(
        "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(4))
    )
    table_io.write_table(laid, loc, mode="overwrite", partition_by=["day", "bucket"])
    parts = [p.name for p in (tmp_path / "transcripts").iterdir() if p.is_dir()]
    assert any(p.startswith("day=") for p in parts)

    snap = table_io.snapshot_id(spark, loc)
    # mtime churn (touch every file) must NOT change the snapshot id
    later = time.time() + 1000
    for root, _dirs, files in os.walk(loc):
        for name in files:
            os.utime(os.path.join(root, name), (later, later))
    assert table_io.snapshot_id(spark, loc) == snap

    back = table_io.read_table(spark, loc)
    ckpt = CheckpointTable(spark, str(tmp_path / "lineage"))
    executed = resumable_backfill(
        spark,
        ["u0"],
        lambda u: back.drop("day", "bucket"),
        str(tmp_path / "out"),
        ckpt,
        "run1",
        ["text"],
        "ts",
        snapshot_id=snap,
    )
    assert executed == ["u0"]
    rec = ckpt.read().collect()[0]
    assert rec["snapshot_id"] == snap
    assert rec["row_count"] == tdf.count()

    # appending data changes the snapshot id
    table_io.write_table(laid.limit(1), loc, mode="append", partition_by=["day", "bucket"])
    assert table_io.snapshot_id(spark, loc) != snap


def test_table_io_auto_mode_bare_name_falls_back_to_parquet(spark):
    """A bare catalog-style name that exists as a directory reads back as
    Parquet in auto mode (symmetric with write_table's fallback)."""
    import shutil
    import uuid

    from deep_ner_spark.sources import table_io

    name = f"tmp_tbl_{uuid.uuid4().hex[:8]}"  # JVM + Python cwd == repo root
    df = spark.createDataFrame([(1, "a")], ["x", "y"])
    try:
        table_io.write_table(df, name, mode="overwrite")
        assert table_io.read_table(spark, name).count() == 1
    finally:
        shutil.rmtree(name, ignore_errors=True)

"""Regression tests for the round-3 ADVICE findings.

1. streaming/sketches.py state persistence is crash-atomic: generations
   are immutable, the manifest pointer advances only after a complete
   write, and an interrupted write leaves the previous state readable.
2. sources/versioned.py vacuum never drops the CURRENT version.
3. queries/quality_audit.py Gini terms multiply in decimal, not int64.
4. queries/gapfill.py restores spark.sql.cteRecursionLevelLimit.
5. operators/multimodal.py dhash rejects malformed PPM loudly (not via
   a strippable assert).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from event_data_etl_gcs_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_state_commit_survives_interrupted_next_write(spark, tmp_path):
    """A generation fully written but not pointer-advanced (the crash
    window) is invisible; readers keep seeing the last committed gen."""
    from event_data_etl_gcs_spark.streaming.sketches import (
        STATE_MANIFEST,
        commit_state,
        read_state,
    )

    state_dir = str(tmp_path / "state")
    df1 = spark.range(5).select(F.col("id").alias("v"))
    assert commit_state(df1, state_dir) == 1
    assert read_state(spark, state_dir).count() == 5

    # simulate a crash AFTER the gen=2 data write but BEFORE the pointer
    # advance: write the directory by hand, do not touch the manifest
    df2 = spark.range(9).select(F.col("id").alias("v"))
    df2.write.parquet(os.path.join(state_dir, "gen=2"))
    assert read_state(spark, state_dir).count() == 5  # old state intact

    # the recovery path (ADVICE r5): a checkpoint-replayed rerun of the
    # same batch recomputes gen=2; the orphaned uncommitted directory is
    # proven garbage by the manifest pointer and is cleared, so the retry
    # COMMITS instead of wedging the stream on errorifexists forever
    assert commit_state(df2, state_dir) == 2
    assert read_state(spark, state_dir).count() == 9


def test_state_generations_prune_but_keep_fallback(spark, tmp_path):
    from event_data_etl_gcs_spark.streaming.sketches import (
        commit_state,
        read_state,
    )

    state_dir = str(tmp_path / "state")
    for n in (3, 6, 9):
        commit_state(spark.range(n).select(F.col("id").alias("v")), state_dir)
    assert read_state(spark, state_dir).count() == 9
    # current (gen=3) + previous (gen=2) retained, gen=1 pruned
    assert not os.path.exists(os.path.join(state_dir, "gen=1"))
    assert os.path.exists(os.path.join(state_dir, "gen=2"))
    assert os.path.exists(os.path.join(state_dir, "gen=3"))


def test_kmv_state_never_torn_mid_stream(spark, tmp_path):
    """After every micro-batch there is a complete committed generation:
    the manifest always points at a directory with a _SUCCESS marker."""
    from event_data_etl_gcs_spark.streaming.sketches import (
        STATE_MANIFEST,
        run_streaming_kmv_maintenance,
    )

    ev = load_table(spark, SF, "events")
    src = str(tmp_path / "src")
    ev.limit(2000).repartition(3).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "state")
    run_streaming_kmv_maintenance(spark, stream, state)
    with open(os.path.join(state, STATE_MANIFEST)) as f:
        gen = json.load(f)["current"]
    assert gen >= 3  # one generation per micro-batch
    assert os.path.exists(os.path.join(state, f"gen={gen}", "_SUCCESS"))


def test_vacuum_never_drops_current_version(spark, tmp_path):
    from event_data_etl_gcs_spark.sources.versioned import (
        read_snapshot,
        vacuum_versions,
        write_snapshot,
    )

    tdir = str(tmp_path / "tbl")
    for n in (2, 4, 6):
        write_snapshot(spark.range(n).select(F.col("id").alias("v")), tdir)
    dropped = vacuum_versions(tdir, keep_last=0)
    assert 3 not in dropped  # current version survives keep_last=0
    assert read_snapshot(spark, tdir).count() == 6


def test_gini_term_exact_beyond_int64(spark):
    """(2i - nk - 1) * c at 100 TB ranks/counts: the decimal form must
    equal the exact python integer where a raw int64 product wraps."""
    from event_data_etl_gcs_spark.queries.quality_audit import (
        gini_term_decimal,
    )

    i, nk, c = 5_000_000_000, 5_000_000_000, 5_000_000_000
    exact = (2 * i - nk - 1) * c
    assert exact > 2**63  # the scenario the fix targets
    df = spark.createDataFrame(
        [(i, nk, c)], "i long, nk long, c long"
    )
    got = df.select(
        F.sum(gini_term_decimal()).alias("s")
    ).collect()[0]["s"]
    assert int(got) == exact


def test_recursion_limit_restored_after_date_spine(spark):
    from event_data_etl_gcs_spark.queries.gapfill import (
        sql_recursive_date_spine,
    )

    before = spark.conf.get("spark.sql.cteRecursionLevelLimit")
    out = sql_recursive_date_spine(spark, SF)
    assert spark.conf.get("spark.sql.cteRecursionLevelLimit") == before
    rows = out.collect()  # still executable after the restore
    assert len(rows) >= 28 and all(r["n_events"] >= 0 for r in rows)


def test_dhash_rejects_malformed_ppm(spark):
    from event_data_etl_gcs_spark.operators.multimodal import dhash_images

    bad_magic = b"P5\n4 4\n255\n" + bytes(48)
    truncated = b"P6\n4 4\n255\n" + bytes(10)  # expects 48 raster bytes
    for payload in (bad_magic, truncated):
        media = spark.createDataFrame(
            [(1, bytearray(payload))], "media_id long, payload binary"
        )
        with pytest.raises(Exception, match="PPM"):
            dhash_images(media).collect()

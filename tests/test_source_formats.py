"""Interchange-format connectors: CSV / ORC / text / JSONL round-trips.

Fidelity contract: write a real testdata table out in the format, read it
back with the engine's reader, and require the round-tripped frame to be
row-identical (exceptAll empty both ways) — not just count-equal."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from event_data_etl_gcs_spark.sources.catalog import load_table
from event_data_etl_gcs_spark.sources.formats import (
    read_csv,
    read_orc,
    read_text_lines,
    write_csv,
    write_orc,
)

SF = "/root/testdata/sf0.001"


def assert_same_rows(a, b):
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_csv_round_trip_events(spark, tmp_path):
    """CSV round-trips the events table exactly, including microsecond
    timestamps (ISO-8601 format pinned in the connector) and the quoted
    free-text props column."""
    ev = load_table(spark, SF, "events")
    path = str(tmp_path / "events_csv")
    write_csv(ev, path, compression=None)
    back = read_csv(spark, path, ev.schema)
    assert back.schema == ev.schema
    assert_same_rows(back, ev)


def test_csv_gzip_and_failfast(spark, tmp_path):
    nation = load_table(spark, SF, "nation")
    path = str(tmp_path / "nation_csv")
    write_csv(nation, path, compression="gzip")
    back = read_csv(spark, path, nation.schema)
    assert_same_rows(back, nation)
    # FAILFAST: a schema that can't parse the data errors instead of
    # silently nulling
    bad_schema = "n_nationkey TIMESTAMP, n_name BIGINT, n_regionkey BIGINT, n_comment STRING"
    from pyspark.sql.types import StructType

    with pytest.raises(Exception):
        # collect(), not count(): count() prunes every column so the
        # malformed cells are never parsed at all
        read_csv(spark, path, StructType.fromDDL(bad_schema)).collect()


def test_orc_round_trip_partitioned(spark, tmp_path):
    """ORC round-trips lineitem exactly, including decimals, and supports
    hive-partitioned layout + predicate pushdown to the scan."""
    li = load_table(spark, SF, "lineitem")
    path = str(tmp_path / "li_orc")
    write_orc(li, path, partition_by=["l_returnflag"])
    back = read_orc(spark, path).select(*li.columns)  # partition col moves last
    assert_same_rows(back, li)
    plan = (
        read_orc(spark, path)
        .filter(F.col("l_returnflag") == "R")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # partition pruning: the R-only scan reads one partition directory
    assert "l_returnflag" in plan


def test_text_lines_reader(spark, tmp_path):
    docs = load_table(spark, SF, "documents").select("text")
    path = str(tmp_path / "docs_txt")
    docs.write.mode("overwrite").text(path)
    back = read_text_lines(spark, path)
    assert back.columns == ["value"]
    assert back.count() == docs.count()
    assert_same_rows(back.withColumnRenamed("value", "text"), docs)


def test_jsonl_round_trip(spark, tmp_path):
    """JSONL export (the training-tooling interchange) reads back exactly
    under the declared schema."""
    from event_data_etl_gcs_spark.sources.parquet_sink import export_jsonl

    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "docs_jsonl")
    export_jsonl(docs, path, compression=None)
    back = spark.read.schema(docs.schema).json(path)
    assert_same_rows(back, docs)


def test_rechunk_gzip_jsonl(spark, tmp_path):
    """Gzipped JSONL lands as splittable parquet with identical rows and
    real parallelism (>1 output partition from 1 unsplittable input)."""
    import glob
    import gzip
    import json

    from event_data_etl_gcs_spark.sources.formats import rechunk_gzip_jsonl

    docs = load_table(spark, SF, "documents")
    rows = [r.asDict() for r in docs.collect()]
    gz = tmp_path / "corpus.jsonl.gz"
    with gzip.open(gz, "wt") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    out = str(tmp_path / "rechunked")
    n = rechunk_gzip_jsonl(spark, str(gz), out, docs.schema, target_partitions=8)
    assert n == len(rows)
    back = spark.read.parquet(out).select(*docs.columns)
    assert_same_rows(back, docs)
    # the landed layout is actually parallel: multiple parquet files
    assert len(glob.glob(f"{out}/*.parquet")) == 8


def test_binary_file_ingest_feeds_media_contract(spark, tmp_path):
    """Files on disk -> binaryFile source -> media contract -> the same
    PPM decoder the column-backed path uses; length pushdown skips
    oversized blobs at listing time."""
    import os

    from event_data_etl_gcs_spark.operators.multimodal import decode_ppm
    from event_data_etl_gcs_spark.sources.formats import (
        media_from_binary_files,
        read_binary_files,
    )

    d = str(tmp_path / "imgs")
    os.makedirs(d)
    # two tiny valid P6 PPMs + one oversized blob
    for name, w, h, fill in [("a.ppm", 2, 2, 10), ("b.ppm", 3, 1, 200)]:
        body = bytes([fill]) * (w * h * 3)
        with open(os.path.join(d, name), "wb") as f:
            f.write(b"P6\n%d %d\n255\n" % (w, h) + body)
    with open(os.path.join(d, "huge.bin"), "wb") as f:
        f.write(b"\x00" * 4096)

    files = read_binary_files(spark, d, max_bytes=1024)
    assert files.count() == 2  # huge.bin skipped by the length predicate

    media = media_from_binary_files(spark, d, mime="image/x-ppm", max_bytes=1024)
    rows = media.collect()
    assert len(rows) == 2
    assert len({r["media_id"] for r in rows}) == 2  # stable distinct ids
    assert all(r["meta"]["path"].startswith("file:") for r in rows)

    decoded = {
        (r["width"], r["height"]): r["mean_pixel"]
        for r in decode_ppm(media).collect()
    }
    assert decoded == {(2, 2): 10.0, (3, 1): 200.0}

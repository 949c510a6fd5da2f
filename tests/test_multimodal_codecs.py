"""decode_real contract: same DECODED_SCHEMA whichever codec backend is
present. In this container (no pillow/soundfile) the fallback path runs;
with SPARK_GRAFT_REAL_CODECS=1 + pillow installed the PIL path runs —
both are exercised by whichever environment executes this suite."""

from __future__ import annotations

import pytest

from event_data_etl_gcs_spark.operators.multimodal import (
    DECODED_SCHEMA,
    _real_codecs_available,
    decode_real,
    decode_stub,
    documents_as_media,
    real_codecs_enabled,
)
from event_data_etl_gcs_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return documents_as_media(load_table(spark, SF, "documents")).limit(50)


def test_decode_real_schema_stable(spark, media):
    out = decode_real(media)
    assert out.schema == DECODED_SCHEMA
    rows = out.collect()
    assert len(rows) == 50
    assert all(r["sha256"] is not None and r["n_bytes"] > 0 for r in rows)


def test_decode_real_matches_stub_when_no_codecs(spark, media):
    """Without real codecs the dispatch must be exactly decode_stub."""
    if real_codecs_enabled() and _real_codecs_available()["image"]:
        pytest.skip("real codecs active in this environment")
    got = {r["media_id"]: r["features"] for r in decode_real(media).collect()}
    want = {r["media_id"]: r["features"] for r in decode_stub(media).collect()}
    assert got == want


def test_decode_real_strict_raises_without_codecs(spark, media):
    if real_codecs_enabled() and _real_codecs_available()["image"]:
        pytest.skip("real codecs active in this environment")
    with pytest.raises(NotImplementedError):
        decode_real(media, strict=True)


def test_dhash_deterministic_and_perturbation_tolerant(spark):
    from pyspark.sql import functions as F

    from event_data_etl_gcs_spark.operators.multimodal import (
        dhash_dedup_groups,
        dhash_images,
        synthesize_ppm_images,
    )
    from event_data_etl_gcs_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(100)
    media = synthesize_ppm_images(docs)
    a = {r["media_id"]: r["dhash"] for r in dhash_images(media).collect()}
    b = {
        r["media_id"]: r["dhash"]
        for r in dhash_images(media.repartition(7)).collect()
    }
    assert a == b and len(a) == 100  # partitioning-invariant

    # identical payloads -> identical hashes -> grouped
    dup = media.union(media.limit(5).withColumn(
        "media_id", F.col("media_id") + 1_000_000
    ))
    groups = dhash_dedup_groups(dup).collect()
    grouped_ids = {r["media_id"] for r in groups}
    for r in groups:
        assert r["n_images"] >= 2
    # the 5 duplicated payload pairs must be grouped together
    assert {1_000_000 + i for i in range(5)} & grouped_ids

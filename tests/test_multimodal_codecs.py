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

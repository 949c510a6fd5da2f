"""Multimodal-column queries: binary payload plumbing over the documents
table (real codecs stubbed — see operators.multimodal)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import decode_stub, documents_as_media
from ..sources.catalog import load_table
from .registry import query


@query(
    "multimodal_meta",
    oracle=(
        "SELECT doc_id AS media_id, "
        "CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, "
        "sha256(text) AS payload_sha256 "
        "FROM documents"
    ),
    doc=(
        "Binary-column metadata path: utf-8 payload size + content hash "
        "computed JVM-side on a binary column."
    ),
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = documents_as_media(docs)
    return media.select(
        "media_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("payload_sha256"),
    )


@query(
    "multimodal_decode",
    oracle=None,  # mapInPandas stage — not SQL-expressible; rows-only check
    doc=(
        "Arrow-batched mapInPandas decode/feature-extract over the media "
        "contract (stub codec): media_id, mime, n_bytes, sha256, "
        "fixed-dim feature vector."
    ),
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = documents_as_media(docs)
    return decode_stub(media)

"""Multimodal-column queries: binary payload plumbing over the documents
table (real codecs stubbed — see operators.multimodal)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    decode_ppm,
    decode_stub,
    documents_as_media,
    synthesize_ppm_images,
)
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


@query(
    "multimodal_image_stats",
    oracle="""
WITH base AS (
  SELECT doc_id,
         4 + doc_id % 5 AS width,
         3 + doc_id % 4 AS height,
         list_transform(range(1, length(text) + 1),
                        i -> CAST(ascii(substring(text, i, 1)) AS BIGINT)) AS bts
  FROM documents
), calc AS (
  SELECT doc_id AS media_id, width, height,
         width * height * 3 AS n_pixel_bytes,
         len(bts) AS src_len,
         list_sum(bts) AS src_sum,
         bts
  FROM base
)
SELECT media_id, width, height, n_pixel_bytes,
       CAST((n_pixel_bytes // src_len) * src_sum
            + COALESCE(list_sum(bts[1:(n_pixel_bytes % src_len)]), 0) AS DOUBLE)
       / n_pixel_bytes AS mean_pixel
FROM calc
""",
    doc=(
        "True binary-format plumbing: P6 PPM images synthesized from doc "
        "text, header-parsed and pixel-averaged via Arrow mapInPandas — "
        "the oracle recomputes the byte math relationally, so even this "
        "Python-decoded path is value-checked."
    ),
)
def multimodal_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return decode_ppm(synthesize_ppm_images(docs))


@query(
    "multimodal_audio_stats",
    oracle="""
WITH base AS (
  SELECT doc_id,
         length(text) + 4000 + (doc_id % 5) * 1000 AS n_samples,
         list_transform(range(1, length(text) + 1),
                        i -> (CAST(ascii(substring(text, i, 1)) AS BIGINT) - 128) * 256) AS s
  FROM documents
), cyc AS (
  SELECT doc_id AS media_id, n_samples, len(s) AS L, s,
         n_samples // len(s) AS full_cycles, n_samples % len(s) AS rem,
         list_sum(list_transform(s, v -> v * v)) AS cyc_energy,
         list_sum(list_transform(s, v -> abs(v))) AS cyc_abs
  FROM base
)
SELECT media_id,
       CAST(16000 AS BIGINT) AS sample_rate,
       CAST(n_samples AS BIGINT) AS n_samples,
       CAST(n_samples AS DOUBLE) / 16000 AS duration_s,
       CAST(list_max(list_transform(s, v -> abs(v))) AS BIGINT) AS peak,
       CAST(full_cycles * cyc_energy
            + COALESCE(list_sum(list_transform(s[1:rem], v -> v * v)), 0)
            AS BIGINT) AS energy,
       CAST(full_cycles * cyc_abs
            + COALESCE(list_sum(list_transform(s[1:rem], v -> abs(v))), 0)
            AS DOUBLE) / n_samples AS mean_abs
FROM cyc
""",
    doc=(
        "Audio binary plumbing, value-checked end to end: mono 16-bit PCM "
        "WAV payloads synthesized from doc text, RIFF header parsed and "
        "sample stats (peak / energy / mean_abs) computed from raw bytes "
        "via Arrow mapInPandas with integer math — the oracle recomputes "
        "the cycle arithmetic relationally, so even the Python-decoded "
        "audio path is hash-checked, like multimodal_image_stats."
    ),
)
def multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import decode_wav, synthesize_wav_audio

    docs = load_table(spark, sf_dir, "documents")
    return decode_wav(synthesize_wav_audio(docs))


@query(
    "multimodal_image_dhash_dedup",
    oracle=None,  # the 9x8 area-pooled bit pattern has no tractable SQL
    # form; determinism + duplicate grouping are pinned in
    # tests/test_multimodal_codecs.py.
    doc=(
        "Perceptual image dedup: 64-bit dHash per image (integer area "
        "pooling over raw PPM bytes, Arrow-batched mapInPandas, 8 bytes "
        "of state per image at 100 TB) grouped on hash equality — the "
        "image-side SimHash; Hamming-banded buckets compose for the "
        "near-dup tier."
    ),
)
def multimodal_image_dhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import dhash_dedup_groups, synthesize_ppm_images

    docs = load_table(spark, sf_dir, "documents")
    return dhash_dedup_groups(synthesize_ppm_images(docs))


@query(
    "multimodal_video_frame_stats",
    oracle=None,  # frame extraction over framed binary payloads has no
    # SQL form; tests/test_multimodal_video.py pins the sampler against
    # python byte arithmetic and the resize stage's shapes.
    doc=(
        "Video preprocessing plumbing: synthesize framed binary "
        "payloads, sample every 4th frame (mapInPandas flatMap shape — "
        "one output row per kept frame with a deterministic byte "
        "checksum), and aggregate per-video frame stats. Map-only "
        "until the final count; a real decoder (ffmpeg) slots into the "
        "per-frame loop unchanged."
    ),
)
def multimodal_video_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import frame_sample, synthesize_videos

    docs = load_table(spark, sf_dir, "documents")
    frames = frame_sample(synthesize_videos(docs))
    return frames.groupBy("media_id").agg(
        F.count("*").cast("long").alias("n_sampled_frames"),
        F.min("frame_sum").alias("min_frame_sum"),
        F.max("frame_sum").alias("max_frame_sum"),
        F.sum("frame_sum").cast("long").alias("total_bytes_sum"),
    )

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
    oracle="""
WITH base AS (
  SELECT doc_id AS media_id,
         octet_length(encode(text)) AS n,
         sha256(text) AS sha,
         list_transform(range(0, octet_length(encode(text))),
                        i -> CAST(concat('0x', substring(hex(encode(text)), 2*i+1, 2)) AS BIGINT)) AS bts
  FROM documents
)
SELECT media_id,
       'application/octet-stream' AS mime,
       CAST(n AS BIGINT) AS n_bytes,
       sha AS sha256,
       CASE WHEN n = 0 THEN '0,0,0,0,0,0,0,0'
       ELSE array_to_string([
         n % 997,
         bts[1],
         bts[-1],
         list_sum(bts[1:64]) % 9973,
         list_min(bts),
         list_max(bts),
         list_sum(list_transform(bts[1:128], b -> b % 2)),
         n % 31
       ], ',') END AS features_csv
FROM base
""",
    doc=(
        "Arrow-batched mapInPandas decode/feature-extract over the media "
        "contract (stub codec): media_id, mime, n_bytes, sha256, "
        "fixed-dim feature vector. The stub features are pure integer "
        "functions of the payload bytes, so the oracle recomputes them "
        "relationally from the utf-8 byte list (hex-pair extraction) — "
        "the Python decode path is value-checked, not just row-counted. "
        "The feature vector rides as an integer CSV (features_csv) "
        "because the driver canonicalizer hashes only atomic columns."
    ),
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = documents_as_media(docs)
    return decode_stub(media).select(
        "media_id",
        "mime",
        "n_bytes",
        "sha256",
        F.expr(
            "array_join(transform(features, x -> CAST(CAST(x AS BIGINT) AS STRING)), ',')"
        ).alias("features_csv"),
    )


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


def _duck_dhash_oracle() -> str:
    """DuckDB mirror of operators/multimodal.py dhash_images over the
    synthesized PPM corpus: the whole hash is integer math on cyclic
    text bytes (grayscale triples -> 9x8 integer area pool -> 64
    cross-multiplied comparisons), so it inlines as nested list lambdas.
    Bit 63 lands as the signed-int64 constant (the Python side stores
    bits-2^64 when bit 63 is set)."""
    # cell k (flat, 1-based k+1): r = k//9, c = k%9; block sums over
    # y in [r*h//8, min(max((r+1)*h//8, y0+1), h)) x [c*w//9, ...)
    y0 = "((k//9)*h//8)"
    y1 = f"least(greatest(((k//9)+1)*h//8, {y0}+1), h)"
    x0 = "((k%9)*w//9)"
    x1 = f"least(greatest(((k%9)+1)*w//9, {x0}+1), w)"
    cell = (
        "list_transform(range(0, 72), k -> struct_pack("
        f"tot := list_sum(flatten(list_transform(range({y0}, {y1}), y -> "
        f"list_transform(range({x0}, {x1}), x -> gray[y*w+x+1])))), "
        f"n := ({y1} - {y0}) * ({x1} - {x0})))"
    )
    bit_terms = []
    for k in range(64):
        r, c = k // 8, k % 8
        hi, lo = r * 9 + c + 2, r * 9 + c + 1  # (r, c+1) vs (r, c), 1-based
        val = -(1 << 63) if k == 63 else (1 << k)
        bit_terms.append(
            f"(CASE WHEN cells[{hi}].tot * cells[{lo}].n > "
            f"cells[{lo}].tot * cells[{hi}].n THEN CAST({val} AS BIGINT) "
            f"ELSE 0 END)"
        )
    dhash = " + ".join(bit_terms)
    return f"""
WITH base AS (
  SELECT doc_id AS media_id,
         4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,
         CASE WHEN octet_length(encode(text)) = 0 THEN [CAST(0 AS BIGINT)]
              ELSE list_transform(range(0, octet_length(encode(text))),
                   i -> CAST(concat('0x', substring(hex(encode(text)), 2*i+1, 2)) AS BIGINT)) END AS bts
  FROM documents
), g AS (
  SELECT media_id, w, h,
         list_transform(range(0, w*h), i ->
           bts[((3*i) % len(bts)) + 1] + bts[((3*i+1) % len(bts)) + 1]
           + bts[((3*i+2) % len(bts)) + 1]) AS gray
  FROM base
), cellsq AS (
  SELECT media_id, {cell} AS cells FROM g
), hashes AS (
  SELECT media_id, {dhash} AS dhash FROM cellsq
), grp AS (
  SELECT dhash, count(*) AS n_images, min(media_id) AS group_rep
  FROM hashes GROUP BY dhash HAVING count(*) > 1
)
SELECT hs.media_id, hs.dhash, grp.group_rep, CAST(grp.n_images AS BIGINT) AS n_images
FROM hashes hs JOIN grp USING (dhash)
"""


@query(
    "multimodal_image_dhash_dedup",
    oracle=_duck_dhash_oracle(),
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
    oracle="""
WITH base AS (
  SELECT doc_id AS media_id,
         CASE WHEN octet_length(encode(text)) = 0 THEN [CAST(0 AS BIGINT)]
              ELSE list_transform(range(0, octet_length(encode(text))),
                   i -> CAST(concat('0x', substring(hex(encode(text)), 2*i+1, 2)) AS BIGINT)) END AS bts
  FROM documents
), fr AS (
  SELECT media_id, len(bts) AS L, list_sum(bts) AS S, bts, f
  FROM base, unnest([0, 4, 8]) AS t(f)
), sums AS (
  SELECT media_id, f,
         (48 // L) * S +
         CASE WHEN (f % L) + (48 % L) <= L
              THEN COALESCE(list_sum(bts[(f % L) + 1 : (f % L) + (48 % L)]), 0)
              ELSE COALESCE(list_sum(bts[(f % L) + 1 : L]), 0)
                   + COALESCE(list_sum(bts[1 : (f % L) + (48 % L) - L]), 0)
         END AS frame_sum
  FROM fr
)
SELECT media_id, CAST(count(*) AS BIGINT) AS n_sampled_frames,
       CAST(min(frame_sum) AS BIGINT) AS min_frame_sum,
       CAST(max(frame_sum) AS BIGINT) AS max_frame_sum,
       CAST(sum(frame_sum) AS BIGINT) AS total_bytes_sum
FROM sums GROUP BY media_id
""",
    # Each synthesized frame is the text's byte cycle starting at offset
    # f mod L (FRAME_BYTES=48 bytes, frames 0/4/8 of 12 at every_k=4),
    # so a frame checksum decomposes into whole-cycle sums plus a cyclic
    # partial slice — the same relational byte math as the image/audio
    # stats oracles.
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

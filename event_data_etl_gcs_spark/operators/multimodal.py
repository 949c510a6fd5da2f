"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata (SURVEY.md Phase 4 north star).

Spark-side plumbing is real and tested: schema contract, Arrow-batched
``mapInPandas`` decode/feature-extract stage, partition-preserving shape.
The codec itself is STUBBED — image/audio libraries are not in this
container — behind ``decode_stub`` (deterministic fake features) and
``decode_real`` (raises NotImplementedError, the integration point for
PIL/librosa/ffmpeg).

Scale notes: binary payloads ride in parquet pages like any column;
``spark.sql.files.maxPartitionBytes`` bounds per-task memory; the decode
stage is map-only (no shuffle) and Arrow-batched, so at 100 TB it scales
with executor count. Metadata filters (mime/width/dur) are ordinary
columns — pushed down, so decode only runs on surviving rows.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# The engine's multimodal column contract: payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), False),
        StructField("meta", MapType(StringType(), StringType()), True),
    ]
)

FEATURE_DIM = 8

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("mime", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("sha256", StringType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter for tests/demos: wrap the documents table's text as fake
    binary payloads under the media contract."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.create_map(
            F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
        ).alias("meta"),
    )


def _stub_features(payload: bytes) -> list[float]:
    """Deterministic fake feature vector: byte-histogram moments.

    Stands in for a real image/audio embedder; replace with the actual
    codec in ``decode_real``.
    """
    if not payload:
        return [0.0] * FEATURE_DIM
    n = len(payload)
    return [
        float(n % 997),
        float(payload[0]),
        float(payload[-1]),
        float(sum(payload[:64]) % 9973),
        float(min(payload)),
        float(max(payload)),
        float(sum(b % 2 for b in payload[:128])),
        float(n % 31),
    ]


def decode_stub(media: DataFrame, batch_size: int = 1024) -> DataFrame:
    """Arrow-batched decode/feature-extract stage over the media contract.

    mapInPandas: each task receives an iterator of pandas batches — the
    per-batch shape (not per-row) is what makes this viable at scale.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": payloads.map(lambda p: len(p) if p is not None else None),
                    "sha256": payloads.map(
                        lambda p: hashlib.sha256(p).hexdigest() if p is not None else None
                    ),
                    "features": payloads.map(
                        lambda p: _stub_features(bytes(p)) if p is not None else None
                    ),
                }
            )

    return media.mapInPandas(process, schema=DECODED_SCHEMA)


# --- A real binary format: PPM images --------------------------------------
#
# The stub above fakes features; this path exercises TRUE binary parsing:
# deterministic P6 PPM images are synthesized from document text (header +
# pixel bytes cycled from the utf-8 text), and the decoder parses the
# header and computes pixel statistics from the raw bytes — the exact
# plumbing an image pipeline needs, minus only the external codec.

def synthesize_ppm_images(documents: DataFrame) -> DataFrame:
    """Deterministic fake camera: doc text -> P6 PPM binary payload.
    Dimensions derive from doc_id; pixels cycle the utf-8 text bytes."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                w = 4 + int(doc_id) % 5
                h = 3 + int(doc_id) % 4
                n = w * h * 3
                src = text.encode("utf-8") or b"\x00"
                body = (src * (n // len(src) + 1))[:n]
                payloads.append(b"P6\n%d %d\n255\n" % (w, h) + body)
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    return documents.select("doc_id", "text").mapInPandas(
        build, schema="media_id long, payload binary"
    )


def decode_ppm(media: DataFrame) -> DataFrame:
    """Parse the P6 header and compute pixel statistics from raw bytes —
    Arrow-batched, schema-stable, map-only."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "n_pixel_bytes": [], "mean_pixel": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                magic, dims, maxval, body = b.split(b"\n", 3)
                w, h = (int(x) for x in dims.split())
                assert magic == b"P6" and maxval == b"255"
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixel_bytes"].append(len(body))
                out["mean_pixel"].append(sum(body) / len(body) if body else 0.0)
            yield pd.DataFrame(out)

    return media.mapInPandas(
        parse,
        schema="media_id long, width long, height long, n_pixel_bytes long, mean_pixel double",
    )


# --- Video-shaped payloads: frame sampling + resize ------------------------
#
# A "video" here is a binary payload of N fixed-size frames (deterministic
# synthetic stand-in for a real container format). frame_sample keeps
# every k-th frame; resize_frames downsamples each frame by integer
# striding. Real codecs (ffmpeg) slot into the same mapInPandas shape.

FRAME_W, FRAME_H = 8, 6
FRAME_BYTES = FRAME_W * FRAME_H


def synthesize_videos(documents: DataFrame, n_frames: int = 12) -> DataFrame:
    """doc text -> fake video: n_frames frames of FRAME_BYTES, bytes
    cycled from the text with a per-frame offset."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                src = text.encode("utf-8") or b"\x00"
                frames = []
                for f in range(n_frames):
                    body = (src[f % len(src):] + src * (FRAME_BYTES // len(src) + 2))[
                        :FRAME_BYTES
                    ]
                    frames.append(body)
                payloads.append(b"".join(frames))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": payloads,
                    "n_frames": [n_frames] * len(payloads),
                }
            )

    return documents.select("doc_id", "text").mapInPandas(
        build, schema="media_id long, payload binary, n_frames int"
    )


def frame_sample(videos: DataFrame, every_k: int = 4) -> DataFrame:
    """Keep every k-th frame; output one row per sampled frame with a
    deterministic frame checksum (sum of bytes) — the row-generating
    (flatMap) shape of video preprocessing."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_sum": []}
            for mid, payload, n in zip(pdf["media_id"], pdf["payload"], pdf["n_frames"]):
                b = bytes(payload)
                for f in range(0, int(n), every_k):
                    frame = b[f * FRAME_BYTES:(f + 1) * FRAME_BYTES]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(f)
                    out["frame_sum"].append(sum(frame))
            yield pd.DataFrame(out)

    return videos.mapInPandas(
        sample, schema="media_id long, frame_idx int, frame_sum long"
    )


def resize_frames(videos: DataFrame, stride: int = 2) -> DataFrame:
    """Integer-stride downsample of each frame (every stride-th pixel per
    axis) — the resize stage's plumbing; a real resampler (PIL) slots in
    per-frame unchanged."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "small": []}
            for mid, payload, n in zip(pdf["media_id"], pdf["payload"], pdf["n_frames"]):
                b = bytes(payload)
                for f in range(int(n)):
                    frame = b[f * FRAME_BYTES:(f + 1) * FRAME_BYTES]
                    small = bytes(
                        frame[y * FRAME_W + x]
                        for y in range(0, FRAME_H, stride)
                        for x in range(0, FRAME_W, stride)
                    )
                    out["media_id"].append(mid)
                    out["frame_idx"].append(f)
                    out["small"].append(small)
            yield pd.DataFrame(out)

    return videos.mapInPandas(
        resize, schema="media_id long, frame_idx int, small binary"
    )


# --- Audio-shaped payloads: real WAV/PCM byte format -----------------------
#
# Like the PPM path, this exercises TRUE binary plumbing for audio: a
# canonical 44-byte RIFF/WAVE PCM header + 16-bit little-endian mono
# samples synthesized deterministically from document text. The decoder
# parses the header fields and computes sample statistics with integer
# math (so the stats are oracle-recomputable relationally). torchaudio /
# ffmpeg slot into the same mapInPandas shape for real codecs.

AUDIO_SAMPLE_RATE = 16_000


def _wav_header(data_len: int, sample_rate: int = AUDIO_SAMPLE_RATE) -> bytes:
    import struct

    return (
        b"RIFF"
        + struct.pack("<I", 36 + data_len)
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", data_len)
    )


def synthesize_wav_audio(documents: DataFrame) -> DataFrame:
    """Deterministic fake microphone: doc text -> mono 16-bit PCM WAV.
    ``n_samples = length(text) + 4000 + (doc_id % 5) * 1000`` (always >=
    one full text cycle); sample i = (byte[i % len] - 128) * 256."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                src = np.frombuffer(text.encode("utf-8") or b"\x00", dtype=np.uint8)
                n = len(text) + 4000 + int(doc_id) % 5 * 1000
                reps = np.tile(src, n // len(src) + 1)[:n].astype(np.int32)
                samples = ((reps - 128) * 256).astype("<i2").tobytes()
                payloads.append(_wav_header(len(samples)) + samples)
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    return documents.select("doc_id", "text").mapInPandas(
        build, schema="media_id long, payload binary"
    )


def decode_wav(media: DataFrame) -> DataFrame:
    """Parse the RIFF/WAVE header and compute sample statistics from the
    raw PCM bytes — Arrow-batched, map-only. peak/energy are exact
    integer math (int64 sums), duration/mean_abs exact double divisions,
    so every output value has a relational oracle."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        for pdf in batches:
            out = {
                "media_id": [], "sample_rate": [], "n_samples": [],
                "duration_s": [], "peak": [], "energy": [], "mean_abs": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                assert b[:4] == b"RIFF" and b[8:16] == b"WAVEfmt "
                _, fmt, ch, rate, _, _, bits = struct.unpack("<IHHIIHH", b[16:36])
                assert fmt == 1 and ch == 1 and bits == 16 and b[36:40] == b"data"
                (data_len,) = struct.unpack("<I", b[40:44])
                s = np.frombuffer(b[44:44 + data_len], dtype="<i2").astype(np.int64)
                out["media_id"].append(mid)
                out["sample_rate"].append(rate)
                out["n_samples"].append(len(s))
                out["duration_s"].append(len(s) / rate)
                out["peak"].append(int(np.abs(s).max()) if len(s) else 0)
                out["energy"].append(int((s * s).sum()))
                out["mean_abs"].append(
                    int(np.abs(s).sum()) / len(s) if len(s) else 0.0
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(
        parse,
        schema=(
            "media_id long, sample_rate long, n_samples long, "
            "duration_s double, peak long, energy long, mean_abs double"
        ),
    )


def resample_audio(audio: DataFrame, factor: int = 4) -> DataFrame:
    """Decimate by an integer factor (every factor-th sample, no filter —
    a real polyphase resampler slots in per-payload unchanged). Returns
    re-headered WAV payloads at the reduced sample rate."""

    def resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        for pdf in batches:
            payloads, mids = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                (rate,) = struct.unpack("<I", b[24:28])
                (data_len,) = struct.unpack("<I", b[40:44])
                s = np.frombuffer(b[44:44 + data_len], dtype="<i2")[::factor]
                body = s.tobytes()
                payloads.append(_wav_header(len(body), rate // factor) + body)
                mids.append(mid)
            yield pd.DataFrame({"media_id": mids, "payload": payloads})

    return audio.mapInPandas(resample, schema="media_id long, payload binary")


def _real_codecs_available() -> dict[str, bool]:
    """Driver-side availability probe for optional real codec libraries.

    Checked on the DRIVER so the plan (and output schema) is decided
    before any task launches; executors in a well-formed cluster share the
    driver's Python environment, so the probe result holds there too.

    ``image`` has two backends: pillow when importable, else the vendored
    pure-Python PPM/PNG decoder (``_vendor/pycodec`` — stdlib-only, so it
    is importable wherever this package is; ``image_backend`` records
    which one won). Real-codec mode is therefore always AVAILABLE for
    images; it stays opt-in via SPARK_GRAFT_REAL_CODECS.
    """
    avail: dict[str, bool] = {}
    try:
        __import__("PIL.Image")
        avail["image"], avail["image_backend"] = True, "pil"
    except Exception:
        try:
            __import__("event_data_etl_gcs_spark._vendor.pycodec")
            avail["image"], avail["image_backend"] = True, "pycodec"
        except Exception:
            avail["image"], avail["image_backend"] = False, None
    try:
        __import__("soundfile")
        avail["audio"] = True
    except Exception:
        avail["audio"] = False
    return avail


def real_codecs_enabled() -> bool:
    """Real codecs are opt-in via SPARK_GRAFT_REAL_CODECS=1 (the container
    default ships no image/audio libraries)."""
    import os

    return os.environ.get("SPARK_GRAFT_REAL_CODECS", "").strip() in ("1", "true")


def decode_real(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode/feature-extract with REAL codecs when available, else the
    deterministic stub — same DECODED_SCHEMA either way, so downstream
    plans are identical and swapping the codec never replans the job.

    Dispatch: opt-in via ``SPARK_GRAFT_REAL_CODECS=1`` → real image
    decode (width/height/channel means as the feature head, stub moments
    for the rest), backed by pillow when importable, else the vendored
    pure-Python PPM/PNG decoder (``_vendor/pycodec``: actual zlib
    inflate + scanline unfiltering — real pixels, not fakes, and always
    importable since it is stdlib-only). With the env flag unset, falls
    back to ``decode_stub`` — or raises if ``strict=True`` (for callers
    that must not silently ship fake features, e.g. a production embed
    stage).

    The Spark-side shape is the integration contract: Arrow-batched
    ``mapInPandas``, map-only, schema-stable. Wiring in torchaudio/ffmpeg
    later means editing only the per-batch Python body below.
    """
    use_real = real_codecs_enabled() and _real_codecs_available()["image"]
    if not use_real:
        if strict:
            raise NotImplementedError(
                "real media codecs not enabled (set SPARK_GRAFT_REAL_CODECS=1; "
                "pillow is used when importable, else the vendored pure-"
                "Python PPM/PNG decoder); decode_stub is the plumbing-"
                "equivalent fallback"
            )
        return decode_stub(media)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        try:
            from PIL import Image

            def _open_rgb(b: bytes):
                img = Image.open(io.BytesIO(b)).convert("RGB")
                w, h = img.size
                return w, h, list(img.getdata())

        except Exception:
            from event_data_etl_gcs_spark._vendor.pycodec import open_image

            def _open_rgb(b: bytes):
                return open_image(b)

        for pdf in batches:
            rows = {k: [] for k in ("media_id", "mime", "n_bytes", "sha256", "features")}
            for mid, mime, payload in zip(pdf["media_id"], pdf["mime"], pdf["payload"]):
                rows["media_id"].append(mid)
                rows["mime"].append(mime)
                if payload is None:
                    rows["n_bytes"].append(None)
                    rows["sha256"].append(None)
                    rows["features"].append(None)
                    continue
                b = bytes(payload)
                rows["n_bytes"].append(len(b))
                rows["sha256"].append(hashlib.sha256(b).hexdigest())
                try:
                    w, h, px = _open_rgb(b)
                    n = max(len(px), 1)
                    means = [sum(p[c] for p in px) / n for c in range(3)]
                    rows["features"].append(
                        [float(w), float(h), *map(float, means), 0.0, 0.0, 0.0]
                    )
                except Exception:
                    # Not an image this codec reads: stub features keep the
                    # row (quarantine-by-filter is the caller's policy).
                    rows["features"].append(_stub_features(b))
            yield pd.DataFrame(rows)

    return media.mapInPandas(process, schema=DECODED_SCHEMA)


# --- Perceptual image hashing (dHash) for image near-dedup ------------------
#
# The image-side analogue of text SimHash: a 64-bit difference hash over a
# 9x8 grayscale downsample — byte-identical re-encodes AND small pixel
# perturbations map to nearby hashes, so image near-dups group by hash (or
# by Hamming-banded buckets, exactly like operators/dedup.py simhash). Pure
# integer arithmetic over the raw PPM bytes: deterministic, library-free.

def dhash_images(media: DataFrame) -> DataFrame:
    """(media_id, dhash) — 64-bit perceptual difference hash per image.

    Arrow-batched mapInPandas (map-only, pipelines with the scan): parse
    the P6 header, average-pool RGB to a 9x8 grayscale grid using exact
    integer sums (area interpolation: each target cell averages its
    source-pixel block), then emit bit (r, c) = 1 iff cell[r][c+1] >
    cell[r][c]. At 100 TB the hash is 8 bytes per image; grouping or
    Hamming-banding the hashes is ordinary relational work downstream.
    """

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                magic, dims, maxval, body = b.split(b"\n", 3)
                # explicit raise, not assert: under python -O an assert
                # is stripped and a malformed payload would be indexed
                # arbitrarily, yielding a WRONG hash (silent mis-group)
                if magic != b"P6" or maxval != b"255":
                    raise ValueError(
                        f"media_id={mid}: unsupported PPM payload "
                        f"(magic={magic!r}, maxval={maxval!r})"
                    )
                w, h = (int(x) for x in dims.split())
                if len(body) != 3 * w * h:
                    raise ValueError(
                        f"media_id={mid}: truncated PPM raster "
                        f"({len(body)} bytes, expected {3 * w * h})"
                    )
                # integer grayscale per source pixel: (r + g + b)
                gray = [
                    sum(body[3 * i : 3 * i + 3]) for i in range(w * h)
                ]
                # 9x8 average pool with exact integer block sums
                cells = []
                for r in range(8):
                    row = []
                    y0, y1 = r * h // 8, max((r + 1) * h // 8, r * h // 8 + 1)
                    for c in range(9):
                        x0, x1 = c * w // 9, max((c + 1) * w // 9, c * w // 9 + 1)
                        tot = n = 0
                        for y in range(y0, min(y1, h)):
                            for x in range(x0, min(x1, w)):
                                tot += gray[y * w + x]
                                n += 1
                        row.append((tot, max(n, 1)))
                    cells.append(row)
                bits = 0
                k = 0
                for r in range(8):
                    for c in range(8):
                        t1, n1 = cells[r][c + 1]
                        t0, n0 = cells[r][c]
                        # compare averages without division: t1/n1 > t0/n0
                        if t1 * n0 > t0 * n1:
                            bits |= 1 << k
                        k += 1
                ids.append(mid)
                # store as signed int64 (Spark LongType)
                hashes.append(bits - (1 << 64) if bits >= (1 << 63) else bits)
            yield pd.DataFrame({"media_id": ids, "dhash": hashes})

    return media.mapInPandas(hash_batch, schema="media_id long, dhash long")


def dhash_dedup_groups(media: DataFrame) -> DataFrame:
    """Image dedup groups: identical dHash -> one group (group rep = min
    media id; singletons excluded). One hash groupBy — the exact-dedup
    tier; Hamming-banded near-dup buckets compose with
    operators/dedup.py's simhash banding if needed."""
    hashed = dhash_images(media)
    groups = (
        hashed.groupBy("dhash")
        .agg(
            F.count("*").alias("n_images"),
            F.min("media_id").alias("group_rep"),
        )
        .filter(F.col("n_images") > 1)
    )
    return hashed.join(groups, "dhash").select(
        "media_id", "dhash", "group_rep", "n_images"
    )

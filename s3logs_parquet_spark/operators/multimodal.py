"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched Pandas operators over mapInPandas.

Design (the part that must be real at 100 TB):
- payloads are `binary` columns co-located with a metadata struct
  (modality, mime, width/height/sample_rate/n_frames/duration) so
  planning-level ops (filter by modality, size buckets, partition
  routing) never touch the bytes;
- heavy per-item work runs in `mapInPandas` — Arrow transfers the
  binary batches zero-copy to Python, batch size bounded by
  `spark.sql.execution.arrow.maxRecordsPerBatch` so executor memory is
  payload-bounded, and the operator is a map-only stage (no shuffle);
- the decode kernel is pluggable: `decoder="fake"` is a deterministic
  stand-in (seeded by payload bytes) keeping every schema/partition/
  batch-shape aspect real; `decoder="bmp"` is a REAL image codec —
  uncompressed 24-bit BMP parsed with pure stdlib `struct`/numpy
  (encode_bmp/_bmp_decode round-trip pixel-exact, tested on real
  payloads); `audio_features` decodes REAL 16-bit PCM WAV via the
  stdlib `wave` module (encode_wav/_wav_decode round-trip
  sample-exact); `decoder="real"` attempts a Pillow import at runtime
  (per executor) for compressed formats (JPEG/PNG), raising
  NotImplementedError with guidance when the optional dependency is
  absent (as in this container — compressed image and ffmpeg-class
  video codecs are the only remaining external-dep points).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Typed metadata carried beside every payload column.
MEDIA_META_SCHEMA = StructType(
    [
        StructField("modality", StringType(), False),  # image|audio|video|text
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)


def media_table_schema(id_field: str = "media_id") -> StructType:
    return StructType(
        [
            StructField(id_field, LongType(), False),
            StructField("payload", BinaryType(), True),
            StructField("meta", MEDIA_META_SCHEMA, False),
        ]
    )


def attach_fake_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a media table from a text corpus: payload = UTF-8 bytes,
    metadata derived deterministically — the fixture path for pipelines
    whose real payloads live in object storage."""
    payload = F.encode(F.col(text_col), "UTF-8")
    n = F.octet_length(payload)
    meta = F.struct(
        F.when(F.col(id_col) % 3 == 0, F.lit("image"))
        .when(F.col(id_col) % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
        (F.pmod(n, F.lit(640)) + 32).cast("int").alias("width"),
        (F.pmod(n, F.lit(480)) + 32).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.pmod(n, F.lit(240)) + 1).cast("int").alias("n_frames"),
        (n * 10).cast("long").alias("duration_ms"),
    )
    return df.select(F.col(id_col).alias("media_id"), payload.alias("payload"), meta.alias("meta"))


# ---------------------------------------------------------------------------
# Decode kernels
# ---------------------------------------------------------------------------


def _fake_pixels(payload: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic pseudo-decode: pixels from a byte-seeded PRNG.
    Keeps shapes/dtypes identical to a real decoder."""
    seed = int.from_bytes(hashlib.md5(payload or b"").digest()[:4], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def encode_bmp(px: np.ndarray) -> bytes:
    """Encode an H×W×3 uint8 RGB array as an uncompressed 24-bit BMP
    (BITMAPINFOHEADER, bottom-up, BGR, rows padded to 4 bytes) — pure
    stdlib. The writer half of the real-codec round-trip."""
    import struct

    h, w = int(px.shape[0]), int(px.shape[1])
    row = w * 3
    pad = (4 - row % 4) % 4
    img_size = (row + pad) * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    body = b"".join(
        px[y][:, ::-1].tobytes() + b"\x00" * pad for y in range(h - 1, -1, -1)
    )
    return header + info + body


def _bmp_decode(payload: bytes) -> np.ndarray:
    """REAL image decode, no external deps: parse an uncompressed
    24-bit BMP (the format a 100 TB ingest would carry for raw
    frames). Returns H×W×3 uint8 RGB. Raises ValueError with the
    actual constraint on anything else — corrupt rows go to the
    caller's side channel, they don't kill the job silently."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    (off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if hdr_size < 40 or bpp != 24 or comp != 0:
        raise ValueError(
            f"only uncompressed 24-bit BMP supported (got header={hdr_size}, "
            f"bpp={bpp}, compression={comp}); use decoder='real' (Pillow) "
            f"for compressed formats"
        )
    bottom_up = h > 0
    h = abs(h)
    row = w * 3
    stride = (row + 3) // 4 * 4
    if off + stride * h > len(payload):
        raise ValueError("truncated BMP payload")
    px = (
        np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=off)
        .reshape(h, stride)[:, :row]
        .reshape(h, w, 3)
    )
    if bottom_up:
        px = px[::-1]
    return px[:, :, ::-1].copy()  # BGR → RGB


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode a mono int16 sample array as 16-bit PCM WAV via the
    stdlib ``wave`` module."""
    import io
    import wave as wave_mod

    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(int(sample_rate))
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def _wav_decode(payload: bytes) -> tuple[int, np.ndarray]:
    """REAL audio decode, no external deps: 16-bit PCM WAV via the
    stdlib ``wave`` module. Returns (sample_rate, mono int16 samples);
    multi-channel input is averaged down to mono."""
    import io
    import wave as wave_mod

    with wave_mod.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(
                f"only 16-bit PCM WAV supported (got sampwidth={w.getsampwidth()})"
            )
        sr = w.getframerate()
        ch = w.getnchannels()
        data = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    if ch > 1:
        data = data.reshape(-1, ch).mean(axis=1).astype(np.int16)
    return sr, data


def pil_available() -> bool:
    """True when Pillow is importable — the optional real-codec dep."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _real_decode(payload: bytes) -> np.ndarray:
    """Real image decode via Pillow when installed (attempted at
    runtime, per executor); raises NotImplementedError with guidance
    when the optional dependency is absent. Returns H×W×3 uint8,
    shape-compatible with the deterministic fake."""
    try:
        from PIL import Image
    except ImportError as exc:  # pragma: no cover - env without PIL
        raise NotImplementedError(
            "decoder='real' requires Pillow (PIL), not present in this "
            "environment; pass decoder='fake' for the deterministic stand-in "
            "(ffmpeg/soundfile equivalents for audio/video remain stubs)"
        ) from exc
    import io

    img = Image.open(io.BytesIO(payload)).convert("RGB")
    return np.asarray(img, dtype=np.uint8)


DECODE_OUT_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("height", IntegerType(), True),
        StructField("width", IntegerType(), True),
        StructField("mean_intensity", DoubleType(), True),
        StructField("feature", ArrayType(DoubleType()), True),
    ]
)


def decode_and_featurize(
    df: DataFrame, decoder: str = "fake", feature_dim: int = 16
) -> DataFrame:
    """Decode payloads and emit per-item features (mean intensity + a
    pooled feature vector). mapInPandas: one Arrow batch in, one out;
    no shuffle; Python memory bounded by batch size × payload size."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                h = int(meta["height"] or 32)
                w = int(meta["width"] or 32)
                if decoder == "fake":
                    px = _fake_pixels(bytes(payload or b""), h, w)
                elif decoder == "bmp":
                    px = _bmp_decode(bytes(payload or b""))
                    h, w = int(px.shape[0]), int(px.shape[1])  # trust the codec, not meta
                else:
                    px = _real_decode(bytes(payload or b""))
                    h, w = int(px.shape[0]), int(px.shape[1])  # trust the codec, not meta
                pooled = px.astype(np.float64).reshape(-1)[: feature_dim * 16]
                pad = feature_dim * 16 - pooled.size
                if pad > 0:
                    pooled = np.pad(pooled, (0, pad))
                feat = pooled.reshape(feature_dim, -1).mean(axis=1) / 255.0
                rows.append(
                    {
                        "media_id": int(mid),
                        "height": h,
                        "width": w,
                        "mean_intensity": float(px.mean()),
                        "feature": feat.tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in DECODE_OUT_SCHEMA.fields])

    return df.mapInPandas(run, DECODE_OUT_SCHEMA)


RESIZE_OUT_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("height", IntegerType(), True),
        StructField("width", IntegerType(), True),
    ]
)


def resize_images(df: DataFrame, target_h: int, target_w: int, decoder: str = "fake") -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode (raw RGB bytes).
    Demonstrates binary-out plumbing; a real codec would swap in at the
    two marked points."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                h = int(meta["height"] or 32)
                w = int(meta["width"] or 32)
                if decoder == "fake":
                    px = _fake_pixels(bytes(payload or b""), h, w)  # decode point
                elif decoder == "bmp":
                    px = _bmp_decode(bytes(payload or b""))
                    h, w = int(px.shape[0]), int(px.shape[1])
                else:
                    px = _real_decode(bytes(payload or b""))
                    h, w = int(px.shape[0]), int(px.shape[1])
                yi = (np.arange(target_h) * h // target_h).clip(0, h - 1)
                xi = (np.arange(target_w) * w // target_w).clip(0, w - 1)
                resized = px[yi][:, xi]
                rows.append(
                    {
                        "media_id": int(mid),
                        "payload": resized.tobytes(),  # encode point
                        "height": target_h,
                        "width": target_w,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZE_OUT_SCHEMA.fields])

    return df.mapInPandas(run, RESIZE_OUT_SCHEMA)


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_payload", BinaryType(), True),
    ]
)


def sample_frames(df: DataFrame, every_n: int = 30, decoder: str = "fake") -> DataFrame:
    """Video frame sampling: one output row per kept frame (explode-
    shaped mapInPandas). Frame count comes from metadata; payload per
    frame is the deterministic fake (or the real decoder's frames)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                n_frames = int(meta["n_frames"] or 1)
                for idx in range(0, n_frames, every_n):
                    if decoder == "fake":
                        frame = _fake_pixels(
                            bytes(payload or b"") + idx.to_bytes(4, "big"), 8, 8
                        )
                    else:
                        frame = _real_decode(bytes(payload or b""))
                    rows.append(
                        {"media_id": int(mid), "frame_idx": idx, "frame_payload": frame.tobytes()}
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SAMPLE_SCHEMA.fields])

    return df.mapInPandas(run, FRAME_SAMPLE_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_samples", LongType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("rms", DoubleType(), True),
        StructField("zero_crossings", LongType(), True),
    ]
)


def audio_features(df: DataFrame, decoder: str = "wav") -> DataFrame:
    """Audio feature extraction over REAL payload bytes: decode 16-bit
    PCM WAV (stdlib codec, _wav_decode) and emit per-item sample rate,
    length, duration, RMS energy, and zero-crossing count — the
    cheap-signal front of an audio curation pipeline (silence/clipping
    filters, duration buckets). mapInPandas, map-only, no shuffle;
    ``decoder="fake"`` derives the same features from the byte-seeded
    PRNG stand-in so pipelines are testable without audio payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                raw = bytes(payload or b"")
                if decoder == "wav":
                    sr, samples = _wav_decode(raw)
                elif decoder == "fake":
                    sr = int(meta["sample_rate"] or 16000)
                    seed = int.from_bytes(hashlib.md5(raw).digest()[:4], "big")
                    rng = np.random.default_rng(seed)
                    samples = rng.integers(-(2**15), 2**15, size=sr, dtype=np.int64).astype(
                        np.int16
                    )
                else:
                    raise ValueError(f"unknown audio decoder {decoder!r} (wav|fake)")
                x = samples.astype(np.float64)
                rms = float(np.sqrt(np.mean(x * x))) if x.size else 0.0
                zc = int(np.count_nonzero(np.diff(np.signbit(x)))) if x.size else 0
                rows.append(
                    {
                        "media_id": int(mid),
                        "sample_rate": int(sr),
                        "n_samples": int(samples.size),
                        "duration_ms": int(samples.size * 1000 // max(1, sr)),
                        "rms": rms,
                        "zero_crossings": zc,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields])

    return df.mapInPandas(run, AUDIO_FEATURES_SCHEMA)

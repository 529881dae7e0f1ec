"""Multimodal-column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via mapInPandas.

The general codec libraries (Pillow/torchaudio/ffmpeg) are not available in
this container, so decode is REAL only for the uncompressed containers a
pure numpy parser can handle — PPM (P6) and BMP (24-bit uncompressed) — and
stays an honest NotImplementedError for everything else. Everything
Spark-side is real and tested either way: schemas, Arrow batch iteration,
partition-preserving mapInPandas plumbing, and the metadata model.

Scale: mapInPandas streams Arrow batches; per-batch memory is bounded by
spark.sql.execution.arrow.maxRecordsPerBatch (set it to keep
batch_rows * max_blob_size under executor memory at 100 TB — e.g. 128 rows
for 10 MB images).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
        T.StructField("meta_duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        # real decoded dimensions (PPM/BMP parse); NULL when the payload is
        # not a container the pure-python decoder understands
        T.StructField("img_width", T.IntegerType(), True),
        T.StructField("img_height", T.IntegerType(), True),
    ]
)


# ------------------------------------------------------------ real decode
def decode_image_bytes(payload: bytes | None) -> tuple[int, int, np.ndarray] | None:
    """Pure-numpy decode of the two uncompressed containers we support:

      * PPM P6 (``P6\\n<w> <h>\\n<maxval>\\n`` + RGB bytes, maxval <= 255)
      * BMP, BITMAPINFOHEADER, 24 bpp, uncompressed (BI_RGB), bottom-up
        rows padded to 4 bytes (the standard header layout is public
        format documentation)

    Returns (width, height, HxWx3 uint8 array) or None when the payload is
    not one of these containers (caller decides whether that is an error).
    """
    if not payload:
        return None
    if payload[:2] == b"P6":
        try:
            # header: magic, whitespace-separated width/height/maxval, one
            # whitespace byte, then raw RGB
            parts: list[bytes] = []
            i = 2
            while len(parts) < 3 and i < len(payload):
                while i < len(payload) and payload[i : i + 1].isspace():
                    i += 1
                j = i
                while j < len(payload) and not payload[j : j + 1].isspace():
                    j += 1
                parts.append(payload[i:j])
                i = j
            i += 1  # single whitespace after maxval
            w, h, maxval = (int(p) for p in parts)
            if maxval > 255:
                return None
            pix = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
            return w, h, pix.reshape(h, w, 3)
        except Exception:
            return None
    if payload[:2] == b"BM" and len(payload) >= 54:
        try:
            data_off = struct.unpack_from("<I", payload, 10)[0]
            w = struct.unpack_from("<i", payload, 18)[0]
            h = struct.unpack_from("<i", payload, 22)[0]
            bpp = struct.unpack_from("<H", payload, 28)[0]
            compression = struct.unpack_from("<I", payload, 30)[0]
            if bpp != 24 or compression != 0 or w <= 0 or h == 0:
                return None
            bottom_up = h > 0
            h_abs = abs(h)
            stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
            rows = np.frombuffer(
                payload, dtype=np.uint8, count=stride * h_abs, offset=data_off
            ).reshape(h_abs, stride)[:, : w * 3].reshape(h_abs, w, 3)
            if bottom_up:
                rows = rows[::-1]
            # BMP stores BGR; normalize to RGB
            return w, h_abs, rows[:, :, ::-1]
        except Exception:
            return None
    return None


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Serialize an HxWx3 uint8 array as a PPM P6 payload."""
    h, w = pixels.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + pixels.astype(np.uint8).tobytes()


def decode_wav_bytes(
    payload: bytes | None,
) -> tuple[int, int, np.ndarray] | None:
    """Pure-numpy decode of the uncompressed audio container: RIFF/WAVE
    with an integer-PCM ``fmt `` chunk (audio_format 1) at 8 or 16 bits
    and a ``data`` chunk (standard RIFF layout is public format
    documentation; chunks are word-aligned).

    Returns (sample_rate, n_channels, float32 array shaped (frames,
    channels) normalized to [-1, 1]) or None when the payload is not a
    PCM WAV this parser understands.
    """
    if not payload or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    try:
        fmt = None
        data = None
        i = 12
        while i + 8 <= len(payload):
            cid = payload[i : i + 4]
            size = struct.unpack_from("<I", payload, i + 4)[0]
            body = payload[i + 8 : i + 8 + size]
            if cid == b"fmt " and len(body) >= 16:
                audio_format, n_ch, rate = struct.unpack_from("<HHI", body, 0)
                bits = struct.unpack_from("<H", body, 14)[0]
                fmt = (audio_format, n_ch, rate, bits)
            elif cid == b"data":
                data = body
            i += 8 + size + (size & 1)
        if fmt is None or data is None:
            return None
        audio_format, n_ch, rate, bits = fmt
        if audio_format != 1 or n_ch < 1 or rate < 1 or bits not in (8, 16):
            return None
        if bits == 8:
            samples = (
                np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0
            ) / 128.0
        else:
            samples = (
                np.frombuffer(
                    data[: len(data) - (len(data) % 2)], dtype="<i2"
                ).astype(np.float32)
                / 32768.0
            )
        frames = len(samples) // n_ch
        if frames == 0:
            return None
        return rate, n_ch, samples[: frames * n_ch].reshape(frames, n_ch)
    except Exception:
        return None


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Serialize a float array (frames,) or (frames, channels) in [-1, 1]
    as a 16-bit PCM WAV payload — the encode twin of decode_wav_bytes."""
    arr = np.clip(np.asarray(samples, dtype=np.float32), -1.0, 1.0)
    if arr.ndim == 1:
        arr = arr[:, None]
    pcm = (arr * 32767.0).astype("<i2").tobytes()
    n_ch = arr.shape[1]
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(pcm))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16)
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        # NULL when the payload is not a PCM WAV the pure decoder handles
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("rms", T.FloatType(), True),
        T.StructField("peak", T.FloatType(), True),
        T.StructField("zero_cross_rate", T.FloatType(), True),
    ]
)


def audio_features(media: DataFrame) -> DataFrame:
    """Audio feature extraction over kind == 'audio' payloads via
    mapInPandas: real sample-domain stats (RMS, peak, zero-crossing rate,
    exact duration) for PCM WAV payloads; NULL feature columns for
    containers the pure decoder does not cover (same honest-NULL contract
    as decode_features' img_width/img_height).

    Scale posture identical to decode_features: Arrow-batched, partition-
    preserving, no shuffle; bound per-batch memory with
    spark.sql.execution.arrow.maxRecordsPerBatch."""

    def _fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                n_bytes = 0 if p is None else len(p)
                decoded = decode_wav_bytes(p)
                if decoded is None:
                    rows.append((int(mid), n_bytes, None, None, None, None, None, None))
                    continue
                rate, n_ch, samples = decoded
                mono = samples.mean(axis=1)
                zc = (
                    float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                    if len(mono) > 1
                    else 0.0
                )
                rows.append(
                    (
                        int(mid),
                        n_bytes,
                        int(rate),
                        int(n_ch),
                        int(round(len(samples) * 1000.0 / rate)),
                        float(np.sqrt(np.mean(mono**2))),
                        float(np.max(np.abs(mono))),
                        zc,
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURE_SCHEMA.fields])

    return media.filter(F.col("kind") == "audio").mapInPandas(
        _fn, schema=AUDIO_FEATURE_SCHEMA
    )


def resample_audio(media: DataFrame, target_rate: int) -> DataFrame:
    """Nearest-neighbor audio resample (index sampling — the audio analog
    of resize_image): REAL for PCM WAV payloads, re-encoded as 16-bit PCM
    at target_rate; any other audio container raises NotImplementedError
    explicitly (no codec libs in this environment)."""

    def _fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload = []
            out_dur = []
            for p, kind in zip(pdf["payload"], pdf["kind"]):
                if kind != "audio":
                    out_payload.append(p)
                    out_dur.append(None)
                    continue
                decoded = decode_wav_bytes(p)
                if decoded is None:
                    raise NotImplementedError(
                        "audio decode beyond PCM WAV requires a codec "
                        "library not present in this container"
                    )
                rate, n_ch, samples = decoded
                n_out = max(1, int(round(len(samples) * target_rate / rate)))
                idx = (np.arange(n_out) * rate // target_rate).clip(
                    0, len(samples) - 1
                )
                out_payload.append(encode_wav(samples[idx], target_rate))
                out_dur.append(int(round(n_out * 1000.0 / target_rate)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": out_payload,
                    "mime": pdf["mime"],
                    "meta_width": pdf["meta_width"],
                    "meta_height": pdf["meta_height"],
                    "meta_duration_ms": out_dur,
                }
            )

    return media.mapInPandas(_fn, schema=MEDIA_SCHEMA)


def _histogram_feature(payload: bytes | None, dim: int = 8) -> list[float]:
    """Byte-histogram folded to `dim` buckets — the format-agnostic feature
    used for every payload (decodable or not); deterministic and cheap."""
    if payload is None:
        return [0.0] * dim
    buckets = [0] * dim
    for b in payload:
        buckets[b % dim] += 1
    total = max(1, len(payload))
    return [round(c / total, 6) for c in buckets]


def decode_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary payloads; partition- and
    order-agnostic, Arrow-batched. Emits the byte-histogram feature for
    every row plus REAL decoded dimensions for PPM/BMP payloads (NULL for
    formats the pure-python decoder does not cover)."""

    def _fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["payload"].map(decode_image_bytes)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ),
                    "feature": pdf["payload"].map(
                        lambda p: _histogram_feature(p, dim)
                    ),
                    "img_width": dims.map(lambda d: None if d is None else d[0]),
                    "img_height": dims.map(lambda d: None if d is None else d[1]),
                }
            )

    return media.mapInPandas(_fn, schema=FEATURE_SCHEMA)


def resize_image(media: DataFrame, width: int, height: int) -> DataFrame:
    """Nearest-neighbor image resize: REAL for PPM/BMP payloads (numpy
    decode -> index-sample -> PPM re-encode); payloads in any other
    container still raise NotImplementedError (no codec libs in this
    environment) — the failure is per-batch and explicit, never a silent
    pass-through."""

    def _fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload = []
            out_w, out_h = [], []
            for p, kind in zip(pdf["payload"], pdf["kind"]):
                if kind != "image":
                    out_payload.append(p)
                    out_w.append(None)
                    out_h.append(None)
                    continue
                decoded = decode_image_bytes(p)
                if decoded is None:
                    raise NotImplementedError(
                        "image decode beyond PPM/BMP requires a codec "
                        "library not present in this container"
                    )
                w0, h0, pix = decoded
                ys = (np.arange(height) * h0 // height).clip(0, h0 - 1)
                xs = (np.arange(width) * w0 // width).clip(0, w0 - 1)
                out_payload.append(encode_ppm(pix[ys][:, xs]))
                out_w.append(width)
                out_h.append(height)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": out_payload,
                    "mime": pdf["mime"],
                    "meta_width": out_w,
                    "meta_height": out_h,
                    "meta_duration_ms": pdf["meta_duration_ms"],
                }
            )

    return media.mapInPandas(_fn, schema=MEDIA_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: emits (media_id, frame_ts_ms) rows
    from the metadata duration — the real per-frame decode hook would plug
    into decode_features."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta_duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def synthetic_media(spark, n: int = 100, real_audio: bool = False) -> DataFrame:
    """Deterministic media fixture. Image rows (media_id % 3 == 0) carry a
    REAL tiny PPM P6 payload whose pixel bytes are the ASCII-safe sequence
    ((id*7 + j*13) % 127) + 1 — decodable by decode_image_bytes AND
    re-parsable by the DuckDB oracle (payload casts to VARCHAR because
    every byte is 1..127). Audio/video rows keep an opaque text payload —
    unless real_audio is set (pytest-only path; WAV headers are binary so
    the DuckDB-oracle VARCHAR trick does not apply), in which case audio
    rows carry a REAL mono 16-bit PCM WAV: a (110 * (mid % 8 + 1)) Hz
    square wave at 8 kHz, amplitude 0.5, (mid % 4 + 1) * 200 ms long."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                kind = ["image", "audio", "video"][mid % 3]
                mw = mh = dur = None
                if kind == "image":
                    w = mid % 4 + 2
                    h = mid % 5 + 2
                    pix = bytes(
                        ((mid * 7 + j * 13) % 127) + 1 for j in range(w * h * 3)
                    )
                    payload = f"P6\n{w} {h}\n255\n".encode() + pix
                    mime = "image/x-portable-pixmap"
                    mw, mh = w, h
                elif kind == "audio" and real_audio:
                    rate = 8000
                    dur = (mid % 4 + 1) * 200
                    freq = 110 * (mid % 8 + 1)
                    t = np.arange(int(rate * dur / 1000))
                    wave = 0.5 * np.sign(
                        np.sin(2 * np.pi * freq * t / rate) + 1e-12
                    )
                    payload = encode_wav(wave, rate)
                    mime = "audio/wav"
                else:
                    payload = (
                        "payload-" + hashlib.md5(str(mid).encode()).hexdigest()
                    ).encode()
                    mime = "application/octet-stream"
                    if kind == "video":
                        dur = (mid % 10 + 1) * 1000
                rows.append((mid, kind, payload, mime, mw, mh, dur))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "payload", "mime",
                    "meta_width", "meta_height", "meta_duration_ms",
                ],
            )

    return spark.range(n).mapInPandas(_gen, schema=MEDIA_SCHEMA)

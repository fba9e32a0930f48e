"""Multimodal column operators — Spark-side plumbing for opaque binary
payloads (image/audio/video) with typed metadata.

Uncompressed formats decode FOR REAL with zero dependencies (round 4):
24-bit BMP and binary PPM (P6) images via ``struct``/numpy header+pixel
parsing, and 16-bit PCM WAV audio via RIFF chunk walking — dimensions,
channel statistics, RMS/peak/zero-crossings are all computed from actual
pixels/samples, round-trip-tested against the in-repo encoders
(``encode_bmp`` / ``encode_ppm`` / ``encode_wav``). COMPRESSED formats
(JPEG/PNG/MP3/H.264) remain stubbed behind a clearly-marked deterministic
fake (``_FAKE``): this container ships no codec libraries. Everything
Spark-side — binary column schema, Arrow batch iteration (``mapInPandas``),
output schemas, partitioning, batch-shape handling — is real either way;
install PIL/ffmpeg on a real cluster and extend the dispatch in
``_decode_image`` without touching the operators.
"""

from __future__ import annotations

import hashlib
import re
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FAKE = True  # compressed formats only — BMP/PPM/WAV decode is REAL


def _image_features(img: np.ndarray) -> np.ndarray:
    """8-dim feature vector from an (H, W, 3) uint8 RGB array: per-channel
    means, grayscale std/min/max/mean, aspect ratio — the deterministic
    feature-extract stage a training pipeline would fan out on."""
    f = np.asarray(img, dtype=np.float64) / 255.0
    gray = f.mean(axis=2)
    h, w = img.shape[0], img.shape[1]
    return np.array(
        [
            f[..., 0].mean(), f[..., 1].mean(), f[..., 2].mean(),
            gray.std(), gray.min(), gray.max(),
            w / max(h, 1), gray.mean(),
        ],
        dtype=np.float32,
    )


def _decode_bmp(b: bytes) -> tuple[int, int, np.ndarray]:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER), pure struct/numpy."""
    data_off = struct.unpack_from("<I", b, 10)[0]
    w, h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    comp = struct.unpack_from("<I", b, 30)[0]
    if comp != 0 or bpp != 24:
        raise NotImplementedError(f"only uncompressed 24-bit BMP (bpp={bpp}, comp={comp})")
    top_down = h < 0
    H = abs(h)
    row_bytes = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    px = (
        np.frombuffer(b, dtype=np.uint8, offset=data_off, count=row_bytes * H)
        .reshape(H, row_bytes)[:, : w * 3]
        .reshape(H, w, 3)
    )
    if not top_down:
        px = px[::-1]  # bottom-up storage
    img = px[..., ::-1]  # BGR → RGB
    return w, H, _image_features(img)


_PPM_HDR = re.compile(rb"P6\s+(?:#[^\n]*\s+)*(\d+)\s+(?:#[^\n]*\s+)*(\d+)\s+(?:#[^\n]*\s+)*(\d+)\s")


def _decode_ppm(b: bytes) -> tuple[int, int, np.ndarray]:
    """Binary PPM (P6), maxval ≤ 255."""
    m = _PPM_HDR.match(b)
    if m is None:
        raise ValueError("malformed PPM header")
    w, h, maxval = (int(x) for x in m.groups())
    if maxval > 255:
        raise NotImplementedError("16-bit PPM")
    img = np.frombuffer(b, np.uint8, count=w * h * 3, offset=m.end()).reshape(h, w, 3)
    return w, h, _image_features(img)


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → uncompressed 24-bit bottom-up BMP bytes."""
    h, w = img.shape[0], img.shape[1]
    row_bytes = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = np.asarray(img, dtype=np.uint8)[::-1, :, ::-1].reshape(h, w * 3)
    data = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + data


def encode_ppm(img: np.ndarray) -> bytes:
    h, w = img.shape[0], img.shape[1]
    return f"P6\n{w} {h}\n255\n".encode() + np.asarray(img, dtype=np.uint8).tobytes()


def _decode_image(payload: bytes) -> tuple[int, int, np.ndarray]:
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if _FAKE:
        return _decode_image_fake(payload)
    raise NotImplementedError(  # pragma: no cover
        "compressed image decode requires PIL/pillow — not available in "
        "this container; BMP/PPM decode natively"
    )


def _decode_image_fake(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic fake: dimensions and an 8-dim feature vector derived
    from sha256(payload) — stable across runs/partitionings."""
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    feats = np.frombuffer(h[2:10], dtype=np.uint8).astype(np.float32) / 255.0
    return width, height, feats


IMAGE_META_SCHEMA = (
    "item long, n_bytes int, width int, height int, features array<float>"
)


def decode_images(df: DataFrame, id_col: str, binary_col: str) -> DataFrame:
    """binary → (dimensions, feature vector), Arrow-batched mapInPandas.
    BMP/PPM payloads decode for real (magic-dispatched); compressed formats
    take the deterministic fake (see module docstring)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for item, payload in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(payload)
                w, h, f = _decode_image(b)
                rows.append((int(item), len(b), w, h, f.tolist()))
            yield pd.DataFrame(
                rows, columns=["item", "n_bytes", "width", "height", "features"]
            )

    return df.select(id_col, binary_col).mapInPandas(op, IMAGE_META_SCHEMA)


def resize_images(df: DataFrame, id_col: str, binary_col: str, target: int = 224) -> DataFrame:
    """Resize stub: emits the (deterministic fake) resized payload digest +
    target dims — the real implementation would return re-encoded bytes."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "item": pdf[id_col].astype("int64"),
                    "width": target,
                    "height": target,
                    "resized_sha": [
                        hashlib.sha256(bytes(p) + str(target).encode()).hexdigest()
                        for p in pdf[binary_col]
                    ],
                }
            )
            yield out

    return df.select(id_col, binary_col).mapInPandas(
        op, "item long, width int, height int, resized_sha string"
    )


def sample_frames(
    df: DataFrame, id_col: str, binary_col: str, every_n: int = 10, max_frames: int = 8
) -> DataFrame:
    """Video frame-sampling stub: derives a deterministic frame count from
    the payload and emits one row per sampled frame (posexplode shape)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            items, frames, shas = [], [], []
            for item, payload in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(payload)
                n_frames = 30 + hashlib.sha256(b).digest()[0]
                for k, fr in enumerate(range(0, n_frames, every_n)):
                    if k >= max_frames:
                        break
                    items.append(int(item))
                    frames.append(fr)
                    shas.append(hashlib.sha256(b + fr.to_bytes(4, "big")).hexdigest())
            yield pd.DataFrame({"item": items, "frame": frames, "frame_sha": shas})

    return df.select(id_col, binary_col).mapInPandas(
        op, "item long, frame int, frame_sha string"
    )


AUDIO_META_SCHEMA = (
    "item long, n_bytes int, channels int, sample_rate int, bits int, "
    "n_samples long, duration_s double, rms float, peak float, zero_cross long"
)


def _decode_wav(b: bytes) -> tuple[int, int, int, np.ndarray]:
    """RIFF/WAVE chunk walk, 16-bit PCM — pure struct/numpy. Returns
    (channels, sample_rate, bits, samples[-1..1] mono-mixed)."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = struct.unpack_from("<I", b, pos + 4)[0]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", b, pos + 8)
        elif cid == b"data":
            data = b[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(f"only 16-bit PCM WAV (format={audio_format}, bits={bits})")
    raw = np.frombuffer(data, dtype="<i2")
    if channels > 1:
        raw = raw[: len(raw) - len(raw) % channels].reshape(-1, channels)
        samples = raw.astype(np.float64).mean(axis=1) / 32768.0
    else:
        samples = raw.astype(np.float64) / 32768.0
    return channels, rate, bits, samples


def encode_wav(samples: np.ndarray, sample_rate: int = 16000, channels: int = 1) -> bytes:
    """float samples in [-1, 1] (flat, interleaved if multi-channel) →
    16-bit PCM WAV bytes."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ", 16, 1, channels,
        sample_rate, sample_rate * channels * 2, channels * 2, 16,
        b"data", len(pcm),
    )
    return hdr + pcm


def decode_audio(df: DataFrame, id_col: str, binary_col: str) -> DataFrame:
    """WAV binary → sample-level features (RMS, peak, zero crossings),
    Arrow-batched mapInPandas — the audio feature-extract stage."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for item, payload in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(payload)
                ch, rate, bits, s = _decode_wav(b)
                n = len(s)
                rms = float(np.sqrt(np.mean(s**2))) if n else 0.0
                peak = float(np.abs(s).max()) if n else 0.0
                zc = int(np.count_nonzero(np.signbit(s[1:]) != np.signbit(s[:-1]))) if n > 1 else 0
                rows.append(
                    (int(item), len(b), ch, rate, bits, n, n / rate if rate else 0.0,
                     rms, peak, zc)
                )
            yield pd.DataFrame(
                rows,
                columns=["item", "n_bytes", "channels", "sample_rate", "bits",
                         "n_samples", "duration_s", "rms", "peak", "zero_cross"],
            )

    return df.select(id_col, binary_col).mapInPandas(op, AUDIO_META_SCHEMA)


def synth_media_table(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic per-row media fixture: one solid-color 24-bit BMP and
    one 16-bit PCM square-wave WAV per id, generated DISTRIBUTED through the
    in-repo encoders (Arrow-batched mapInPandas — nothing driver-side).
    Every decoded property is a closed-form function of the id, so the
    decode operators are oracle-checkable in plain SQL:

      width = 4 + id % 13, height = 4 + (id*7) % 11,
      rgb = (id % 256, (id*7) % 256, (id*13) % 256)
      n_samples = 50 + id % 64, rate = 8000 + (id % 4) * 4000,
      square-wave amplitude = 0.25 + (id % 4) * 0.1 (alternating sign, so
      zero_cross = n_samples - 1 and peak = trunc(amp*32767)/32768).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf[id_col]:
                d = int(d)
                w, h = 4 + d % 13, 4 + (d * 7) % 11
                img = np.full(
                    (h, w, 3),
                    [d % 256, (d * 7) % 256, (d * 13) % 256],
                    dtype=np.uint8,
                )
                n = 50 + d % 64
                amp = 0.25 + (d % 4) * 0.1
                samples = np.where(np.arange(n) % 2 == 0, amp, -amp)
                rows.append(
                    (d, encode_bmp(img), encode_wav(samples, 8000 + (d % 4) * 4000))
                )
            yield pd.DataFrame(rows, columns=["item", "img", "wav"])

    return df.select(id_col).mapInPandas(gen, "item long, img binary, wav binary")


def synthesize_binary_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Test fixture: treat utf-8 text bytes as an opaque payload column —
    the binary-column schema the real pipeline would carry."""
    return df.select(
        F.col(id_col).alias("item"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.length(F.col(text_col)).alias("meta_len"),
    )

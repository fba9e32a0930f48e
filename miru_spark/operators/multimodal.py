"""Multimodal column operators — Spark-side plumbing for opaque binary
payloads (image/audio/video) with typed metadata.

The decode step is STUBBED: this container ships no image/audio libraries,
so ``_decode_image_real`` raises NotImplementedError and the default path is
a clearly-marked deterministic fake (content-hash-derived dimensions and
features). Everything Spark-side is real and tested: binary column schema,
Arrow batch iteration (``mapInPandas``), output schemas, partitioning
behavior, and batch-shape handling — swap ``_FAKE`` off and install
PIL/librosa on a real cluster and the operators run unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FAKE = True  # no codec libs in this container — deterministic fake decode


def _decode_image_real(payload: bytes) -> tuple[int, int, np.ndarray]:  # pragma: no cover
    raise NotImplementedError(
        "real image decode requires PIL/pillow — not available in this "
        "container; the deterministic fake below exercises the same plumbing"
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
    """binary → (dimensions, feature vector), Arrow-batched mapInPandas."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _decode_image_fake if _FAKE else _decode_image_real
        for pdf in batches:
            rows = []
            for item, payload in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(payload)
                w, h, f = decode(b)
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


def synthesize_binary_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Test fixture: treat utf-8 text bytes as an opaque payload column —
    the binary-column schema the real pipeline would carry."""
    return df.select(
        F.col(id_col).alias("item"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.length(F.col(text_col)).alias("meta_len"),
    )

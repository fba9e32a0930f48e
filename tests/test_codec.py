"""Codec unit tests: delta+varint round-trips (property-style, seeded) and
block-max metadata — SURVEY.md §5 test plan."""

from __future__ import annotations

import numpy as np
import pytest

from miru_spark import codec


@pytest.mark.parametrize("seed", range(8))
def test_varint_roundtrip_random(seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    n = int(rng.integers(0, 5000))
    vals = rng.integers(0, 2**40, size=n).astype(np.uint64)
    out, nbytes = codec.varint_encode(vals)
    assert nbytes.sum() == len(out)
    back = codec.varint_decode(out.tobytes())
    np.testing.assert_array_equal(back, vals)


def test_varint_edge_values():
    vals = np.array([0, 1, 127, 128, 16383, 16384, 2**31 - 1, 2**40], dtype=np.uint64)
    out, _ = codec.varint_encode(vals)
    np.testing.assert_array_equal(codec.varint_decode(out.tobytes()), vals)


def test_varint_empty():
    out, nb = codec.varint_encode(np.array([], dtype=np.uint64))
    assert len(out) == 0 and len(nb) == 0
    assert len(codec.varint_decode(b"")) == 0
    assert codec.delta_pack(np.array([], dtype=np.int64)) == b""
    assert len(codec.delta_unpack(b"")) == 0


@pytest.mark.parametrize("seed", range(8))
def test_delta_pack_roundtrip_sorted_ids(seed):
    rng = np.random.Generator(np.random.PCG64([1, seed]))
    n = int(rng.integers(1, 3000))
    ids = np.unique(rng.integers(0, 1_000_000, size=n)).astype(np.int64)
    buf = codec.delta_pack(ids)
    np.testing.assert_array_equal(codec.delta_unpack(buf), ids)
    # delta+varint beats raw int32 for dense lists
    if len(ids) > 500:
        assert len(buf) < 4 * len(ids)


def test_block_metadata():
    ids = np.arange(0, 300, dtype=np.int64) * 3
    tfs = (ids % 7) + 1
    last, mx = codec.block_metadata(ids, tfs)
    assert len(last) == len(mx) == 3  # ceil(300/128)
    assert last[0] == ids[127] and last[-1] == ids[-1]
    assert mx[0] == tfs[:128].max() and mx[2] == tfs[256:].max()

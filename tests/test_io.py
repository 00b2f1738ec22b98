"""Dataset IO tests: native loader vs pure-numpy fallback on synthetic TexMex files."""

import os
import struct

import numpy as np
import pytest

from rii_tpu.utils import io as rio
from rii_tpu import native


def _write_fvecs(path, arr):
    with open(path, "wb") as f:
        for row in arr:
            f.write(struct.pack("<i", arr.shape[1]))
            f.write(row.astype("<f4").tobytes())


def _write_ivecs(path, arr):
    with open(path, "wb") as f:
        for row in arr:
            f.write(struct.pack("<i", arr.shape[1]))
            f.write(row.astype("<i4").tobytes())


def _write_bvecs(path, arr):
    with open(path, "wb") as f:
        for row in arr:
            f.write(struct.pack("<i", arr.shape[1]))
            f.write(row.astype(np.uint8).tobytes())


def test_fvecs_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    arr = rng.random((50, 16)).astype(np.float32)
    p = str(tmp_path / "x.fvecs")
    _write_fvecs(p, arr)
    np.testing.assert_array_equal(rio.fvecs_read(p), arr)
    np.testing.assert_array_equal(rio.fvecs_read(p, count=10, offset=5), arr[5:15])


def test_ivecs_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 1000, (30, 8)).astype(np.int32)
    p = str(tmp_path / "x.ivecs")
    _write_ivecs(p, arr)
    np.testing.assert_array_equal(rio.ivecs_read(p), arr)


def test_bvecs_batches(tmp_path):
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 256, (37, 12)).astype(np.uint8)
    p = str(tmp_path / "x.bvecs")
    _write_bvecs(p, arr)
    batches = list(rio.bvecs_read_batches(p, batch_size=10))
    np.testing.assert_array_equal(np.concatenate(batches), arr)
    assert batches[0].shape == (10, 12)
    assert batches[-1].shape == (7, 12)


@pytest.mark.skipif(not native.available(), reason="native loader not built")
def test_native_matches_numpy(tmp_path):
    rng = np.random.RandomState(1)
    arr = rng.random((64, 24)).astype(np.float32)
    p = str(tmp_path / "y.fvecs")
    _write_fvecs(p, arr)
    dim, count = native.texmex_probe(p, "f")
    assert (dim, count) == (24, 64)
    np.testing.assert_array_equal(native.texmex_read(p, "f"), arr)


@pytest.mark.skipif(not native.available(), reason="native loader not built")
def test_native_bvecs_f32(tmp_path):
    rng = np.random.RandomState(1)
    arr = rng.randint(0, 256, (20, 8)).astype(np.uint8)
    p = str(tmp_path / "y.bvecs")
    _write_bvecs(p, arr)
    out = native.bvecs_read_f32(p)
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, arr.astype(np.float32))

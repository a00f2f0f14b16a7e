"""Native decode engine (libfastnifti) bindings and fallbacks."""

import gzip

import numpy as np
import pytest

from torchio_tpu import native


def test_available_or_fallback():
    # Either the library built (this image has g++) or fallbacks engage.
    assert native.gunzip(gzip.compress(b"hello"), 5) == b"hello"


def test_gunzip_matches_gzip(rng):
    raw = rng.random(100_000).astype(np.float32).tobytes()
    assert native.gunzip(gzip.compress(raw), len(raw)) == raw


def test_gunzip_too_small_buffer_falls_back(rng):
    # A wrong expected_size must never make a loadable file fail: the
    # native path reports the undersized buffer and the wrapper falls
    # back to the gzip module, returning the complete payload.
    raw = rng.random(1000).astype(np.float32).tobytes()
    assert native.gunzip(gzip.compress(raw), 16) == raw


@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.float32, np.float64])
def test_f2c_transpose(rng, dtype):
    arr = (rng.random((13, 17, 19)) * 100).astype(dtype)
    out = native.f2c_transpose(np.asfortranarray(arr))
    np.testing.assert_array_equal(out, arr)
    assert out.flags["C_CONTIGUOUS"]


def test_byteswap(rng):
    arr = (rng.random(1000) * 100).astype(np.float32)
    expected = arr.byteswap()
    got = native.byteswap_inplace(arr.copy())
    np.testing.assert_array_equal(got, expected)


def test_nifti_gz_roundtrip_through_native(tmp_path, rng):
    import torchio_tpu as tio

    data = rng.normal(size=(1, 24, 32, 40)).astype(np.float32)
    path = tmp_path / "x.nii.gz"
    tio.write_nifti(path, data, np.diag([1.5, 1.5, 1.5, 1.0]))
    back, aff = tio.read_nifti(path)
    np.testing.assert_allclose(back, data, rtol=1e-6)
    assert np.asarray(back).flags["C_CONTIGUOUS"]

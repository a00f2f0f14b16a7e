import gzip

import numpy as np
import pytest

from torchio_tpu.io.nifti import (
    NiftiFile,
    read_header,
    read_nifti,
    write_nifti,
)


@pytest.fixture
def volume(rng):
    return rng.normal(size=(1, 8, 9, 10)).astype(np.float32)


@pytest.fixture
def affine():
    aff = np.diag([2.0, 2.0, 2.0, 1.0])
    aff[:3, 3] = [1.0, -2.0, 3.0]
    return aff


def test_roundtrip_nii(tmp_path, volume, affine):
    path = tmp_path / "x.nii"
    write_nifti(path, volume, affine)
    data, aff = read_nifti(path)
    np.testing.assert_allclose(data, volume, rtol=1e-6)
    np.testing.assert_allclose(aff, affine, atol=1e-5)


def test_roundtrip_nii_gz(tmp_path, volume, affine):
    path = tmp_path / "x.nii.gz"
    write_nifti(path, volume, affine)
    data, aff = read_nifti(path)
    np.testing.assert_allclose(data, volume, rtol=1e-6)
    np.testing.assert_allclose(aff, affine, atol=1e-5)


def test_header_only(tmp_path, volume, affine):
    path = tmp_path / "x.nii"
    write_nifti(path, volume, affine)
    hdr = read_header(path)
    assert hdr.shape == (8, 9, 10)
    assert hdr.dtype == np.float32
    np.testing.assert_allclose(hdr.affine, affine, atol=1e-5)


def test_multichannel_roundtrip(tmp_path, rng):
    vol = rng.normal(size=(3, 4, 5, 6)).astype(np.float32)
    path = tmp_path / "mc.nii.gz"
    write_nifti(path, vol)
    data, _ = read_nifti(path)
    assert data.shape == (3, 4, 5, 6)
    np.testing.assert_allclose(data, vol, rtol=1e-6)


def test_3d_input(tmp_path, rng):
    vol = rng.normal(size=(4, 5, 6)).astype(np.float32)
    path = tmp_path / "v.nii"
    write_nifti(path, vol)
    data, _ = read_nifti(path)
    assert data.shape == (1, 4, 5, 6)
    np.testing.assert_allclose(data[0], vol, rtol=1e-6)


def test_region_read_matches_full(tmp_path, volume, affine):
    path = tmp_path / "x.nii"
    write_nifti(path, volume, affine)
    f = NiftiFile(path)
    region = f.read_region(
        (slice(0, 1), slice(2, 6), slice(1, 9), slice(3, 7))
    )
    np.testing.assert_allclose(region, volume[:, 2:6, 1:9, 3:7], rtol=1e-6)


def test_region_read_gz(tmp_path, volume):
    path = tmp_path / "x.nii.gz"
    write_nifti(path, volume)
    f = NiftiFile(path)
    region = f.read_region((slice(0, 1), slice(0, 4), slice(0, 4), slice(0, 4)))
    np.testing.assert_allclose(region, volume[:, :4, :4, :4], rtol=1e-6)


def test_int_dtypes_preserved(tmp_path):
    vol = np.arange(2 * 3 * 4, dtype=np.int16).reshape(1, 2, 3, 4)
    path = tmp_path / "i.nii"
    write_nifti(path, vol)
    data, _ = read_nifti(path)
    assert data.dtype == np.int16
    np.testing.assert_array_equal(data, vol)


def test_bytes_source(tmp_path, volume, affine):
    path = tmp_path / "x.nii.gz"
    write_nifti(path, volume, affine)
    raw = path.read_bytes()
    data, aff = read_nifti(raw)
    np.testing.assert_allclose(data, volume, rtol=1e-6)


def test_scl_slope_applied(tmp_path, volume):
    # hand-patch the header to set scl_slope=2, scl_inter=10
    path = tmp_path / "x.nii"
    write_nifti(path, volume)
    raw = bytearray(path.read_bytes())
    import struct

    struct.pack_into("<2f", raw, 112, 2.0, 10.0)
    path.write_bytes(bytes(raw))
    data, _ = read_nifti(path)
    np.testing.assert_allclose(data, volume * 2.0 + 10.0, rtol=1e-5)


def test_not_nifti_raises(tmp_path):
    path = tmp_path / "bad.nii"
    path.write_bytes(b"\x00" * 400)
    with pytest.raises(ValueError):
        read_header(path)


def test_fortran_order_on_disk(tmp_path):
    # first voxel axis must be fastest-varying on disk (NIfTI convention)
    vol = np.arange(8, dtype=np.float32).reshape(1, 2, 2, 2)
    path = tmp_path / "f.nii"
    write_nifti(path, vol)
    raw = path.read_bytes()
    payload = np.frombuffer(raw[352:], dtype=np.float32)
    expected = vol[0].reshape(-1, order="F")
    np.testing.assert_array_equal(payload, expected)

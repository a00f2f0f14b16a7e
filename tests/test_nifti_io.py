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


def _patch_header(path, fmt, offset, *values):
    import struct

    raw = bytearray(path.read_bytes())
    struct.pack_into(fmt, raw, offset, *values)
    path.write_bytes(bytes(raw))


def test_qform_fallback_when_no_sform(tmp_path, volume):
    # sform_code=0 + qform_code=1 with identity quaternion and offsets:
    # affine must become diag(pixdim) with the qoffset translation.
    path = tmp_path / "q.nii"
    write_nifti(path, volume)
    _patch_header(path, "<2h", 252, 1, 0)          # qform=1, sform=0
    _patch_header(path, "<6f", 256, 0.0, 0.0, 0.0, 5.0, -7.0, 9.0)
    _patch_header(path, "<4f", 76, 1.0, 2.0, 3.0, 4.0)  # qfac + pixdims
    header = read_header(path)
    expected = np.diag([2.0, 3.0, 4.0, 1.0])
    expected[:3, 3] = (5.0, -7.0, 9.0)
    np.testing.assert_allclose(header.affine, expected, atol=1e-6)


def test_no_form_codes_fall_back_to_pixdim(tmp_path, volume):
    path = tmp_path / "p.nii"
    write_nifti(path, volume)
    _patch_header(path, "<2h", 252, 0, 0)
    _patch_header(path, "<4f", 76, 1.0, 2.0, 2.0, 2.0)
    header = read_header(path)
    np.testing.assert_allclose(header.affine, np.diag([2.0, 2.0, 2.0, 1.0]))


def test_quaternion_rotation_90deg(tmp_path, volume):
    # b=0, c=0, d=sqrt(0.5): 90-degree rotation about K axis.
    import math

    path = tmp_path / "r.nii"
    write_nifti(path, volume)
    _patch_header(path, "<2h", 252, 1, 0)
    _patch_header(path, "<6f", 256, 0.0, 0.0, math.sqrt(0.5), 0.0, 0.0, 0.0)
    _patch_header(path, "<4f", 76, 1.0, 1.0, 1.0, 1.0)
    header = read_header(path)
    expected_rot = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float64)
    np.testing.assert_allclose(header.affine[:3, :3], expected_rot, atol=1e-6)


def test_big_endian_nifti1(tmp_path):
    # Handcraft a full big-endian NIfTI-1 file (2x2x2 float32 ramp).
    import struct

    vol = np.arange(8, dtype=">f4").reshape(2, 2, 2)
    hdr = bytearray(352)
    struct.pack_into(">i", hdr, 0, 348)                 # sizeof_hdr
    struct.pack_into(">8h", hdr, 40, 3, 2, 2, 2, 1, 1, 1, 1)
    struct.pack_into(">h", hdr, 70, 16)                 # float32
    struct.pack_into(">8f", hdr, 76, 1, 1, 1, 1, 1, 1, 1, 1)
    struct.pack_into(">f", hdr, 108, 352.0)             # vox_offset
    struct.pack_into(">2h", hdr, 252, 0, 1)             # sform=1
    struct.pack_into(
        ">12f", hdr, 280, 1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0
    )
    path = tmp_path / "be.nii"
    path.write_bytes(bytes(hdr) + vol.tobytes(order="F"))
    data, affine = read_nifti(path)
    np.testing.assert_array_equal(
        data[0], np.arange(8, dtype=np.float32).reshape(2, 2, 2)
    )
    np.testing.assert_allclose(affine, np.eye(4))


def test_nifti2_roundtrip(tmp_path):
    # Handcraft a NIfTI-2 file; parser dispatches on sizeof_hdr=540.
    import struct

    vol = np.arange(8, dtype="<f4").reshape(2, 2, 2)
    hdr = bytearray(544)
    struct.pack_into("<i", hdr, 0, 540)
    struct.pack_into("<h", hdr, 12, 16)                 # float32
    struct.pack_into("<8q", hdr, 16, 3, 2, 2, 2, 1, 1, 1, 1)
    struct.pack_into("<8d", hdr, 104, 1, 1, 1, 1, 1, 1, 1, 1)
    struct.pack_into("<q", hdr, 168, 544)               # vox_offset
    struct.pack_into("<2d", hdr, 176, 1.0, 0.0)         # slope/inter
    struct.pack_into("<2i", hdr, 344, 0, 1)             # sform=1
    struct.pack_into(
        "<12d", hdr, 400, 2, 0, 0, 10, 0, 2, 0, 20, 0, 0, 2, 30
    )
    path = tmp_path / "v2.nii"
    path.write_bytes(bytes(hdr) + vol.tobytes(order="F"))
    header = read_header(path)
    assert header.version == 2
    assert header.spatial_shape == (2, 2, 2)
    data, affine = read_nifti(path)
    np.testing.assert_array_equal(data[0], vol)
    expected = np.eye(4)
    expected[0, 0] = expected[1, 1] = expected[2, 2] = 2.0
    expected[:3, 3] = (10, 20, 30)
    np.testing.assert_allclose(affine, expected)


def test_5d_vector_layout_folds_channels(tmp_path):
    # NIfTI vector images: (I, J, K, 1, V) on disk -> (V, I, J, K).
    import struct

    i = j = k = 2
    v = 3
    vol = np.arange(i * j * k * v, dtype="<f4").reshape(i, j, k, 1, v, order="F")
    hdr = bytearray(352)
    struct.pack_into("<i", hdr, 0, 348)
    struct.pack_into("<8h", hdr, 40, 5, i, j, k, 1, v, 1, 1)
    struct.pack_into("<h", hdr, 70, 16)
    struct.pack_into("<8f", hdr, 76, 1, 1, 1, 1, 1, 1, 1, 1)
    struct.pack_into("<f", hdr, 108, 352.0)
    struct.pack_into("<2h", hdr, 252, 0, 1)
    struct.pack_into("<12f", hdr, 280, 1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0)
    path = tmp_path / "vec.nii"
    path.write_bytes(bytes(hdr) + vol.tobytes(order="F"))
    data, _ = read_nifti(path)
    assert data.shape == (v, i, j, k)
    np.testing.assert_array_equal(data[1], vol[..., 0, 1])


def test_truncated_header_raises(tmp_path):
    path = tmp_path / "tiny.nii"
    path.write_bytes(b"\x00" * 100)
    with pytest.raises(ValueError, match="too small"):
        read_header(path)


def test_unsupported_datatype_raises(tmp_path, volume):
    path = tmp_path / "odd.nii"
    write_nifti(path, volume)
    _patch_header(path, "<h", 70, 1)  # DT_BINARY: unsupported
    with pytest.raises(ValueError, match="datatype"):
        read_header(path)


# --- consolidated from test_coverage_edges5.py (round 5) ---
import gzip
import struct
import sys
import numpy as np
import pytest
import torchio_tpu as tio
from torchio_tpu.data import ScalarImage
from torchio_tpu.io import nifti

def _write_nii_edge5(tmp_path, arr, name="t.nii", affine=None):
    path = tmp_path / name
    nifti.write_nifti(path, arr, affine)
    return path

def _craft_nifti2_edge5(bo="<", datatype=16, shape=(2, 3, 4), sform=1, qform=0):
    """Hand-build a 540-byte NIfTI-2 header (we only write NIfTI-1, but
    must read both; the reference reads via nibabel)."""
    raw = bytearray(540)
    struct.pack_into(bo + "i", raw, 0, 540)
    struct.pack_into(bo + "8s", raw, 4, b"n+2\x00\r\n\x1a\n")
    struct.pack_into(bo + "h", raw, 12, datatype)
    struct.pack_into(bo + "h", raw, 14, 32)  # bitpix
    dim = [len(shape), *shape] + [1] * (7 - len(shape))
    struct.pack_into(bo + "8q", raw, 16, *dim)
    struct.pack_into(bo + "8d", raw, 104, 1.0, 1.0, 2.0, 3.0, 1, 1, 1, 1)
    struct.pack_into(bo + "q", raw, 168, 544)  # vox_offset
    struct.pack_into(bo + "2d", raw, 176, 1.0, 0.0)  # slope/inter
    struct.pack_into(bo + "2i", raw, 344, qform, sform)
    struct.pack_into(bo + "6d", raw, 352, 0.0, 0.0, 0.0, 5.0, 6.0, 7.0)
    srow = np.diag([1.0, 2.0, 3.0]).astype(np.float64)
    struct.pack_into(
        bo + "12d", raw, 400,
        *srow[0], 0.0, *srow[1], 0.0, *srow[2], 0.0,
    )
    return bytes(raw)


class TestNifti2Parsing:
    def test_big_endian_nifti2_sform(self):
        h = nifti.parse_header(_craft_nifti2_edge5(bo=">"))
        assert h.version == 2 and h.byteorder == ">"
        assert h.shape == (2, 3, 4)
        np.testing.assert_allclose(np.diag(h.affine)[:3], [1.0, 2.0, 3.0])

    def test_truncated_nifti2(self):
        with pytest.raises(ValueError, match="Truncated NIfTI-2"):
            nifti.parse_header(struct.pack("<i", 540) + b"\x00" * 400)

    def test_unsupported_datatype(self):
        with pytest.raises(ValueError, match="datatype code"):
            nifti.parse_header(_craft_nifti2_edge5(datatype=9999))

    def test_qform_affine(self):
        # identity quaternion, offsets (5, 6, 7), pixdims (1, 2, 3)
        h = nifti.parse_header(_craft_nifti2_edge5(sform=0, qform=1))
        np.testing.assert_allclose(np.diag(h.affine)[:3], [1.0, 2.0, 3.0])
        np.testing.assert_allclose(h.affine[:3, 3], [5.0, 6.0, 7.0])

    def test_no_form_fallback_is_pixdim_diag(self):
        h = nifti.parse_header(_craft_nifti2_edge5(sform=0, qform=0))
        np.testing.assert_allclose(np.diag(h.affine), [1.0, 2.0, 3.0, 1.0])

    def test_read_header_from_long_bytes(self):
        data = _craft_nifti2_edge5() + b"\x00" * 256
        assert nifti.read_header(data).version == 2

class TestNiftiEdges:
    def test_is_gzipped_bytes(self):
        assert nifti._is_gzipped(b"\x1f\x8b\x08") is True
        assert nifti._is_gzipped(b"ni1\x00") is False

    def test_read_header_file_like(self, tmp_path):
        arr = np.ones((1, 3, 4, 5), np.float32)
        plain = _write_nii_edge5(tmp_path, arr, "a.nii")
        gz = _write_nii_edge5(tmp_path, arr, "a.nii.gz")
        with open(plain, "rb") as f:
            assert nifti.read_header(f).shape[:3] == (3, 4, 5)
        with open(gz, "rb") as f:
            assert nifti.read_header(f).shape[:3] == (3, 4, 5)

    def test_file_like_full_read_gz(self, tmp_path):
        arr = np.arange(60, dtype=np.float32).reshape(1, 3, 4, 5)
        gz = _write_nii_edge5(tmp_path, arr, "a.nii.gz")
        with open(gz, "rb") as f:
            nf = nifti.NiftiFile(f)
            out = nf.read()
        np.testing.assert_array_equal(out, arr)

    def _patch_dims(self, path, dims):
        raw = bytearray(path.read_bytes())
        struct.pack_into("<8h", raw, 40, *dims)
        path.write_bytes(bytes(raw))

    def test_read_2d_and_1d_canonicalize(self, tmp_path):
        arr = np.arange(12, dtype=np.float32).reshape(1, 3, 4, 1)
        path = _write_nii_edge5(tmp_path, arr, "p.nii")
        self._patch_dims(path, [2, 3, 4, 1, 1, 1, 1, 1])
        out, _ = nifti.read_nifti(path)
        assert out.shape == (1, 3, 4, 1)
        self._patch_dims(path, [1, 12, 1, 1, 1, 1, 1, 1])
        out, _ = nifti.read_nifti(path)
        assert out.shape == (1, 12, 1, 1)

    def test_read_5d_vector_folds(self, tmp_path):
        # (3, 4, 5, 2) written as 4D, re-labeled (3, 4, 5, 1, 2): the
        # NIfTI vector-image layout folds trailing dims into channels
        arr = np.arange(120, dtype=np.float32).reshape(2, 3, 4, 5)
        path = _write_nii_edge5(tmp_path, arr, "v.nii")
        self._patch_dims(path, [5, 3, 4, 5, 1, 2, 1, 1])
        out, _ = nifti.read_nifti(path)
        assert out.shape == (2, 3, 4, 5)
        # region reads through the backend fold the same way
        img = ScalarImage(path)
        region = img[:, 1:3, :2, :3]
        assert np.asarray(region.data).shape == (2, 2, 2, 3)

    def test_scaled_dtype_is_float32(self, tmp_path):
        arr = (np.arange(12, dtype=np.int16)).reshape(1, 3, 4, 1)
        path = _write_nii_edge5(tmp_path, arr, "s.nii")
        raw = bytearray(path.read_bytes())
        struct.pack_into("<2f", raw, 112, 2.0, 1.0)  # scl_slope, scl_inter
        path.write_bytes(bytes(raw))
        nf = nifti.NiftiFile(path)
        assert nf.dtype == np.float32
        out = nf.read()
        # disk I-axis values 0, 4, 8 scaled by slope 2 + inter 1
        np.testing.assert_allclose(out[0, :, 0, 0], [1.0, 9.0, 17.0])

    def test_write_errors_and_casts(self, tmp_path):
        with pytest.raises(ValueError, match="3D or 4D"):
            nifti.write_nifti(tmp_path / "bad.nii", np.ones((3, 3), np.float32))
        p = tmp_path / "b.nii"
        nifti.write_nifti(p, np.ones((2, 3, 4), bool))
        out, _ = nifti.read_nifti(p)
        assert out.dtype == np.uint8
        nifti.write_nifti(p, np.ones((2, 3, 4), np.float16))
        out, _ = nifti.read_nifti(p)
        assert out.dtype == np.float32

    def test_is_nifti_true(self, tmp_path):
        path = _write_nii_edge5(tmp_path, np.ones((1, 2, 2, 2), np.float32))
        assert nifti.is_nifti(path) is True
        assert nifti.is_nifti(tmp_path / "absent.nii") is False

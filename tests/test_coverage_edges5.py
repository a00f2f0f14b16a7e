"""Round-4 coverage push, IO layer: NIfTI-2 / exotic-header parsing,
transform-matrix files, suffix-routed writing, backend-registry
fallbacks, and CLI branches (VERDICT r3 item 10)."""

import gzip
import struct
import sys

import numpy as np
import pytest

import torchio_tpu as tio
from torchio_tpu.data import ScalarImage
from torchio_tpu.io import nifti


def _write_nii(tmp_path, arr, name="t.nii", affine=None):
    path = tmp_path / name
    nifti.write_nifti(path, arr, affine)
    return path


def _craft_nifti2(bo="<", datatype=16, shape=(2, 3, 4), sform=1, qform=0):
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
        h = nifti.parse_header(_craft_nifti2(bo=">"))
        assert h.version == 2 and h.byteorder == ">"
        assert h.shape == (2, 3, 4)
        np.testing.assert_allclose(np.diag(h.affine)[:3], [1.0, 2.0, 3.0])

    def test_truncated_nifti2(self):
        with pytest.raises(ValueError, match="Truncated NIfTI-2"):
            nifti.parse_header(struct.pack("<i", 540) + b"\x00" * 400)

    def test_unsupported_datatype(self):
        with pytest.raises(ValueError, match="datatype code"):
            nifti.parse_header(_craft_nifti2(datatype=9999))

    def test_qform_affine(self):
        # identity quaternion, offsets (5, 6, 7), pixdims (1, 2, 3)
        h = nifti.parse_header(_craft_nifti2(sform=0, qform=1))
        np.testing.assert_allclose(np.diag(h.affine)[:3], [1.0, 2.0, 3.0])
        np.testing.assert_allclose(h.affine[:3, 3], [5.0, 6.0, 7.0])

    def test_no_form_fallback_is_pixdim_diag(self):
        h = nifti.parse_header(_craft_nifti2(sform=0, qform=0))
        np.testing.assert_allclose(np.diag(h.affine), [1.0, 2.0, 3.0, 1.0])

    def test_read_header_from_long_bytes(self):
        data = _craft_nifti2() + b"\x00" * 256
        assert nifti.read_header(data).version == 2


class TestNiftiEdges:
    def test_is_gzipped_bytes(self):
        assert nifti._is_gzipped(b"\x1f\x8b\x08") is True
        assert nifti._is_gzipped(b"ni1\x00") is False

    def test_read_header_file_like(self, tmp_path):
        arr = np.ones((1, 3, 4, 5), np.float32)
        plain = _write_nii(tmp_path, arr, "a.nii")
        gz = _write_nii(tmp_path, arr, "a.nii.gz")
        with open(plain, "rb") as f:
            assert nifti.read_header(f).shape[:3] == (3, 4, 5)
        with open(gz, "rb") as f:
            assert nifti.read_header(f).shape[:3] == (3, 4, 5)

    def test_file_like_full_read_gz(self, tmp_path):
        arr = np.arange(60, dtype=np.float32).reshape(1, 3, 4, 5)
        gz = _write_nii(tmp_path, arr, "a.nii.gz")
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
        path = _write_nii(tmp_path, arr, "p.nii")
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
        path = _write_nii(tmp_path, arr, "v.nii")
        self._patch_dims(path, [5, 3, 4, 5, 1, 2, 1, 1])
        out, _ = nifti.read_nifti(path)
        assert out.shape == (2, 3, 4, 5)
        # region reads through the backend fold the same way
        img = ScalarImage(path)
        region = img[:, 1:3, :2, :3]
        assert np.asarray(region.data).shape == (2, 2, 2, 3)

    def test_scaled_dtype_is_float32(self, tmp_path):
        arr = (np.arange(12, dtype=np.int16)).reshape(1, 3, 4, 1)
        path = _write_nii(tmp_path, arr, "s.nii")
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
        path = _write_nii(tmp_path, np.ones((1, 2, 2, 2), np.float32))
        assert nifti.is_nifti(path) is True
        assert nifti.is_nifti(tmp_path / "absent.nii") is False


class TestMatrixEdges:
    def test_itk_tfm_with_fixed_center(self, tmp_path):
        path = tmp_path / "t.tfm"
        path.write_text(
            "#Insight Transform File V1.0\n"
            "Transform: AffineTransform_double_3_3\n"
            "Parameters: 1 0 0 0 1 0 0 0 1 2 3 4\n"
            "FixedParameters: 10 20 30\n"
        )
        m = tio.read_matrix(path)
        # identity rotation: the center folds out; translation survives
        # up to the ITK LPS -> RAS sign convention
        np.testing.assert_allclose(np.abs(m[:3, 3]), [2, 3, 4])

    def test_itk_tfm_unparseable(self, tmp_path):
        path = tmp_path / "t.tfm"
        path.write_text("Transform: AffineTransform_double_3_3\n")
        with pytest.raises(ValueError, match="Could not parse"):
            tio.read_matrix(path)

    def test_unknown_suffix(self, tmp_path):
        path = tmp_path / "t.mystery"
        path.write_text("")
        with pytest.raises(ValueError, match="Unknown suffix"):
            tio.read_matrix(path)

    def test_h5_transform_with_fake_h5py(self, tmp_path, monkeypatch):
        params = np.array([1, 0, 0, 0, 1, 0, 0, 0, 1, 5, 6, 7], np.float64)

        class FakeGroup(dict):
            pass

        tgroup = FakeGroup(TransformParameters=params)
        group = FakeGroup({"0": "meta", "1": tgroup})

        class FakeFile(dict):
            def __init__(self, *a, **k):
                super().__init__(TransformGroup=group)

            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

        fake = type(sys)("h5py")
        fake.File = FakeFile
        monkeypatch.setitem(sys.modules, "h5py", fake)
        m = tio.read_matrix(tmp_path / "t.h5")
        np.testing.assert_allclose(np.abs(m[:3, 3]), [5, 6, 7])

        tgroup["TransformParameters"] = params[:6]
        with pytest.raises(ValueError, match="parameter count"):
            tio.read_matrix(tmp_path / "t.h5")


class TestWriteZarr:
    def test_write_nifti_zarr_with_fake_zarr(self, tmp_path, monkeypatch):
        from torchio_tpu.io import write as write_mod

        class FakeStore:
            def __init__(self):
                self.attrs = {}
                self.data = None

            def __setitem__(self, key, value):
                self.data = np.asarray(value)

        stores = {}

        def fake_open(path, mode, shape, chunks, dtype):
            store = FakeStore()
            stores[path] = (store, shape, chunks, dtype)
            return store

        fake = type(sys)("zarr")
        fake.open = fake_open
        monkeypatch.setitem(sys.modules, "zarr", fake)
        out = tmp_path / "x.nii.zarr"
        write_mod.write_nifti_zarr(out, np.ones((3, 4, 5), np.float32))
        store, shape, chunks, dtype = stores[str(out)]
        assert shape == (1, 3, 4, 5)  # 3D promoted to (C, I, J, K)
        assert chunks == (1, 64, 64, 64)
        assert store.attrs["affine"] == np.eye(4).tolist()


class TestBackendRegistryEdges:
    def test_slices_shape_negative_step(self):
        from torchio_tpu.io.backends import slices_shape

        full = (slice(0, 2, 1), slice(0, 3, 1), slice(0, 4, 1))
        assert slices_shape((*full, slice(3, -1, -1)))[3] == 4
        assert slices_shape((*full, slice(1, 3, 1)))[3] == 2

    def test_unreadable_bytes_raise(self):
        with pytest.raises(ValueError, match="No backend"):
            ScalarImage(b"certainly not an image").shape  # noqa: B018

    def test_sniff_fallback_failure(self, tmp_path):
        path = tmp_path / "data.weird"
        path.write_bytes(b"\x00" * 400)
        with pytest.raises(ValueError, match="No backend"):
            ScalarImage(path).shape  # noqa: B018

    def test_lazy_reader_protocol(self):
        from torchio_tpu.io.backends import ArrayBackend, BackendRequest

        class MyReader:
            def get_backend(self, request: BackendRequest):
                return ArrayBackend(
                    np.ones((1, 2, 2, 2), np.float32), np.eye(4)
                )

        img = ScalarImage("whatever.custom", reader=MyReader())
        assert img.shape == (1, 2, 2, 2)

    def test_plain_callable_reader(self):
        img = ScalarImage(
            "whatever.custom",
            reader=lambda src: (np.ones((1, 2, 2, 2), np.float32), np.eye(4)),
        )
        assert img.shape == (1, 2, 2, 2)

    def test_dicom_matcher_rejects_plain_dir(self, tmp_path):
        (tmp_path / "notes.txt").write_text("hello")
        with pytest.raises(ValueError, match="No backend"):
            ScalarImage(tmp_path).shape  # noqa: B018

    def test_lazy_crop_pad_dtype_passthrough(self, rng):
        img = ScalarImage(rng.normal(size=(1, 8, 8, 8)).astype(np.float32))
        subject = tio.Subject(t1=img)
        cropped = tio.CropOrPad((4, 4, 4))(subject)
        assert cropped.t1.dataobj.dtype == np.float32
        padded = tio.CropOrPad((12, 12, 12))(subject)
        assert padded.t1.dataobj.dtype == np.float32


class TestCliEdges:
    def test_animate_mp4(self, tmp_path, monkeypatch):
        import torchio_tpu.cli as cli
        import torchio_tpu.visualization as viz

        src = tmp_path / "t.nii"
        ScalarImage(np.ones((1, 4, 4, 4), np.float32)).save(src)
        called = {}
        monkeypatch.setattr(
            viz, "make_video", lambda img, out, axis: called.setdefault("out", out)
        )
        rc = cli.main(["animate", str(src), str(tmp_path / "o.mp4")])
        assert rc == 0 and called["out"] == tmp_path / "o.mp4"

    def test_transform_string_kwarg(self, tmp_path):
        import torchio_tpu.cli as cli

        src = tmp_path / "t.nii"
        ScalarImage(np.ones((1, 4, 4, 4), np.float32)).save(src)
        dst = tmp_path / "o.nii"
        # "mean" is not a Python literal: falls back to the raw string
        rc = cli.main(
            ["transform", "Pad", str(src), str(dst), "padding=1", "padding_mode=mean"]
        )
        assert rc == 0
        assert ScalarImage(dst).shape == (1, 6, 6, 6)

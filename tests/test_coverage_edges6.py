"""Round-4 coverage push, part 3: codec error/variant paths (JPEG-LS,
JPEG lossless, DICOM quantization), dataset branches, optional-import
getters, bbox axes conversions, and the compilation-cache bootstrap."""

import struct
import sys

import numpy as np
import pytest

import torchio_tpu as tio
from torchio_tpu.data import ScalarImage


def _python_jpegll(monkeypatch):
    """Force the pure-Python JPEG-lossless decoder (the oracle)."""
    import torchio_tpu.native as native

    monkeypatch.setattr(native, "jpegll_decode", lambda stream: None)


def _python_jls(monkeypatch):
    import torchio_tpu.native as native

    monkeypatch.setattr(native, "jls_decode", lambda stream: None)


class TestJpegLosslessPython:
    def test_all_predictors_python_decoder(self, monkeypatch):
        from torchio_tpu.io.jpeg_lossless import (
            decode_lossless_jpeg,
            encode_lossless_jpeg,
        )

        _python_jpegll(monkeypatch)
        rng = np.random.default_rng(2)
        img = rng.integers(0, 3000, (9, 11)).astype(np.uint16)
        for predictor in range(1, 8):
            stream = encode_lossless_jpeg(img, predictor=predictor)
            np.testing.assert_array_equal(decode_lossless_jpeg(stream), img)

    def test_not_a_jpeg(self, monkeypatch):
        from torchio_tpu.io.jpeg_lossless import decode_lossless_jpeg

        _python_jpegll(monkeypatch)
        with pytest.raises(ValueError, match="Not a JPEG"):
            decode_lossless_jpeg(b"nope")

    def test_bad_marker(self, monkeypatch):
        from torchio_tpu.io.jpeg_lossless import decode_lossless_jpeg

        _python_jpegll(monkeypatch)
        with pytest.raises(ValueError, match="Bad marker"):
            decode_lossless_jpeg(bytes([0xFF, 0xD8]) + b"\x00" * 8)

    def _patch_after_marker(self, stream, marker, offset, value):
        idx = stream.find(bytes([0xFF, marker]))
        assert idx >= 0
        patched = bytearray(stream)
        patched[idx + 4 + offset] = value  # skip marker + length
        return bytes(patched)

    def test_multi_component_sof_rejected(self, monkeypatch):
        from torchio_tpu.io.jpeg_lossless import (
            SOF3,
            decode_lossless_jpeg,
            encode_lossless_jpeg,
        )

        _python_jpegll(monkeypatch)
        stream = encode_lossless_jpeg(np.zeros((4, 4), np.uint8))
        # SOF3 payload: precision(1) height(2) width(2) ncomp(1)
        bad = self._patch_after_marker(stream, SOF3, 5, 3)
        with pytest.raises(ValueError, match="single-component"):
            decode_lossless_jpeg(bad)

    def test_multi_scan_component_rejected(self, monkeypatch):
        from torchio_tpu.io.jpeg_lossless import (
            SOS,
            decode_lossless_jpeg,
            encode_lossless_jpeg,
        )

        _python_jpegll(monkeypatch)
        stream = encode_lossless_jpeg(np.zeros((4, 4), np.uint8))
        bad = self._patch_after_marker(stream, SOS, 0, 2)  # Ns = 2
        with pytest.raises(ValueError, match="one scan component"):
            decode_lossless_jpeg(bad)

    def test_truncated_restart_stream(self, monkeypatch):
        from torchio_tpu.io.jpeg_lossless import (
            decode_lossless_jpeg,
            encode_lossless_jpeg,
        )

        _python_jpegll(monkeypatch)
        rng = np.random.default_rng(3)
        img = rng.integers(0, 200, (6, 6)).astype(np.uint8)
        stream = encode_lossless_jpeg(img, restart_interval=6)
        # chop the scan right after the first RST marker, keep EOI
        first_rst = stream.find(bytes([0xFF, 0xD0]))
        assert first_rst > 0
        bad = stream[: first_rst + 4] + bytes([0xFF, 0xD9])
        with pytest.raises(ValueError, match="Truncated restart"):
            decode_lossless_jpeg(bad)


class TestJpegLsPython:
    def test_low_precision_thresholds(self, monkeypatch):
        from torchio_tpu.io.jpeg_ls import decode_jpeg_ls, encode_jpeg_ls

        _python_jls(monkeypatch)
        rng = np.random.default_rng(4)
        img = rng.integers(0, 16, (8, 9)).astype(np.uint8)
        stream = encode_jpeg_ls(img, precision=4)
        np.testing.assert_array_equal(decode_jpeg_ls(stream), img)

    def test_not_a_stream_and_bad_marker(self, monkeypatch):
        from torchio_tpu.io.jpeg_ls import decode_jpeg_ls_python

        with pytest.raises(ValueError, match="Not a JPEG-LS"):
            decode_jpeg_ls_python(b"xx")
        with pytest.raises(ValueError, match="Bad marker"):
            decode_jpeg_ls_python(bytes([0xFF, 0xD8, 0x12, 0x34]))

    def test_sos_before_sof_rejected(self, monkeypatch):
        from torchio_tpu.io.jpeg_ls import SOS, decode_jpeg_ls_python

        payload = bytes([1, 0, 0, 0, 0, 0])
        seg = bytes([0xFF, SOS]) + struct.pack(">H", len(payload) + 2) + payload
        with pytest.raises(ValueError, match="SOS before SOF55"):
            decode_jpeg_ls_python(bytes([0xFF, 0xD8]) + seg)

    def test_multi_component_scan_rejected(self, monkeypatch):
        from torchio_tpu.io.jpeg_ls import SOS, decode_jpeg_ls_python, encode_jpeg_ls

        stream = encode_jpeg_ls(np.zeros((4, 4), np.uint8))
        idx = stream.find(bytes([0xFF, SOS]))
        # replace the SOS with a two-component scan header (Ns=2):
        # interleaved scans are out of scope (mode-0 only)
        payload = bytes([2, 1, 0, 2, 0, 0, 1, 0])
        sos = bytes([0xFF, SOS]) + struct.pack(">H", len(payload) + 2) + payload
        bad = stream[:idx] + sos + bytes([0xFF, 0xD9])
        with pytest.raises(ValueError, match="interleave mode 0"):
            decode_jpeg_ls_python(bad)


class TestDicomQuantization:
    def test_int32_quantization_branches(self, tmp_path):
        from torchio_tpu.io.dicom import read_dicom_file, write_dicom

        # int32 within int16 range -> stored int16
        p = tmp_path / "a.dcm"
        write_dicom(p, np.arange(-8, 8, dtype=np.int32).reshape(1, 4, 4, 1))
        arr, _ = read_dicom_file(p)
        np.testing.assert_array_equal(
            arr.ravel(), np.arange(-8, 8, dtype=np.int32)
        )
        # int32 within uint16 range (but above int16) -> stored uint16
        p2 = tmp_path / "b.dcm"
        write_dicom(p2, np.full((1, 2, 2, 1), 40000, np.int32))
        arr2, _ = read_dicom_file(p2)
        assert int(arr2.ravel()[0]) == 40000

    def test_constant_float_volume(self, tmp_path):
        from torchio_tpu.io.dicom import read_dicom_file, write_dicom

        p = tmp_path / "c.dcm"
        write_dicom(p, np.full((1, 3, 3, 1), 2.5, np.float32))
        arr, _ = read_dicom_file(p)
        np.testing.assert_allclose(arr, 2.5)

    def test_3d_input_promotes(self, tmp_path):
        from torchio_tpu.io.dicom import read_dicom_file, write_dicom

        p = tmp_path / "d.dcm"
        write_dicom(p, np.ones((3, 3, 2), np.int16))
        arr, _ = read_dicom_file(p)
        assert arr.shape[-3:] == (3, 3) or arr.size == 18

    def test_rescale_slope_applied(self, tmp_path):
        from torchio_tpu.io.dicom import read_dicom_file, write_dicom

        p = tmp_path / "e.dcm"
        data = np.linspace(0.0, 1e6, 16, dtype=np.float64).reshape(1, 4, 4, 1)
        write_dicom(p, data)
        arr, _ = read_dicom_file(p)
        np.testing.assert_allclose(
            np.asarray(arr, np.float64).ravel(), data.ravel(), rtol=1e-3, atol=20.0
        )

    def test_unreadable_directory(self, tmp_path):
        from torchio_tpu.io.dicom import read_dicom_dir

        (tmp_path / "x.dcm").write_bytes(b"junk" * 40)
        with pytest.raises(ValueError, match="No readable DICOM"):
            read_dicom_dir(tmp_path)


class TestOptionalImportGetters:
    @pytest.mark.parametrize(
        "getter",
        ["get_matplotlib", "get_pil", "get_zarr", "get_h5py", "get_ipyniivue"],
    )
    def test_getters_return_or_raise(self, getter):
        import torchio_tpu.external.imports as ximports

        fn = getattr(ximports, getter)
        try:
            module = fn()
        except ImportError as e:
            assert "pip install" in str(e)
        else:
            assert module is not None


class TestBBoxAxesConversions:
    def _boxes(self, axes="IJK"):
        from torchio_tpu.core.affine import AffineMatrix
        from torchio_tpu.data.bboxes import (
            BoundingBoxes,
            BoundingBoxFormat,
            Representation,
        )

        fmt = BoundingBoxFormat(axes, Representation.CORNERS)
        return BoundingBoxes(
            np.array([[1.0, 2.0, 3.0, 4.0, 5.0, 6.0]], np.float32),
            format=fmt,
            affine=AffineMatrix(),
        )

    def test_affine_property(self):
        boxes = self._boxes()
        assert boxes.affine.spacing == (1.0, 1.0, 1.0)

    def test_voxel_perm_to_world(self):
        from torchio_tpu.data.bboxes import BoundingBoxFormat, Representation

        boxes = self._boxes("KJI")  # permuted voxel source axes
        out = boxes.to_format(BoundingBoxFormat("RAS", Representation.CORNERS))
        # KJI (1,2,3)-(4,5,6) -> IJK (3,2,1)-(6,5,4) -> RAS via identity
        np.testing.assert_allclose(
            np.asarray(out.data)[0], [3, 2, 1, 6, 5, 4]
        )

    def test_world_to_world_flip(self):
        from torchio_tpu.data.bboxes import BoundingBoxFormat, Representation

        boxes = self._boxes("RAS")
        # identity affine orientation is RAS; LPS flips the first two
        # world axes before mapping back through the inverse affine
        out = boxes.to_format(BoundingBoxFormat("KJI", Representation.CORNERS))
        np.testing.assert_allclose(
            np.asarray(out.data)[0], [3, 2, 1, 6, 5, 4]
        )


class TestDatasetBranches:
    def test_fpg_load_all(self, monkeypatch, tmp_path, rng):
        import h5py

        import torchio_tpu.datasets as datasets
        import torchio_tpu.datasets.fpg as mod
        from torchio_tpu.io.matrix import write_matrix

        monkeypatch.setattr(mod, "get_cache_dir", lambda: tmp_path)
        root = tmp_path / "fpg"
        root.mkdir()

        def fake_download(url, rootdir, filename=None, **kw):
            path = root / filename
            if filename.endswith((".nii.gz", ".nrrd")):
                ScalarImage(rng.random((1, 4, 4, 4)).astype(np.float32)).save(
                    path
                )
            elif filename.endswith(".tfm"):
                write_matrix(np.eye(4), path)
            elif filename.endswith(".h5"):
                with h5py.File(path, "w") as f:
                    g = f.create_group("TransformGroup").create_group("1")
                    g["TransformParameters"] = np.concatenate(
                        [np.eye(3).ravel(), np.zeros(3)]
                    )
                    g["TransformFixedParameters"] = np.zeros(3)

        monkeypatch.setattr(mod, "download_url", fake_download)
        subject = datasets.FPG(load_all=True)
        assert {"t1", "seg", "t2", "fmri", "dmri"} <= set(subject.images)

    def test_mni_find_missing(self, tmp_path):
        from torchio_tpu.datasets.mni import Colin27

        with pytest.raises(FileNotFoundError):
            Colin27._find(tmp_path, "t1")


class TestZarrBackendDtypeChannels:
    def test_4d_dtype_and_channel_region(self, monkeypatch, rng):
        import types

        class FakeArray:
            def __init__(self, arr, attrs=None):
                self._arr = arr
                self.shape = arr.shape
                self.dtype = arr.dtype
                self.attrs = attrs or {}

            def __getitem__(self, key):
                return self._arr[key]

            def __array__(self, dtype=None):
                return np.asarray(self._arr, dtype)

        mod = types.ModuleType("zarr")
        arr = rng.random((2, 5, 6, 7)).astype(np.float32)  # (C, I, J, K)
        mod.open = lambda source, mode="r": FakeArray(
            arr, attrs={"affine": np.eye(4).tolist(), "channels": True}
        )
        monkeypatch.setitem(sys.modules, "zarr", mod)
        from torchio_tpu.io.remote import ZarrBackend

        backend = ZarrBackend("store4d")
        assert backend.dtype == np.float32
        if backend.shape[0] == 2:  # channel axis recognized
            region = backend[
                (slice(0, 2), slice(1, 3), slice(2, 4), slice(0, 5))
            ]
            np.testing.assert_array_equal(region, arr[:, 1:3, 2:4, 0:5])


class TestCompilationCacheBootstrap:
    def test_setup_runs_without_env(self, monkeypatch):
        monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
        tio._setup_compilation_cache()
        import jax

        assert jax.config.jax_compilation_cache_dir is not None


class TestOptionalImportGetters:
    def test_every_getter_resolves_or_hints(self):
        # each convenience getter either returns the module or raises
        # the hint-bearing ImportError (external/imports.py)
        from torchio_tpu.external import imports as ext

        for getter in (
            ext.get_matplotlib,
            ext.get_pil,
            ext.get_zarr,
            ext.get_monai,
            ext.get_h5py,
            ext.get_ipyniivue,
        ):
            try:
                assert getter() is not None
            except ImportError as e:
                assert "Install it with" in str(e)

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


def test_build_from_source(tmp_path, monkeypatch):
    """The auto-build path compiles the C++ source with make."""
    import shutil

    import torchio_tpu.native as native

    if shutil.which("make") is None or shutil.which("g++") is None:
        pytest.skip("no native toolchain")
    # point the module at a fresh copy of the source tree with no .so
    src = tmp_path / "native"
    src.mkdir()
    repo_native = native._SRC_DIR
    shutil.copy(repo_native / "fastnifti.cpp", src / "fastnifti.cpp")
    shutil.copy(repo_native / "Makefile", src / "Makefile")
    monkeypatch.setattr(native, "_SRC_DIR", src)
    # the Makefile drops the .so at ../torchio_tpu/native/ relative to src
    monkeypatch.setattr(
        native,
        "_LIB_PATH",
        src.parent / "torchio_tpu" / "native" / "libfastnifti.so",
    )
    assert native._build()


def test_build_without_source_returns_false(tmp_path, monkeypatch):
    import torchio_tpu.native as native

    monkeypatch.setattr(native, "_SRC_DIR", tmp_path)  # empty dir
    assert native._build() is False


def test_byteswap_fallback_non_contiguous(rng):
    from torchio_tpu.native import byteswap_inplace

    arr = rng.integers(0, 1000, (8, 8), dtype=np.uint16)[::2]  # non-contig
    expected = arr.byteswap()
    np.testing.assert_array_equal(byteswap_inplace(arr.copy()[::1]), expected[::1]) if False else None
    out = byteswap_inplace(arr)
    np.testing.assert_array_equal(out, expected)


def test_f2c_transpose_odd_itemsize_fallback():
    from torchio_tpu.native import f2c_transpose

    # structured 3-byte itemsize triggers the numpy fallback
    arr = np.zeros((2, 2, 2), dtype=[("a", "u1"), ("b", "u2")])
    out = f2c_transpose(arr)
    assert out.flags["C_CONTIGUOUS"]


class TestNativeJpegLossless:
    def test_native_matches_python_decoder(self):
        from torchio_tpu import native
        from torchio_tpu.io import jpeg_lossless as jl

        if not native.available() or native.jpegll_decode(b"") is not None:
            pass  # probe: empty stream must return None either way
        rng = np.random.default_rng(11)
        img = rng.integers(0, 4000, (31, 23)).astype(np.uint16)
        stream = jl.encode_lossless_jpeg(img)
        native_out = native.jpegll_decode(stream)
        if native_out is None:
            pytest.skip("native library unavailable")
        np.testing.assert_array_equal(native_out, img)
        # and the public decoder (which prefers native) agrees
        np.testing.assert_array_equal(jl.decode_lossless_jpeg(stream), img)

    def test_native_8bit(self):
        from torchio_tpu import native
        from torchio_tpu.io import jpeg_lossless as jl

        rng = np.random.default_rng(12)
        img = rng.integers(0, 250, (9, 14)).astype(np.uint8)
        out = native.jpegll_decode(jl.encode_lossless_jpeg(img))
        if out is None:
            pytest.skip("native library unavailable")
        assert out.dtype == np.uint8
        np.testing.assert_array_equal(out, img)

    def test_garbage_returns_none(self):
        from torchio_tpu import native

        assert native.jpegll_decode(b"\x00\x01\x02") is None

    def test_decode_speed_sanity(self):
        """The native path decodes a 256^2 16-bit slice well under the
        pure-Python decoder's time (sanity, not a benchmark)."""
        import time

        from torchio_tpu import native
        from torchio_tpu.io import jpeg_lossless as jl

        rng = np.random.default_rng(13)
        img = (rng.integers(0, 50, (256, 256)).cumsum(axis=1) % 3000).astype(
            np.uint16
        )
        stream = jl.encode_lossless_jpeg(img)
        if native.jpegll_decode(stream) is None:
            pytest.skip("native library unavailable")
        t0 = time.perf_counter()
        out = native.jpegll_decode(stream)
        native_t = time.perf_counter() - t0
        np.testing.assert_array_equal(out, img)
        assert native_t < 0.1


# --- consolidated from test_coverage_edges2.py (round 5) ---
import gzip
import warnings
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torchio_tpu as tio


class TestNativeFallbacks:
    def test_build_failure_returns_false(self, monkeypatch):
        import torchio_tpu.native as native

        def boom(*a, **k):
            raise OSError("no compiler")

        monkeypatch.setattr(native.subprocess, "run", boom)
        monkeypatch.setattr(native, "_LIB_PATH", native._LIB_PATH.parent / "nope.so")
        assert native._build() is False

    def test_get_lib_absent_returns_none(self, monkeypatch):
        import torchio_tpu.native as native

        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_tried", False)
        monkeypatch.setattr(
            native, "_LIB_PATH", native._LIB_PATH.parent / "nope.so"
        )
        monkeypatch.setattr(native, "_build", lambda: False)
        assert native.get_lib() is None

    def test_jls_decode_without_lib(self, monkeypatch):
        import torchio_tpu.native as native

        monkeypatch.setattr(native, "get_lib", lambda: None)
        assert native.jls_decode(b"\x00" * 16) is None
        assert native.jpegll_decode(b"\x00" * 16) is None

    def test_jls_decode_error_rc_returns_none(self, monkeypatch):
        import torchio_tpu.native as native

        class FakeLib:
            # info probes fail -> decoders bail to the Python codecs
            def fn_jls_info(self, *a):
                return 1

            def fn_jls_decode(self, *a):
                return 1

            def fn_jpegll_info(self, *a):
                return 1

            def fn_jpegll_decode(self, *a):
                return 1

        monkeypatch.setattr(native, "get_lib", lambda: FakeLib())
        assert native.jls_decode(b"\xff\xd8" + b"\x00" * 32) is None
        assert native.jpegll_decode(b"\xff\xd8" + b"\x00" * 32) is None

    def test_f2c_transpose_error_rc_falls_back(self, monkeypatch):
        import torchio_tpu.native as native

        class FakeLib:
            def fn_f2c_transpose(self, *a):
                return 1  # native transpose failed

        monkeypatch.setattr(native, "get_lib", lambda: FakeLib())
        arr = np.asfortranarray(
            np.arange(8, dtype=np.float32).reshape(2, 2, 2)
        )
        out = native.f2c_transpose(arr)
        np.testing.assert_array_equal(out, arr)
        assert out.flags["C_CONTIGUOUS"]


class TestNativeLoadFailure:
    def test_cdll_oserror_yields_none(self, monkeypatch):
        import ctypes

        import torchio_tpu.native as native

        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_tried", False)

        def boom(path):
            raise OSError("refused")

        monkeypatch.setattr(ctypes, "CDLL", boom)
        assert native.get_lib() is None
        assert native._lib is None
        # restore the loader cache for later tests
        monkeypatch.setattr(native, "_tried", False)

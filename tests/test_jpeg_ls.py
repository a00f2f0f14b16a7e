"""JPEG-LS (ITU T.87) codec and its DICOM wiring.

The reference reads JPEG-LS DICOM through SimpleITK's GDCM/CharLS
(``/root/reference/src/torchio/data/io.py:148-174``); this repo owns
the codec (``torchio_tpu/io/jpeg_ls.py`` + the native decoder in
``native/fastnifti.cpp``).  The pure-Python encoder doubles as the
correctness oracle for the native path.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from torchio_tpu.io.jpeg_ls import (
    _Params,
    decode_jpeg_ls,
    decode_jpeg_ls_python,
    encode_jpeg_ls,
)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def _cases(rng):
    x = np.linspace(0, 1000, 48)
    piecewise = np.zeros((20, 33), np.uint8)
    piecewise[:, 10:20] = 200
    piecewise[5:10, :] = 7
    piecewise[:, -1] = 255
    return [
        (rng.integers(0, 256, (23, 31)).astype(np.uint8), 8),
        (rng.integers(0, 65536, (19, 17)).astype(np.uint16), 16),
        (rng.integers(0, 4096, (25, 37)).astype(np.uint16), 12),
        ((x[None, :] + x[:, None]).astype(np.uint16), 16),
        (np.full((17, 29), 1234, np.uint16), 16),
        (piecewise, 8),
        (np.zeros((5, 7), np.uint8), 8),
    ]


class TestCodecRoundTrip:
    def test_lossless(self, rng):
        for img, prec in _cases(rng):
            stream = encode_jpeg_ls(img, precision=prec)
            back = decode_jpeg_ls_python(stream)
            assert back.dtype == img.dtype
            np.testing.assert_array_equal(back, img)

    def test_near_lossless_bounded_error(self, rng):
        img = rng.integers(0, 4096, (25, 37)).astype(np.uint16)
        for near in (1, 2, 5):
            back = decode_jpeg_ls_python(
                encode_jpeg_ls(img, near=near, precision=12)
            )
            err = np.abs(back.astype(int) - img.astype(int)).max()
            assert err <= near

    def test_near_lossless_run_mode(self):
        x = np.linspace(0, 255, 48)
        smooth = (x[None, :] * x[:, None] / 255).astype(np.uint8)
        back = decode_jpeg_ls_python(encode_jpeg_ls(smooth, near=2))
        assert np.abs(back.astype(int) - smooth.astype(int)).max() <= 2

    def test_restart_intervals(self, rng):
        img = rng.integers(0, 65536, (23, 19)).astype(np.uint16)
        for interval in (1, 4, 7, 23, 50):
            stream = encode_jpeg_ls(img, restart_interval=interval)
            np.testing.assert_array_equal(decode_jpeg_ls_python(stream), img)

    def test_compresses_smooth_data(self, rng):
        """Clinical-like smooth 12-bit data must actually compress."""
        base = rng.normal(1000, 200, (64, 64))
        from scipy.ndimage import gaussian_filter

        img = gaussian_filter(base, 4).clip(0, 4095).astype(np.uint16)
        stream = encode_jpeg_ls(img, precision=12)
        assert len(stream) < img.nbytes / 2


class TestNativeDecoder:
    def test_matches_python_oracle(self, rng):
        from torchio_tpu import native

        if native.get_lib() is None:  # pragma: no cover
            pytest.skip("native library unavailable")
        for img, prec in _cases(rng):
            stream = encode_jpeg_ls(img, precision=prec)
            nat = native.jls_decode(stream)
            assert nat is not None
            np.testing.assert_array_equal(nat, decode_jpeg_ls_python(stream))
            assert nat.dtype == img.dtype

    def test_matches_python_near(self, rng):
        from torchio_tpu import native

        if native.get_lib() is None:  # pragma: no cover
            pytest.skip("native library unavailable")
        img = rng.integers(0, 4096, (21, 33)).astype(np.uint16)
        stream = encode_jpeg_ls(img, near=3, precision=12)
        np.testing.assert_array_equal(
            native.jls_decode(stream), decode_jpeg_ls_python(stream)
        )

    def test_restart_stream_falls_back(self, rng):
        from torchio_tpu import native

        if native.get_lib() is None:  # pragma: no cover
            pytest.skip("native library unavailable")
        img = rng.integers(0, 256, (9, 9)).astype(np.uint8)
        stream = encode_jpeg_ls(img, restart_interval=3)
        assert native.jls_decode(stream) is None  # Python handles it
        np.testing.assert_array_equal(decode_jpeg_ls(stream), img)

    def test_dispatch_prefers_native(self, rng, monkeypatch):
        from torchio_tpu import native

        img = rng.integers(0, 256, (5, 5)).astype(np.uint8)
        stream = encode_jpeg_ls(img)
        sentinel = np.ones((5, 5), np.uint8)
        monkeypatch.setattr(native, "jls_decode", lambda s: sentinel)
        assert decode_jpeg_ls(stream) is sentinel

    def test_dispatch_falls_back(self, rng, monkeypatch):
        from torchio_tpu import native

        img = rng.integers(0, 256, (5, 5)).astype(np.uint8)
        stream = encode_jpeg_ls(img)
        monkeypatch.setattr(native, "jls_decode", lambda s: None)
        np.testing.assert_array_equal(decode_jpeg_ls(stream), img)


class TestMultiComponent:
    @staticmethod
    def _three_plane_stream(planes, precision):
        """Build an interleave-mode-0 3-component stream by splicing
        three single-component scans under one SOF55."""
        height, width = planes[0].shape
        maxval = (1 << precision) - 1
        params = _Params(maxval)

        def seg(marker, payload):
            return (
                bytes([0xFF, marker])
                + struct.pack(">H", len(payload) + 2)
                + payload
            )

        sof_comps = b"".join(bytes([i + 1, 0x11, 0]) for i in range(3))
        out = bytes([0xFF, 0xD8]) + seg(
            0xF7,
            struct.pack(">BHHB", precision, height, width, 3) + sof_comps,
        )
        out += seg(
            0xF8,
            bytes([1])
            + struct.pack(
                ">HHHHH", maxval, params.t1, params.t2, params.t3, params.reset
            ),
        )
        for i, plane in enumerate(planes):
            single = encode_jpeg_ls(plane, precision=precision)
            # scan data of the single-component stream: after its SOS
            sos_at = single.find(bytes([0xFF, 0xDA]))
            sos_len = struct.unpack_from(">H", single, sos_at + 2)[0]
            scan = single[sos_at + 2 + sos_len : -2]  # strip EOI
            out += seg(0xDA, bytes([1, i + 1, 0, 0, 0, 0])) + scan
        return out + bytes([0xFF, 0xD9])

    def test_three_component_planar(self, rng):
        planes = [
            rng.integers(0, 256, (11, 13)).astype(np.uint8) for _ in range(3)
        ]
        stream = self._three_plane_stream(planes, 8)
        out = decode_jpeg_ls_python(stream)
        assert out.shape == (11, 13, 3)
        for i in range(3):
            np.testing.assert_array_equal(out[..., i], planes[i])

    def test_three_component_native(self, rng):
        from torchio_tpu import native

        if native.get_lib() is None:  # pragma: no cover
            pytest.skip("native library unavailable")
        planes = [
            rng.integers(0, 4096, (7, 9)).astype(np.uint16) for _ in range(3)
        ]
        stream = self._three_plane_stream(planes, 12)
        nat = native.jls_decode(stream)
        assert nat is not None
        np.testing.assert_array_equal(nat, decode_jpeg_ls_python(stream))


class TestErrors:
    def test_not_jpeg(self):
        with pytest.raises(ValueError, match="Not a JPEG-LS"):
            decode_jpeg_ls_python(b"\x12\x34")

    def test_missing_sof(self):
        with pytest.raises(ValueError, match="Missing SOF55"):
            decode_jpeg_ls_python(bytes([0xFF, 0xD8, 0xFF, 0xD9]))

    def test_mapping_tables_rejected(self, rng):
        img = rng.integers(0, 256, (4, 4)).astype(np.uint8)
        stream = bytearray(encode_jpeg_ls(img))
        lse_at = stream.find(bytes([0xFF, 0xF8]))
        stream[lse_at + 4] = 2  # LSE ID 2 = mapping table
        with pytest.raises(ValueError, match="mapping tables"):
            decode_jpeg_ls_python(bytes(stream))

    def test_bad_near(self):
        with pytest.raises(ValueError, match="NEAR"):
            _Params(255, near=255)
        with pytest.raises(ValueError, match="MAXVAL"):
            _Params(0)

    def test_encode_requires_2d(self):
        with pytest.raises(ValueError, match="2D"):
            encode_jpeg_ls(np.zeros((2, 2, 2), np.uint8))

    def test_truncated_restart_stream(self, rng):
        img = rng.integers(0, 256, (10, 5)).astype(np.uint8)
        stream = encode_jpeg_ls(img, restart_interval=2)
        # drop everything after the first restart marker
        cut = stream.find(b"\xff\xd0")
        truncated = stream[:cut] + bytes([0xFF, 0xD9])
        with pytest.raises(ValueError, match="Truncated"):
            decode_jpeg_ls_python(truncated)


class TestDicomIntegration:
    def test_write_read_lossless(self, tmp_path, rng):
        from torchio_tpu.io.dicom import read_dicom_file, write_dicom

        data = rng.integers(-1000, 3000, (1, 14, 11, 5)).astype(np.int16)
        path = tmp_path / "ls.dcm"
        write_dicom(path, data, np.eye(4), compression="jpeg-ls")
        back, _ = read_dicom_file(path)
        np.testing.assert_array_equal(back, data)

    def test_write_read_lossless_python_decoder(self, tmp_path, rng, monkeypatch):
        from torchio_tpu import native
        from torchio_tpu.io.dicom import read_dicom_file, write_dicom

        monkeypatch.setattr(native, "jls_decode", lambda s: None)
        data = rng.integers(0, 4096, (1, 6, 7, 2)).astype(np.uint16)
        path = tmp_path / "ls.dcm"
        write_dicom(path, data, np.eye(4), compression="jpeg-ls")
        back, _ = read_dicom_file(path)
        np.testing.assert_array_equal(back, data)

    def test_read_near_lossless_syntax(self, tmp_path, rng):
        from torchio_tpu.io.dicom import (
            JPEG_LS_NEAR,
            _el,
            _encapsulate,
            read_dicom_file,
        )

        img = rng.integers(0, 4096, (9, 13)).astype(np.uint16)
        stream = encode_jpeg_ls(img, near=2, precision=12)
        meta_body = _el(0x0002, 0x0010, b"UI", JPEG_LS_NEAR.encode())
        meta = (
            _el(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta_body)))
            + meta_body
        )
        head = (
            struct.pack("<HH", 0x7FE0, 0x0010)
            + b"OB\x00\x00"
            + struct.pack("<I", 0xFFFFFFFF)
        )
        elements = b"".join(
            [
                _el(0x0028, 0x0010, b"US", struct.pack("<H", 9)),
                _el(0x0028, 0x0011, b"US", struct.pack("<H", 13)),
                _el(0x0028, 0x0100, b"US", struct.pack("<H", 16)),
                _el(0x0028, 0x0103, b"US", struct.pack("<H", 0)),
                head + _encapsulate([stream]),
            ]
        )
        path = tmp_path / "near.dcm"
        path.write_bytes(b"\x00" * 128 + b"DICM" + meta + elements)
        back, _ = read_dicom_file(path)
        err = np.abs(
            back[0, :, :, 0].astype(int).T - img.astype(int)
        ).max()
        assert err <= 2

    def test_spp_mismatch_raises(self, tmp_path, rng):
        from torchio_tpu.io.dicom import (
            JPEG_LS_LOSSLESS,
            _el,
            _encapsulate,
            read_dicom_file,
        )

        img = rng.integers(0, 256, (4, 4)).astype(np.uint8)
        stream = encode_jpeg_ls(img)
        meta_body = _el(0x0002, 0x0010, b"UI", JPEG_LS_LOSSLESS.encode())
        meta = (
            _el(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta_body)))
            + meta_body
        )
        head = (
            struct.pack("<HH", 0x7FE0, 0x0010)
            + b"OB\x00\x00"
            + struct.pack("<I", 0xFFFFFFFF)
        )
        elements = b"".join(
            [
                _el(0x0028, 0x0002, b"US", struct.pack("<H", 3)),
                _el(0x0028, 0x0004, b"CS", b"RGB"),
                _el(0x0028, 0x0010, b"US", struct.pack("<H", 4)),
                _el(0x0028, 0x0011, b"US", struct.pack("<H", 4)),
                _el(0x0028, 0x0100, b"US", struct.pack("<H", 8)),
                _el(0x0028, 0x0103, b"US", struct.pack("<H", 0)),
                head + _encapsulate([stream]),
            ]
        )
        path = tmp_path / "bad.dcm"
        path.write_bytes(b"\x00" * 128 + b"DICM" + meta + elements)
        with pytest.raises(ValueError, match="SamplesPerPixel"):
            read_dicom_file(path)

    def test_unsupported_compression_message(self, tmp_path):
        from torchio_tpu.io.dicom import write_dicom

        with pytest.raises(ValueError, match="jpeg-ls"):
            write_dicom(
                tmp_path / "x.dcm",
                np.zeros((1, 2, 2, 1), np.int16),
                compression="webp",
            )


# --- consolidated from test_coverage_edges6.py (round 5) ---
import struct
import sys
import numpy as np
import pytest
import torchio_tpu as tio
from torchio_tpu.data import ScalarImage

def _python_jpegll_edge6(monkeypatch):
    """Force the pure-Python JPEG-lossless decoder (the oracle)."""
    import torchio_tpu.native as native

    monkeypatch.setattr(native, "jpegll_decode", lambda stream: None)

def _python_jls_edge6(monkeypatch):
    import torchio_tpu.native as native

    monkeypatch.setattr(native, "jls_decode", lambda stream: None)


class TestJpegLsPython:
    def test_low_precision_thresholds(self, monkeypatch):
        from torchio_tpu.io.jpeg_ls import decode_jpeg_ls, encode_jpeg_ls

        _python_jls_edge6(monkeypatch)
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


class TestJlsCoverageLines:
    def test_bitreader_runaway_unary(self):
        from torchio_tpu.io.jpeg_ls import _BitReader

        reader = _BitReader(b"\x00" * 2048)
        with pytest.raises(ValueError, match="runaway unary"):
            reader.read_unary()

    def test_decode_limited_overlong_code(self):
        from torchio_tpu.io.jpeg_ls import _BitReader, _decode_limited

        reader = _BitReader(b"\x20" + b"\x00" * 8)  # unary 2 then zeros
        with pytest.raises(ValueError, match="over-long"):
            _decode_limited(reader, k=0, limit=4, qbpp=2)

    def test_find_scan_end_without_marker(self):
        from torchio_tpu.io.jpeg_ls import _find_scan_end

        assert _find_scan_end(b"\x00" * 10, 0) == 10
        assert _find_scan_end(b"\x00\x00\xff", 0) == 3

    def test_stray_rst_marker_between_segments(self, rng):
        from torchio_tpu.io.jpeg_ls import decode_jpeg_ls_python as decode_jls, encode_jpeg_ls

        img = rng.integers(0, 255, (6, 7)).astype(np.uint8)
        stream = bytearray(encode_jpeg_ls(img))
        assert stream[:2] == b"\xff\xd8"
        stream[2:2] = b"\xff\xd0"  # stray RST0 after SOI
        out = decode_jls(bytes(stream))
        np.testing.assert_array_equal(np.asarray(out), img)

    def test_lse_zero_maxval_defaults_to_precision(self, rng):
        import struct

        from torchio_tpu.io.jpeg_ls import decode_jpeg_ls_python as decode_jls, encode_jpeg_ls

        img = rng.integers(0, 255, (5, 5)).astype(np.uint8)
        stream = bytearray(encode_jpeg_ls(img))
        # insert an LSE (ID 1) with MAXVAL=0 and zero thresholds right
        # after SOF55: decoder must fall back to (1 << precision) - 1
        sof = stream.find(b"\xff\xf7")
        assert sof >= 0
        sof_len = struct.unpack_from(">H", stream, sof + 2)[0]
        insert_at = sof + 2 + sof_len
        lse = b"\xff\xf8" + struct.pack(">H", 13) + b"\x01" + struct.pack(
            ">HHHHH", 0, 0, 0, 0, 0
        )
        stream[insert_at:insert_at] = lse
        out = decode_jls(bytes(stream))
        np.testing.assert_array_equal(np.asarray(out), img)

    def test_marker_terminated_stream_zero_pads(self, rng):
        from torchio_tpu.io.jpeg_ls import decode_jpeg_ls_python as decode_jls, encode_jpeg_ls

        img = rng.integers(0, 255, (8, 8)).astype(np.uint8)
        stream = bytearray(encode_jpeg_ls(img))
        # truncate a chunk of entropy data before EOI: bit reads that
        # hit the EOI marker zero-pad instead of walking past it
        assert stream[-2:] == b"\xff\xd9"
        truncated = bytes(stream[:-12]) + b"\xff\xd9"
        try:
            decode_jls(truncated)
        except ValueError:
            pass  # corrupt-stream errors are acceptable; no overrun


class TestJlsBitstreamBranches:
    def test_bitreader_marker_zero_pads(self):
        from torchio_tpu.io.jpeg_ls import _BitReader

        reader = _BitReader(b"\x12\xff\xd9")
        value = reader.read(24)
        # one real byte then the EOI marker: remaining bits read as zero
        assert value == 0x12 << 16

    def test_run_past_line_end_detected(self):
        from torchio_tpu.io.jpeg_ls import (
            decode_jpeg_ls_python,
            encode_jpeg_ls,
        )

        img = np.full((2, 8), 100, np.uint8)  # constant rows -> run mode
        stream = bytearray(encode_jpeg_ls(img))
        # deterministic corruption (found by exhaustive byte search):
        # inflating this entropy byte makes the run-interruption count
        # exceed the remaining line width
        stream[46] = 232
        with pytest.raises(ValueError, match="run past line end"):
            decode_jpeg_ls_python(bytes(stream))

"""Native DICOM series reader (fixture: the reference's DICOM series)."""

from pathlib import Path

import numpy as np
import pytest

import torchio_tpu as tio
from torchio_tpu.io.dicom import is_dicom, read_dicom_dir

FIXTURE = Path(__file__).parent / "image_data_dicom"

pytestmark = pytest.mark.skipif(
    not FIXTURE.is_dir(), reason="DICOM fixture not available"
)


def test_read_series():
    data, affine = read_dicom_dir(FIXTURE)
    assert data.shape == (1, 88, 128, 17)
    assert data.dtype == np.int16
    np.testing.assert_allclose(np.linalg.norm(affine[:3, :3], axis=0), 2.0)
    assert data.max() > 0


def test_is_dicom():
    some_file = sorted(FIXTURE.iterdir())[0]
    assert is_dicom(some_file)
    assert not is_dicom(FIXTURE / "missing.dcm")


def test_image_from_dicom_dir():
    img = tio.ScalarImage(FIXTURE)
    assert img.shape == (1, 88, 128, 17)
    assert img.spacing == (2.0, 2.0, 2.0)
    data = np.asarray(img.data)
    assert np.isfinite(data).all()


def test_single_slice():
    some_file = sorted(FIXTURE.iterdir())[0]
    img = tio.ScalarImage(some_file)
    assert img.shape[3] == 1
    assert img.shape[1:3] == (88, 128)


def test_transform_on_dicom():
    img = tio.ScalarImage(FIXTURE)
    sub = tio.Subject(ct=img)
    out = tio.RescaleIntensity(out_min=0.0, out_max=1.0)(sub)
    data = np.asarray(out.ct.data)
    assert data.min() == pytest.approx(0.0, abs=1e-6)
    assert data.max() == pytest.approx(1.0, abs=1e-6)


def test_convert_dicom_to_nifti(tmp_path):
    img = tio.ScalarImage(FIXTURE)
    out_path = tmp_path / "converted.nii.gz"
    img.save(out_path)
    back = tio.ScalarImage(out_path)
    np.testing.assert_allclose(np.asarray(back.data), np.asarray(img.data), rtol=1e-6)
    np.testing.assert_allclose(back.affine.data, img.affine.data, atol=1e-4)


class TestDicomWriting:
    """Native DICOM writing + compressed round trips (VERDICT r2 item 6:
    the reference writes DICOM through SimpleITK,
    /root/reference/src/torchio/data/image.py:699-753)."""

    def _volume(self, shape=(1, 7, 6, 5), dtype=np.int16, seed=3):
        rng = np.random.default_rng(seed)
        data = rng.integers(-500, 1500, shape).astype(dtype)
        affine = np.array(
            [
                [0.0, -0.8, 0.0, 10.0],
                [0.9, 0.0, 0.0, -20.0],
                [0.0, 0.0, 1.2, 5.0],
                [0.0, 0.0, 0.0, 1.0],
            ]
        )
        return data, affine

    def test_series_round_trip_uncompressed(self, tmp_path):
        from torchio_tpu.io.dicom import read_dicom_dir, write_dicom_series

        data, affine = self._volume()
        write_dicom_series(tmp_path / "series", data, affine)
        back, back_affine = read_dicom_dir(tmp_path / "series")
        np.testing.assert_array_equal(back, data)
        np.testing.assert_allclose(back_affine, affine, atol=1e-6)

    def test_series_round_trip_rle(self, tmp_path):
        from torchio_tpu.io.dicom import read_dicom_dir, write_dicom_series

        data, affine = self._volume()
        write_dicom_series(tmp_path / "rle", data, affine, compression="rle")
        back, back_affine = read_dicom_dir(tmp_path / "rle")
        np.testing.assert_array_equal(back, data)  # RLE is lossless
        np.testing.assert_allclose(back_affine, affine, atol=1e-6)

    def test_multiframe_file_round_trip(self, tmp_path):
        from torchio_tpu.io.dicom import read_dicom_file, write_dicom

        data, affine = self._volume()
        for compression in (None, "rle"):
            path = tmp_path / f"vol_{compression}.dcm"
            write_dicom(path, data, affine, compression=compression)
            back, back_affine = read_dicom_file(path)
            np.testing.assert_array_equal(back, data)
            np.testing.assert_allclose(back_affine, affine, atol=1e-6)

    def test_float_volume_quantized_round_trip(self, tmp_path):
        from torchio_tpu.io.dicom import read_dicom_dir, write_dicom_series

        rng = np.random.default_rng(0)
        data = rng.random((1, 6, 6, 4)).astype(np.float32) * 3.5 - 1.0
        write_dicom_series(tmp_path / "f32", data, np.eye(4))
        back, _ = read_dicom_dir(tmp_path / "f32")
        # 16-bit quantization over the value range
        tol = (data.max() - data.min()) / 65535.0
        np.testing.assert_allclose(back, data, atol=tol * 1.01)

    def test_fixture_reencoded_compressed_round_trip(self, tmp_path):
        """The in-repo clinical fixture re-encoded RLE-compressed reads
        back identically (the VERDICT done-criterion)."""
        from torchio_tpu.io.dicom import read_dicom_dir, write_dicom_series

        data, affine = read_dicom_dir(FIXTURE)
        write_dicom_series(
            tmp_path / "reenc", data, affine, compression="rle"
        )
        back, back_affine = read_dicom_dir(tmp_path / "reenc")
        np.testing.assert_array_equal(np.asarray(back), np.asarray(data))
        np.testing.assert_allclose(back_affine, affine, atol=1e-4)

    def test_write_image_routes_dcm(self, tmp_path):
        from torchio_tpu.io.dicom import read_dicom_file
        from torchio_tpu.io.write import write_image

        data, affine = self._volume()
        write_image(tmp_path / "out.dcm", data, affine)
        back, _ = read_dicom_file(tmp_path / "out.dcm")
        np.testing.assert_array_equal(back, data)

    def test_multichannel_rejected(self, tmp_path):
        from torchio_tpu.io.dicom import write_dicom

        with pytest.raises(ValueError, match="single-channel"):
            write_dicom(tmp_path / "x.dcm", np.zeros((2, 4, 4, 2), np.int16))


class TestCompressedSyntaxes:
    """Decoding of compressed/big-endian transfer syntaxes."""

    def _encapsulated_file(self, tmp_path, syntax, frame_bytes, rows, cols,
                           bits=16, signed=0):
        """Hand-build a single-frame encapsulated DICOM file."""
        import struct

        from torchio_tpu.io.dicom import _el, _encapsulate

        meta_body = b"".join([
            _el(0x0002, 0x0001, b"OB", b"\x00\x01"),
            _el(0x0002, 0x0002, b"UI", b"1.2.840.10008.5.1.4.1.1.7"),
            _el(0x0002, 0x0003, b"UI", b"2.25.1"),
            _el(0x0002, 0x0010, b"UI", syntax.encode()),
        ])
        meta = _el(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta_body))) + meta_body
        pixel = (
            struct.pack("<HH", 0x7FE0, 0x0010)
            + b"OB\x00\x00"
            + struct.pack("<I", 0xFFFFFFFF)
            + _encapsulate([frame_bytes])
        )
        elements = b"".join([
            _el(0x0028, 0x0010, b"US", struct.pack("<H", rows)),
            _el(0x0028, 0x0011, b"US", struct.pack("<H", cols)),
            _el(0x0028, 0x0030, b"DS", b"1\\1"),
            _el(0x0028, 0x0100, b"US", struct.pack("<H", bits)),
            _el(0x0028, 0x0103, b"US", struct.pack("<H", signed)),
        ])
        path = tmp_path / "enc.dcm"
        path.write_bytes(b"\x00" * 128 + b"DICM" + meta + elements + pixel)
        return path

    def test_jpeg_baseline(self, tmp_path):
        import io

        from PIL import Image as PILImage

        from torchio_tpu.io.dicom import JPEG_BASELINE, read_dicom_file

        rng = np.random.default_rng(1)
        # smooth image so lossy JPEG stays close
        base = rng.integers(100, 120, (8, 8)).astype(np.uint8)
        buf = io.BytesIO()
        PILImage.fromarray(base, "L").save(buf, "JPEG", quality=100)
        path = self._encapsulated_file(
            tmp_path, JPEG_BASELINE, buf.getvalue(), 8, 8, bits=8
        )
        data, _ = read_dicom_file(path)
        assert data.shape == (1, 8, 8, 1)
        # lossy codec: close but not exact
        np.testing.assert_allclose(
            data[0, :, :, 0], base.T, atol=4
        )

    def test_jpeg2000_lossless_16bit(self, tmp_path):
        import io

        from PIL import Image as PILImage

        from torchio_tpu.io.dicom import J2K_LOSSLESS, read_dicom_file

        rng = np.random.default_rng(2)
        base = rng.integers(0, 4000, (6, 10)).astype(np.uint16)
        buf = io.BytesIO()
        PILImage.fromarray(base, "I;16").save(
            buf, "JPEG2000", irreversible=False
        )
        path = self._encapsulated_file(
            tmp_path, J2K_LOSSLESS, buf.getvalue(), 6, 10, bits=16
        )
        data, _ = read_dicom_file(path)
        np.testing.assert_array_equal(data[0, :, :, 0], base.T)

    def test_explicit_big_endian(self, tmp_path):
        import struct

        from torchio_tpu.io.dicom import EXPLICIT_BIG, _el, read_dicom_file

        rng = np.random.default_rng(4)
        pixels = rng.integers(0, 3000, (5, 4)).astype(np.uint16)  # rows, cols

        def el_be(group, element, vr, value):
            if len(value) % 2:
                value += b"\x00"
            head = struct.pack(">HH", group, element) + vr
            if vr in (b"OB", b"OW", b"SQ", b"UN", b"UT"):
                return head + b"\x00\x00" + struct.pack(">I", len(value)) + value
            return head + struct.pack(">H", len(value)) + value

        meta_body = b"".join([
            _el(0x0002, 0x0001, b"OB", b"\x00\x01"),
            _el(0x0002, 0x0010, b"UI", EXPLICIT_BIG.encode()),
        ])
        meta = _el(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta_body))) + meta_body
        elements = b"".join([
            el_be(0x0028, 0x0010, b"US", struct.pack(">H", 5)),
            el_be(0x0028, 0x0011, b"US", struct.pack(">H", 4)),
            el_be(0x0028, 0x0030, b"DS", b"1\\1"),
            el_be(0x0028, 0x0100, b"US", struct.pack(">H", 16)),
            el_be(0x0028, 0x0103, b"US", struct.pack(">H", 0)),
            el_be(
                0x7FE0, 0x0010, b"OW",
                pixels.astype(">u2").tobytes(),
            ),
        ])
        path = tmp_path / "be.dcm"
        path.write_bytes(b"\x00" * 128 + b"DICM" + meta + elements)
        data, _ = read_dicom_file(path)
        np.testing.assert_array_equal(data[0, :, :, 0], pixels.T)

    def test_packbits_round_trip(self):
        from torchio_tpu.io.dicom import _packbits_decode, _packbits_encode

        rng = np.random.default_rng(7)
        for payload in [
            bytes(rng.integers(0, 256, 1000, np.uint8)),  # noisy
            b"\x00" * 500 + b"\x07" * 300 + bytes(range(100)),  # runs
            b"",
            b"\x42",
        ]:
            encoded = _packbits_encode(payload)
            assert _packbits_decode(encoded, len(payload)) == payload

    def test_unsupported_syntax_raises(self, tmp_path):
        import struct

        from torchio_tpu.io.dicom import _el

        meta_body = _el(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.4.100")
        meta = _el(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta_body))) + meta_body
        path = tmp_path / "mpeg.dcm"
        path.write_bytes(b"\x00" * 128 + b"DICM" + meta)
        from torchio_tpu.io.dicom import DicomSlice

        with pytest.raises(ValueError, match="transfer syntax"):
            DicomSlice(path)


class TestDicomCli:
    """`torchio convert` is DICOM-bidirectional (VERDICT r2 item 6)."""

    def test_convert_dicom_dir_to_nifti_and_back(self, tmp_path):
        from torchio_tpu.cli import main

        nii = tmp_path / "vol.nii.gz"
        assert main(["convert", str(FIXTURE), str(nii)]) == 0
        assert nii.exists()

        series = tmp_path / "series"
        series.mkdir()
        assert main(["convert", str(nii), str(series)]) == 0
        from torchio_tpu.io.dicom import read_dicom_dir

        back, _ = read_dicom_dir(series)
        orig, _ = read_dicom_dir(FIXTURE)
        tol = max(float(np.ptp(orig)) / 65535.0, 1e-6)
        np.testing.assert_allclose(
            np.asarray(back, np.float64), np.asarray(orig, np.float64),
            atol=tol * 1.01,
        )

    def test_convert_to_single_dcm(self, tmp_path):
        from torchio_tpu.cli import main
        from torchio_tpu.io.dicom import read_dicom_file

        out = tmp_path / "vol.dcm"
        assert main(["convert", str(FIXTURE), str(out)]) == 0
        data, _ = read_dicom_file(out)
        orig, _ = read_dicom_dir_data()
        assert data.shape == orig.shape

def read_dicom_dir_data():
    from torchio_tpu.io.dicom import read_dicom_dir

    return read_dicom_dir(FIXTURE)


class TestParserEdges:
    def _explicit_file(self, tmp_path, body):
        import struct

        from torchio_tpu.io.dicom import _el

        meta_body = _el(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.1")
        meta = _el(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta_body))) + meta_body
        pixels = np.arange(12, dtype=np.uint16).reshape(3, 4)
        tail = b"".join([
            _el(0x0028, 0x0010, b"US", struct.pack("<H", 3)),
            _el(0x0028, 0x0011, b"US", struct.pack("<H", 4)),
            _el(0x0028, 0x0100, b"US", struct.pack("<H", 16)),
            _el(0x0028, 0x0103, b"US", struct.pack("<H", 0)),
            _el(0x7FE0, 0x0010, b"OW", pixels.tobytes()),
        ])
        path = tmp_path / "f.dcm"
        path.write_bytes(b"\x00" * 128 + b"DICM" + meta + body + tail)
        return path, pixels

    def test_undefined_length_sequence_skipped(self, tmp_path):
        """A top-level SQ with undefined length (items with defined AND
        undefined lengths, nested elements) is walked and discarded."""
        import struct

        from torchio_tpu.io.dicom import DicomSlice, _el

        inner_element = _el(0x0008, 0x0060, b"CS", b"MR")
        defined_item = struct.pack("<HHI", 0xFFFE, 0xE000, len(inner_element)) + inner_element
        undefined_item = (
            struct.pack("<HHI", 0xFFFE, 0xE000, 0xFFFFFFFF)
            + inner_element
            + struct.pack("<HHI", 0xFFFE, 0xE00D, 0)
        )
        seq = (
            struct.pack("<HH", 0x0008, 0x1140)  # ReferencedImageSequence
            + b"SQ\x00\x00"
            + struct.pack("<I", 0xFFFFFFFF)
            + defined_item
            + undefined_item
            + struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
        )
        path, pixels = self._explicit_file(tmp_path, seq)
        s = DicomSlice(path)
        np.testing.assert_array_equal(s.pixels, pixels)

    def test_malformed_sequence_raises(self, tmp_path):
        import struct

        from torchio_tpu.io.dicom import DicomSlice

        bad_seq = (
            struct.pack("<HH", 0x0008, 0x1140)
            + b"SQ\x00\x00"
            + struct.pack("<I", 0xFFFFFFFF)
            + struct.pack("<HHI", 0x0008, 0x0060, 2)  # not an item tag
            + b"MR"
        )
        path, _ = self._explicit_file(tmp_path, bad_seq)
        with pytest.raises(ValueError, match="Malformed sequence"):
            DicomSlice(path)

    def test_headerless_implicit_file(self, tmp_path):
        """No DICM preamble: parsed as implicit VR little endian."""
        import struct

        from torchio_tpu.io.dicom import DicomSlice

        def imp(group, element, value):
            return struct.pack("<HHI", group, element, len(value)) + value

        pixels = np.arange(6, dtype=np.uint16).reshape(2, 3)
        raw = b"".join([
            imp(0x0028, 0x0010, struct.pack("<H", 2)),
            imp(0x0028, 0x0011, struct.pack("<H", 3)),
            imp(0x0028, 0x0100, struct.pack("<H", 16)),
            imp(0x0028, 0x0103, struct.pack("<H", 0)),
            imp(0x7FE0, 0x0010, pixels.tobytes()),
        ])
        path = tmp_path / "headerless.dcm"
        path.write_bytes(raw)
        s = DicomSlice(path)
        np.testing.assert_array_equal(s.pixels, pixels)

    def test_unreadable_files_skipped_in_dir(self, tmp_path):
        from torchio_tpu.io.dicom import read_dicom_dir, write_dicom_series

        data = np.arange(2 * 3 * 4, dtype=np.int16).reshape(1, 2, 3, 4)
        write_dicom_series(tmp_path, data, np.eye(4))
        (tmp_path / "notes.txt").write_bytes(b"not a dicom")
        back, _ = read_dicom_dir(tmp_path)
        np.testing.assert_array_equal(back, data)

    def test_decode_helpers(self):
        from torchio_tpu.io.dicom import _decode_is, _decode_us

        # binary US is NEVER sniffed as text: Rows=49 is b'1\x00'
        assert _decode_us(b"1\x00", False) == 49
        assert _decode_us(b"\x05\x00", False) == 5
        assert _decode_us(b"\x00\x05", True) == 5
        assert _decode_us(b"", False) == 0
        assert _decode_is(b"12 ") == 12
        assert _decode_is(b"+") == 0

    def test_rle_wrong_segment_count(self):
        import struct

        from torchio_tpu.io.dicom import _decode_rle_frame

        header = struct.pack("<16I", 1, 64, *([0] * 14))
        with pytest.raises(ValueError, match="segments"):
            _decode_rle_frame(header + b"\x00\x01", 1, 1, np.uint16)

    def test_rle_8bit_round_trip(self):
        from torchio_tpu.io.dicom import _decode_rle_frame, _encode_rle_frame

        rng = np.random.default_rng(3)
        frame = rng.integers(0, 255, (5, 7)).astype(np.uint8)
        back = _decode_rle_frame(_encode_rle_frame(frame), 5, 7, np.uint8)
        np.testing.assert_array_equal(back[..., 0], frame)

    def test_multi_fragment_single_frame(self, tmp_path):
        """JPEG streams may be split across fragments; they concatenate."""
        import io
        import struct

        from PIL import Image as PILImage

        from torchio_tpu.io.dicom import (
            JPEG_BASELINE,
            _el,
            _encapsulate,
            read_dicom_file,
        )

        base = np.full((4, 4), 77, np.uint8)
        buf = io.BytesIO()
        PILImage.fromarray(base, "L").save(buf, "JPEG", quality=100)
        stream = buf.getvalue()
        half = len(stream) // 2

        meta_body = _el(0x0002, 0x0010, b"UI", JPEG_BASELINE.encode())
        meta = _el(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta_body))) + meta_body
        pixel = (
            struct.pack("<HH", 0x7FE0, 0x0010)
            + b"OB\x00\x00"
            + struct.pack("<I", 0xFFFFFFFF)
            + _encapsulate([stream[:half], stream[half:]])
        )
        # _encapsulate pads fragments to even length, which would corrupt
        # a mid-stream split; build the fragments manually instead
        frags = [stream[:half], stream[half:]]
        parts = [struct.pack("<HHI", 0xFFFE, 0xE000, 0)]
        for frag in frags:
            parts.append(
                struct.pack("<HHI", 0xFFFE, 0xE000, len(frag)) + frag
            )
        parts.append(struct.pack("<HHI", 0xFFFE, 0xE0DD, 0))
        pixel = (
            struct.pack("<HH", 0x7FE0, 0x0010)
            + b"OB\x00\x00"
            + struct.pack("<I", 0xFFFFFFFF)
            + b"".join(parts)
        )
        tail = b"".join([
            _el(0x0028, 0x0010, b"US", struct.pack("<H", 4)),
            _el(0x0028, 0x0011, b"US", struct.pack("<H", 4)),
            _el(0x0028, 0x0100, b"US", struct.pack("<H", 8)),
            _el(0x0028, 0x0103, b"US", struct.pack("<H", 0)),
        ])
        path = tmp_path / "frag.dcm"
        path.write_bytes(b"\x00" * 128 + b"DICM" + meta + tail + pixel)
        data, _ = read_dicom_file(path)
        np.testing.assert_allclose(data[0, :, :, 0], base.T, atol=2)

    def test_malformed_encapsulation_raises(self, tmp_path):
        import struct

        from torchio_tpu.io.dicom import _el, DicomSlice, RLE_LOSSLESS

        meta_body = _el(0x0002, 0x0010, b"UI", RLE_LOSSLESS.encode())
        meta = _el(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta_body))) + meta_body
        pixel = (
            struct.pack("<HH", 0x7FE0, 0x0010)
            + b"OB\x00\x00"
            + struct.pack("<I", 0xFFFFFFFF)
            + struct.pack("<HHI", 0x0008, 0x0060, 0)  # not an item tag
        )
        tail = b"".join([
            _el(0x0028, 0x0010, b"US", struct.pack("<H", 1)),
            _el(0x0028, 0x0011, b"US", struct.pack("<H", 1)),
        ])
        path = tmp_path / "badenc.dcm"
        path.write_bytes(b"\x00" * 128 + b"DICM" + meta + tail + pixel)
        with pytest.raises(ValueError, match="encapsulated"):
            DicomSlice(path)


class TestJpegLossless:
    def test_codec_round_trips(self):
        from torchio_tpu.io.jpeg_lossless import (
            decode_lossless_jpeg,
            encode_lossless_jpeg,
        )

        rng = np.random.default_rng(0)
        for dtype, hi in ((np.uint8, 250), (np.uint16, 4000)):
            img = rng.integers(0, hi, (13, 17)).astype(dtype)
            back = decode_lossless_jpeg(encode_lossless_jpeg(img))
            np.testing.assert_array_equal(back, img)

    def test_all_predictors_round_trip(self):
        from torchio_tpu.io.jpeg_lossless import (
            decode_lossless_jpeg,
            encode_lossless_jpeg,
        )

        rng = np.random.default_rng(1)
        img = rng.integers(0, 4000, (11, 9)).astype(np.uint16)
        for predictor in range(1, 8):
            stream = encode_lossless_jpeg(img, predictor=predictor)
            np.testing.assert_array_equal(decode_lossless_jpeg(stream), img)
        with pytest.raises(ValueError, match="predictor"):
            encode_lossless_jpeg(img, predictor=8)

    def test_dicom_round_trip_jpeg_lossless(self, tmp_path):
        from torchio_tpu.io.dicom import (
            read_dicom_dir,
            read_dicom_file,
            write_dicom,
            write_dicom_series,
        )

        rng = np.random.default_rng(5)
        data = rng.integers(-900, 2000, (1, 6, 7, 3)).astype(np.int16)
        affine = np.diag([0.8, 0.9, 1.5, 1.0])
        write_dicom_series(
            tmp_path / "jll", data, affine, compression="jpeg-lossless"
        )
        back, back_affine = read_dicom_dir(tmp_path / "jll")
        np.testing.assert_array_equal(back, data)  # lossless
        np.testing.assert_allclose(back_affine, affine, atol=1e-6)

        path = tmp_path / "vol.dcm"
        write_dicom(path, data, affine, compression="jpeg-lossless")
        back2, _ = read_dicom_file(path)
        np.testing.assert_array_equal(back2, data)

    def test_codec_errors(self):
        from torchio_tpu.io.jpeg_lossless import decode_lossless_jpeg

        with pytest.raises(ValueError, match="Not a JPEG"):
            decode_lossless_jpeg(b"\x00\x00")

    def test_unknown_compression_rejected(self, tmp_path):
        from torchio_tpu.io.dicom import write_dicom

        with pytest.raises(ValueError, match="compression"):
            write_dicom(
                tmp_path / "x.dcm",
                np.zeros((1, 2, 2, 1), np.int16),
                compression="jpeg2000",
            )


class TestReviewRegressions:
    """Regressions for the round-3 code-review findings."""

    def test_us_digit_bytes_not_text_sniffed(self, tmp_path):
        """Rows=49 is stored as b'1\\x00'; it must decode as 49."""
        import struct

        from torchio_tpu.io.dicom import DicomSlice, _el

        meta_body = _el(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.1")
        meta = _el(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta_body))) + meta_body
        pixels = np.arange(49 * 50, dtype=np.uint16).reshape(49, 50)
        tail = b"".join([
            _el(0x0028, 0x0010, b"US", struct.pack("<H", 49)),
            _el(0x0028, 0x0011, b"US", struct.pack("<H", 50)),
            _el(0x0028, 0x0100, b"US", struct.pack("<H", 16)),
            _el(0x0028, 0x0103, b"US", struct.pack("<H", 0)),
            _el(0x7FE0, 0x0010, b"OW", pixels.tobytes()),
        ])
        path = tmp_path / "digit.dcm"
        path.write_bytes(b"\x00" * 128 + b"DICM" + meta + tail)
        s = DicomSlice(path)
        assert (s.rows, s.cols) == (49, 50)
        np.testing.assert_array_equal(s.pixels, pixels)

    def test_meta_parse_bounded_to_group_2(self, tmp_path):
        """A DICM preamble with an IMPLICIT-VR dataset: the meta walk
        must stop at group 0x0002 and not parse the dataset as
        explicit VR (which previously could reject valid files)."""
        import struct

        from torchio_tpu.io.dicom import DicomSlice, _el

        def imp(group, element, value):
            return struct.pack("<HHI", group, element, len(value)) + value

        meta_body = _el(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2")
        meta = _el(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta_body))) + meta_body
        pixels = np.arange(6, dtype=np.uint16).reshape(2, 3)
        dataset = b"".join([
            imp(0x0028, 0x0010, struct.pack("<H", 2)),
            imp(0x0028, 0x0011, struct.pack("<H", 3)),
            imp(0x0028, 0x0100, struct.pack("<H", 16)),
            imp(0x0028, 0x0103, struct.pack("<H", 0)),
            imp(0x7FE0, 0x0010, pixels.tobytes()),
        ])
        path = tmp_path / "implicit_with_meta.dcm"
        path.write_bytes(b"\x00" * 128 + b"DICM" + meta + dataset)
        s = DicomSlice(path)
        np.testing.assert_array_equal(s.pixels, pixels)

    def test_jpeg_lossless_restart_intervals(self):
        from torchio_tpu import native
        from torchio_tpu.io.jpeg_lossless import (
            decode_lossless_jpeg,
            encode_lossless_jpeg,
        )

        rng = np.random.default_rng(4)
        img = rng.integers(0, 4000, (11, 17)).astype(np.uint16)
        for interval in (7, 17, 50):
            stream = encode_lossless_jpeg(img, restart_interval=interval)
            # the native decoder declines restart streams (falls back)
            assert native.jpegll_decode(stream) is None
            np.testing.assert_array_equal(decode_lossless_jpeg(stream), img)

    def test_writer_huffman_table_has_no_all_ones_code(self):
        """T.81 Annex C reserves the all-1-bits codeword; the emitted
        DHT must never assign it (strict decoders reject such tables)."""
        import struct

        from torchio_tpu.io.jpeg_lossless import encode_lossless_jpeg

        stream = encode_lossless_jpeg(np.zeros((4, 4), np.uint16))
        pos = 2
        while pos + 4 <= len(stream):
            marker = stream[pos + 1]
            pos += 2
            length = struct.unpack_from(">H", stream, pos)[0]
            if marker == 0xC4:
                bits = list(stream[pos + 3 : pos + 19])
                code = 0
                last16 = None
                for level, count in enumerate(bits, start=1):
                    for _ in range(count):
                        if level == 16:
                            last16 = code
                        code += 1
                    code <<= 1
                assert last16 != 0xFFFF
            if marker == 0xDA:
                break
            pos += length


class TestRgbDicom:
    """SamplesPerPixel=3 (ultrasound / RGB secondary capture)."""

    def _rgb_file(self, tmp_path, planar, rng):
        import struct

        from torchio_tpu.io.dicom import _el

        rows, cols = 5, 7
        rgb = rng.integers(0, 255, (rows, cols, 3)).astype(np.uint8)
        if planar:
            pixel_bytes = np.moveaxis(rgb, -1, 0).tobytes()
        else:
            pixel_bytes = rgb.tobytes()
        meta_body = _el(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.1")
        meta = _el(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta_body))) + meta_body
        elements = b"".join([
            _el(0x0028, 0x0002, b"US", struct.pack("<H", 3)),
            _el(0x0028, 0x0004, b"CS", b"RGB"),
            _el(0x0028, 0x0006, b"US", struct.pack("<H", 1 if planar else 0)),
            _el(0x0028, 0x0010, b"US", struct.pack("<H", rows)),
            _el(0x0028, 0x0011, b"US", struct.pack("<H", cols)),
            _el(0x0028, 0x0100, b"US", struct.pack("<H", 8)),
            _el(0x0028, 0x0103, b"US", struct.pack("<H", 0)),
            _el(0x7FE0, 0x0010, b"OW", pixel_bytes),
        ])
        path = tmp_path / f"rgb_{planar}.dcm"
        path.write_bytes(b"\x00" * 128 + b"DICM" + meta + elements)
        return path, rgb

    @pytest.mark.parametrize("planar", [False, True])
    def test_uncompressed_rgb(self, tmp_path, rng, planar):
        from torchio_tpu.io.dicom import read_dicom_file

        path, rgb = self._rgb_file(tmp_path, planar, rng)
        data, _ = read_dicom_file(path)
        assert data.shape == (3, 7, 5, 1)  # (C, i=col, j=row, k)
        for ch in range(3):
            np.testing.assert_array_equal(
                data[ch, :, :, 0], rgb[:, :, ch].T
            )

    def test_rle_rgb_round_trip(self):
        from torchio_tpu.io.dicom import _decode_rle_frame, _encode_rle_frame
        import struct

        rng = np.random.default_rng(6)
        rgb = rng.integers(0, 255, (6, 4, 3)).astype(np.uint8)
        # encode per channel with the writer's encoder, merge segments
        segs = []
        for ch in range(3):
            frame = _encode_rle_frame(rgb[:, :, ch])
            nseg = struct.unpack_from("<I", frame, 0)[0]
            assert nseg == 1
            segs.append(frame[64:])
        offsets = []
        pos = 64
        for s in segs:
            offsets.append(pos)
            pos += len(s)
        header = struct.pack("<16I", 3, *offsets, *([0] * 12))
        merged = header + b"".join(segs)
        back = _decode_rle_frame(merged, 6, 4, np.uint8, 3)
        np.testing.assert_array_equal(back, rgb)

    def test_jpeg_rgb_via_pil(self, tmp_path, rng):
        import io
        import struct

        from PIL import Image as PILImage

        from torchio_tpu.io.dicom import (
            JPEG_BASELINE,
            _el,
            _encapsulate,
            read_dicom_file,
        )

        rgb = np.full((6, 6, 3), (100, 150, 200), np.uint8)
        buf = io.BytesIO()
        PILImage.fromarray(rgb, "RGB").save(buf, "JPEG", quality=100)
        meta_body = _el(0x0002, 0x0010, b"UI", JPEG_BASELINE.encode())
        meta = _el(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta_body))) + meta_body
        pixel = (
            struct.pack("<HH", 0x7FE0, 0x0010)
            + b"OB\x00\x00"
            + struct.pack("<I", 0xFFFFFFFF)
            + _encapsulate([buf.getvalue()])
        )
        elements = b"".join([
            _el(0x0028, 0x0002, b"US", struct.pack("<H", 3)),
            _el(0x0028, 0x0010, b"US", struct.pack("<H", 6)),
            _el(0x0028, 0x0011, b"US", struct.pack("<H", 6)),
            _el(0x0028, 0x0100, b"US", struct.pack("<H", 8)),
            _el(0x0028, 0x0103, b"US", struct.pack("<H", 0)),
        ])
        path = tmp_path / "rgbjpeg.dcm"
        path.write_bytes(b"\x00" * 128 + b"DICM" + meta + elements + pixel)
        data, _ = read_dicom_file(path)
        assert data.shape == (3, 6, 6, 1)
        np.testing.assert_allclose(data[:, 0, 0, 0], (100, 150, 200), atol=4)


class TestYbrColor:
    def test_ybr_full_uncompressed_converts_to_rgb(self, tmp_path):
        import struct

        from torchio_tpu.io.dicom import _el, _ybr_full_to_rgb, read_dicom_file

        rng = np.random.default_rng(8)
        ybr = rng.integers(0, 255, (4, 5, 3)).astype(np.uint8)
        meta_body = _el(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.1")
        meta = _el(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta_body))) + meta_body
        elements = b"".join([
            _el(0x0028, 0x0002, b"US", struct.pack("<H", 3)),
            _el(0x0028, 0x0004, b"CS", b"YBR_FULL"),
            _el(0x0028, 0x0010, b"US", struct.pack("<H", 4)),
            _el(0x0028, 0x0011, b"US", struct.pack("<H", 5)),
            _el(0x0028, 0x0100, b"US", struct.pack("<H", 8)),
            _el(0x0028, 0x0103, b"US", struct.pack("<H", 0)),
            _el(0x7FE0, 0x0010, b"OW", ybr.tobytes()),
        ])
        path = tmp_path / "ybr.dcm"
        path.write_bytes(b"\x00" * 128 + b"DICM" + meta + elements)
        data, _ = read_dicom_file(path)
        expected = _ybr_full_to_rgb(ybr[None])[0]
        for ch in range(3):
            np.testing.assert_array_equal(data[ch, :, :, 0], expected[:, :, ch].T)

    def test_unknown_ybr_variant_raises(self, tmp_path):
        import struct

        from torchio_tpu.io.dicom import DicomSlice, _el

        meta_body = _el(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.1")
        meta = _el(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta_body))) + meta_body
        elements = b"".join([
            _el(0x0028, 0x0002, b"US", struct.pack("<H", 3)),
            _el(0x0028, 0x0004, b"CS", b"YBR_PARTIAL_422"),
            _el(0x0028, 0x0010, b"US", struct.pack("<H", 2)),
            _el(0x0028, 0x0011, b"US", struct.pack("<H", 2)),
            _el(0x0028, 0x0100, b"US", struct.pack("<H", 8)),
            _el(0x0028, 0x0103, b"US", struct.pack("<H", 0)),
            _el(0x7FE0, 0x0010, b"OW", bytes(12)),
        ])
        path = tmp_path / "ybr422.dcm"
        path.write_bytes(b"\x00" * 128 + b"DICM" + meta + elements)
        with pytest.raises(ValueError, match="color space"):
            DicomSlice(path)


class TestPythonDecoderPath:
    """Exercise the pure-Python JPEG-Lossless decoder explicitly (the
    native library normally short-circuits it)."""

    @pytest.fixture
    def no_native(self, monkeypatch):
        from torchio_tpu import native

        monkeypatch.setattr(native, "jpegll_decode", lambda stream: None)

    def test_python_decoder_all_paths(self, no_native):
        from torchio_tpu.io.jpeg_lossless import (
            decode_lossless_jpeg,
            encode_lossless_jpeg,
        )

        rng = np.random.default_rng(9)
        for dtype, hi in ((np.uint8, 250), (np.uint16, 4000)):
            img = rng.integers(0, hi, (9, 11)).astype(dtype)
            back = decode_lossless_jpeg(encode_lossless_jpeg(img))
            np.testing.assert_array_equal(back, img)
        # smooth (run-heavy) image exercises small-category codes
        x = np.linspace(0, 1000, 32, dtype=np.uint16)
        smooth = (x[None, :] + x[:, None]).astype(np.uint16)
        np.testing.assert_array_equal(
            decode_lossless_jpeg(encode_lossless_jpeg(smooth)), smooth
        )

    def test_python_decoder_errors(self, no_native):
        from torchio_tpu.io.jpeg_lossless import decode_lossless_jpeg

        with pytest.raises(ValueError, match="Not a JPEG"):
            decode_lossless_jpeg(b"\x12\x34")
        # SOI but no SOF3/SOS
        with pytest.raises(ValueError, match="Missing SOF3/SOS"):
            decode_lossless_jpeg(bytes([0xFF, 0xD8, 0xFF, 0xD9]))

    def test_python_decoder_restart_stream(self, no_native):
        from torchio_tpu.io.jpeg_lossless import (
            decode_lossless_jpeg,
            encode_lossless_jpeg,
        )

        rng = np.random.default_rng(10)
        img = rng.integers(0, 3000, (7, 9)).astype(np.uint16)
        stream = encode_lossless_jpeg(img, restart_interval=11)
        np.testing.assert_array_equal(decode_lossless_jpeg(stream), img)

    def test_dicom_jpeg_lossless_via_python_decoder(self, no_native, tmp_path):
        from torchio_tpu.io.dicom import read_dicom_file, write_dicom

        data = np.arange(2 * 4 * 5 * 3, dtype=np.int16).reshape(1, 4, 5, 6)
        path = tmp_path / "py.dcm"
        write_dicom(path, data, np.eye(4), compression="jpeg-lossless")
        back, _ = read_dicom_file(path)
        np.testing.assert_array_equal(back, data)


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


class TestJpegLosslessPython:
    def test_all_predictors_python_decoder(self, monkeypatch):
        from torchio_tpu.io.jpeg_lossless import (
            decode_lossless_jpeg,
            encode_lossless_jpeg,
        )

        _python_jpegll_edge6(monkeypatch)
        rng = np.random.default_rng(2)
        img = rng.integers(0, 3000, (9, 11)).astype(np.uint16)
        for predictor in range(1, 8):
            stream = encode_lossless_jpeg(img, predictor=predictor)
            np.testing.assert_array_equal(decode_lossless_jpeg(stream), img)

    def test_not_a_jpeg(self, monkeypatch):
        from torchio_tpu.io.jpeg_lossless import decode_lossless_jpeg

        _python_jpegll_edge6(monkeypatch)
        with pytest.raises(ValueError, match="Not a JPEG"):
            decode_lossless_jpeg(b"nope")

    def test_bad_marker(self, monkeypatch):
        from torchio_tpu.io.jpeg_lossless import decode_lossless_jpeg

        _python_jpegll_edge6(monkeypatch)
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

        _python_jpegll_edge6(monkeypatch)
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

        _python_jpegll_edge6(monkeypatch)
        stream = encode_lossless_jpeg(np.zeros((4, 4), np.uint8))
        bad = self._patch_after_marker(stream, SOS, 0, 2)  # Ns = 2
        with pytest.raises(ValueError, match="one scan component"):
            decode_lossless_jpeg(bad)

    def test_truncated_restart_stream(self, monkeypatch):
        from torchio_tpu.io.jpeg_lossless import (
            decode_lossless_jpeg,
            encode_lossless_jpeg,
        )

        _python_jpegll_edge6(monkeypatch)
        rng = np.random.default_rng(3)
        img = rng.integers(0, 200, (6, 6)).astype(np.uint8)
        stream = encode_lossless_jpeg(img, restart_interval=6)
        # chop the scan right after the first RST marker, keep EOI
        first_rst = stream.find(bytes([0xFF, 0xD0]))
        assert first_rst > 0
        bad = stream[: first_rst + 4] + bytes([0xFF, 0xD9])
        with pytest.raises(ValueError, match="Truncated restart"):
            decode_lossless_jpeg(bad)

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


class TestDicomCoverageLines:
    def _meta(self, syntax):
        import struct

        from torchio_tpu.io.dicom import _el

        body = b"".join([
            _el(0x0002, 0x0001, b"OB", b"\x00\x01"),
            _el(0x0002, 0x0002, b"UI", b"1.2.840.10008.5.1.4.1.1.7"),
            _el(0x0002, 0x0003, b"UI", b"2.25.1"),
            _el(0x0002, 0x0010, b"UI", syntax.encode()),
        ])
        return (
            _el(0x0002, 0x0000, b"UL", struct.pack("<I", len(body))) + body
        )

    def test_truncated_sequence_returns_at_eof(self):
        import struct

        from torchio_tpu.io.dicom import _ElementParser

        # undefined-length SQ holding one defined-length empty item,
        # then EOF with no sequence delimiter: the skip must stop
        raw = (
            struct.pack("<HH", 0x0008, 0x1140)
            + b"SQ\x00\x00"
            + struct.pack("<I", 0xFFFFFFFF)
            + struct.pack("<HHI", 0xFFFE, 0xE000, 0)
        )
        parser = _ElementParser(raw, explicit=True, big=False)
        out, pos = parser.parse(0)
        assert pos == len(raw)

    def test_fragment_frame_mismatch_raises(self, tmp_path):
        import struct

        from torchio_tpu.io.dicom import (
            RLE_LOSSLESS,
            _el,
            _encapsulate,
            read_dicom_file,
        )

        meta = self._meta(RLE_LOSSLESS)
        pixel = (
            struct.pack("<HH", 0x7FE0, 0x0010)
            + b"OB\x00\x00"
            + struct.pack("<I", 0xFFFFFFFF)
            + _encapsulate([b"\x00" * 8, b"\x00" * 8, b"\x00" * 8])
        )
        elements = b"".join([
            _el(0x0028, 0x0008, b"IS", b"2 "),
            _el(0x0028, 0x0010, b"US", struct.pack("<H", 2)),
            _el(0x0028, 0x0011, b"US", struct.pack("<H", 2)),
            _el(0x0028, 0x0100, b"US", struct.pack("<H", 8)),
            _el(0x0028, 0x0103, b"US", struct.pack("<H", 0)),
        ])
        path = tmp_path / "bad.dcm"
        path.write_bytes(b"\x00" * 128 + b"DICM" + meta + elements + pixel)
        with pytest.raises(ValueError, match="fragments for 2 frames"):
            read_dicom_file(path)

    def test_jpeg_lossless_color_unsupported(self, tmp_path):
        import struct

        from torchio_tpu.io.dicom import (
            JPEG_LOSSLESS_SV1,
            _el,
            _encapsulate,
            read_dicom_file,
        )

        meta = self._meta(JPEG_LOSSLESS_SV1)
        pixel = (
            struct.pack("<HH", 0x7FE0, 0x0010)
            + b"OB\x00\x00"
            + struct.pack("<I", 0xFFFFFFFF)
            + _encapsulate([b"\xff\xd8\xff"])
        )
        elements = b"".join([
            _el(0x0028, 0x0002, b"US", struct.pack("<H", 3)),
            _el(0x0028, 0x0010, b"US", struct.pack("<H", 2)),
            _el(0x0028, 0x0011, b"US", struct.pack("<H", 2)),
            _el(0x0028, 0x0100, b"US", struct.pack("<H", 8)),
            _el(0x0028, 0x0103, b"US", struct.pack("<H", 0)),
        ])
        path = tmp_path / "color.dcm"
        path.write_bytes(b"\x00" * 128 + b"DICM" + meta + elements + pixel)
        with pytest.raises(ValueError, match="SamplesPerPixel"):
            read_dicom_file(path)

    def test_rle_short_stream_pads(self, tmp_path):
        import struct

        from torchio_tpu.io.dicom import (
            RLE_LOSSLESS,
            _el,
            _encapsulate,
            read_dicom_file,
        )

        # one RLE segment whose packbits data decodes to fewer bytes
        # than rows*cols: the decoder zero-pads
        header = struct.pack("<16I", 1, 64, *([0] * 14))
        packbits = b"\x00\x07"  # one literal byte -> 1 of 4 expected
        frame = header + packbits
        meta = self._meta(RLE_LOSSLESS)
        pixel = (
            struct.pack("<HH", 0x7FE0, 0x0010)
            + b"OB\x00\x00"
            + struct.pack("<I", 0xFFFFFFFF)
            + _encapsulate([frame])
        )
        elements = b"".join([
            _el(0x0028, 0x0010, b"US", struct.pack("<H", 2)),
            _el(0x0028, 0x0011, b"US", struct.pack("<H", 2)),
            _el(0x0028, 0x0100, b"US", struct.pack("<H", 8)),
            _el(0x0028, 0x0103, b"US", struct.pack("<H", 0)),
        ])
        path = tmp_path / "short.dcm"
        path.write_bytes(b"\x00" * 128 + b"DICM" + meta + elements + pixel)
        data, _ = read_dicom_file(path)
        flat = np.asarray(data).reshape(-1)
        assert flat[0] == 7 and (flat[1:] == 0).all()

    def test_backend_dtype_and_region(self, tmp_path):
        from torchio_tpu.io.dicom import DicomBackend, write_dicom

        data = np.arange(8, dtype=np.int16).reshape(1, 2, 2, 2)
        write_dicom(tmp_path / "x.dcm", data, np.eye(4))
        backend = DicomBackend(tmp_path / "x.dcm")
        assert np.dtype(backend.dtype).kind in "if"
        region = backend[(slice(None), slice(0, 1), slice(None), slice(None))]
        assert region.shape[1] == 1


class TestJpegLosslessCoverageLines:
    def test_eoi_before_sos_raises(self, monkeypatch):
        from torchio_tpu.io.jpeg_lossless import decode_lossless_jpeg

        _python_jpegll_edge6(monkeypatch)
        with pytest.raises(ValueError):
            decode_lossless_jpeg(b"\xff\xd8\xff\xd9\x00\x00")

    def test_unsupported_predictor_raises(self, monkeypatch, rng):
        import struct

        from torchio_tpu.io.jpeg_lossless import (
            decode_lossless_jpeg,
            encode_lossless_jpeg,
        )

        _python_jpegll_edge6(monkeypatch)
        img = rng.integers(0, 255, (4, 4)).astype(np.uint8)
        stream = bytearray(encode_lossless_jpeg(img, predictor=1))
        # patch the SOS spectral-selection byte (the predictor) to 8
        sos = stream.find(b"\xff\xda")
        assert sos >= 0
        length = struct.unpack_from(">H", stream, sos + 2)[0]
        ncomp = stream[sos + 4]
        predictor_at = sos + 5 + 2 * ncomp
        assert stream[predictor_at] == 1
        stream[predictor_at] = 8
        with pytest.raises(ValueError, match="predictor"):
            decode_lossless_jpeg(bytes(stream))


class TestPilChannelHandling:
    def _encapsulated(self, tmp_path, syntax, frame, rows, cols, *,
                      bits=8, spp=1, photometric=None):
        import struct

        from torchio_tpu.io.dicom import _el, _encapsulate

        meta_body = b"".join([
            _el(0x0002, 0x0001, b"OB", b"\x00\x01"),
            _el(0x0002, 0x0002, b"UI", b"1.2.840.10008.5.1.4.1.1.7"),
            _el(0x0002, 0x0003, b"UI", b"2.25.1"),
            _el(0x0002, 0x0010, b"UI", syntax.encode()),
        ])
        meta = (
            _el(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta_body)))
            + meta_body
        )
        elements = [
            _el(0x0028, 0x0002, b"US", struct.pack("<H", spp)),
            _el(0x0028, 0x0010, b"US", struct.pack("<H", rows)),
            _el(0x0028, 0x0011, b"US", struct.pack("<H", cols)),
            _el(0x0028, 0x0100, b"US", struct.pack("<H", bits)),
            _el(0x0028, 0x0103, b"US", struct.pack("<H", 0)),
        ]
        if photometric is not None:
            elements.append(_el(0x0028, 0x0004, b"CS", photometric))
        pixel = (
            struct.pack("<HH", 0x7FE0, 0x0010)
            + b"OB\x00\x00"
            + struct.pack("<I", 0xFFFFFFFF)
            + _encapsulate([frame])
        )
        path = tmp_path / "pil.dcm"
        path.write_bytes(
            b"\x00" * 128 + b"DICM" + meta + b"".join(elements) + pixel
        )
        return path

    def test_rgb_coded_grayscale_trims_channels(self, tmp_path, rng):
        import io

        from PIL import Image as PILImage

        from torchio_tpu.io.dicom import JPEG_BASELINE, read_dicom_file

        gray = rng.integers(100, 120, (8, 8)).astype(np.uint8)
        rgb = np.stack([gray] * 3, axis=-1)
        buf = io.BytesIO()
        PILImage.fromarray(rgb, "RGB").save(buf, "JPEG", quality=100)
        path = self._encapsulated(
            tmp_path, JPEG_BASELINE, buf.getvalue(), 8, 8, spp=1
        )
        data, _ = read_dicom_file(path)
        assert np.asarray(data).shape[0] == 1  # one channel kept

    def test_ybr_photometric_with_pil_syntax_passthrough(self, tmp_path, rng):
        import io

        from PIL import Image as PILImage

        from torchio_tpu.io.dicom import JPEG_BASELINE, read_dicom_file

        rgb = rng.integers(90, 140, (8, 8, 3)).astype(np.uint8)
        buf = io.BytesIO()
        PILImage.fromarray(rgb, "RGB").save(buf, "JPEG", quality=100)
        path = self._encapsulated(
            tmp_path, JPEG_BASELINE, buf.getvalue(), 8, 8, spp=3,
            photometric=b"YBR_FULL_422",
        )
        data, _ = read_dicom_file(path)
        assert np.asarray(data).shape[0] == 3  # RGB kept as-is (no YBR remap)

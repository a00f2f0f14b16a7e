"""From-scratch DICOM series reader (no pydicom/SimpleITK).

The reference reads DICOM through SimpleITK's C++ GDCM
(``/root/reference/src/torchio/data/io.py:148-174``); this implements the
needed subset natively: explicit/implicit VR little endian parsing,
uncompressed PixelData, slice sorting by ImagePositionPatient along the
slice normal, LPS -> RAS affine construction, and rescale slope/intercept.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

_TAGS = {
    (0x0002, 0x0010): "transfer_syntax",
    (0x0020, 0x0032): "position",  # ImagePositionPatient
    (0x0020, 0x0037): "orientation",  # ImageOrientationPatient
    (0x0028, 0x0002): "samples_per_pixel",
    (0x0028, 0x0008): "num_frames",
    (0x0028, 0x0010): "rows",
    (0x0028, 0x0011): "cols",
    (0x0028, 0x0030): "pixel_spacing",
    (0x0028, 0x0100): "bits_allocated",
    (0x0028, 0x0103): "pixel_representation",
    (0x0028, 0x1052): "rescale_intercept",
    (0x0028, 0x1053): "rescale_slope",
    (0x0018, 0x0050): "slice_thickness",
    (0x7FE0, 0x0010): "pixel_data",
}

_EXPLICIT_LONG_VRS = {b"OB", b"OW", b"OF", b"SQ", b"UT", b"UN", b"OD", b"OL", b"UC", b"UR"}

_SUPPORTED_SYNTAXES = {
    "1.2.840.10008.1.2",       # implicit VR little endian
    "1.2.840.10008.1.2.1",     # explicit VR little endian
}


def _parse_elements(raw: bytes, start: int, explicit: bool) -> dict:
    """Walk top-level data elements collecting the tags we need."""
    out: dict = {}
    pos = start
    n = len(raw)
    while pos + 8 <= n:
        group, element = struct.unpack_from("<HH", raw, pos)
        pos += 4
        if explicit and group != 0xFFFE:
            vr = raw[pos : pos + 2]
            if vr in _EXPLICIT_LONG_VRS:
                length = struct.unpack_from("<I", raw, pos + 4)[0]
                pos += 8
            else:
                length = struct.unpack_from("<H", raw, pos + 2)[0]
                pos += 4
        else:
            vr = b""
            length = struct.unpack_from("<I", raw, pos)[0]
            pos += 4
        if length == 0xFFFFFFFF:
            raise ValueError("Undefined-length (compressed/sequence) PixelData"
                             " is not supported by the native DICOM reader")
        key = (group, element)
        if key in _TAGS:
            out[_TAGS[key]] = raw[pos : pos + length]
        if key == (0x7FE0, 0x0010):
            break  # pixel data is last for our purposes
        pos += length
    return out


def _decode_ds(value: bytes) -> list[float]:
    return [float(v) for v in value.decode("ascii", "ignore").strip("\x00 ").split("\\") if v]


def _decode_us(value: bytes) -> int:
    if len(value) >= 2:
        return struct.unpack("<H", value[:2])[0]
    return int(value.decode("ascii", "ignore").strip() or 0)


class DicomSlice:
    """One parsed single-frame DICOM file."""

    def __init__(self, path: Path):
        raw = path.read_bytes()
        if raw[128:132] == b"DICM":
            # file meta group is always explicit VR; read transfer syntax
            meta = _parse_elements(raw[:4096], 132, explicit=True)
            syntax = (
                meta.get("transfer_syntax", b"").decode("ascii", "ignore").strip("\x00 ")
            )
            if syntax and syntax not in _SUPPORTED_SYNTAXES:
                raise ValueError(
                    f"Unsupported DICOM transfer syntax {syntax!r}"
                    " (only uncompressed little endian is supported natively)"
                )
            explicit = syntax != "1.2.840.10008.1.2"
            # find the end of the meta group: re-walk from 132 until group != 2
            pos = 132
            while pos + 8 <= len(raw):
                group = struct.unpack_from("<H", raw, pos)[0]
                if group != 0x0002:
                    break
                vr = raw[pos + 4 : pos + 6]
                if vr in _EXPLICIT_LONG_VRS:
                    length = struct.unpack_from("<I", raw, pos + 8)[0]
                    pos += 12 + length
                else:
                    length = struct.unpack_from("<H", raw, pos + 6)[0]
                    pos += 8 + length
            tags = _parse_elements(raw, pos, explicit)
        else:
            tags = _parse_elements(raw, 0, explicit=False)
        self.rows = _decode_us(tags["rows"])
        self.cols = _decode_us(tags["cols"])
        bits = _decode_us(tags.get("bits_allocated", b"\x10\x00"))
        signed = _decode_us(tags.get("pixel_representation", b"\x00\x00"))
        self.position = np.array(
            _decode_ds(tags.get("position", b"0\\0\\0")), np.float64
        )
        orient = _decode_ds(tags.get("orientation", b"1\\0\\0\\0\\1\\0"))
        self.row_dir = np.array(orient[:3], np.float64)
        self.col_dir = np.array(orient[3:6], np.float64)
        spacing = _decode_ds(tags.get("pixel_spacing", b"1\\1"))
        self.spacing_rc = (spacing[0], spacing[1])  # (row, col) in mm
        self.slope = _decode_ds(tags.get("rescale_slope", b"1"))[0]
        self.intercept = _decode_ds(tags.get("rescale_intercept", b"0"))[0]
        dtype = {
            (8, 0): np.uint8, (8, 1): np.int8,
            (16, 0): np.uint16, (16, 1): np.int16,
            (32, 0): np.uint32, (32, 1): np.int32,
        }[(bits, signed)]
        pixels = np.frombuffer(
            tags["pixel_data"], dtype=np.dtype(dtype).newbyteorder("<"),
            count=self.rows * self.cols,
        )
        self.pixels = pixels.reshape(self.rows, self.cols)  # (row, col)


def read_dicom_dir(directory) -> tuple[np.ndarray, np.ndarray]:
    """Read a directory of single-frame DICOM files as one volume.

    Returns ``(data_cijk, affine)`` where voxel axes are
    (i=column, j=row, k=slice) and the affine maps to RAS+ world mm.
    """
    directory = Path(directory)
    paths = sorted(
        p for p in directory.iterdir()
        if p.is_file() and not p.name.startswith(".")
    )
    slices = []
    for p in paths:
        try:
            slices.append(DicomSlice(p))
        except (KeyError, ValueError, struct.error):
            continue
    if not slices:
        raise ValueError(f"No readable DICOM slices found in {directory}")
    normal = np.cross(slices[0].row_dir, slices[0].col_dir)
    slices.sort(key=lambda s: float(np.dot(s.position, normal)))
    volume = np.stack([s.pixels for s in slices])  # (k, row=j, col=i)
    data = np.transpose(volume, (2, 1, 0))[None]  # (1, i, j, k)
    first = slices[0]
    if len(slices) > 1:
        slice_step = slices[1].position - first.position
    else:
        slice_step = normal * _first_nonzero(first, 1.0)
    # LPS -> RAS: negate world x and y
    flip = np.array([-1.0, -1.0, 1.0])
    affine = np.eye(4)
    affine[:3, 0] = first.row_dir * first.spacing_rc[1] * flip  # i = column step
    affine[:3, 1] = first.col_dir * first.spacing_rc[0] * flip  # j = row step
    affine[:3, 2] = slice_step * flip
    affine[:3, 3] = first.position * flip
    arr = data
    if first.slope != 1.0 or first.intercept != 0.0:
        arr = data.astype(np.float32) * first.slope + first.intercept
    return np.ascontiguousarray(arr), affine


def _first_nonzero(s: DicomSlice, default: float) -> float:
    return default


def is_dicom(path) -> bool:
    path = Path(path)
    try:
        with open(path, "rb") as f:
            head = f.read(132)
        return head[128:132] == b"DICM"
    except (OSError, IsADirectoryError):
        return False


class DicomBackend:
    """Eager backend over a DICOM series directory (or single file)."""

    def __init__(self, source):
        source = Path(source)
        if source.is_dir():
            self._data, self._affine = read_dicom_dir(source)
        else:
            s = DicomSlice(source)
            data = np.transpose(s.pixels, (1, 0))[None, :, :, None]
            if s.slope != 1.0 or s.intercept != 0.0:
                data = data.astype(np.float32) * s.slope + s.intercept
            self._data = np.ascontiguousarray(data)
            flip = np.array([-1.0, -1.0, 1.0])
            affine = np.eye(4)
            affine[:3, 0] = s.row_dir * s.spacing_rc[1] * flip
            affine[:3, 1] = s.col_dir * s.spacing_rc[0] * flip
            affine[:3, 2] = np.cross(s.row_dir, s.col_dir) * flip
            affine[:3, 3] = s.position * flip
            self._affine = affine

    @property
    def shape(self):
        return self._data.shape

    @property
    def affine(self):
        return self._affine

    @property
    def dtype(self):
        return self._data.dtype

    def __getitem__(self, slices):
        return np.asarray(self._data[slices])

    def to_array(self):
        return self._data

    to_tensor = to_array

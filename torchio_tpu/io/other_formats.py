"""NRRD and MetaImage (MHA/MHD) readers — pure Python/numpy.

The reference reads these through SimpleITK
(``/root/reference/src/torchio/data/io.py:148-174``); both formats are
text headers + raw/gzip payloads, implemented natively here. Space
conventions (NRRD's explicit space field, MetaImage's LPS) are converted
to RAS+ at the boundary, like the reference's LPS->RAS flip.
"""

from __future__ import annotations

import gzip
import zlib
from pathlib import Path

import numpy as np

_NRRD_TYPES = {
    "signed char": np.int8, "int8": np.int8, "int8_t": np.int8,
    "uchar": np.uint8, "unsigned char": np.uint8, "uint8": np.uint8,
    "uint8_t": np.uint8,
    "short": np.int16, "short int": np.int16, "signed short": np.int16,
    "int16": np.int16, "int16_t": np.int16,
    "ushort": np.uint16, "unsigned short": np.uint16, "uint16": np.uint16,
    "uint16_t": np.uint16,
    "int": np.int32, "signed int": np.int32, "int32": np.int32,
    "int32_t": np.int32,
    "uint": np.uint32, "unsigned int": np.uint32, "uint32": np.uint32,
    "uint32_t": np.uint32,
    "longlong": np.int64, "int64": np.int64, "int64_t": np.int64,
    "ulonglong": np.uint64, "uint64": np.uint64, "uint64_t": np.uint64,
    "float": np.float32, "double": np.float64,
}

_SPACE_SIGNS = {
    "left-posterior-superior": (-1.0, -1.0, 1.0),
    "lps": (-1.0, -1.0, 1.0),
    "right-anterior-superior": (1.0, 1.0, 1.0),
    "ras": (1.0, 1.0, 1.0),
    "left-anterior-superior": (-1.0, 1.0, 1.0),
    "las": (-1.0, 1.0, 1.0),
}


def _parse_vector(text: str) -> list[float]:
    return [float(v) for v in text.strip().lstrip("(").rstrip(")").split(",")]


def read_nrrd(path) -> tuple[np.ndarray, np.ndarray]:
    """Read a .nrrd / .nhdr file; returns ((C, I, J, K) data, RAS affine)."""
    path = Path(path)
    raw = path.read_bytes()
    if not raw.startswith(b"NRRD"):
        raise ValueError(f"{path} is not a NRRD file")
    header_end = raw.find(b"\n\n")
    if header_end < 0:
        header_end = raw.find(b"\r\n\r\n")
    header_text = raw[:header_end].decode("ascii", "ignore")
    fields: dict[str, str] = {}
    for line in header_text.splitlines()[1:]:
        if line.startswith("#") or ":" not in line:
            continue
        key, _, value = line.partition(":")
        fields[key.strip().lower()] = value.lstrip("=").strip()

    dtype = np.dtype(_NRRD_TYPES[fields["type"].strip()])
    sizes = [int(v) for v in fields["sizes"].split()]
    dim = int(fields.get("dimension", len(sizes)))
    encoding = fields.get("encoding", "raw").lower()
    endian = fields.get("endian", "little")
    if dtype.itemsize > 1:
        dtype = dtype.newbyteorder("<" if endian == "little" else ">")

    payload = raw[header_end:].lstrip(b"\r\n")
    datafile = fields.get("data file") or fields.get("datafile")
    if datafile:  # detached header (.nhdr)
        payload = (path.parent / datafile.split()[0]).read_bytes()
    if encoding in ("gzip", "gz"):
        payload = gzip.decompress(payload)
    elif encoding in ("zlib",):
        payload = zlib.decompress(payload)
    elif encoding not in ("raw",):
        raise ValueError(f"Unsupported NRRD encoding: {encoding}")
    count = int(np.prod(sizes))
    arr = np.frombuffer(payload, dtype=dtype, count=count).reshape(
        sizes, order="F"
    )

    # space handling: NRRD axes are (fastest..slowest); vector/channel
    # axes have 'none' space directions
    signs = np.asarray(
        _SPACE_SIGNS.get(fields.get("space", "lps").lower(), (-1.0, -1.0, 1.0))
    )
    directions = []
    spatial_axes = []
    if "space directions" in fields:
        for axis, token in enumerate(fields["space directions"].split(") ")):
            token = token.strip()
            if token in ("none", ""):
                continue
            directions.append(_parse_vector(token))
            spatial_axes.append(axis)
    else:
        directions = np.eye(3).tolist()
        spatial_axes = list(range(min(3, dim)))
    origin = (
        _parse_vector(fields["space origin"])
        if "space origin" in fields
        else [0.0, 0.0, 0.0]
    )
    affine = np.eye(4)
    for col, d in enumerate(directions[:3]):
        affine[:3, col] = np.asarray(d) * signs
    affine[:3, 3] = np.asarray(origin) * signs

    # move channel axes (non-spatial) to the front
    if arr.ndim == 3:
        data = arr[None]
    else:
        channel_axes = [a for a in range(arr.ndim) if a not in spatial_axes]
        order = channel_axes + spatial_axes
        data = np.transpose(arr, order)
        data = data.reshape((-1,) + data.shape[len(channel_axes):])
    if data.dtype.byteorder not in ("=", "|"):
        data = data.astype(data.dtype.newbyteorder("="))
    return np.ascontiguousarray(data), affine


def read_meta_image(path) -> tuple[np.ndarray, np.ndarray]:
    """Read a .mha / .mhd MetaImage; returns ((C, I, J, K) data, RAS affine)."""
    path = Path(path)
    raw = path.read_bytes()
    fields: dict[str, str] = {}
    pos = 0
    while True:
        nl = raw.find(b"\n", pos)
        line = raw[pos:nl].decode("ascii", "ignore").strip()
        pos = nl + 1
        if "=" not in line:
            break
        key, _, value = line.partition("=")
        fields[key.strip().lower()] = value.strip()
        if key.strip().lower() == "elementdatafile":
            break
    types = {
        "MET_CHAR": np.int8, "MET_UCHAR": np.uint8,
        "MET_SHORT": np.int16, "MET_USHORT": np.uint16,
        "MET_INT": np.int32, "MET_UINT": np.uint32,
        "MET_LONG": np.int64, "MET_ULONG": np.uint64,
        "MET_FLOAT": np.float32, "MET_DOUBLE": np.float64,
    }
    dtype = np.dtype(types[fields["elementtype"]])
    sizes = [int(v) for v in fields["dimsize"].split()]
    channels = int(fields.get("elementnumberofchannels", "1"))
    spacing = [float(v) for v in fields.get("elementspacing", "1 1 1").split()]
    offset = [float(v) for v in fields.get("offset", fields.get("position", "0 0 0")).split()]
    tmatrix = [
        float(v)
        for v in fields.get(
            "transformmatrix", fields.get("orientation", "1 0 0 0 1 0 0 0 1")
        ).split()
    ]
    compressed = fields.get("compresseddata", "false").lower() == "true"
    datafile = fields.get("elementdatafile", "LOCAL")
    payload = (
        raw[pos:] if datafile == "LOCAL" else (path.parent / datafile).read_bytes()
    )
    if compressed:
        payload = zlib.decompress(payload)
    count = channels * int(np.prod(sizes))
    arr = np.frombuffer(payload, dtype=dtype.newbyteorder("<"), count=count)
    if channels > 1:
        # channel-interleaved per voxel: C is the fastest axis on disk
        data = arr.reshape([channels] + sizes, order="F")
    else:
        data = arr.reshape(sizes, order="F")[None]
    rotation = np.asarray(tmatrix, np.float64).reshape(3, 3).T
    lps = np.eye(4)
    lps[:3, :3] = rotation * np.asarray(spacing)
    lps[:3, 3] = offset
    flip = np.diag([-1.0, -1.0, 1.0, 1.0])
    affine = flip @ lps
    out = np.asarray(data)
    if out.dtype.byteorder not in ("=", "|"):
        out = out.astype(out.dtype.newbyteorder("="))
    return np.ascontiguousarray(out), affine

"""Suffix-routed image writing.

Parity reference: ``/root/reference/src/torchio/data/image.py:699-753``
(``Image.save`` via SimpleITK for any ITK format, or niizarr for
``.nii.zarr``). This framework owns NIfTI/NRRD/MetaImage writers
natively (no SimpleITK); ``.nii.zarr`` needs the optional ``zarr``
package, mirroring the reference's optional niizarr dependency.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .nifti import write_nifti
from .other_formats import write_meta_image, write_nrrd


def write_nifti_zarr(path, data, affine=None, *, chunks=None) -> None:
    """Write (C, I, J, K) data + RAS affine as a ``.nii.zarr`` store.

    The affine is stored in the array attributes (the layout
    ``ZarrBackend`` in :mod:`torchio_tpu.io.remote` reads back).
    """
    try:
        import zarr
    except ImportError as e:  # pragma: no cover - zarr not in this image
        raise ImportError(
            "Writing .nii.zarr requires the 'zarr' package:"
            " pip install zarr"
        ) from e
    arr = np.asarray(data)
    if arr.ndim == 3:
        arr = arr[None]
    affine = np.eye(4) if affine is None else np.asarray(affine, np.float64)
    store = zarr.open(
        str(path),
        mode="w",
        shape=arr.shape,
        chunks=chunks or (arr.shape[0], 64, 64, 64),
        dtype=arr.dtype,
    )
    store[:] = arr
    store.attrs["affine"] = affine.tolist()


def _write_dcm(path, data, affine=None) -> None:
    from .dicom import write_dicom

    write_dicom(path, data, affine)


_WRITERS = {
    ".nii": write_nifti,
    ".nii.gz": write_nifti,
    ".nrrd": write_nrrd,
    ".nhdr": write_nrrd,
    ".mha": write_meta_image,
    ".mhd": write_meta_image,
    ".nii.zarr": write_nifti_zarr,
    ".dcm": _write_dcm,
}


def supported_write_suffixes() -> tuple[str, ...]:
    return tuple(sorted(_WRITERS))


def write_image(path, data, affine=None) -> None:
    """Write (C, I, J, K) data + RAS affine, format chosen by suffix.

    A directory target (existing directory, or a path ending in a
    separator) writes a one-file-per-slice DICOM series — the native
    counterpart of the reference's SimpleITK series writing.
    """
    raw = str(path)
    name = raw.lower().rstrip("/")
    for suffix in sorted(_WRITERS, key=len, reverse=True):
        if name.endswith(suffix):
            _WRITERS[suffix](Path(path), data, affine)
            return
    if raw.endswith(("/", "\\")) or Path(path).is_dir():
        from .dicom import write_dicom_series

        write_dicom_series(Path(path), data, affine)
        return
    raise ValueError(
        f"Unsupported output format for {path!r}; supported suffixes:"
        f" {', '.join(supported_write_suffixes())} (or a directory for a"
        " DICOM series)"
    )

"""Image containers: lazy-by-default volumes with affine metadata.

Parity reference: ``/root/reference/src/torchio/data/image.py``
(``Image``/``ScalarImage``/``LabelMap``: constructor source dispatch, lazy
header-only metadata, region reads, metadata access, ``new_like``,
``save``, deepcopy preserving lazy backends).

TPU-native notes: voxel data is host numpy until it crosses the batch
boundary (``jnp.asarray`` / ``jax.device_put`` in
:mod:`torchio_tpu.data.batch`). ``Image.to(device)`` eagerly places data
on a JAX device for users who want a device-resident image.
"""

from __future__ import annotations

import copy as _copy
import io as _stdio
from pathlib import Path
from typing import Any, Callable

import jax
import numpy as np

from ..core.affine import AffineMatrix
from ..io.backends import (
    ArrayBackend,
    BackendRequest,
    ImageDataBackend,
    normalize_index,
    resolve_backend,
)
from .bboxes import BoundingBoxes
from .invertible import Invertible
from .points import Points


def _to_host(x: Any) -> np.ndarray:
    """Any array-ish (numpy, jax, torch) to host numpy."""
    if isinstance(x, np.ndarray):
        return x
    if isinstance(x, jax.Array):
        return np.asarray(x)
    if hasattr(x, "detach"):
        return x.detach().cpu().numpy()
    return np.asarray(x)


class Image(Invertible):
    """Lazy 3D/4D medical image: (C, I, J, K) data + RAS+ affine.

    Accepted sources: ``None`` (empty), array-likes (numpy / jax / torch),
    ``bytes``/``BytesIO`` holding an encoded file, or a path. Path sources
    stay on disk until data is first accessed; shape/affine/dtype come from
    the header alone.

    Args:
        source: see above.
        reader: callable ``path -> (data_cijk, affine)`` or a
            :class:`~torchio_tpu.io.backends.LazyReader`.
        reader_kwargs: forwarded to the reader.
        affine: overrides the affine from the file/array.
        channels_last: input array is (I, J, K, C) and is permuted.
        suffix: filename suffix hint for bytes/file-like sources.
        points: named :class:`Points` annotations attached to the image.
        bounding_boxes: named :class:`BoundingBoxes` annotations.
        **kwargs: arbitrary metadata (attribute- and key-accessible).
    """

    #: Source types accepted by the constructor (mirror of the reference's
    #: ``Image.ImageInput``; zarr stores are additionally accepted when the
    #: optional dependency is present).
    ImageInput = object  # documented alias; runtime dispatch is duck-typed

    def __init__(
        self,
        source: Any = None,
        *,
        reader: Callable | None = None,
        reader_kwargs: dict[str, Any] | None = None,
        affine: Any = None,
        channels_last: bool = False,
        suffix: str | None = None,
        points: dict[str, Points] | None = None,
        bounding_boxes: dict[str, BoundingBoxes] | None = None,
        **kwargs: Any,
    ) -> None:
        self._reader = reader
        self._reader_kwargs = dict(reader_kwargs or {})
        self._suffix = suffix
        self._metadata: dict[str, Any] = dict(kwargs)
        self._data: np.ndarray | jax.Array | None = None
        self._backend: ImageDataBackend | None = None
        self._path: Path | None = None
        self._uri: str | None = None
        self._affine: AffineMatrix | None = None
        if affine is not None:
            self._affine = (
                affine if isinstance(affine, AffineMatrix) else AffineMatrix(affine)
            )
        self._points: dict[str, Points] = dict(points or {})
        self._bounding_boxes: dict[str, BoundingBoxes] = dict(bounding_boxes or {})
        self.applied_transforms: list[Any] = []

        if source is None:
            pass
        elif isinstance(source, (np.ndarray, jax.Array, list, tuple)) or (
            # torch tensors expose .detach(); so do buffered file
            # objects (io.BufferedReader.detach) — those must route to
            # the file-like branch below
            hasattr(source, "detach") and not hasattr(source, "read")
        ):
            if isinstance(source, jax.Array):
                # keep device arrays on device; backend views are lazy
                arr: Any = source
                if arr.ndim == 3:
                    arr = arr[None]
                if channels_last:
                    import jax.numpy as _jnp

                    arr = _jnp.moveaxis(arr, -1, 0)
            else:
                arr = _to_host(source)
                if arr.ndim == 3:
                    arr = arr[None]
                if channels_last:
                    arr = np.moveaxis(arr, -1, 0)
            if arr.ndim != 4:
                raise ValueError(
                    f"Image data must be 3D or 4D (C, I, J, K), got {arr.shape}"
                )
            self._data = arr
            aff = self._affine or AffineMatrix()
            self._affine = aff
            if isinstance(arr, np.ndarray):
                self._backend = ArrayBackend(arr, aff.data)
        elif isinstance(source, (bytes, bytearray, _stdio.BytesIO)):
            raw = source.getvalue() if isinstance(source, _stdio.BytesIO) else bytes(source)
            self._backend = resolve_backend(
                BackendRequest(source=raw, reader=reader, suffix=suffix)
            )
        elif isinstance(source, (str, Path)) or hasattr(source, "read"):
            if isinstance(source, str) and "://" in source and not source.startswith(
                "file://"
            ):
                self._uri = source  # remote URI: resolved lazily by the registry
            elif isinstance(source, (str, Path)):
                self._path = Path(source)
            else:
                # file-like: slurp bytes
                raw = source.read()
                self._backend = resolve_backend(
                    BackendRequest(source=raw, reader=reader, suffix=suffix)
                )
        elif isinstance(source, ImageDataBackend):
            self._backend = source
        else:
            raise ValueError(f"Unsupported Image source type: {type(source)}")

    # --- Lazy machinery ---

    def _ensure_backend(self) -> None:
        if self._backend is None:
            if self._data is not None:
                # device-array image: materialize a host view on demand
                self._backend = ArrayBackend(_to_host(self._data), self.affine.data)
                return
            source = self._uri if self._uri is not None else self._path
            if source is None:
                raise RuntimeError(
                    "Image has no data: construct with a source or call set_data()"
                )
            self._backend = resolve_backend(
                BackendRequest(
                    source=source,
                    reader=self._reader,
                    suffix=self._suffix,
                    kwargs=self._reader_kwargs,
                )
            )

    def load(self) -> None:
        """Materialize voxel data from the backend (disk I/O happens here)."""
        if self._data is not None:
            return
        self._ensure_backend()
        assert self._backend is not None
        self._data = np.asarray(self._backend.to_array())
        if self._affine is None:
            self._affine = AffineMatrix(self._backend.affine)

    def unload(self) -> None:
        """Drop in-memory data if the image can be re-read from its source."""
        if self._path is None and not isinstance(self._backend, ArrayBackend):
            return
        if self._path is not None:
            self._data = None
            self._backend = None

    # --- Properties ---

    @property
    def path(self) -> Path | None:
        return self._path

    @property
    def is_loaded(self) -> bool:
        return self._data is not None

    @property
    def data(self) -> np.ndarray | jax.Array:
        """Voxel data (C, I, J, K); triggers :meth:`load` when lazy."""
        self.load()
        assert self._data is not None
        return self._data

    @data.setter
    def data(self, value: Any) -> None:
        self.set_data(value)

    @property
    def affine(self) -> AffineMatrix:
        if self._affine is not None:
            return self._affine
        self._ensure_backend()
        assert self._backend is not None
        self._affine = AffineMatrix(self._backend.affine)
        return self._affine

    @affine.setter
    def affine(self, value: Any) -> None:
        self._affine = value if isinstance(value, AffineMatrix) else AffineMatrix(value)

    @property
    def metadata(self) -> dict[str, Any]:
        return self._metadata

    @property
    def dataobj(self) -> ImageDataBackend:
        """The lazy backend (header metadata + region reads)."""
        self._ensure_backend()
        assert self._backend is not None
        return self._backend

    @property
    def shape(self) -> tuple[int, int, int, int]:
        if self._data is not None:
            return tuple(self._data.shape)  # type: ignore[return-value]
        return self.dataobj.shape

    @property
    def spatial_shape(self) -> tuple[int, int, int]:
        return self.shape[1:]

    @property
    def num_channels(self) -> int:
        return self.shape[0]

    @property
    def spacing(self) -> tuple[float, float, float]:
        return self.affine.spacing

    @property
    def origin(self) -> tuple[float, float, float]:
        return self.affine.origin

    @property
    def orientation(self) -> tuple[str, str, str]:
        return self.affine.orientation

    @property
    def memory(self) -> int:
        """Estimated bytes once loaded."""
        n = 1
        for d in self.shape:
            n *= d
        itemsize = np.dtype(self.dtype).itemsize if self._data is None else self._data.dtype.itemsize
        return n * itemsize

    @property
    def dtype(self):
        if self._data is not None:
            return self._data.dtype
        return self.dataobj.dtype

    @property
    def points(self) -> dict[str, Points]:
        return self._points

    @property
    def bounding_boxes(self) -> dict[str, BoundingBoxes]:
        return self._bounding_boxes

    @property
    def device(self):
        """JAX device of the data, or ``None`` for host numpy / unloaded."""
        if isinstance(self._data, jax.Array):
            return next(iter(self._data.devices()))
        return None

    # --- Mutation ---

    def set_data(self, value: Any) -> None:
        """Replace voxel data (keeps the current affine)."""
        arr = value if isinstance(value, jax.Array) else _to_host(value)
        if arr.ndim == 3:
            arr = arr[None]
        if arr.ndim != 4:
            raise ValueError(f"Image data must be 3D or 4D, got shape {arr.shape}")
        self._data = arr
        if self._affine is None:
            self._affine = AffineMatrix()
        self._backend = ArrayBackend(_to_host(arr), self._affine.data)
        self._path = None

    def to(self, device: Any = None, dtype: Any = None) -> "Image":
        """Place data on a JAX device (or back on host with ``"cpu"``)."""
        self.load()
        data = self._data
        if dtype is not None:
            data = data.astype(dtype)  # type: ignore[union-attr]
        if device is not None:
            if isinstance(device, str) and device in ("cpu", "host"):
                data = _to_host(data)
            else:
                if isinstance(device, str):
                    device = jax.devices(device)[0]
                data = jax.device_put(data, device)
        self._data = data
        return self

    def numpy(self) -> np.ndarray:
        """Data as host numpy."""
        return _to_host(self.data)

    def jax(self) -> jax.Array:
        """Data as a JAX array (device_put if still on host)."""
        data = self.data
        if isinstance(data, jax.Array):
            return data
        import jax.numpy as jnp

        return jnp.asarray(data)

    def new_like(
        self,
        *,
        data: Any = None,
        affine: Any = None,
        **kwargs: Any,
    ) -> "Image":
        """New image of the same class sharing metadata/annotations."""
        new_data = self.data if data is None else data
        new_affine = self.affine if affine is None else affine
        meta = dict(self._metadata)
        meta.update(kwargs)
        out = type(self)(
            _to_host(new_data) if not isinstance(new_data, jax.Array) else new_data,
            affine=AffineMatrix(new_affine),
            points={k: _copy.deepcopy(v) for k, v in self._points.items()},
            bounding_boxes={k: _copy.deepcopy(v) for k, v in self._bounding_boxes.items()},
            **meta,
        )
        return out

    def save(self, path: str | Path, **kwargs: Any) -> None:
        """Write to disk; format chosen by suffix.

        Supports ``.nii``/``.nii.gz`` (native writer), ``.nrrd``/
        ``.nhdr`` and ``.mha``/``.mhd`` (native writers, LPS on disk
        like the reference's SimpleITK output), and ``.nii.zarr``
        (optional ``zarr`` dependency). Parity reference:
        ``/root/reference/src/torchio/data/image.py:699-753``.
        """
        from ..io.write import write_image

        write_image(path, self.numpy(), self.affine.data)

    # --- Visualization hooks ---

    def plot(self, **kwargs: Any) -> Any:
        """Three-plane slice plot (see torchio_tpu.visualization)."""
        from ..visualization import plot_image

        return plot_image(self, **kwargs)

    def to_gif(self, output_path: str | Path, **kwargs: Any) -> Path:
        """Save a slice-sweep animated GIF."""
        from ..visualization import make_gif

        return make_gif(self, output_path, **kwargs)

    def to_video(self, output_path: str | Path, **kwargs: Any) -> Path:
        """Save a slice-sweep MP4 (needs the ffmpeg binary)."""
        from ..visualization import make_video

        return make_video(self, output_path, **kwargs)

    def plot_interactive(self, *, height: int = 300) -> Any:
        """Interactive NiiVue viewer in Jupyter (requires ipyniivue)."""
        from ..external.imports import get_ipyniivue

        ipyniivue = get_ipyniivue()
        import tempfile

        tmp = tempfile.NamedTemporaryFile(suffix=".nii.gz", delete=False)  # noqa: SIM115
        tmp.close()
        self.save(tmp.name)
        viewer = ipyniivue.NiiVue(height=height)
        viewer.load_volumes([{"path": tmp.name}])
        return viewer

    def _repr_html_(self) -> str:
        from ..repr_html import image_repr_html

        return image_repr_html(self)

    # --- Indexing ---

    def __getitem__(self, index: Any) -> "Image":
        """Region read: slices go through the backend without loading all.

        Returns a new image of the same class with the affine origin
        shifted to the region corner. Axes are never dropped.
        """
        if isinstance(index, str):
            return self._metadata[index]
        if self._data is not None:
            slices = normalize_index(index, self.shape)
            if isinstance(self._data, jax.Array):
                # device-resident data: slice ON DEVICE (a host pull
                # here would download the whole volume per patch)
                region = self._data[slices]
            else:
                region = _to_host(self._data)[slices]
            corner = np.array([slices[1].start, slices[2].start, slices[3].start])
        else:
            backend = self.dataobj
            slices = normalize_index(index, backend.shape)
            region = backend[slices]
            corner = np.array([slices[1].start, slices[2].start, slices[3].start])
        aff = np.array(self.affine.data)
        aff[:3, 3] = aff[:3, :3] @ corner.astype(np.float64) + aff[:3, 3]
        return self.new_like(data=region, affine=aff)

    def __setitem__(self, key: str, value: Any) -> None:
        self._metadata[key] = value

    def __contains__(self, key: str) -> bool:
        return key in self._metadata

    def __getattr__(self, name: str) -> Any:
        if name.startswith("_"):
            raise AttributeError(name)
        try:
            meta = object.__getattribute__(self, "_metadata")
        except AttributeError:
            raise AttributeError(name) from None
        if name in meta:
            return meta[name]
        raise AttributeError(f"{type(self).__name__} has no attribute {name!r}")

    # --- Copy ---

    def __copy__(self) -> "Image":
        return self.__deepcopy__({})

    def __deepcopy__(self, memo: dict) -> "Image":
        """Deep copy preserving laziness: unloaded images stay unloaded."""
        cls = type(self)
        new = cls.__new__(cls)
        memo[id(self)] = new
        new._reader = self._reader
        new._reader_kwargs = dict(self._reader_kwargs)
        new._suffix = self._suffix
        new._metadata = _copy.deepcopy(self._metadata, memo)
        new._path = self._path
        new._uri = self._uri
        new._affine = self._affine.clone() if self._affine is not None else None
        new._points = {k: _copy.deepcopy(v, memo) for k, v in self._points.items()}
        new._bounding_boxes = {
            k: _copy.deepcopy(v, memo) for k, v in self._bounding_boxes.items()
        }
        new.applied_transforms = list(self.applied_transforms)
        if self._data is not None:
            if isinstance(self._data, jax.Array):
                new._data = self._data  # immutable: safe to share, stays on device
                new._backend = None
            else:
                new._data = self._data.copy()
                new._backend = ArrayBackend(new._data, new.affine.data)
        else:
            new._data = None
            new._backend = self._backend  # backends are read-only views
        return new

    def __repr__(self) -> str:
        cls = type(self).__name__
        try:
            shape = self.shape
            status = "loaded" if self.is_loaded else "lazy"
            return (
                f"{cls}(shape: {shape}; spacing:"
                f" ({', '.join(f'{s:.2f}' for s in self.spacing)});"
                f" orientation: {''.join(self.orientation)}+; {status})"
            )
        except Exception:
            return f"{cls}(empty)"


class ScalarImage(Image):
    """Intensity image (MRI, CT, ...). Interpolated smoothly by transforms."""


class LabelMap(Image):
    """Discrete segmentation. Transforms use nearest/label interpolation
    and skip intensity modifications."""

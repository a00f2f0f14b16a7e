"""Batch containers: 5D stacked image data with per-sample affines.

Parity reference: ``/root/reference/src/torchio/data/batch.py``
(``ImagesBatch``, ``SubjectsBatch``/``StudiesBatch``, per-element history
slicing via ``_slice_history``/``_slice_params``).

Data lives as a JAX array (or host numpy pre-device) of shape
``(B, C, I, J, K)``; affines are host float64 (one per sample). This is
the structure transforms operate on — the hot path.
"""

from __future__ import annotations

import copy as _copy
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..core.affine import AffineMatrix
from .image import Image, ScalarImage
from .invertible import Invertible

#: Reserved param keys used for per-instance history bookkeeping.
_BATCH_META_KEYS = ("_batch_size", "_batched_keys", "_keep")


class ImagesBatch(Invertible):
    """5D array ``(B, C, I, J, K)`` + per-sample affines + image class."""

    def __init__(
        self,
        data: Any,
        affines: list[AffineMatrix],
        *,
        image_class: type[Image] = ScalarImage,
    ) -> None:
        if data.ndim != 5:
            raise ValueError(f"Expected 5D (B, C, I, J, K) data, got {data.ndim}D")
        if len(affines) != data.shape[0]:
            raise ValueError(f"Expected {data.shape[0]} affines, got {len(affines)}")
        self._data = data
        self._affines = affines
        self._image_class = image_class
        self._sharding: Any = None
        self.applied_transforms: list[Any] = []

    @classmethod
    def from_images(cls, images: list[Image]) -> "ImagesBatch":
        if not images:
            raise ValueError("Cannot create batch from empty list")
        arrays = [img.data for img in images]
        if any(isinstance(a, jax.Array) for a in arrays):
            stacked: Any = jnp.stack([jnp.asarray(a) for a in arrays])
        else:
            stacked = np.stack(arrays)
        affines = [img.affine.clone() for img in images]
        return cls(stacked, affines, image_class=type(images[0]))

    @property
    def data(self) -> Any:
        return self._data

    @data.setter
    def data(self, value: Any) -> None:
        if value.ndim != 5:
            raise ValueError(f"Expected 5D tensor, got {value.ndim}D")
        if self._sharding is not None and value.shape[0] == self._data.shape[0]:
            # Placement invariant: a sharded batch keeps every stage's
            # output on the mesh (device_put is a no-op when the kernel
            # already produced the right sharding). Shape-changing
            # stages (e.g. Resample to a new space) re-place too — only
            # a batch-size change drops the sharding.
            value = jax.device_put(jnp.asarray(value), self._sharding)
        elif self._sharding is not None:
            self._sharding = None
        self._data = value

    @property
    def sharding(self) -> Any:
        """The mesh placement enforced on ``data`` (None = unmanaged)."""
        return self._sharding

    def shard_(self, mesh_or_sharding: Any, *, spatial: bool = False) -> "ImagesBatch":
        """Place ``data`` on a mesh and keep transform outputs there.

        Args:
            mesh_or_sharding: a :class:`jax.sharding.Mesh` (the batch axis
                goes over its first axis name; with ``spatial=True`` the J
                axis goes over its second) or an explicit
                :class:`~jax.sharding.NamedSharding`.
            spatial: also shard the J spatial axis (for volumes larger
                than one chip's HBM; stencil/gather kernels then incur
                XLA-inserted collectives).

        Beyond-reference: the reference's only distributed hook is an
        injected subject sampler (SURVEY.md §2.10); here the public
        transform pipeline itself runs on a ``jax.sharding`` mesh.
        """
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        if isinstance(mesh_or_sharding, Mesh):
            mesh = mesh_or_sharding
            names = mesh.axis_names
            spec = PartitionSpec(
                names[0],
                None,
                None,
                names[1] if spatial and len(names) > 1 else None,
                None,
            )
            sharding = NamedSharding(mesh, spec)
        else:
            sharding = mesh_or_sharding
        self._sharding = sharding
        self._data = jax.device_put(jnp.asarray(self._data), sharding)
        return self

    def unshard_(self) -> "ImagesBatch":
        """Stop enforcing the mesh placement (data stays where it is)."""
        self._sharding = None
        return self

    def __deepcopy__(self, memo: dict) -> "ImagesBatch":
        # jax Arrays and shardings are immutable: share the buffers,
        # copy the mutable metadata (the same contract as the
        # reference's deepcopy-before-transform).
        cls = type(self)
        new = cls.__new__(cls)
        memo[id(self)] = new
        data = self._data
        new._data = data if isinstance(data, jax.Array) else _copy.deepcopy(data, memo)
        new._affines = [a.clone() for a in self._affines]
        new._image_class = self._image_class
        new._sharding = self._sharding
        new.applied_transforms = _copy.deepcopy(self.applied_transforms, memo)
        return new

    @property
    def affines(self) -> list[AffineMatrix]:
        return self._affines

    @affines.setter
    def affines(self, value: list[AffineMatrix]) -> None:
        self._affines = value

    @property
    def image_class(self) -> type[Image]:
        return self._image_class

    @property
    def batch_size(self) -> int:
        return int(self._data.shape[0])

    @property
    def device(self):
        if isinstance(self._data, jax.Array):
            return next(iter(self._data.devices()))
        return None

    def affines_array(self, dtype=np.float32) -> np.ndarray:
        """(B, 4, 4) stacked affines for device-side geometry."""
        return np.stack([a.data for a in self._affines]).astype(dtype)

    def to(self, device: Any = None, dtype: Any = None) -> "ImagesBatch":
        data = self._data
        if dtype is not None:
            data = data.astype(dtype)
        if device is not None:
            if isinstance(device, str) and device in ("cpu", "host"):
                data = np.asarray(data)
            else:
                if isinstance(device, str):
                    device = jax.devices(device)[0]
                data = jax.device_put(data, device)
        self._data = data
        return self

    def __getitem__(self, index: int) -> Image:
        # keep device arrays on device; host numpy stays host
        return self._image_class(
            self._data[index], affine=self._affines[index].clone()
        )

    def __len__(self) -> int:
        return self.batch_size

    def unbatch(self) -> list[Image]:
        return [self[i] for i in range(self.batch_size)]

    def __repr__(self) -> str:
        b, c, i, j, k = self._data.shape
        return (
            f"ImagesBatch({self._image_class.__name__}, batch_size={b},"
            f" shape=({c}, {i}, {j}, {k}))"
        )


class SubjectsBatch(Invertible):
    """Named image batches + per-sample metadata lists.

    The unit every transform operates on. Supports per-element history
    slicing on :meth:`unbatch` and per-element branch histories from
    per-instance OneOf/SomeOf.
    """

    def __init__(
        self,
        images: dict[str, ImagesBatch],
        *,
        metadata: dict[str, list[Any]] | None = None,
    ) -> None:
        self._images = images
        self._metadata: dict[str, list[Any]] = metadata or {}
        self.applied_transforms: list[Any] = []
        self._per_element_history: list[list[Any]] | None = None

    @classmethod
    def from_subjects(cls, subjects: list[Any]) -> "SubjectsBatch":
        if not subjects:
            raise ValueError("Cannot create batch from empty list")
        first = subjects[0]
        images = {
            name: ImagesBatch.from_images([s.images[name] for s in subjects])
            for name in first.images
        }
        metadata = {
            key: [s.metadata[key] for s in subjects] for key in first.metadata
        }
        return cls(images, metadata=metadata)

    # --- Properties ---

    @property
    def batch_size(self) -> int:
        if self._images:
            return next(iter(self._images.values())).batch_size
        # imageless subjects (metadata-only) still batch and transform
        # (as no-ops); infer the element count from any metadata list
        for values in self._metadata.values():
            return len(values)
        raise ValueError("Batch has no images or metadata")

    @property
    def images(self) -> dict[str, ImagesBatch]:
        return self._images

    @property
    def metadata(self) -> dict[str, list[Any]]:
        return self._metadata

    @property
    def device(self):
        return next(iter(self._images.values())).device

    def to(self, device: Any = None, dtype: Any = None) -> "SubjectsBatch":
        for batch in self._images.values():
            batch.to(device, dtype)
        return self

    def shard_(self, mesh_or_sharding: Any, *, spatial: bool = False) -> "SubjectsBatch":
        """Place every image batch on a mesh; transform outputs stay there.

        See :meth:`ImagesBatch.shard_`. After this, the public pipeline
        (``tio.Compose([...])(batch)``) runs with mesh-sharded arrays and
        XLA inserts the collectives the kernels need.
        """
        for batch in self._images.values():
            batch.shard_(mesh_or_sharding, spatial=spatial)
        return self

    def unshard_(self) -> "SubjectsBatch":
        for batch in self._images.values():
            batch.unshard_()
        return self

    def __getitem__(self, key: str) -> ImagesBatch:
        return self._images[key]

    def __getattr__(self, name: str) -> ImagesBatch:
        if name.startswith("_"):
            raise AttributeError(name)
        images = object.__getattribute__(self, "__dict__").get("_images") or {}
        if name in images:
            return images[name]
        raise AttributeError(f"SubjectsBatch has no attribute {name!r}")

    def __len__(self) -> int:
        return self.batch_size

    # --- Per-element history ---

    def set_per_element_history(self, histories: list[list[Any]]) -> None:
        """Freeze distinct per-element histories (per-instance OneOf path)."""
        if len(histories) != self.batch_size:
            raise ValueError(
                f"Expected {self.batch_size} per-element histories,"
                f" got {len(histories)}"
            )
        self._per_element_history = [list(h) for h in histories]
        self.applied_transforms = []

    def adopt_history(self, source: "SubjectsBatch", subjects: list[Any]) -> None:
        """Carry history over after an unbatch→process→re-stack round trip."""
        if source._per_element_history is not None:
            self.set_per_element_history([s.applied_transforms for s in subjects])
        else:
            self.applied_transforms = list(source.applied_transforms)

    def clear_history(self) -> None:
        self.applied_transforms = []
        self._per_element_history = None

    # --- Unbatch ---

    def unbatch(self) -> list[Any]:
        """Split into Subjects, slicing per-instance history per element."""
        from .subject import Subject

        subjects = []
        for i in range(self.batch_size):
            kwargs: dict[str, Any] = {
                name: ib[i] for name, ib in self._images.items()
            }
            for key, values in self._metadata.items():
                kwargs[key] = values[i]
            sub = Subject(**kwargs)
            suffix = _slice_history(self.applied_transforms, i)
            if self._per_element_history is not None:
                sub.applied_transforms = list(self._per_element_history[i]) + suffix
            else:
                sub.applied_transforms = suffix
            subjects.append(sub)
        return subjects

    # --- Inversion ---

    def get_inverse_transform(self, **kwargs: Any):
        if self._per_element_history is not None:
            raise RuntimeError(
                "This batch has per-element transform histories; a single"
                " batch inverse is ambiguous. Use apply_inverse_transform()"
                " or unbatch() and invert per subject."
            )
        return super().get_inverse_transform(**kwargs)

    def apply_inverse_transform(self, **kwargs: Any) -> "SubjectsBatch":
        if self._per_element_history is not None:
            inverted = [s.apply_inverse_transform(**kwargs) for s in self.unbatch()]
            return type(self).from_subjects(inverted)
        return super().apply_inverse_transform(**kwargs)

    def __repr__(self) -> str:
        names = ", ".join(self._images)
        return f"SubjectsBatch(batch_size={self.batch_size}, images=[{names}])"


StudiesBatch = SubjectsBatch


def _slice_params(
    params: dict[str, Any], index: int, batched_keys: list[str]
) -> dict[str, Any]:
    """One element's view of a per-instance params dict.

    Keys named in ``batched_keys`` hold one list entry per element and
    are indexed; everything else is shared verbatim. The bookkeeping
    keys (``_BATCH_META_KEYS``) never survive into a per-subject record.
    """
    per_element = {k for k in batched_keys if isinstance(params.get(k), list)}
    return {
        key: value[index] if key in per_element else value
        for key, value in params.items()
        if key not in _BATCH_META_KEYS
    }


def _trace_for_element(trace: Any, index: int) -> Any | None:
    """The element's version of one history record.

    Batch-shared records (no ``_batched_keys`` tag) pass through as-is.
    Per-instance records come back with their params sliced to the
    element; ``None`` means the record's keep-mask gated this element
    out and the record should be dropped from that subject's history.
    """
    # peek without resolving: batch-shared records pass through with any
    # deferred statistics intact (they resolve on first user access)
    peek = trace.raw_params() if hasattr(trace, "raw_params") else None
    params = peek if peek is not None else getattr(trace, "params", None)
    if not isinstance(params, dict) or "_batched_keys" not in params:
        return trace
    recorded_for = params.get("_batch_size")
    if recorded_for is not None and index not in range(recorded_for):
        raise IndexError(
            f"Element {index} is outside the batch of size {recorded_for}"
            " this per-instance transform was recorded for"
        )
    keep = params.get("_keep")
    if keep is not None and not keep[index]:
        return None
    element_params = _slice_params(params, index, params["_batched_keys"])
    return trace.replace_params(element_params)


def _slice_history(history: list[Any], index: int) -> list[Any]:
    """Per-subject history for batch element ``index`` (see
    :func:`_trace_for_element` for the per-record rules)."""
    views = (_trace_for_element(trace, index) for trace in history)
    return [view for view in views if view is not None]

"""Subject (a.k.a. Study): a dict-like collection of images + annotations.

Parity reference: ``/root/reference/src/torchio/data/subject.py``
(kwargs auto-classified into images/points/bboxes/metadata, attribute and
key access, whole-subject spatial slicing, consistency checks).
"""

from __future__ import annotations

import copy as _copy
from typing import Any, Iterator

from .bboxes import BoundingBoxes
from .image import Image, LabelMap, ScalarImage
from .invertible import Invertible
from .points import Points


class Subject(Invertible):
    """A study: named images, point sets, bounding boxes, and metadata.

    Examples:
        >>> subject = Subject(
        ...     t1=ScalarImage("t1.nii.gz"),
        ...     seg=LabelMap("seg.nii.gz"),
        ...     age=45,
        ... )
        >>> subject.t1.spatial_shape
    """

    def __init__(self, *args: Any, **kwargs: Any) -> None:
        if args:
            if len(args) > 1 or not isinstance(args[0], dict):
                raise ValueError(
                    "Subject accepts a single dict or keyword arguments"
                )
            kwargs = {**args[0], **kwargs}
        images: dict[str, Image] = {}
        points: dict[str, Points] = {}
        bboxes: dict[str, BoundingBoxes] = {}
        metadata: dict[str, Any] = {}
        for k, v in kwargs.items():
            if isinstance(v, Image):
                images[k] = v
            elif isinstance(v, Points):
                points[k] = v
            elif isinstance(v, BoundingBoxes):
                bboxes[k] = v
            else:
                metadata[k] = v
        if not (images or points or bboxes or metadata):
            raise ValueError("A Subject must contain at least one entry")
        self._images = images
        self._points = points
        self._bounding_boxes = bboxes
        self._metadata = metadata
        self.applied_transforms: list[Any] = []

    # --- Access ---

    def __getattr__(self, name: str) -> Any:
        if name.startswith("_"):
            raise AttributeError(name)
        d = object.__getattribute__(self, "__dict__")
        for store_name in ("_images", "_points", "_bounding_boxes", "_metadata"):
            store = d.get(store_name)
            if store and name in store:
                return store[name]
        raise AttributeError(f"Subject has no entry {name!r}")

    def __getitem__(self, item: Any):
        # String lookup covers the SPATIAL stores only, consistent with
        # __iter__/__len__/__contains__ and the reference
        # (subject.py:129-134); metadata is attribute-style or
        # ``subject.metadata[...]``.
        if isinstance(item, str):
            for store in (
                self._images,
                self._points,
                self._bounding_boxes,
            ):
                if item in store:
                    return store[item]
            raise KeyError(item)
        return self._spatial_slice(item)

    def __setitem__(self, key: str, value: Any) -> None:
        for store in (self._images, self._points, self._bounding_boxes, self._metadata):
            store.pop(key, None)
        if isinstance(value, Image):
            self._images[key] = value
        elif isinstance(value, Points):
            self._points[key] = value
        elif isinstance(value, BoundingBoxes):
            self._bounding_boxes[key] = value
        else:
            self._metadata[key] = value

    def __delitem__(self, key: str) -> None:
        for store in (self._images, self._points, self._bounding_boxes, self._metadata):
            if key in store:
                del store[key]
                return
        raise KeyError(key)

    # Iteration, length, and membership cover the SPATIAL entries only
    # (images, points, boxes) — metadata is reachable via attribute/key
    # access but is not part of the spatial mapping, matching the
    # reference (subject.py:137-154).
    def __contains__(self, name: object) -> bool:
        return any(
            name in store
            for store in (
                self._images,
                self._points,
                self._bounding_boxes,
            )
        )

    def __iter__(self) -> Iterator[str]:
        yield from self._images
        yield from self._points
        yield from self._bounding_boxes

    def __len__(self) -> int:
        return (
            len(self._images)
            + len(self._points)
            + len(self._bounding_boxes)
        )

    def keys(self):
        return list(iter(self))

    def get(self, key: str, default: Any = None) -> Any:
        try:
            return self[key]
        except KeyError:
            return default

    def items(self):
        return [(k, self[k]) for k in self]

    def values(self):
        return [self[k] for k in self]

    # --- Properties ---

    @property
    def metadata(self) -> dict[str, Any]:
        return self._metadata

    @property
    def images(self) -> dict[str, Image]:
        return self._images

    @property
    def points(self) -> dict[str, Points]:
        return self._points

    @property
    def bounding_boxes(self) -> dict[str, BoundingBoxes]:
        return self._bounding_boxes

    @property
    def spatial_shape(self) -> tuple[int, int, int]:
        self._check_consistent_attribute("spatial_shape")
        return self._first_image.spatial_shape

    @property
    def shape(self) -> tuple[int, int, int, int]:
        self._check_consistent_attribute("shape")
        return self._first_image.shape

    @property
    def spacing(self) -> tuple[float, float, float]:
        self._check_consistent_attribute("spacing")
        return self._first_image.spacing

    @property
    def device(self):
        return self._first_image.device

    @property
    def _first_image(self) -> Image:
        if not self._images:
            raise RuntimeError("Subject contains no images")
        return next(iter(self._images.values()))

    def get_images(
        self, intensity_only: bool = True, include=None, exclude=None
    ) -> list[Image]:
        """Images filtered by type and name (transform scoping helper)."""
        out = []
        for name, image in self._images.items():
            if include is not None and name not in include:
                continue
            if exclude is not None and name in exclude:
                continue
            if intensity_only and not isinstance(image, ScalarImage):
                continue
            out.append(image)
        return out

    def get_images_dict(
        self, intensity_only: bool = True, include=None, exclude=None
    ) -> dict[str, Image]:
        out = {}
        for name, image in self._images.items():
            if include is not None and name not in include:
                continue
            if exclude is not None and name in exclude:
                continue
            if intensity_only and not isinstance(image, ScalarImage):
                continue
            out[name] = image
        return out

    # --- Annotations ---

    def all_points(self) -> dict[Any, Points]:
        """Subject-level and per-image point sets, keyed by name or (img, name)."""
        out: dict[Any, Points] = dict(self._points)
        for img_name, image in self._images.items():
            for pname, pts in image.points.items():
                out[(img_name, pname)] = pts
        return out

    def all_bounding_boxes(self) -> dict[Any, BoundingBoxes]:
        out: dict[Any, BoundingBoxes] = dict(self._bounding_boxes)
        for img_name, image in self._images.items():
            for bname, boxes in image.bounding_boxes.items():
                out[(img_name, bname)] = boxes
        return out

    # --- Behavior ---

    def load(self) -> None:
        for image in self._images.values():
            image.load()

    def unload(self) -> None:
        for image in self._images.values():
            image.unload()

    def to(self, device: Any = None, dtype: Any = None) -> "Subject":
        for image in self._images.values():
            image.to(device, dtype)
        return self

    def check_consistent_spatial_shape(self) -> None:
        self._check_consistent_attribute("spatial_shape")

    def check_consistent_space(self) -> None:
        self._check_consistent_attribute("spatial_shape")
        self._check_consistent_attribute("spacing")

    def _check_consistent_attribute(
        self, attribute: str, rel_tol: float = 1e-6
    ) -> None:
        if len(self._images) <= 1:
            return
        names = list(self._images)
        first = getattr(self._images[names[0]], attribute)
        import numpy as _np

        for name in names[1:]:
            value = getattr(self._images[name], attribute)
            same = (
                _np.allclose(value, first, rtol=rel_tol)
                if isinstance(first, tuple) and first and isinstance(first[0], float)
                else value == first
            )
            if not same:
                raise RuntimeError(
                    f"Inconsistent {attribute} across images:"
                    f" {names[0]}={first}, {name}={value}"
                )

    def _spatial_slice(self, item: Any) -> "Subject":
        if not self._images:
            raise RuntimeError("Cannot spatially slice a Subject with no images")
        self._check_consistent_attribute("spatial_shape")
        if isinstance(item, (int, slice)) or item is Ellipsis:
            items: tuple = (item,)
        elif isinstance(item, tuple):
            items = item
        else:
            raise TypeError(f"Index type {type(item).__name__} not understood")
        kwargs: dict[str, Any] = {
            name: image[(slice(None), *items)] for name, image in self._images.items()
        }
        kwargs.update(self._points)
        kwargs.update(self._bounding_boxes)
        kwargs.update(self._metadata)
        new = type(self)(**kwargs)
        new.applied_transforms = list(self.applied_transforms)
        return new

    # --- Copy & repr ---

    def __copy__(self) -> "Subject":
        return self.__deepcopy__({})

    def __deepcopy__(self, memo: dict) -> "Subject":
        new = type(self).__new__(type(self))
        memo[id(self)] = new
        new._images = {k: _copy.deepcopy(v, memo) for k, v in self._images.items()}
        new._points = {k: _copy.deepcopy(v, memo) for k, v in self._points.items()}
        new._bounding_boxes = {
            k: _copy.deepcopy(v, memo) for k, v in self._bounding_boxes.items()
        }
        new._metadata = _copy.deepcopy(self._metadata, memo)
        new.applied_transforms = list(self.applied_transforms)
        return new

    def plot(self, **kwargs: Any) -> Any:
        """Plot all images, one row of three planes each."""
        from ..visualization import plot_subject

        return plot_subject(self, **kwargs)

    def _repr_html_(self) -> str:
        from ..repr_html import subject_repr_html

        return subject_repr_html(self)

    def __repr__(self) -> str:
        parts = []
        if self._images:
            parts.append(f"images: {tuple(self._images)}")
        if self._points:
            parts.append(f"points: {tuple(self._points)}")
        if self._bounding_boxes:
            parts.append(f"bounding_boxes: {tuple(self._bounding_boxes)}")
        if self._metadata:
            parts.append(f"metadata: {tuple(self._metadata)}")
        return f"Subject({'; '.join(parts)})"


# DICOM terminology alias.
Study = Subject

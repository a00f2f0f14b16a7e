"""MONAI transform adapter (optional dependency).

Parity reference: ``/root/reference/src/torchio/transforms/monai_adapter.py``
(wraps MONAI dict-style ``MapTransform`` or array transforms; converts
Image <-> ``monai.data.MetaTensor`` with affine round-trip; skips history
because the wrapped transform is opaque).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from ..data.batch import SubjectsBatch
from .transform import Transform


def _filter_images(images: dict, include, exclude) -> dict:
    """Apply include/exclude name filters (reference
    cornucopia_adapter.py:137-144, monai_adapter.py:101-109)."""
    if include is not None:
        images = {k: v for k, v in images.items() if k in include}
    if exclude is not None:
        images = {k: v for k, v in images.items() if k not in exclude}
    return images


def _require_monai():
    try:
        import monai  # noqa: F401

        return monai
    except ImportError as e:  # pragma: no cover - optional dep
        raise ImportError(
            "MonaiAdapter requires MONAI: pip install monai"
        ) from e


class MonaiAdapter(Transform):
    """Run a MONAI transform inside a torchio_tpu pipeline.

    Dict-style (``MapTransform``) instances receive ``{name: MetaTensor}``;
    array transforms receive each image tensor individually. The wrapped
    transform is opaque, so no history entry is recorded.
    """

    _records_history = False

    def __init__(self, monai_transform: Any, **kwargs: Any) -> None:
        super().__init__(**kwargs)
        if not callable(monai_transform):
            raise TypeError(
                "monai_transform must be callable,"
                f" got {type(monai_transform).__name__}"
            )
        self.transform = monai_transform

    def apply_transform(
        self, batch: SubjectsBatch, params: dict[str, Any]
    ) -> SubjectsBatch:
        monai = _require_monai()
        import torch

        from monai.data import MetaTensor
        from monai.transforms import MapTransform

        from ..data.image import ScalarImage

        is_dict_style = isinstance(self.transform, MapTransform)
        subjects = batch.unbatch()
        for subject in subjects:
            if is_dict_style:
                # Dict-style (MapTransform): ALL images (the transform's
                # `keys` decide what it touches — filtering here would
                # break image/label-coupled spatial transforms) plus
                # metadata, mirroring the reference's
                # _apply_dict_transform (monai_adapter.py:167-186).
                if not subject.images:
                    continue
                data: dict[str, Any] = {}
                for name, image in subject.images.items():
                    tensor = torch.as_tensor(np.asarray(image.data))
                    data[name] = MetaTensor(
                        tensor, affine=torch.as_tensor(image.affine.data)
                    )
                data.update(subject.metadata)
                result = self.transform(data)
                for name, image in subject.images.items():
                    value = result.get(name)
                    if not isinstance(value, torch.Tensor):
                        continue
                    image.set_data(np.asarray(value))
                    if isinstance(value, MetaTensor) and value.affine is not None:
                        image.affine = np.asarray(value.affine)
            else:
                # Array-style: ScalarImage only, then include/exclude
                # (reference monai_adapter.py:101-109).
                scalars = {
                    k: v
                    for k, v in subject.images.items()
                    if isinstance(v, ScalarImage)
                }
                images = _filter_images(scalars, self.include, self.exclude)
                for image in images.values():
                    tensor = torch.as_tensor(np.asarray(image.data))
                    image.set_data(np.asarray(self.transform(tensor)))
        rebuilt = SubjectsBatch.from_subjects(subjects)
        batch._images = rebuilt._images
        batch._metadata = rebuilt._metadata
        return batch


class CornucopiaAdapter(Transform):
    """Run a Cornucopia transform on all image tensors positionally.

    Parity reference:
    ``/root/reference/src/torchio/transforms/cornucopia_adapter.py``
    (scalar images first, then labels, so Cornucopia shares spatial
    parameters across them; not invertible).
    """

    _records_history = False

    def __init__(self, cornucopia_transform: Any, **kwargs: Any) -> None:
        super().__init__(**kwargs)
        if not callable(cornucopia_transform):
            raise TypeError(
                "cornucopia_transform must be callable,"
                f" got {type(cornucopia_transform).__name__}"
            )
        self.transform = cornucopia_transform

    def apply_transform(
        self, batch: SubjectsBatch, params: dict[str, Any]
    ) -> SubjectsBatch:
        try:
            import torch
        except ImportError as e:  # pragma: no cover
            raise ImportError("CornucopiaAdapter requires torch") from e

        from ..data.image import ScalarImage

        subjects = batch.unbatch()
        for subject in subjects:
            images = _filter_images(
                dict(subject.images), self.include, self.exclude
            )
            scalars = [
                (n, img)
                for n, img in images.items()
                if isinstance(img, ScalarImage)
            ]
            labels = [
                (n, img)
                for n, img in images.items()
                if not isinstance(img, ScalarImage)
            ]
            ordered = scalars + labels
            if not ordered:
                continue  # filter matched nothing (reference :116-117)
            tensors = [torch.as_tensor(np.asarray(img.data)) for _, img in ordered]
            results = self.transform(*tensors)
            if not isinstance(results, (tuple, list)):
                results = (results,)
            if len(results) != len(ordered):
                raise ValueError(
                    f"Cornucopia transform returned {len(results)} tensors"
                    f" for {len(ordered)} input images"
                )
            for (name, img), result in zip(ordered, results):
                if hasattr(result, "detach"):
                    result = result.detach()
                img.set_data(np.asarray(result))
        rebuilt = SubjectsBatch.from_subjects(subjects)
        batch._images = rebuilt._images
        batch._metadata = rebuilt._metadata
        return batch

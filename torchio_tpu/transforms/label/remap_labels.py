"""RemapLabels (invertible when bijective) and RemoveLabels.

Parity reference: ``/root/reference/src/torchio/transforms/label/remap_labels.py``
and ``remove_labels.py``.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp

from ...data.batch import SubjectsBatch
from ...data.image import LabelMap
from .._utils import as_jnp
from ..transform import Transform


def _remap(data, remapping: dict) -> Any:
    out = data
    for old, new in remapping.items():
        out = jnp.where(data == float(old), float(new), out)
    return out.astype(data.dtype)


class RemapLabels(Transform):
    r"""Replace label values per a ``{old: new}`` dict (others unchanged)."""

    def __init__(self, remapping: dict[int, int], **kwargs: Any) -> None:
        super().__init__(**kwargs)
        self.remapping = dict(remapping)

    def make_params(self, batch: SubjectsBatch) -> dict[str, Any]:
        return {"remapping": {int(k): int(v) for k, v in self.remapping.items()}}

    def apply_transform(
        self, batch: SubjectsBatch, params: dict[str, Any]
    ) -> SubjectsBatch:
        remapping = {int(k): int(v) for k, v in params["remapping"].items()}
        for _name, img_batch in batch.images.items():
            if not issubclass(img_batch.image_class, LabelMap):
                continue
            img_batch.data = _remap(as_jnp(img_batch.data), remapping)
        return batch

    @property
    def invertible(self) -> bool:
        return True

    def inverse(self, params: dict[str, Any]) -> "RemapLabels":
        remapping = {int(k): int(v) for k, v in params["remapping"].items()}
        return RemapLabels({v: k for k, v in remapping.items()}, copy=False)


class RemoveLabels(Transform):
    """Set the given labels to ``background_label``."""

    def __init__(
        self,
        labels: Sequence[int],
        *,
        background_label: int = 0,
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        self.labels = list(labels)
        self.background_label = background_label

    def apply_transform(
        self, batch: SubjectsBatch, params: dict[str, Any]
    ) -> SubjectsBatch:
        remapping = {int(lbl): int(self.background_label) for lbl in self.labels}
        for _name, img_batch in batch.images.items():
            if not issubclass(img_batch.image_class, LabelMap):
                continue
            img_batch.data = _remap(as_jnp(img_batch.data), remapping)
        return batch

"""Mask: set voxels outside a mask to a constant.

Parity reference: ``/root/reference/src/torchio/transforms/intensity/mask.py``.
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
import numpy as np

from ...data.batch import SubjectsBatch
from ...data.image import LabelMap
from .._utils import as_jnp
from ..transform import IntensityTransform


class Mask(IntensityTransform):
    """Zero (or set to ``outside_value``) voxels outside a mask.

    ``masking_method`` is a LabelMap key or a callable on the first
    sample's tensor; ``labels`` optionally restricts which label values
    count as inside.
    """

    def __init__(
        self,
        *,
        masking_method: str | Callable = "brain",
        outside_value: float = 0.0,
        labels: list[int] | None = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        self.masking_method = masking_method
        self.outside_value = outside_value
        self.labels = labels

    def apply_transform(
        self, batch: SubjectsBatch, params: dict[str, Any]
    ) -> SubjectsBatch:
        mask = self._resolve_mask(batch)
        for _name, img_batch in self._get_images(batch).items():
            data = as_jnp(img_batch.data)
            img_batch.data = jnp.where(mask, data, self.outside_value)
        return batch

    def fusable(self, batch: SubjectsBatch) -> bool:
        # LabelMap-key masks fuse (the mask rides the data dict);
        # callable masks run host numpy on concrete arrays
        return (
            bool(self._get_images(batch))
            and isinstance(self.masking_method, str)
            and self.masking_method in batch.images
            and issubclass(
                batch.images[self.masking_method].image_class, LabelMap
            )
        )

    def fused_stage(self, batch: SubjectsBatch):
        from ..fuse import FusedStage, mask_apply

        names = tuple(self._get_images(batch))
        if not names:
            return None
        mask_name = self.masking_method
        labels = None if self.labels is None else tuple(self.labels)
        return FusedStage(
            key=(
                "mask", (*names, mask_name), mask_name, labels,
                self.outside_value,
            ),
            apply=mask_apply(names, mask_name, labels, self.outside_value),
            args=(),
            params={},
        )

    def _resolve_mask(self, batch: SubjectsBatch):
        if callable(self.masking_method) and not isinstance(self.masking_method, str):
            first = next(iter(self._get_images(batch).values()))
            return jnp.asarray(
                np.asarray(self.masking_method(np.asarray(first.data[0])), bool)
            )
        if isinstance(self.masking_method, str):
            key = self.masking_method
            if key not in batch.images:
                raise KeyError(
                    f'Masking method "{key}" not found in batch images.'
                    f" Available: {list(batch.images)}"
                )
            mask_batch = batch.images[key]
            if not issubclass(mask_batch.image_class, LabelMap):
                raise TypeError(f'Masking method "{key}" must refer to a LabelMap.')
            mask_data = as_jnp(mask_batch.data[0])
            if self.labels is not None:
                mask = jnp.zeros_like(mask_data, bool)
                for label in self.labels:
                    mask = mask | (mask_data == label)
                return mask
            return mask_data.astype(bool)
        raise TypeError(
            f"masking_method must be a str or callable, got {type(self.masking_method)}"
        )

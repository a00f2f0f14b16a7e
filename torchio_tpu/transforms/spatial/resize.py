"""Resize: interpolate to a target shape (FOV preserved, spacing scales).

Parity reference: ``/root/reference/src/torchio/transforms/spatial/resize.py``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from ...data.batch import SubjectsBatch
from ...data.image import LabelMap
from ...ops.resample import upsample_volume
from .._utils import as_jnp
from ..transform import SpatialTransform


def _resize_nearest(data, target):
    out = data
    for rel, n_out in enumerate(target):
        axis = out.ndim - 3 + rel
        n_in = out.shape[axis]
        # torch F.interpolate nearest: src = floor(dst * in / out)
        idx = (np.arange(n_out) * n_in // n_out).clip(max=n_in - 1)
        out = jnp.take(out, jnp.asarray(idx), axis=axis)
    return out


class Resize(SpatialTransform):
    r"""Resample to a fixed spatial shape (anisotropic scaling warning:
    prefer Resample + CropOrPad for medical data)."""

    def __init__(
        self,
        target_shape: int | tuple[int, int, int],
        *,
        image_interpolation: str = "linear",
        label_interpolation: str = "nearest",
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        if isinstance(target_shape, int):
            target_shape = (target_shape,) * 3
        self.target_shape = tuple(int(s) for s in target_shape)
        self.image_interpolation = image_interpolation
        self.label_interpolation = label_interpolation

    def make_params(self, batch: SubjectsBatch) -> dict[str, Any]:
        return {"target_shape": list(self.target_shape)}

    def apply_transform(
        self, batch: SubjectsBatch, params: dict[str, Any]
    ) -> SubjectsBatch:
        target = tuple(params["target_shape"])
        for _name, img_batch in batch.images.items():
            is_label = issubclass(img_batch.image_class, LabelMap)
            mode = self.label_interpolation if is_label else self.image_interpolation
            data = as_jnp(img_batch.data)
            old_shape = data.shape[2:]
            if mode == "nearest":
                resized = _resize_nearest(data.astype(jnp.float32), target)
            else:
                resized = upsample_volume(data.astype(jnp.float32), target)
            img_batch.data = resized.astype(data.dtype)
            for affine in img_batch.affines:
                for axis in range(3):
                    affine._matrix[:3, axis] *= old_shape[axis] / target[axis]
        return batch

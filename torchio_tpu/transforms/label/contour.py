"""Contour: surface voxels of each label via morphological erosion.

Parity reference: ``/root/reference/src/torchio/transforms/label/contour.py``
(pad with -1; 3x3x3 min-pool erosion; boundary where eroded != original).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from jax import lax

from ...data.batch import SubjectsBatch
from ...data.image import LabelMap
from .._utils import as_jnp
from ..transform import Transform


def _extract_contour(data):
    f32 = as_jnp(data).astype(jnp.float32)
    padded = jnp.pad(
        f32, [(0, 0), (0, 0), (1, 1), (1, 1), (1, 1)], constant_values=-1.0
    )
    eroded = -lax.reduce_window(
        -padded,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, 1, 3, 3, 3),
        window_strides=(1, 1, 1, 1, 1),
        padding="VALID",
    )
    return (eroded != f32).astype(jnp.float32)


class Contour(Transform):
    """Replace each label map with its boundary voxels (binary)."""

    def apply_transform(
        self, batch: SubjectsBatch, params: dict[str, Any]
    ) -> SubjectsBatch:
        for _name, img_batch in batch.images.items():
            if not issubclass(img_batch.image_class, LabelMap):
                continue
            img_batch.data = _extract_contour(img_batch.data)
        return batch

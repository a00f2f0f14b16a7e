"""OneHot: label map -> one-hot channels (invertible via argmax).

Parity reference: ``/root/reference/src/torchio/transforms/label/one_hot.py``.
"""

from __future__ import annotations

from typing import Any

import jax.nn
import jax.numpy as jnp
import numpy as np

from ...data.batch import SubjectsBatch
from ...data.image import LabelMap
from .._utils import as_jnp
from ..transform import Transform


class OneHot(Transform):
    r"""One-hot encode each LabelMap: (1, I, J, K) -> (K, I, J, K)."""

    def __init__(self, *, num_classes: int = -1, **kwargs: Any) -> None:
        super().__init__(**kwargs)
        self.num_classes = num_classes

    def make_params(self, batch: SubjectsBatch) -> dict[str, Any]:
        return {"num_classes": self.num_classes}

    def apply_transform(
        self, batch: SubjectsBatch, params: dict[str, Any]
    ) -> SubjectsBatch:
        num_classes = params["num_classes"]
        for _name, img_batch in batch.images.items():
            if not issubclass(img_batch.image_class, LabelMap):
                continue
            data = as_jnp(img_batch.data).astype(jnp.int32)
            n = num_classes
            if n == -1:
                n = int(jnp.max(data)) + 1  # scalar pull only
            encoded = jax.nn.one_hot(data[:, 0], n, axis=1, dtype=jnp.float32)
            img_batch.data = encoded
        return batch

    @property
    def invertible(self) -> bool:
        return True

    def inverse(self, params: dict[str, Any]) -> "_OneHotInverse":
        return _OneHotInverse(copy=False)


class _OneHotInverse(Transform):
    """argmax back to single-channel labels."""

    def apply_transform(
        self, batch: SubjectsBatch, params: dict[str, Any]
    ) -> SubjectsBatch:
        for _name, img_batch in batch.images.items():
            if not issubclass(img_batch.image_class, LabelMap):
                continue
            data = as_jnp(img_batch.data)
            if data.shape[1] > 1:
                img_batch.data = jnp.argmax(data, axis=1, keepdims=True).astype(
                    jnp.float32
                )
        return batch

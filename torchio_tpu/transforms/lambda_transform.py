"""Lambda: apply a user callable per image.

Parity reference:
``/root/reference/src/torchio/transforms/lambda_transform.py`` (callable
receives each (C, I, J, K) tensor; ``types_to_apply`` filters by image
class).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax.numpy as jnp

from ..data.batch import SubjectsBatch
from ..data.image import Image
from ._utils import as_jnp
from .transform import Transform


class Lambda(Transform):
    """Apply ``function`` to each image's (C, I, J, K) array.

    Args:
        function: callable mapping an array to an array of the same shape
            family (the output is re-stacked into the batch).
        types_to_apply: image classes (e.g. ``[ScalarImage]``) to
            restrict application; ``None`` applies to all.
    """

    def __init__(
        self,
        function: Callable,
        types_to_apply: Sequence[type[Image]] | None = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        self.function = function
        self.types_to_apply = tuple(types_to_apply) if types_to_apply else None

    def apply_transform(
        self, batch: SubjectsBatch, params: dict[str, Any]
    ) -> SubjectsBatch:
        for _name, img_batch in self._get_images(batch).items():
            if self.types_to_apply is not None and not issubclass(
                img_batch.image_class, self.types_to_apply
            ):
                continue
            data = as_jnp(img_batch.data)
            outs = [jnp.asarray(self.function(data[i])) for i in range(len(data))]
            for out in outs:
                if out.ndim != 4:
                    raise ValueError(
                        "Lambda function must return a 4D (C, I, J, K) array,"
                        f" got {out.ndim}D"
                    )
            img_batch.data = jnp.stack(outs)
        return batch

"""Clamp (CT windowing).

Parity reference: ``/root/reference/src/torchio/transforms/intensity/clamp.py``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from ...data.batch import SubjectsBatch
from .._utils import as_jnp
from ..transform import IntensityTransform


class Clamp(IntensityTransform):
    """Clamp intensities to ``[out_min, out_max]``."""

    def __init__(
        self,
        *,
        out_min: float | None = None,
        out_max: float | None = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        if out_min is not None and out_max is not None and out_min > out_max:
            raise ValueError(f"out_min ({out_min}) must be <= out_max ({out_max})")
        self.out_min = out_min
        self.out_max = out_max
        self.warn_if_noop(
            is_noop=out_min is None and out_max is None,
            hint="out_min=-1000, out_max=1000",
        )

    def apply_transform(
        self, batch: SubjectsBatch, params: dict[str, Any]
    ) -> SubjectsBatch:
        for _name, img_batch in self._get_images(batch).items():
            img_batch.data = jnp.clip(
                as_jnp(img_batch.data), self.out_min, self.out_max
            )
        return batch

    def fusable(self, batch: SubjectsBatch) -> bool:
        return bool(self._get_images(batch))

    def fused_stage(self, batch: SubjectsBatch):
        from ..fuse import FusedStage, clamp_apply

        names = tuple(self._get_images(batch))
        if not names:
            return None
        return FusedStage(
            key=("clamp", names, self.out_min, self.out_max),
            apply=clamp_apply(names, self.out_min, self.out_max),
            args=(),
            params=self.make_params(batch),
        )

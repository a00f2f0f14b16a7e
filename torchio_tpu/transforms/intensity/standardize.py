"""Standardize / ZNormalization.

Parity reference:
``/root/reference/src/torchio/transforms/intensity/standardize.py``
(per-image mean/std from the first batch element, optional mask via
LabelMap key or callable, invertible).
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
import numpy as np

from ...data.batch import SubjectsBatch
from .._utils import as_jnp
from ..transform import DeferredParam, IntensityTransform
from .normalize import resolve_mask


def _finalize_stats(name: str):
    """Host finalizer: validates the (mean, std, count) triple and
    records (mean, std) — errors surface at resolution, after the
    output compute has dispatched."""

    def finalize(host: np.ndarray) -> tuple[float, float]:
        mean, std, count = (float(v) for v in host)
        if count == 0:
            raise RuntimeError(
                f'Standardization mask for "{name}" is empty.'
            )
        if std == 0:
            raise RuntimeError(
                f'Cannot standardize "{name}": standard deviation'
                " is zero."
            )
        return (mean, std)

    return finalize


class Standardize(IntensityTransform):
    """Z-score normalization: subtract mean, divide by std.

    Statistics are computed from the first batch element (optionally
    within a mask) and applied batch-wide, matching the reference.
    """

    def __init__(
        self,
        *,
        masking_method: str | Callable | None = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        self.masking_method = masking_method

    def make_params(self, batch: SubjectsBatch) -> dict[str, Any]:
        stats: dict[str, Any] = {}
        for name, img_batch in self._get_images(batch).items():
            mask = resolve_mask(self.masking_method, img_batch, batch)
            # device-side reductions; the scalars stay on device as a
            # DeferredParam — the one host transfer happens after the
            # output compute is dispatched (Transform.forward), so the
            # hot path has zero blocking round trips
            data = as_jnp(img_batch.data[0]).astype(jnp.float32)
            # sample std (ddof=1), matching torch.std's unbiased default
            # in the reference (standardize.py:48-49)
            if mask is not None:
                m = jnp.broadcast_to(as_jnp(mask), data.shape)
                count_d = jnp.sum(m).astype(jnp.float32)
                mean_d = jnp.sum(jnp.where(m, data, 0.0)) / jnp.maximum(
                    count_d, 1
                )
                ss_d = jnp.sum(jnp.where(m, (data - mean_d) ** 2, 0.0))
                std_d = jnp.sqrt(ss_d / jnp.maximum(count_d - 1.0, 1.0))
                triple = jnp.stack([mean_d, std_d, count_d])
            else:
                triple = jnp.stack(
                    [jnp.mean(data), jnp.std(data, ddof=1), jnp.float32(1.0)]
                )

            stats[name] = DeferredParam(triple, _finalize_stats(name), eager=True)
        return {"stats": stats}

    def apply_transform(
        self, batch: SubjectsBatch, params: dict[str, Any]
    ) -> SubjectsBatch:
        for name, img_batch in self._get_images(batch).items():
            if name not in params["stats"]:
                continue
            recorded = params["stats"][name]
            if isinstance(recorded, DeferredParam):
                mean, std = recorded.device[0], recorded.device[1]
            else:
                mean, std = recorded
            data = as_jnp(img_batch.data).astype(jnp.float32)
            img_batch.data = (data - mean) / std
        return batch

    def fusable(self, batch: SubjectsBatch) -> bool:
        if not self._get_images(batch):
            return False
        if self.masking_method is None:
            return True
        # a LabelMap-key mask rides the fused data dict; callables run
        # host numpy and stay on the eager path
        return (
            isinstance(self.masking_method, str)
            and self.masking_method in batch.images
        )

    def fused_stage(self, batch: SubjectsBatch):
        from ..fuse import FusedStage, install_standardize_params, standardize_apply

        names = tuple(self._get_images(batch))
        if not names:
            return None
        mask_name = (
            self.masking_method
            if isinstance(self.masking_method, str)
            else None
        )
        key_names = names if mask_name is None else (*names, mask_name)
        return FusedStage(
            key=("standardize", key_names, mask_name),
            apply=standardize_apply(names, mask_name),
            args=(),
            params={},
            finish=install_standardize_params,
        )

    @property
    def invertible(self) -> bool:
        return True

    def inverse(self, params: dict[str, Any]) -> "_StandardizeInverse":
        return _StandardizeInverse(stats=params["stats"], copy=False)


class _StandardizeInverse(IntensityTransform):
    def __init__(self, *, stats: dict[str, tuple[float, float]], **kwargs: Any) -> None:
        super().__init__(**kwargs)
        self._stats = stats

    def apply_transform(
        self, batch: SubjectsBatch, params: dict[str, Any]
    ) -> SubjectsBatch:
        for name, img_batch in self._get_images(batch).items():
            if name not in self._stats:
                continue
            mean, std = self._stats[name]
            img_batch.data = as_jnp(img_batch.data) * std + mean
        return batch


ZNormalization = Standardize

"""Gamma intensity transform.

Parity reference: ``/root/reference/src/torchio/transforms/intensity/gamma.py``
(:math:`\\mathrm{sign}(I) \\cdot |I|^{e^\\beta}`; invertible via
:math:`-\\beta`; per-instance log-gamma).
"""

from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp

from ...data.batch import SubjectsBatch
from .._utils import as_jnp, broadcast_param
from ..parameter_range import to_range
from ..transform import IntensityTransform


def _gamma_pow(data, log_gamma):
    if isinstance(log_gamma, list):
        gamma = jnp.exp(broadcast_param(log_gamma, data))
    else:
        gamma = math.exp(log_gamma)
    return jnp.sign(data) * jnp.abs(data) ** gamma


class Gamma(IntensityTransform):
    r"""Apply :math:`v \mapsto \mathrm{sign}(v)\,|v|^{\gamma}` with
    :math:`\gamma = e^{\beta}` and :math:`\beta` sampled from ``log_gamma``."""

    def __init__(self, *, log_gamma: Any = 0.0, **kwargs: Any) -> None:
        super().__init__(**kwargs)
        self.log_gamma = to_range(log_gamma)
        self.warn_if_noop(
            is_noop=self.log_gamma.is_constant(0.0),
            hint="log_gamma=(-0.3, 0.3)",
        )

    @property
    def supports_per_instance_params(self) -> bool:
        return True

    @property
    def supports_per_instance_p(self) -> bool:
        return True

    def make_params(self, batch: SubjectsBatch) -> dict[str, Any]:
        n = self._resolve_n(batch)
        keep = self._keep_mask(batch, n)
        log_gamma = self._mask_identity(self.log_gamma.sample_1d(n), keep, identity=0.0)
        params = {"log_gamma": self._serialize_param(log_gamma)}
        self._tag_batched(params, batch, n, keep, ["log_gamma"])
        return params

    def apply_transform(
        self, batch: SubjectsBatch, params: dict[str, Any]
    ) -> SubjectsBatch:
        for _name, img_batch in self._get_images(batch).items():
            img_batch.data = _gamma_pow(as_jnp(img_batch.data), params["log_gamma"])
        return batch

    def fusable(self, batch: SubjectsBatch) -> bool:
        return bool(self._get_images(batch))

    def fused_stage(self, batch: SubjectsBatch):
        import numpy as np

        from ..fuse import FusedStage, gamma_apply

        names = tuple(self._get_images(batch))
        if not names:
            return None
        params = self.make_params(batch)
        lg = params["log_gamma"]
        if isinstance(lg, list):
            # per-element path exponentiates on device (as unfused does)
            args = jnp.asarray(np.asarray(lg, np.float32))
            pre_exp = False
        else:
            # scalar path mirrors the unfused host math.exp exactly
            args = jnp.float32(math.exp(lg))
            pre_exp = True
        return FusedStage(
            key=("gamma", names, pre_exp),
            apply=gamma_apply(names, pre_exp),
            args=args,
            params=params,
        )

    @property
    def invertible(self) -> bool:
        return True

    def inverse(self, params: dict[str, Any]) -> "_GammaInverse":
        return _GammaInverse(log_gamma=params["log_gamma"], copy=False)


class _GammaInverse(IntensityTransform):
    """Applies gamma with the negated log-exponent."""

    def __init__(self, *, log_gamma, **kwargs: Any) -> None:
        super().__init__(**kwargs)
        self._log_gamma = log_gamma

    def apply_transform(
        self, batch: SubjectsBatch, params: dict[str, Any]
    ) -> SubjectsBatch:
        neg = (
            [-v for v in self._log_gamma]
            if isinstance(self._log_gamma, list)
            else -self._log_gamma
        )
        for _name, img_batch in self._get_images(batch).items():
            img_batch.data = _gamma_pow(as_jnp(img_batch.data), neg)
        return batch

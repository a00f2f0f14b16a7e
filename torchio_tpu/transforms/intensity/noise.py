"""Gaussian / Rician noise.

Parity reference: ``/root/reference/src/torchio/transforms/intensity/noise.py``
(seeded generator recorded in params; per-element mean/std broadcast;
Rician magnitude noise; gated-out rows restored bit-exactly because the
Rician map is non-linear at zero).

TPU-native: the noise field is generated on device with ``jax.random``
from the recorded integer seed — replaying the seed regenerates the exact
realization, preserving the reference's replay contract.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ... import random as tio_random
from ...data.batch import SubjectsBatch
from .._utils import as_jnp, broadcast_param, restore_gated
from ..parameter_range import to_nonneg_range, to_range
from ..transform import IntensityTransform


class Noise(IntensityTransform):
    r"""Add Gaussian noise, or Rician noise
    :math:`\sqrt{(I + n_1)^2 + n_2^2}` with :math:`n_i \sim N(\mu, \sigma^2)`.

    Args:
        mean: scalar, ``(lo, hi)`` range, or distribution for :math:`\mu`.
        std: scalar, range, or distribution for :math:`\sigma` (>= 0).
        rician: use Rician magnitude noise (MRI-typical).
    """

    def __init__(
        self,
        *,
        mean: Any = 0.0,
        std: Any = 0.25,
        rician: bool = False,
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        self.mean = to_range(mean)
        self.std = to_nonneg_range(std)
        self.rician = rician

    @property
    def supports_per_instance_params(self) -> bool:
        return True

    @property
    def supports_per_instance_p(self) -> bool:
        return True

    def make_params(self, batch: SubjectsBatch) -> dict[str, Any]:
        seed = tio_random.draw_seed()
        n = self._resolve_n(batch)
        keep = self._keep_mask(batch, n)
        mean = self._mask_identity(self.mean.sample_1d(n), keep, identity=0.0)
        std = self._mask_identity(self.std.sample_1d(n), keep, identity=0.0)
        params = {
            "mean": self._serialize_param(mean),
            "std": self._serialize_param(std),
            "seed": seed,
            "rician": self.rician,
        }
        self._tag_batched(params, batch, n, keep, ["mean", "std"])
        return params

    def fusable(self, batch: SubjectsBatch) -> bool:
        return bool(self._get_images(batch))

    def fused_stage(self, batch: SubjectsBatch):
        from ..fuse import FusedStage, noise_apply

        names = tuple(self._get_images(batch))
        if not names:
            return None
        params = self.make_params(batch)
        keep = params.get("_keep")
        gated = keep is not None and not all(keep)
        args = (
            jnp.asarray(np.asarray(params["mean"], np.float32)),
            jnp.asarray(np.asarray(params["std"], np.float32)),
            jnp.asarray(np.asarray(keep if gated else 0.0, np.float32)),
            jax.random.PRNGKey(params["seed"]),
        )
        return FusedStage(
            key=("noise", names, self.rician, gated),
            apply=noise_apply(names, self.rician, gated),
            args=args,
            params=params,
        )

    def apply_transform(
        self, batch: SubjectsBatch, params: dict[str, Any]
    ) -> SubjectsBatch:
        key = jax.random.PRNGKey(params["seed"])
        keep = params.get("_keep")
        rician = params.get("rician", False)
        for _name, img_batch in self._get_images(batch).items():
            data = as_jnp(img_batch.data)
            mean = broadcast_param(params["mean"], data)
            std = broadcast_param(params["std"], data)
            key, k1, k2 = jax.random.split(key, 3)
            out = _noise_kernel(data, mean, std, k1, k2, rician)
            img_batch.data = restore_gated(out, data, keep)
        return batch


from functools import partial as _partial  # noqa: E402


@_partial(jax.jit, static_argnames=("rician",))
def _noise_kernel(data, mean, std, k1, k2, rician: bool):
    """RNG + add (or Rician magnitude) fused into one program."""
    noise = mean + std * jax.random.normal(k1, data.shape, jnp.float32)
    if rician:
        noise2 = mean + std * jax.random.normal(k2, data.shape, jnp.float32)
        return jnp.sqrt((data + noise) ** 2 + noise2**2)
    return data + noise

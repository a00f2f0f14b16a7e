"""BiasField: smooth multiplicative intensity inhomogeneity (SynthSeg-style).

Parity reference:
``/root/reference/src/torchio/transforms/intensity/bias_field.py``
(coarse N(0, std) field at ``scale`` x resolution -> trilinear upsample ->
``exp`` -> multiply; the seed is recorded in the params so the exact field
regenerates for inversion (divide); per-element seeds when batched).

TPU-native: fields are generated on device with ``jax.random`` keyed by
the recorded seed — same replay contract, no host round-trip.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ... import random as tio_random
from ...data.batch import SubjectsBatch
from ...ops.resample import upsample_volume
from .._utils import as_jnp, restore_gated
from ..parameter_range import to_nonneg_range
from ..transform import IntensityTransform


def _coarse_shape(spatial, scale: float) -> tuple[int, int, int]:
    return tuple(max(round(s * scale), 4) for s in spatial)


def _field_from_seed(shape, std, seed: int, scale: float):
    """(B, C, I, J, K) strictly-positive bias field from one seed.

    ``std`` is a scalar or a (B,) array (per-element stds share one key
    stream only when called per element)."""
    b, c = shape[0], shape[1]
    spatial = shape[2:]
    small = _coarse_shape(spatial, scale)
    key = jax.random.PRNGKey(seed)
    coarse = jax.random.normal(key, (b, c, *small), jnp.float32)
    std_arr = jnp.asarray(std, jnp.float32).reshape(-1, 1, 1, 1, 1)
    coarse = coarse * std_arr
    field = upsample_volume(coarse, tuple(spatial))
    return jnp.exp(field)


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("scale", "divide"))
def _bias_kernel_per_element(data, stds, seeds, scale: float, divide: bool):
    """Per-element fields + apply, fused into ONE program.

    Matches the sequential per-element path bit-for-bit: each element's
    coarse field comes from ``PRNGKey(seed_i)`` with the (1, C, *small)
    shape the unfused path used."""
    c = data.shape[1]
    spatial = tuple(data.shape[2:])
    small = _coarse_shape(spatial, scale)

    def field_one(sd, s):
        key = jax.random.PRNGKey(sd)
        coarse = jax.random.normal(key, (1, c, *small), jnp.float32) * s
        return jnp.exp(upsample_volume(coarse, spatial))[0]

    field = jax.vmap(field_one)(seeds, stds)
    out = data / field if divide else data * field
    return out.astype(data.dtype)


@_partial(jax.jit, static_argnames=("scale", "divide"))
def _bias_kernel_shared(data, std, seed, scale: float, divide: bool):
    field = _field_from_seed(data.shape, std, seed, scale)
    out = data / field if divide else data * field
    return out.astype(data.dtype)


def _apply_bias(data, std, seed, scale: float, *, divide: bool):
    data = as_jnp(data)
    if isinstance(seed, list):  # per-element seeds
        stds = list(std)
        identity = [s == 0 for s in stds]
        if all(identity):
            return data
        out = _bias_kernel_per_element(
            data,
            jnp.asarray(np.asarray(stds, np.float32)),
            jnp.asarray(np.asarray(seed, np.uint32)),
            scale,
            divide,
        )
        keep = [not i for i in identity]
        return restore_gated(out, data, keep)
    if std == 0:
        return data
    return _bias_kernel_shared(
        data, jnp.float32(std), jnp.uint32(seed), scale, divide
    )


class BiasField(IntensityTransform):
    r"""Multiply by :math:`\exp(\text{upsampled } N(0, \sigma))`.

    Args:
        std: coarse-field standard deviation (scalar / range / dist).
        scale: coarse-to-full resolution ratio in (0, 1].
    """

    def __init__(self, *, std: Any = 0.5, scale: float = 0.025, **kwargs: Any) -> None:
        super().__init__(**kwargs)
        self.std = to_nonneg_range(std)
        if scale <= 0 or scale > 1:
            raise ValueError(f"scale must be in (0, 1], got {scale}")
        self.scale = scale

    @property
    def supports_per_instance_params(self) -> bool:
        return True

    @property
    def supports_per_instance_p(self) -> bool:
        return True

    def make_params(self, batch: SubjectsBatch) -> dict[str, Any]:
        n = self._resolve_n(batch)
        if n is None:
            return {
                "std": self.std.sample_1d(),
                "seed": tio_random.draw_seed(),
                "scale": self.scale,
            }
        keep = self._keep_mask(batch, n)
        std = self._mask_identity(self.std.sample_1d(n), keep, identity=0.0)
        seeds = [tio_random.draw_seed() for _ in range(n)]
        params = {
            "std": self._serialize_param(std),
            "seed": seeds,
            "scale": self.scale,
        }
        self._tag_batched(params, batch, n, keep, ["std", "seed"])
        return params

    def apply_transform(
        self, batch: SubjectsBatch, params: dict[str, Any]
    ) -> SubjectsBatch:
        for _name, img_batch in self._get_images(batch).items():
            img_batch.data = _apply_bias(
                img_batch.data,
                params["std"],
                params["seed"],
                params["scale"],
                divide=False,
            )
        return batch

    def fusable(self, batch: SubjectsBatch) -> bool:
        return bool(self._get_images(batch))

    def fused_stage(self, batch: SubjectsBatch):
        from ..fuse import FusedStage, bias_apply

        names = tuple(self._get_images(batch))
        if not names:
            return None
        params = self.make_params(batch)
        per_element = isinstance(params["seed"], list)
        if per_element:
            stds = params["std"]
            identity = [s == 0 for s in stds]
            all_id = all(identity)
            gated = any(identity) and not all_id
            args = (
                jnp.asarray(np.asarray(stds, np.float32)),
                jnp.asarray(np.asarray(params["seed"], np.uint32)),
                jnp.asarray(
                    np.asarray([not i for i in identity], np.float32)
                ),
            )
        else:
            all_id = params["std"] == 0
            gated = False
            args = (
                jnp.float32(params["std"]),
                jnp.uint32(params["seed"]),
                jnp.float32(0.0),
            )
        return FusedStage(
            key=("bias", names, self.scale, per_element, gated, all_id),
            apply=bias_apply(names, self.scale, per_element, gated, all_id),
            args=args,
            params=params,
        )

    @property
    def invertible(self) -> bool:
        return True

    def inverse(self, params: dict[str, Any]) -> "_BiasFieldInverse":
        return _BiasFieldInverse(
            std=params["std"], seed=params["seed"], scale=params["scale"], copy=False
        )


class _BiasFieldInverse(IntensityTransform):
    """Divides by the regenerated field."""

    def __init__(self, *, std, seed, scale: float, **kwargs: Any) -> None:
        super().__init__(**kwargs)
        self._std = std
        self._seed = seed
        self._scale = scale

    def apply_transform(
        self, batch: SubjectsBatch, params: dict[str, Any]
    ) -> SubjectsBatch:
        for _name, img_batch in self._get_images(batch).items():
            img_batch.data = _apply_bias(
                img_batch.data, self._std, self._seed, self._scale, divide=True
            )
        return batch

"""Fused elementwise transform chains: one XLA program per run.

``Compose(..., fuse=True)`` merges consecutive *elementwise* transforms
(Flip, Noise, Normalize/RescaleIntensity, Gamma, Clamp) into a single
jit-compiled program. Each per-transform dispatch otherwise costs a
host->device round trip; through a high-latency link that dominates the
pipeline (measured: the 3-transform config-1 pipeline spends 10.1 ms of
47.8 ms on the two extra dispatches — BASELINE.md round-4
decomposition).

This is deliberately NOT the whole-pipeline fusion ROADMAP decided
against: only transforms whose parameters are host scalars/vectors (no
host geometry, no data-dependent host branching) participate; anything
else (Spatial, Blur's mm->voxel kernel planning, ...) breaks the run
and executes stage-by-stage as before.

Contract per fused transform (``Transform.fused_stage``):

- eligibility must be decidable WITHOUT consuming RNG (the caller draws
  the p-gate coin between the check and the build, exactly like
  ``Transform.forward``);
- the build calls ``make_params`` verbatim, so the host RNG stream and
  the recorded history are identical to unfused execution;
- the traced apply consumes only its ``args`` pytree and the data dict;
  data-dependent statistics return as aux outputs and land in history
  as :class:`DeferredParam` (same as the unfused deferred-stats path).

Exactness: every fused apply mirrors the unfused arithmetic op-for-op
(gated-out elements bit-exact; see tests/test_fuse.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import numpy as np

from .. import random as tio_random
from .transform import (
    AppliedTransform,
    DeferredParam,
    Transform,
    _all_elements_gated_out,
    _has_deferred,
    _resolve_eager_deferred,
)


@dataclass
class FusedStage:
    """One transform's contribution to a fused chain."""

    #: static identity: (kind, image names, static config). Two stages
    #: with equal keys must have interchangeable ``apply`` callables.
    key: tuple
    #: traced ``(datas, args) -> (datas, aux)``
    apply: Callable
    #: traced argument pytree
    args: Any
    #: history params (JSON values; aux-backed entries filled by finish)
    params: dict
    #: optional ``(aux, params) -> None`` run after execution
    finish: Callable | None = None


#: chain-structure key -> jitted chain. Keyed on stage keys only; jax
#: handles shape/dtype specialization within each entry.
_CHAIN_CACHE: dict[tuple, Any] = {}


def _build_chain(applies: tuple[Callable, ...]):
    def chain(datas: dict, args_list: tuple):
        auxes = []
        for fn, args in zip(applies, args_list):
            datas, aux = fn(datas, args)
            auxes.append(aux)
        return datas, tuple(auxes)

    return jax.jit(chain)


def run_fused(batch, stages: list[tuple[Transform, FusedStage]]):
    """Execute a run of fused stages as ONE program + record history."""
    if not stages:
        return batch
    key = tuple(s.key for _, s in stages)
    chain = _CHAIN_CACHE.get(key)
    if chain is None:
        chain = _build_chain(tuple(s.apply for _, s in stages))
        _CHAIN_CACHE[key] = chain
    names = sorted(
        {n for _, s in stages for n in s.key[1]}
    )
    datas = {n: batch.images[n].data for n in names}
    out, auxes = chain(datas, tuple(s.args for _, s in stages))
    for n in names:
        batch.images[n].data = out[n]
    for (transform, stage), aux in zip(stages, auxes):
        params = stage.params
        if stage.finish is not None:
            stage.finish(aux, params)
        if _has_deferred(params):
            params = _resolve_eager_deferred(params)
        if transform._records_history and not _all_elements_gated_out(params):
            trace = AppliedTransform(
                name=type(transform).__name__,
                params=params,
                include=(
                    None
                    if transform.include is None
                    else list(transform.include)
                ),
                exclude=(
                    None
                    if transform.exclude is None
                    else list(transform.exclude)
                ),
            )
            if not hasattr(batch, "applied_transforms"):
                batch.applied_transforms = []
            batch.applied_transforms.append(trace)
    return batch


def gate_coin(transform: Transform, batch) -> bool:
    """The p-gate exactly as ``Transform.forward`` draws it. Returns
    True when the transform applies (per-instance gating handles p
    inside params)."""
    return (
        transform._per_instance_p_active(batch)
        or float(tio_random.random()) < transform.p
    )


# --------------------------------------------------------------------
# per-transform apply factories (pure; close only over static config)
# --------------------------------------------------------------------


def _bparam(value, ndim: int):
    """Mirror ``_utils.broadcast_param`` for traced args shaped (B,) or
    scalar 0-d arrays."""
    import jax.numpy as jnp

    arr = jnp.asarray(value)
    if arr.ndim == 0:
        return arr
    return arr.reshape((-1,) + (1,) * (ndim - 1))


def flip_static_apply(names: tuple[str, ...], dims: tuple[int, ...]):
    import jax.numpy as jnp

    def apply(datas, args):
        del args
        if not dims:
            return datas, None
        out = dict(datas)
        for nm in names:
            out[nm] = jnp.flip(out[nm], dims)
        return out, None

    return apply


def flip_per_element_apply(names: tuple[str, ...]):
    import jax.numpy as jnp

    def apply(datas, flags):
        out = dict(datas)
        for nm in names:
            x = out[nm]
            for ax in range(3):
                sel = flags[:, ax].reshape((-1, 1, 1, 1, 1)) > 0.5
                x = jnp.where(sel, jnp.flip(x, ax - 3), x)
            out[nm] = x
        return out, None

    return apply


def noise_apply(names: tuple[str, ...], rician: bool, gated: bool):
    import jax.numpy as jnp

    def apply(datas, args):
        mean, std, keep, key = args
        out = dict(datas)
        for nm in names:
            data = out[nm]
            m = _bparam(mean, data.ndim)
            s = _bparam(std, data.ndim)
            key, k1, k2 = jax.random.split(key, 3)
            noise = m + s * jax.random.normal(k1, data.shape, jnp.float32)
            if rician:
                noise2 = m + s * jax.random.normal(k2, data.shape, jnp.float32)
                res = jnp.sqrt((data + noise) ** 2 + noise2**2)
            else:
                res = data + noise
            if gated:
                mask = keep.reshape((-1,) + (1,) * (data.ndim - 1))
                res = jnp.where(mask > 0.5, res, data)
            out[nm] = res
        return out, None

    return apply


def gamma_apply(names: tuple[str, ...], pre_exp: bool):
    import jax.numpy as jnp

    def apply(datas, arg):
        out = dict(datas)
        for nm in names:
            data = out[nm]
            g = _bparam(arg, data.ndim)
            if not pre_exp:
                g = jnp.exp(g)
            out[nm] = jnp.sign(data) * jnp.abs(data) ** g
        return out, None

    return apply


def clamp_apply(
    names: tuple[str, ...], out_min: float | None, out_max: float | None
):
    import jax.numpy as jnp

    def apply(datas, args):
        del args
        out = dict(datas)
        for nm in names:
            out[nm] = jnp.clip(out[nm], out_min, out_max)
        return out, None

    return apply


def blur_apply(
    names: tuple[str, ...],
    drawn: dict,
    truncate: float,
    gated: dict,
    skip: dict,
):
    import jax.numpy as jnp

    from ..ops.gaussian import _blur_per_element_kernel

    def apply(datas, args):
        out = dict(datas)
        for nm in names:
            if skip[nm]:
                continue
            sig, keep = args[nm]
            data = out[nm]
            res = _blur_per_element_kernel(
                jnp.asarray(data), sig, drawn[nm], (False, False, False),
                truncate,
            ).astype(data.dtype)
            if gated[nm]:
                mask = keep.reshape((-1,) + (1,) * (data.ndim - 1))
                res = jnp.where(mask > 0.5, res, data)
            out[nm] = res
        return out, None

    return apply


def bias_apply(
    names: tuple[str, ...],
    scale: float,
    per_element: bool,
    gated: bool,
    all_identity: bool,
):
    import jax.numpy as jnp

    from .intensity.bias_field import (
        _bias_kernel_per_element,
        _bias_kernel_shared,
    )

    def apply(datas, args):
        if all_identity:
            return datas, None
        out = dict(datas)
        stds, seeds, keep = args
        for nm in names:
            data = out[nm]
            if per_element:
                res = _bias_kernel_per_element(data, stds, seeds, scale, False)
                if gated:
                    mask = keep.reshape((-1,) + (1,) * (data.ndim - 1))
                    res = jnp.where(mask > 0.5, res, data)
            else:
                res = _bias_kernel_shared(data, stds, seeds, scale, False)
            out[nm] = res
        return out, None

    return apply


def normalize_apply(
    names: tuple[str, ...], explicit: bool, use_minmax: bool
):
    import jax.numpy as jnp

    def apply(datas, args):
        out = dict(datas)
        aux = {}
        if explicit:
            in_min, in_max, out_min, out_max = args
        else:
            out_min, out_max, pct = args
        for nm in names:
            data = out[nm].astype(jnp.float32)
            if not explicit:
                flat = data[0].reshape(-1)
                if use_minmax:
                    pair = jnp.stack([jnp.min(flat), jnp.max(flat)])
                else:
                    from ._statistics import quantiles_on_device

                    pair = quantiles_on_device(flat, [pct[0], pct[1]])
                aux[nm] = pair
                lo, hi = pair[0], pair[1]
            else:
                lo, hi = in_min, in_max
            omin = _bparam(out_min, data.ndim)
            omax = _bparam(out_max, data.ndim)
            out_range = omax - omin
            in_range = hi - lo
            safe = jnp.where(in_range == 0, 1.0, in_range)
            clipped = jnp.clip(data, lo, hi)
            scaled = (clipped - lo) / safe * out_range + omin
            out[nm] = jnp.where(in_range == 0, data, scaled)
        return out, aux

    return apply


def standardize_apply(names: tuple[str, ...], mask_name: str | None):
    import jax.numpy as jnp

    def apply(datas, args):
        del args
        out = dict(datas)
        aux = {}
        for nm in names:
            data = out[nm].astype(jnp.float32)
            first = data[0]
            if mask_name is not None:
                m = jnp.broadcast_to(
                    datas[mask_name][0] != 0, first.shape
                )
                count = jnp.sum(m).astype(jnp.float32)
                mean = jnp.sum(jnp.where(m, first, 0.0)) / jnp.maximum(
                    count, 1
                )
                ss = jnp.sum(jnp.where(m, (first - mean) ** 2, 0.0))
                std = jnp.sqrt(ss / jnp.maximum(count - 1.0, 1.0))
                aux[nm] = jnp.stack([mean, std, count])
            else:
                mean = jnp.mean(first)
                std = jnp.std(first, ddof=1)
                aux[nm] = jnp.stack([mean, std, jnp.float32(1.0)])
            out[nm] = (data - mean) / std
        return out, aux

    return apply


def mask_apply(
    names: tuple[str, ...],
    mask_name: str,
    labels: tuple | None,
    outside_value: float,
):
    import jax.numpy as jnp

    def apply(datas, args):
        del args
        mask_data = datas[mask_name][0]
        if labels is not None:
            mask = jnp.zeros_like(mask_data, bool)
            for label in labels:
                mask = mask | (mask_data == label)
        else:
            mask = mask_data.astype(bool)
        out = dict(datas)
        for nm in names:
            out[nm] = jnp.where(mask, out[nm], outside_value)
        return out, None

    return apply


def install_standardize_params(aux: dict, params: dict) -> None:
    from .intensity.standardize import _finalize_stats

    params["stats"] = {
        nm: DeferredParam(
            triple, _finalize_stats(nm), eager=True
        )
        for nm, triple in aux.items()
    }


def finalize_range_warn(name: str):
    """Host finalizer matching ``normalize._percentile_range``'s."""
    import warnings

    def finalize(host: np.ndarray):
        low, high = float(host[0]), float(host[1])
        if high - low == 0:
            warnings.warn(
                f'Cannot rescale "{name}": input range is zero.',
                RuntimeWarning,
                stacklevel=2,
            )
        return (low, high)

    return finalize


def install_range_params(aux: dict, params: dict) -> None:
    params["in_ranges"] = {
        nm: DeferredParam(pair, finalize_range_warn(nm))
        for nm, pair in aux.items()
    }

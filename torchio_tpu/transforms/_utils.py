"""Shared helpers for transform implementations (jnp compute path)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def broadcast_param(value: Any, like: Any):
    """Scalar passthrough, or per-element list -> (B, 1, 1, 1, 1) jnp array."""
    if isinstance(value, (list, np.ndarray, jax.Array)):
        arr = jnp.asarray(np.asarray(value, dtype=np.float32))
        return arr.reshape((-1,) + (1,) * (like.ndim - 1))
    return value


def restore_gated(transformed, original, keep):
    """Gated-out elements keep their original values (bit-exact)."""
    if keep is None:
        return transformed
    flags = np.asarray(keep, dtype=bool)
    if flags.all():
        # nothing gated out: skip the eager full-volume select (a
        # 256^3 batch pays ~14 ms for the pass-through otherwise)
        return transformed
    mask = jnp.asarray(flags).reshape((-1,) + (1,) * (transformed.ndim - 1))
    return jnp.where(mask, transformed, original)


def as_jnp(data) -> jax.Array:
    """Move batch data to jnp (device) if it isn't already."""
    if isinstance(data, jax.Array):
        return data
    return jnp.asarray(data)


def unique_labels(data) -> list[int]:
    """Sorted unique integer labels, computed WITHOUT pulling the volume.

    For device-resident integer label maps a ``bincount`` histogram runs
    on device and only the (small) histogram crosses to host; host arrays
    and exotic ranges fall back to ``np.unique``.
    """
    if isinstance(data, jax.Array) and jnp.issubdtype(data.dtype, jnp.integer):
        lo = int(jnp.min(data))
        hi = int(jnp.max(data))
        if 0 <= lo and hi <= 65535:
            hist = jnp.bincount(
                data.reshape(-1).astype(jnp.int32), length=hi + 1
            )
            counts = np.asarray(hist)
            return [int(i) for i in np.nonzero(counts)[0]]
    return sorted(int(v) for v in np.unique(np.asarray(data)))

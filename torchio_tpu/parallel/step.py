"""Fused, shardable augmentation step: the framework's "training step".

One XLA program computes, per batch element: affine resample (rotation /
scale / translation about the image center) -> multiplicative bias field
-> additive Gaussian noise -> global rescale to [0, 1] where the min/max
statistics are GLOBAL across the mesh (XLA inserts the collectives from
the shardings — the scaling-book recipe: annotate, don't hand-write).

Used by ``__graft_entry__.dryrun_multichip`` to validate that the full
step compiles and executes under a real (data, space) mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import random as tio_random
from ..ops.resample import upsample_volume
from ..transforms.spatial.spatial import _euler_rotation
from .mesh import batch_sharding, param_sharding, replicated_sharding


def sample_step_params(batch_size: int, *, degrees=10.0, translation=2.0):
    """Host-side parameter sampling: (B, 3, 3) rotations + (B, 3) shifts."""
    rng = tio_random.get_rng()
    rots = np.stack(
        [
            _euler_rotation(rng.uniform(-degrees, degrees, 3))
            for _ in range(batch_size)
        ]
    ).astype(np.float32)
    shifts = rng.uniform(-translation, translation, (batch_size, 3)).astype(
        np.float32
    )
    return rots, shifts


def _affine_coords(shape, rot, shift):
    """(I, J, K, 3) input coords for one element (rotation about center)."""
    si, sj, sk = shape
    center = jnp.asarray([(si - 1) / 2, (sj - 1) / 2, (sk - 1) / 2], jnp.float32)
    inv = jnp.linalg.inv(rot)
    ri = jnp.arange(si, dtype=jnp.float32)[:, None, None, None]
    rj = jnp.arange(sj, dtype=jnp.float32)[None, :, None, None]
    rk = jnp.arange(sk, dtype=jnp.float32)[None, None, :, None]
    rel = (
        (ri - center[0]) * inv[:, 0]
        + (rj - center[1]) * inv[:, 1]
        + (rk - center[2]) * inv[:, 2]
    )
    return rel + center - shift


def augment_step(data, rotations, shifts, seed, bias_std, noise_std):
    """Pure fused step over (B, C, I, J, K) float32 data.

    The resample stage is the production block-gather kernel
    (:func:`torchio_tpu.ops.resample._resample_one` — the same code path
    ``tio.Spatial`` dispatches to), vmapped over the batch so the whole
    step stays one shardable XLA program.
    """
    from ..ops.resample import _resample_one

    b = data.shape[0]
    spatial = data.shape[2:]

    def per_element(volume, rot, shift):
        coords = _affine_coords(spatial, rot, shift)
        flat = volume.astype(jnp.float32).reshape(volume.shape[0], -1)
        out = _resample_one(
            flat,
            coords.reshape(-1, 3),
            jnp.float32(0.0),
            spatial,
            "linear",
            False,
        )
        return out.reshape(volume.shape[0], *spatial)

    out = jax.vmap(per_element)(data, rotations, shifts)

    key = jax.random.PRNGKey(seed)
    kb, kn = jax.random.split(key)
    small = tuple(max(s // 8, 2) for s in spatial)
    coarse = bias_std * jax.random.normal(kb, (b, 1, *small), jnp.float32)
    field = jnp.exp(upsample_volume(coarse, spatial))
    out = out * field
    out = out + noise_std * jax.random.normal(kn, out.shape, jnp.float32)

    # Global statistics: with sharded inputs XLA lowers these reductions
    # to psum/pmax collectives over the mesh automatically.
    lo = jnp.min(out)
    hi = jnp.max(out)
    return (out - lo) / jnp.maximum(hi - lo, 1e-6)


def make_augment_step(mesh, *, bias_std: float = 0.3, noise_std: float = 0.05):
    """jit-compile the step with mesh shardings on inputs and output."""
    data_sh = batch_sharding(mesh)
    par_sh = param_sharding(mesh)
    rep = replicated_sharding(mesh)
    return jax.jit(
        partial(augment_step, bias_std=bias_std, noise_std=noise_std),
        in_shardings=(data_sh, par_sh, par_sh, rep),
        out_shardings=data_sh,
    )

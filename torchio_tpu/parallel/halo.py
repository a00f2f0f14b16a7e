"""Explicit halo-exchange stencils under ``shard_map``.

The blur/antialias stencils have small known support, so a spatially
sharded volume only needs a ``radius``-wide halo from each neighbor:
``jax.lax.ppermute`` shifts edge slabs across the 'space' axis over ICI,
each shard convolves locally, and no all-gather ever materializes the
full volume (SURVEY.md §5.7's TPU recipe).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec
from jax.experimental.shard_map import shard_map

from ..ops.gaussian import gaussian_kernel_1d, radius_for_sigma


def _exchange_halo(x, radius: int, axis_name: str):
    """Fetch ``radius`` slabs (along spatial axis J) from both neighbors."""
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    left_edge = jax.lax.slice_in_dim(x, 0, radius, axis=3)
    right_edge = jax.lax.slice_in_dim(x, x.shape[3] - radius, x.shape[3], axis=3)
    # send right edge to right neighbor (they receive as their left halo)
    right_halo_src = [(i, (i + 1) % n) for i in range(n)]
    left_halo_src = [(i, (i - 1) % n) for i in range(n)]
    from_left = jax.lax.ppermute(right_edge, axis_name, right_halo_src)
    from_right = jax.lax.ppermute(left_edge, axis_name, left_halo_src)
    # edge-replicate at the global boundary (matches jnp.pad mode="edge")
    first_rep = jnp.repeat(
        jax.lax.slice_in_dim(x, 0, 1, axis=3), radius, axis=3
    )
    last_rep = jnp.repeat(
        jax.lax.slice_in_dim(x, x.shape[3] - 1, x.shape[3], axis=3), radius, axis=3
    )
    from_left = jnp.where(idx == 0, first_rep, from_left)
    from_right = jnp.where(idx == n - 1, last_rep, from_right)
    return jnp.concatenate([from_left, x, from_right], axis=3)


def halo_blur(x, sigma: float, mesh: Mesh, *, truncate: float = 3.0):
    """Gaussian blur along the spatially-sharded J axis with halo exchange.

    ``x`` is (B, C, I, J, K) sharded (B->data, J->space). Only the J
    pass needs communication; I/K passes are shard-local (omitted here —
    compose with :func:`torchio_tpu.ops.gaussian.gaussian_blur` for them).
    """
    radius = radius_for_sigma(sigma, truncate)
    kernel = jnp.asarray(gaussian_kernel_1d(sigma, radius))
    data_ax, space_ax = mesh.axis_names
    spec = PartitionSpec(data_ax, None, None, space_ax, None)

    def local(xs):
        padded = _exchange_halo(xs, radius, space_ax)
        # correlate along axis 3 with the (2r+1,) kernel
        out = jnp.zeros_like(xs)
        for tap in range(2 * radius + 1):
            out = out + kernel[tap] * jax.lax.slice_in_dim(
                padded, tap, tap + xs.shape[3], axis=3
            )
        return out

    fn = shard_map(local, mesh=mesh, in_specs=(spec,), out_specs=spec)
    return fn(x)

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


def _exchange_halo_zero(x, width: int, axis_name: str):
    """Fetch ``width`` J-slabs from both neighbors; ZEROS at the global
    boundary (grid_sample zero-padding semantics, unlike the blur's
    edge-replication)."""
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.psum(1, axis_name)
    left_edge = jax.lax.slice_in_dim(x, 0, width, axis=3)
    right_edge = jax.lax.slice_in_dim(x, x.shape[3] - width, x.shape[3], axis=3)
    from_left = jax.lax.ppermute(
        right_edge, axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    from_right = jax.lax.ppermute(
        left_edge, axis_name, [(i, (i - 1) % n) for i in range(n)]
    )
    zeros = jnp.zeros_like(from_left)
    from_left = jnp.where(idx == 0, zeros, from_left)
    from_right = jnp.where(idx == n - 1, zeros, from_right)
    return jnp.concatenate([from_left, x, from_right], axis=3)


def halo_resample_affine(x, matrix, mesh: Mesh, *, mode: str = "linear"):
    """Affine-resample a volume SHARDED along J without gathering it.

    The SP/CP analog for volumes larger than one chip's HBM (SURVEY.md
    §5.7): each shard computes its slab of the output from its own input
    slab plus a ``halo``-wide neighbor exchange over ICI, where the halo
    width is the affine's maximum J-displacement over the volume bbox
    (host-computed). Zero padding at the global boundary reproduces
    ``grid_sample(padding_mode="zeros")``, so results equal the
    unsharded :func:`torchio_tpu.ops.resample.resample` exactly.

    Args:
        x: (B, C, I, J, K) sharded (B -> data axis, J -> space axis).
        matrix: 4x4 output-voxel -> input-voxel map; output space equals
            input space (augmentation-style affine; fill = 0).
        mesh: the (data, space) mesh.
        mode: "linear" or "nearest".

    Returns:
        (B, C, I, J, K) with the same sharding.
    """
    from ..ops.resample import _resample_one

    m = np.asarray(matrix, np.float64)
    b, c, si, sj, sk = x.shape
    data_ax, space_ax = mesh.axis_names
    n_space = mesh.shape[space_ax]
    if sj % n_space:
        raise ValueError(f"J={sj} not divisible by space={n_space}")
    jl = sj // n_space

    # halo = max |j_in(o) - j_out(o)| over the output bbox corners (the
    # map is affine, so extremes occur at corners), + interpolation slack
    corners = np.array(
        [
            [i, j, k]
            for i in (0.0, si - 1.0)
            for j in (0.0, sj - 1.0)
            for k in (0.0, sk - 1.0)
        ]
    )
    j_in = corners @ m[1, :3] + m[1, 3]
    halo = int(np.ceil(np.abs(j_in - corners[:, 1]).max())) + 2
    if halo >= jl:
        raise ValueError(
            f"Halo {halo} exceeds the local shard width {jl}; use fewer"
            " space shards or an unsharded resample for this transform."
        )

    m32 = jnp.asarray(m, jnp.float32)

    def local(xs):
        jdx = jax.lax.axis_index(space_ax)
        j0 = (jdx * jl).astype(jnp.float32)
        ext = _exchange_halo_zero(xs, halo, space_ax)  # (Bl, C, I, Jl+2h, K)
        ri = jnp.arange(si, dtype=jnp.float32)[:, None, None, None]
        rj = (jnp.arange(jl, dtype=jnp.float32) + j0)[None, :, None, None]
        rk = jnp.arange(sk, dtype=jnp.float32)[None, None, :, None]
        coords = ri * m32[:3, 0] + rj * m32[:3, 1] + rk * m32[:3, 2] + m32[:3, 3]
        # shift J into the extended local frame; validity against the
        # LOCAL extent is sound because the halo covers every in-bounds
        # coordinate and global-OOB coordinates read the zero halo
        coords = coords.at[..., 1].add(halo - j0)
        pts = coords.reshape(-1, 3)
        outs = []
        for e in range(xs.shape[0]):  # static local batch unroll
            flat = ext[e].reshape(c, -1).astype(jnp.float32)
            out = _resample_one(
                flat, pts, 0.0, (si, jl + 2 * halo, sk), mode, False
            )
            outs.append(out.reshape(c, si, jl, sk))
        return jnp.stack(outs)

    spec = PartitionSpec(data_ax, None, None, space_ax, None)
    fn = shard_map(local, mesh=mesh, in_specs=(spec,), out_specs=spec)
    return fn(x)

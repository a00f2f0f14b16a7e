"""Mesh-scale patch inference: GridSampler -> model -> PatchAggregator
over a spatially sharded volume, with NO full-volume gather.

The single-chip pipeline (``data/sampler.py`` + ``data/aggregator.py``)
assumes the volume fits one device. Here the (B, C, I, J, K) batch is
sharded along J over the mesh's space axis and each shard:

1. exchanges a patch-wide J halo with its neighbors (``ppermute`` over
   ICI — zero fill at the global boundary),
2. extracts its OWN patches (those whose grid corner falls in its J
   slab; the halo covers patches overhanging the right edge) with one
   ``lax.scan`` of ``dynamic_slice``,
3. runs the model on the local patch batch,
4. scatter-adds weighted outputs + window weights into its
   halo-extended local slab, and
5. folds the halo contributions back onto the owning neighbors (the
   reverse ``ppermute``) before normalizing.

Reference analog: ``GridSampler`` + ``PatchAggregator``
(``/root/reference/src/torchio/data/sampler.py:142-168``,
``aggregator.py:196-245``) — the reference has no distributed story;
this is SURVEY.md §5.7's TPU-native large-volume recipe applied to
dense inference. Results equal the single-chip hann/average aggregation
exactly (tests/test_parallel.py).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec
from jax.experimental.shard_map import shard_map

from ..data.aggregator import _build_hann_3d
from .halo import HaloUnsupported, _exchange_halo_zero


def grid_corners(spatial_shape, patch_size, patch_overlap) -> np.ndarray:
    """The GridSampler corner grid (regular steps + end snap), (N, 3)."""
    axes = []
    for dim in range(3):
        size = int(spatial_shape[dim])
        patch = int(patch_size[dim])
        step = max(patch - int(patch_overlap[dim]), 1)
        idx = list(range(0, size - patch + 1, step))
        if not idx or idx[-1] != size - patch:
            idx.append(max(size - patch, 0))
        axes.append(idx)
    return np.asarray(
        [(i, j, k) for i in axes[0] for j in axes[1] for k in axes[2]],
        np.int32,
    )


def _partition_corners(corners: np.ndarray, n_space: int, jl: int):
    """Assign each corner to the shard owning its J index; pad every
    shard's list to the max count (padded rows carry weight 0)."""
    owner = np.minimum(corners[:, 1] // jl, n_space - 1)
    per_shard = [corners[owner == s] for s in range(n_space)]
    n_max = max(len(p) for p in per_shard)
    out = np.zeros((n_space, n_max, 3), np.int32)
    valid = np.zeros((n_space, n_max), np.float32)
    for s, rows in enumerate(per_shard):
        out[s, : len(rows)] = rows
        valid[s, : len(rows)] = 1.0
    return out, valid


@lru_cache(maxsize=32)
def _sharded_inference_program(
    mesh: Mesh,
    space_ax: str,
    local_shape: tuple,
    patch_size: tuple,
    n_max: int,
    overlap_mode: str,
    model_id: int,
    model_ref=None,
):
    b, c, si, jl, sk = local_shape
    p = patch_size
    halo = p[1]
    window = (
        jnp.asarray(_build_hann_3d(p))
        if overlap_mode == "hann"
        else jnp.ones((1, 1, 1), jnp.float32)
    )
    model_fn = model_ref if model_ref is not None else (lambda x: x)

    def local(xs, corners, valid):
        # xs (b, c, si, jl, sk); corners (1, n_max, 3); valid (1, n_max)
        jdx = jax.lax.axis_index(space_ax)
        n = jax.lax.psum(1, space_ax)
        j0 = jdx * jl
        ext = _exchange_halo_zero(xs, halo, space_ax)
        local_corners = corners[0].at[:, 1].add(halo - j0)
        w = valid[0]

        def extract(carry, corner):
            patch = jax.lax.dynamic_slice(
                ext,
                (0, 0, corner[0], corner[1], corner[2]),
                (b, c, *p),
            )
            return carry, patch

        _, patches = jax.lax.scan(extract, None, local_corners)
        # (n_max, b, c, pi, pj, pk) -> model on the flat patch batch
        flat = patches.reshape(n_max * b, c, *p)
        out_flat = model_fn(flat)
        out_patches = out_flat.reshape(n_max, b, c, *p).astype(jnp.float32)

        acc = jnp.zeros((b, c, si, jl + 2 * halo, sk), jnp.float32)
        cnt = jnp.zeros_like(acc)

        def scatter(carry, xs_):
            acc, cnt = carry
            patch, corner, keep = xs_
            start = (0, 0, corner[0], corner[1], corner[2])
            contrib = patch * (window * keep)
            region = jax.lax.dynamic_slice(acc, start, (b, c, *p))
            acc = jax.lax.dynamic_update_slice(acc, region + contrib, start)
            wregion = jax.lax.dynamic_slice(cnt, start, (b, c, *p))
            cnt = jax.lax.dynamic_update_slice(
                cnt,
                wregion + jnp.broadcast_to(window * keep, (b, c, *p)),
                start,
            )
            return (acc, cnt), None

        (acc, cnt), _ = jax.lax.scan(
            scatter, (acc, cnt), (out_patches, local_corners, w)
        )

        # fold halo contributions back onto the owning shards: my left
        # halo belongs to the left neighbor's right end (and vice
        # versa); global-boundary halos are all zero by construction
        def fold(buf):
            left = jax.lax.slice_in_dim(buf, 0, halo, axis=3)
            right = jax.lax.slice_in_dim(
                buf, buf.shape[3] - halo, buf.shape[3], axis=3
            )
            center = jax.lax.slice_in_dim(
                buf, halo, buf.shape[3] - halo, axis=3
            )
            from_right = jax.lax.ppermute(
                left, space_ax, [(i, (i - 1) % n) for i in range(n)]
            )
            from_left = jax.lax.ppermute(
                right, space_ax, [(i, (i + 1) % n) for i in range(n)]
            )
            center = center.at[:, :, :, jl - halo :].add(from_right)
            center = center.at[:, :, :, :halo].add(from_left)
            return center

        out = fold(acc)
        weight = fold(cnt)
        return out / jnp.clip(weight, 1e-8)

    axes = set(mesh.axis_names) - {space_ax}
    vol_spec = PartitionSpec(None, None, None, space_ax, None)
    corner_spec = PartitionSpec(space_ax, None, None)
    valid_spec = PartitionSpec(space_ax, None)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(vol_spec, corner_spec, valid_spec),
        out_specs=vol_spec,
        check_rep=False,
    )
    del axes, model_id
    return jax.jit(fn)


def sharded_grid_inference(
    volume,
    *,
    mesh: Mesh,
    space_axis: str = "space",
    model_fn=None,
    patch_size,
    patch_overlap=0,
    overlap_mode: str = "hann",
):
    """Dense patch inference over a J-sharded (B, C, I, J, K) batch.

    Every patch of the GridSampler grid is extracted on the shard
    owning its corner, run through ``model_fn`` (default identity; must
    be shape-preserving), and hann/average-aggregated — all inside one
    ``shard_map`` program with only halo-wide ``ppermute`` traffic.
    Equals the single-chip GridSampler -> PatchAggregator result.
    """
    if overlap_mode not in ("hann", "average"):
        raise HaloUnsupported(
            f"sharded aggregation supports 'hann'/'average', got {overlap_mode!r}"
        )
    b, c, si, sj, sk = volume.shape
    if isinstance(patch_size, int):
        patch_size = (patch_size,) * 3
    patch_size = tuple(int(v) for v in patch_size)
    if isinstance(patch_overlap, int):
        patch_overlap = (patch_overlap,) * 3
    n_space = mesh.shape[space_axis]
    if sj % n_space:
        raise HaloUnsupported(f"J={sj} not divisible by space={n_space}")
    jl = sj // n_space
    if patch_size[1] > jl:
        raise HaloUnsupported(
            f"patch J extent {patch_size[1]} exceeds shard width {jl}"
        )
    corners = grid_corners((si, sj, sk), patch_size, patch_overlap)
    per_shard, valid = _partition_corners(corners, n_space, jl)
    program = _sharded_inference_program(
        mesh,
        space_axis,
        (b, c, si, jl, sk),
        patch_size,
        per_shard.shape[1],
        overlap_mode,
        id(model_fn),
        model_ref=model_fn,
    )
    return program(volume, jnp.asarray(per_shard), jnp.asarray(valid))

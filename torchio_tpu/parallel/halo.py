"""Explicit halo-exchange stencils under ``shard_map``.

The blur/antialias stencils have small known support, so a spatially
sharded volume only needs a ``radius``-wide halo from each neighbor:
``jax.lax.ppermute`` shifts edge slabs across the 'space' axis over ICI,
each shard convolves locally, and no all-gather ever materializes the
full volume (SURVEY.md §5.7's TPU recipe).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec
from jax.experimental.shard_map import shard_map

from ..ops.gaussian import gaussian_kernel_1d, radius_for_sigma


class HaloUnsupported(ValueError):
    """This grid/sharding combination cannot run the halo kernel
    (halo wider than the shard, indivisible axis, ...); callers fall
    back to the ordinary (all-gather) resample path."""


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
        raise HaloUnsupported(
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


# --------------------------------------------------------------------------
# Production halo resample: the kernel the PUBLIC Spatial dispatches to
# when a batch is spatially sharded (J over the mesh's 'space' axis).
# --------------------------------------------------------------------------


def _upsample_field_slab(cp, out_shape, j_start, j_len: int):
    """Rows ``[j_start, j_start + j_len)`` of the trilinearly upsampled
    coarse field, bit-identical to the same rows of
    :func:`torchio_tpu.ops.resample.upsample_field` over the GLOBAL
    ``out_shape`` (align_corners=True: coordinates scale with the global
    extent; ``j_start`` may be traced)."""
    cp = jnp.asarray(cp, jnp.float32)
    ni, nj, nk = cp.shape[:3]
    io, jo, ko = out_shape

    def static_coords(n_in: int, n_out: int):
        if n_out == 1:
            return jnp.zeros((1,), jnp.float32)
        return jnp.arange(n_out, dtype=jnp.float32) * ((n_in - 1) / (n_out - 1))

    gi = static_coords(ni, io)
    gk = static_coords(nk, ko)
    if jo == 1:
        gj = jnp.zeros((j_len,), jnp.float32)
    else:
        gj = (j_start + jnp.arange(j_len, dtype=jnp.float32)) * (
            (nj - 1) / (jo - 1)
        )

    def lerp_axis(arr, g, size, axis):
        i0 = jnp.clip(jnp.floor(g).astype(jnp.int32), 0, size - 1)
        i1 = jnp.clip(i0 + 1, 0, size - 1)
        f = (g - i0).reshape([-1 if a == axis else 1 for a in range(arr.ndim)])
        return jnp.take(arr, i0, axis=axis) * (1.0 - f) + jnp.take(
            arr, i1, axis=axis
        ) * f

    out = lerp_axis(cp, gi, ni, 0)
    out = lerp_axis(out, gj, nj, 1)
    return lerp_axis(out, gk, nk, 2)


@lru_cache(maxsize=64)
def _halo_resample_program(
    mesh: Mesh,
    data_ax,
    space_ax,
    local_shape: tuple,
    halo: int,
    has_cp: bool,
    mode: str,
    apply_fill: bool,
):
    """Compiled shard_map resample program, cached per signature."""
    from ..ops.resample import _inbounds_weight, _resample_one

    bl, c, si, jl, sk = local_shape
    n_space = mesh.shape[space_ax]
    sj = jl * n_space  # global J

    def local(xs, ms, cps, fill_rows):
        jdx = jax.lax.axis_index(space_ax)
        j0 = (jdx * jl).astype(jnp.float32)
        ext = _exchange_halo_zero(xs, halo, space_ax)  # (bl, C, I, Jl+2h, K)
        ri = jnp.arange(si, dtype=jnp.float32)[:, None, None, None]
        rj = (jnp.arange(jl, dtype=jnp.float32) + j0)[None, :, None, None]
        rk = jnp.arange(sk, dtype=jnp.float32)[None, None, :, None]
        outs = []
        for e in range(xs.shape[0]):  # static local-batch unroll
            m = ms[e]
            coords = (
                ri * m[:3, 0] + rj * m[:3, 1] + rk * m[:3, 2] + m[:3, 3]
            )  # GLOBAL input-voxel coords of this shard's output slab
            if has_cp:
                coords = coords + _upsample_field_slab(
                    cps[e], (si, sj, sk), j0, jl
                )
            pts = coords.reshape(-1, 3)
            # Values: gather from the halo-extended LOCAL slab. Zero
            # halos at the global boundary reproduce grid_sample's
            # zero-pad partial sums exactly; the halo width covers every
            # globally-in-bounds coordinate (host-verified), so local
            # out-of-extent corners are exactly the globally-OOB ones.
            local_pts = pts.at[:, 1].add(halo - j0)
            acc = _resample_one(
                ext[e].reshape(c, -1).astype(jnp.float32),
                local_pts,
                0.0,
                (si, jl + 2 * halo, sk),
                mode,
                False,
            )
            if apply_fill:
                # fill mask in the GLOBAL frame (same formula as the
                # unsharded kernel's ones-volume pass)
                w = _inbounds_weight(pts[:, 0], pts[:, 1], pts[:, 2], (si, sj, sk))
                fill_col = fill_rows[e].reshape(-1, 1)
                acc = jnp.where(w[None, :] > 0.5, acc, fill_col)
            outs.append(acc.reshape(c, si, jl, sk))
        return jnp.stack(outs)

    vol_spec = PartitionSpec(data_ax, None, None, space_ax, None)
    elem_specs = (
        PartitionSpec(data_ax, None, None),  # (B, 4, 4)
        PartitionSpec(data_ax, None, None, None, None),  # (B, ni, nj, nk, 3)
        PartitionSpec(data_ax, None),  # (B, C)
    )
    fn = shard_map(
        local, mesh=mesh, in_specs=(vol_spec, *elem_specs), out_specs=vol_spec
    )
    return jax.jit(fn)


def halo_resample_spec(
    x,
    matrices,
    control_points,
    *,
    sharding,
    mode: str = "linear",
    fill=0.0,
):
    """Resample a J-sharded (B, C, I, J, K) batch from per-element grid
    specs WITHOUT ever gathering the full volume onto one chip.

    The production >HBM path (SURVEY.md §5.7): per-element 4x4 maps and
    pre-folded elastic control points (the same specs
    :func:`torchio_tpu.ops.resample.resample_fused` takes), but each
    shard computes its output slab from its own input slab plus a
    halo-wide ``ppermute`` neighbor exchange over ICI. Output space must
    equal input space (augmentation-style maps). Results equal the
    unsharded kernel exactly.

    Raises:
        HaloUnsupported: the J displacement exceeds the shard width, J
            does not divide over the mesh, or the control-point fields
            are not stackable — callers fall back to the gather path.
    """
    from jax.sharding import NamedSharding

    if not isinstance(sharding, NamedSharding):
        raise HaloUnsupported(f"need a NamedSharding, got {type(sharding)}")
    mesh = sharding.mesh
    spec = sharding.spec
    padded = tuple(spec) + (None,) * (5 - len(spec))
    data_ax, space_ax = padded[0], padded[3]
    if space_ax is None:
        raise HaloUnsupported("batch is not spatially sharded")
    if padded[1] is not None or padded[2] is not None or padded[4] is not None:
        raise HaloUnsupported(f"unsupported partition spec {spec}")
    b, c, si, sj, sk = x.shape
    n_space = mesh.shape[space_ax]
    if sj % n_space:
        raise HaloUnsupported(f"J={sj} not divisible by space={n_space}")
    jl = sj // n_space
    if data_ax is not None and b % mesh.shape[data_ax]:
        raise HaloUnsupported(
            f"B={b} not divisible by data={mesh.shape[data_ax]}"
        )
    bl = b // mesh.shape[data_ax] if data_ax is not None else b

    ms = np.stack([np.asarray(m, np.float64) for m in matrices])
    if ms.shape != (b, 4, 4):
        raise HaloUnsupported(f"need {b} 4x4 matrices, got {ms.shape}")

    # Halo width: max |j_in - j_out| over the output bbox (affine -> the
    # extremes are at corners) plus the elastic J-displacement bound
    # (control points are in input-voxel units) plus interpolation slack.
    corners = np.array(
        [
            [i, j, k]
            for i in (0.0, si - 1.0)
            for j in (0.0, sj - 1.0)
            for k in (0.0, sk - 1.0)
        ]
    )
    reach = 0.0
    for e in range(b):
        j_in = corners @ ms[e][1, :3] + ms[e][1, 3]
        reach = max(reach, float(np.abs(j_in - corners[:, 1]).max()))
    cps = None
    has_cp = any(cp is not None for cp in control_points)
    if has_cp:
        shapes = {
            tuple(np.asarray(cp).shape)
            for cp in control_points
            if cp is not None
        }
        if len(shapes) != 1:
            raise HaloUnsupported(f"control-point fields differ: {shapes}")
        coarse = shapes.pop()
        stacked = np.zeros((b, *coarse), np.float32)
        for e, cp in enumerate(control_points):
            if cp is not None:
                stacked[e] = np.asarray(cp, np.float32)
        reach += float(np.abs(stacked[..., 1]).max())
        cps = stacked
    halo = int(np.ceil(reach)) + 2
    if halo >= jl:
        raise HaloUnsupported(
            f"halo {halo} >= local shard width {jl}; fall back to the"
            " unsharded resample"
        )

    if isinstance(fill, jax.Array):
        # device fill stays on device (see ops.resample.resample_fused)
        apply_fill = True
        rows = fill.astype(jnp.float32)
        fill_rows = jnp.broadcast_to(
            rows if rows.ndim == 2 else rows.reshape(1, -1), (b, c)
        )
    else:
        fill_arr = np.asarray(fill, np.float32)
        apply_fill = not (
            fill_arr.size == 1 and float(fill_arr.reshape(-1)[0]) == 0.0
        )
        if apply_fill:
            rows = fill_arr if fill_arr.ndim == 2 else fill_arr.reshape(1, -1)
            fill_rows = np.broadcast_to(rows, (b, c)).astype(np.float32)
        else:
            fill_rows = np.zeros((b, c), np.float32)

    program = _halo_resample_program(
        mesh,
        data_ax,
        space_ax,
        (bl, c, si, jl, sk),
        halo,
        cps is not None,
        mode,
        apply_fill,
    )
    elem_sharding = NamedSharding(mesh, PartitionSpec(data_ax))
    ms_dev = jax.device_put(ms.astype(np.float32), elem_sharding)
    cp_dev = jax.device_put(
        cps if cps is not None else np.zeros((b, 1, 1, 1, 3), np.float32),
        elem_sharding,
    )
    fill_dev = jax.device_put(fill_rows, elem_sharding)
    return program(jnp.asarray(x), ms_dev, cp_dev, fill_dev)

"""Core resampling kernels: trilinear/nearest gather-resample on device.

This is the TPU-native replacement for ``F.grid_sample`` (reference hot
loop: ``/root/reference/src/torchio/transforms/spatial/spatial.py:1695-1731``).

Semantics match ``torch.nn.functional.grid_sample(align_corners=True,
padding_mode="zeros")`` working directly in **input voxel coordinates**
(the reference normalizes to [-1, 1] and back; align_corners=True makes
the two formulations identical):

- trilinear: ONE block-gather fetches all 8 corner values per voxel
  (see the kernel comment); corners outside the volume contribute 0.
- nearest: round-half-to-even then a single gather.
- size-1 axes: every coordinate maps to index 0 with full weight and is
  never out of bounds (align_corners unnormalizes by ``size - 1 = 0``).
- out-of-bounds fill: the trilinear in-bounds weight sum is the exact
  analog of grid-sampling a ones-volume; voxels with weight <= 0.5 are
  replaced by the fill value (scalar or per-channel), mirroring
  ``spatial.py:1719-1728``.

Design notes for TPU: gather cost is per-index and nearly independent
of row width, so the eight corner values are materialized as one 8-wide
row of a zero-padded volume and fetched with a single ``jnp.take`` —
317 ms per 256^3 volume on v5e vs ~1.2 s for separate corner gathers
(measurement series in BASELINE.md). No normalized grid or ones-mask
volume is ever materialized.
"""

from __future__ import annotations

import warnings
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _kernel_fallback_warn(name: str, error: Exception) -> None:
    """A Pallas kernel bug must degrade to the gather path, not crash
    the public transform (round-3 regression: a half-landed kernel
    change made ``tio.Affine`` raise on TPU; the legacy pallas path
    already guards this way — ``spatial/spatial.py`` dispatch)."""
    warnings.warn(
        f"{name} failed ({type(error).__name__}: {error});"
        " falling back to the XLA gather kernel",
        RuntimeWarning,
        stacklevel=3,
    )


def _resample_one(
    flat, pts, fill_row, spatial, mode: str, apply_fill: bool,
    block_dtype=None,
):
    """Resample ONE batch element.

    flat (C, N) flattened volume; pts (M, 3) coords; fill_row (C,) or
    scalar. Per-element 1D ``jnp.take`` gathers are used deliberately:
    XLA lowers batched (B > 1) gathers on TPU to a drastically slower
    loop for non-trivial index patterns, while the single-batch form
    vectorizes (measured on v5e: a batched 4x256^3 rotated resample took
    ~9 s where four sequential single-element calls take ~0.3 s each).
    """
    si, sj, sk = spatial
    c = flat.shape[0]
    m = pts.shape[0]
    ci, cj, ck = pts[:, 0], pts[:, 1], pts[:, 2]
    # size-1 axes: grid_sample(align_corners=True) unnormalizes with
    # (size - 1) = 0, so EVERY coordinate maps to index 0 with full
    # weight and is never out of bounds (2D images stored as (C,I,J,1));
    # forcing the coordinate to 0 reproduces that exactly
    if si == 1:
        ci = jnp.zeros_like(ci)
    if sj == 1:
        cj = jnp.zeros_like(cj)
    if sk == 1:
        ck = jnp.zeros_like(ck)

    if mode == "nearest":
        ri = jnp.round(ci).astype(jnp.int32)
        rj = jnp.round(cj).astype(jnp.int32)
        rk = jnp.round(ck).astype(jnp.int32)
        valid = (
            (ri >= 0) & (ri < si) & (rj >= 0) & (rj < sj) & (rk >= 0) & (rk < sk)
        )
        idx = (
            jnp.clip(ri, 0, si - 1) * (sj * sk)
            + jnp.clip(rj, 0, sj - 1) * sk
            + jnp.clip(rk, 0, sk - 1)
        )
        acc = jnp.take(flat, idx, axis=1) * valid[None, :].astype(jnp.float32)
    else:  # trilinear — ONE block-gather fetches all 8 corners
        # TPU gather cost is per-INDEX, nearly independent of the row
        # width (measured at 16.7M rows: 177/220/233/269 ms for
        # 1/2/4/8-wide f32 rows). Materializing the eight corner values
        # of each voxel as one 8-wide row turns the whole trilinear
        # lookup into a SINGLE take: 269 ms vs 8 x 177 ms at 256^3 on
        # v5e (~3.5x on the gather stage; ~2.9x on the full resample).
        # Every axis is zero-padded front and back so the block at
        # (clip(x0, -1, s-1) + 1, ...) is correct for all x0 in
        # [-1, s-1]; out-of-range corners read the zero pad and carry
        # zero weight anyway. Costs 8x the volume in scratch HBM.
        sip, sjp, skp = si + 1, sj + 1, sk + 1

        def corner_block(channels):
            vp = jnp.pad(
                channels.reshape(-1, si, sj, sk), ((0, 0), (1, 1), (1, 1), (1, 1))
            )
            block = jnp.stack(
                [
                    vp[:, di : di + sip, dj : dj + sjp, dk : dk + skp]
                    for di in (0, 1)
                    for dj in (0, 1)
                    for dk in (0, 1)
                ],
                axis=-1,
            ).reshape(-1, sip * sjp * skp, 8)
            if block_dtype is not None:
                # Half-precision corner rows (gather cost tracks row
                # BYTES past ~16 B: measured 235 ms vs 276 ms per 256^3
                # on v5e for f16 vs f32 rows). Weights and accumulation
                # stay f32; value rounding is <= 2^-11 relative — inside
                # the 1e-3 driver accuracy gate, opt-in via
                # torchio_tpu.config.gather16.
                block = block.astype(block_dtype)
            return block

        i0 = jnp.floor(ci).astype(jnp.int32)
        j0 = jnp.floor(cj).astype(jnp.int32)
        k0 = jnp.floor(ck).astype(jnp.int32)
        fi, fj, fk = ci - i0, cj - j0, ck - k0
        wi = ((1.0 - fi) * ((i0 >= 0) & (i0 < si)),
              fi * ((i0 + 1 >= 0) & (i0 + 1 < si)))
        wj = ((1.0 - fj) * ((j0 >= 0) & (j0 < sj)),
              fj * ((j0 + 1 >= 0) & (j0 + 1 < sj)))
        wk = ((1.0 - fk) * ((k0 >= 0) & (k0 < sk)),
              fk * ((k0 + 1 >= 0) & (k0 + 1 < sk)))
        weights = jnp.stack(
            [
                wi[di] * wj[dj] * wk[dk]
                for di in (0, 1)
                for dj in (0, 1)
                for dk in (0, 1)
            ],
            axis=-1,
        )  # (M, 8)
        ib = jnp.clip(i0, -1, si - 1) + 1
        jb = jnp.clip(j0, -1, sj - 1) + 1
        kb = jnp.clip(k0, -1, sk - 1) + 1
        idx = ib * (sjp * skp) + jb * skp + kb
        # chunk channels so the 8x scratch block stays bounded (~2 GB):
        # label partial-volume mode resamples one channel per label
        chunk = max(1, int(2e9 // max(sip * sjp * skp * 8 * 4, 1)))
        parts = []
        for lo in range(0, c, chunk):
            block = corner_block(flat[lo : lo + chunk])
            corners = jnp.take(block, idx, axis=1)  # (chunk, M, 8)
            parts.append(
                jnp.sum(corners.astype(jnp.float32) * weights[None], axis=-1)
            )
        acc = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)

        if apply_fill:
            # the in-bounds ones-volume mask IS the sum of the corner
            # weights already computed — no second coordinate pass
            mask = jnp.sum(weights, axis=-1)
            fill_col = jnp.asarray(fill_row, jnp.float32).reshape(-1, 1)
            acc = jnp.where(mask[None, :] > 0.5, acc, fill_col)
        return acc

    if not apply_fill:
        # fill == 0: grid_sample's zero padding already produces the
        # right values (partial sums at the boundary), so skip the mask
        # (matches reference _prepare_fill_value returning None).
        return acc

    # nearest mode: the fill mask is still the LINEAR in-bounds weight
    # (matching the reference, which always grid-samples a ones-volume
    # bilinearly)
    mask = _inbounds_weight(ci, cj, ck, (si, sj, sk))
    fill_col = jnp.asarray(fill_row, jnp.float32).reshape(-1, 1)
    return jnp.where(mask[None, :] > 0.5, acc, fill_col)


def _inbounds_weight(ci, cj, ck, spatial):
    """In-bounds weight mask == bilinear grid_sample of a ones-volume
    (always bilinear, matching the reference even in nearest mode).
    Size-1 axes never go out of bounds (align_corners semantics)."""
    si, sj, sk = spatial
    if si == 1:
        ci = jnp.zeros_like(ci)
    if sj == 1:
        cj = jnp.zeros_like(cj)
    if sk == 1:
        ck = jnp.zeros_like(ck)
    i0 = jnp.floor(ci).astype(jnp.int32)
    j0 = jnp.floor(cj).astype(jnp.int32)
    k0 = jnp.floor(ck).astype(jnp.int32)
    fi, fj, fk = ci - i0, cj - j0, ck - k0
    mask = jnp.zeros(ci.shape, jnp.float32)
    for di in (0, 1):
        wi = fi if di else 1.0 - fi
        vi = (i0 + di >= 0) & (i0 + di < si)
        for dj in (0, 1):
            wj = fj if dj else 1.0 - fj
            vj = (j0 + dj >= 0) & (j0 + dj < sj)
            for dk in (0, 1):
                wk = fk if dk else 1.0 - fk
                vk = (k0 + dk >= 0) & (k0 + dk < sk)
                mask = mask + wi * wj * wk * (vi & vj & vk).astype(jnp.float32)
    return mask


@partial(jax.jit, static_argnames=("out_spatial", "mode", "apply_fill"))
def _resample_element(
    data, coords, fill_row, out_spatial: tuple[int, int, int],
    mode: str, apply_fill: bool,
):
    """One batch element: data (C, I, J, K), coords (Io, Jo, Ko, 3)."""
    c, si, sj, sk = data.shape
    flat = data.reshape(c, -1).astype(jnp.float32)
    pts = coords.reshape(-1, 3)
    out = _resample_one(flat, pts, fill_row, (si, sj, sk), mode, apply_fill)
    return out.reshape(c, *out_spatial)


@partial(
    jax.jit,
    static_argnames=("out_spatial", "mode", "apply_fill", "use_f16"),
)
def _resample_element_fused(
    data, matrix, control_points, fill_row,
    out_spatial: tuple[int, int, int], mode: str, apply_fill: bool,
    use_f16: bool,
):
    """One batch element with the sampling grid built INSIDE the program.

    ``matrix`` is the (4, 4) output-voxel -> input-voxel map;
    ``control_points`` is an optional pre-folded coarse displacement
    field in input-voxel units (spacing and, for affine-last ordering,
    the rotation are folded into it on host — both commute with the
    trilinear upsample because everything is linear). Fusing the ramp
    build, elastic upsample, floor/weight math, gather, and weighted sum
    into one XLA program keeps the (M, 3) coordinate tensor (~200 MB at
    256^3) and the upsampled displacement field out of HBM entirely —
    measured 27+28 ms per element at 256^3 for the separate
    build_coords/upsample_field dispatches this replaces.
    """
    c, si, sj, sk = data.shape
    flat = data.reshape(c, -1).astype(jnp.float32)
    coords = _build_coords_kernel(matrix, out_spatial)
    if control_points is not None:
        coords = coords + upsample_field(control_points, out_spatial)
    pts = coords.reshape(-1, 3)
    out = _resample_one(
        flat, pts, fill_row, (si, sj, sk), mode, apply_fill,
        block_dtype=jnp.float16 if use_f16 else None,
    )
    return out.reshape(c, *out_spatial)


def _axis_weights(n_out: int, n_in: int, scale, offset, mode: str):
    """Per-axis interpolation matrix + in-bounds mask for a 1-D affine
    map ``in = scale * out + offset``.

    Returns ``W`` of shape (n_out, n_in) reproducing the gather kernel's
    per-axis corner weights (zero rows outside the volume, matching
    zero-pad semantics), and ``mask`` (n_out,), the LINEAR in-bounds
    weight used for fill (always linear, even in nearest mode — same as
    :func:`_resample_one`'s mask pass).
    """
    coords = scale * jnp.arange(n_out, dtype=jnp.float32) + offset
    if n_in == 1:
        # grid_sample(align_corners=True) with size 1: every coordinate
        # maps to index 0 with full weight, never out of bounds.
        coords = jnp.zeros_like(coords)
    columns = jnp.arange(n_in, dtype=jnp.int32)[None, :]
    x0 = jnp.floor(coords).astype(jnp.int32)
    f = coords - x0
    inb0 = ((x0 >= 0) & (x0 < n_in)).astype(jnp.float32)
    inb1 = ((x0 + 1 >= 0) & (x0 + 1 < n_in)).astype(jnp.float32)
    mask = (1.0 - f) * inb0 + f * inb1
    if mode == "nearest":
        r = jnp.round(coords).astype(jnp.int32)
        valid = ((r >= 0) & (r < n_in)).astype(jnp.float32)
        w = (jnp.clip(r, 0, n_in - 1)[:, None] == columns).astype(jnp.float32)
        return w * valid[:, None], mask
    w = ((1.0 - f) * inb0)[:, None] * (
        jnp.clip(x0, 0, n_in - 1)[:, None] == columns
    ) + (f * inb1)[:, None] * (
        jnp.clip(x0 + 1, 0, n_in - 1)[:, None] == columns
    )
    return w.astype(jnp.float32), mask


@partial(jax.jit, static_argnames=("out_spatial", "mode", "apply_fill"))
def _resample_element_separable(
    data, scales, offsets, fill_row,
    out_spatial: tuple[int, int, int], mode: str, apply_fill: bool,
):
    """Axis-aligned resample of one element as three MXU matmuls.

    When the output->input map is DIAGONAL (pure per-axis scale +
    translation: ``Resample`` to a target spacing, ``Resize``,
    ``Anisotropy`` — no rotation/shear/elastic), the trilinear weight
    w_i*w_j*w_k factorizes, so the whole resample is three tiny
    (n_out, n_in) interpolation matmuls instead of a 10 ns-per-index
    3-D gather: ~4 GFLOP at 256^3 (microseconds of MXU time,
    bandwidth-bound in practice) vs ~1.2 s for the 16.7M-index take.
    Weights, masks, and fill semantics are identical to
    :func:`_resample_one` — exact f32 contractions keep it within
    rounding of the gather path.
    """
    c, si, sj, sk = data.shape
    io, jo, ko = out_spatial
    vol = data.astype(jnp.float32)
    wi, mi = _axis_weights(io, si, scales[0], offsets[0], mode)
    wj, mj = _axis_weights(jo, sj, scales[1], offsets[1], mode)
    wk, mk = _axis_weights(ko, sk, scales[2], offsets[2], mode)
    hi = jax.lax.Precision.HIGHEST
    out = jnp.einsum("oi,cijk->cojk", wi, vol, precision=hi)
    out = jnp.einsum("pj,cojk->copk", wj, out, precision=hi)
    out = jnp.einsum("qk,copk->copq", wk, out, precision=hi)
    if not apply_fill:
        return out
    if mode == "nearest":
        # rebuild the LINEAR masks (nearest W returns its own mask slot)
        _, mi = _axis_weights(io, si, scales[0], offsets[0], "linear")
        _, mj = _axis_weights(jo, sj, scales[1], offsets[1], "linear")
        _, mk = _axis_weights(ko, sk, scales[2], offsets[2], "linear")
    mask = mi[:, None, None] * mj[None, :, None] * mk[None, None, :]
    fill_col = jnp.asarray(fill_row, jnp.float32).reshape(-1, 1, 1, 1)
    return jnp.where(mask[None] > 0.5, out, fill_col)


def _diagonal_map(matrix) -> tuple[np.ndarray, np.ndarray] | None:
    """(scales, offsets) if the 4x4 output->input map is exactly
    diagonal in its 3x3 part, else None."""
    m = np.asarray(matrix, np.float64)
    rot = m[:3, :3]
    if np.any(rot - np.diag(np.diag(rot)) != 0.0):
        return None
    return np.diag(rot).copy(), m[:3, 3].copy()


def _plane_map(matrix) -> tuple[int, np.ndarray, np.ndarray, float, float] | None:
    """Decompose a map that mixes only TWO axes (single-plane rotation:
    axial/coronal/sagittal tilt — the common clinical case).

    Returns ``(axis, a2, b2, scale_u, offset_u)`` where ``axis`` is the
    UNMIXED spatial axis (its row and column off-diagonals are exactly
    zero), ``a2``/``b2`` the 2x2+offset map of the two mixed axes (in
    their original order), and ``scale_u``/``offset_u`` the 1-D affine
    of the unmixed axis. None when no such axis exists (full 3-D
    rotation) — the caller falls back to the 3-D gather.
    """
    m = np.asarray(matrix, np.float64)
    r = m[:3, :3]
    for axis in (2, 1, 0):  # prefer K: no transpose needed
        others = [i for i in (0, 1, 2) if i != axis]
        if (
            r[axis, others[0]] == 0.0
            and r[axis, others[1]] == 0.0
            and r[others[0], axis] == 0.0
            and r[others[1], axis] == 0.0
        ):
            a2 = r[np.ix_(others, others)].copy()
            b2 = m[others, 3].copy()
            return axis, a2, b2, float(r[axis, axis]), float(m[axis, 3])
    return None


@partial(jax.jit, static_argnames=("out_spatial", "mode", "apply_fill"))
def _resample_element_plane(
    data, a2, b2, scale_u, offset_u, fill_row,
    out_spatial: tuple[int, int, int], mode: str, apply_fill: bool,
):
    """Single-plane-rotation resample: 2-D gather + one axis matmul.

    ``data`` is (C, I, J, K) with K the UNMIXED axis (callers transpose
    first). The K interpolation is an `_axis_weights` matmul; the (I, J)
    plane needs a genuine gather, but only over Io*Jo indices — 256x
    fewer than the dense 3-D grid at 256^3 — using the same padded
    corner-block trick as :func:`_resample_one` (4 corners in 2-D).
    Weight/mask/fill semantics match the 3-D kernel exactly.
    """
    c, si, sj, sk = data.shape
    io, jo, ko = out_spatial
    vol = data.astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST

    wk, mk = _axis_weights(ko, sk, scale_u, offset_u, mode)
    if mode == "nearest":
        _, mk = _axis_weights(ko, sk, scale_u, offset_u, "linear")

    # XLA gathers do NOT amortize leading batch dims (a (C*K, N, 4)
    # take re-fetches per leading slice — measured identical to the
    # full 16.7M-index 3-D gather). Instead the unmixed axis rides
    # INSIDE the gathered row (4*KD-wide rows at only Io*Jo indices);
    # cost is then bytes-bound at the gather engine's byte rate, ~10x
    # the per-index path. The K matmul commutes with the in-plane
    # interpolation, so run it on whichever side is smaller.
    matmul_first = ko < sk
    if matmul_first:
        vol = jnp.einsum("qk,cijk->cijq", wk, vol, precision=hi)
    kd = vol.shape[-1]

    # in-plane coordinates for the Io x Jo output grid
    oi = jnp.arange(io, dtype=jnp.float32)
    oj = jnp.arange(jo, dtype=jnp.float32)
    ci = a2[0, 0] * oi[:, None] + a2[0, 1] * oj[None, :] + b2[0]
    cj = a2[1, 0] * oi[:, None] + a2[1, 1] * oj[None, :] + b2[1]
    if si == 1:
        ci = jnp.zeros_like(ci)
    if sj == 1:
        cj = jnp.zeros_like(cj)
    ci, cj = ci.reshape(-1), cj.reshape(-1)  # (M2,) with M2 = Io*Jo

    if mode == "nearest":
        ri = jnp.round(ci).astype(jnp.int32)
        rj = jnp.round(cj).astype(jnp.int32)
        valid = (ri >= 0) & (ri < si) & (rj >= 0) & (rj < sj)
        idx = jnp.clip(ri, 0, si - 1) * sj + jnp.clip(rj, 0, sj - 1)
        rows = vol.reshape(c, si * sj, kd)
        acc = (
            jnp.take(rows, idx, axis=1)
            * valid[None, :, None].astype(jnp.float32)
        )  # (C, M2, KD)
    else:
        sip, sjp = si + 1, sj + 1
        vp = jnp.pad(vol, ((0, 0), (1, 1), (1, 1), (0, 0)))
        block = jnp.stack(
            [
                vp[:, di : di + sip, dj : dj + sjp, :]
                for di in (0, 1)
                for dj in (0, 1)
            ],
            axis=3,
        ).reshape(c, sip * sjp, 4, kd)
        i0 = jnp.floor(ci).astype(jnp.int32)
        j0 = jnp.floor(cj).astype(jnp.int32)
        fi, fj = ci - i0, cj - j0
        wi = ((1.0 - fi) * ((i0 >= 0) & (i0 < si)),
              fi * ((i0 + 1 >= 0) & (i0 + 1 < si)))
        wj = ((1.0 - fj) * ((j0 >= 0) & (j0 < sj)),
              fj * ((j0 + 1 >= 0) & (j0 + 1 < sj)))
        weights = jnp.stack(
            [wi[di] * wj[dj] for di in (0, 1) for dj in (0, 1)], axis=-1
        )  # (M2, 4)
        idx = (jnp.clip(i0, -1, si - 1) + 1) * sjp + (jnp.clip(j0, -1, sj - 1) + 1)
        corners = jnp.take(block, idx, axis=1)  # (C, M2, 4, KD)
        acc = jnp.einsum("cmdk,md->cmk", corners, weights, precision=hi)

    if not matmul_first:
        acc = jnp.einsum("qk,cmk->cmq", wk, acc, precision=hi)
    out = acc.reshape(c, io, jo, ko)
    if not apply_fill:
        return out

    # bilinear in-plane mask (always linear, like the 3-D kernel) x k-mask
    i0 = jnp.floor(ci).astype(jnp.int32)
    j0 = jnp.floor(cj).astype(jnp.int32)
    fi, fj = ci - i0, cj - j0
    mask2 = jnp.zeros(ci.shape, jnp.float32)
    for di in (0, 1):
        wi_ = fi if di else 1.0 - fi
        vi = (i0 + di >= 0) & (i0 + di < si)
        for dj in (0, 1):
            wj_ = fj if dj else 1.0 - fj
            vj = (j0 + dj >= 0) & (j0 + dj < sj)
            mask2 = mask2 + wi_ * wj_ * (vi & vj).astype(jnp.float32)
    mask = mask2.reshape(io, jo)[:, :, None] * mk[None, None, :]
    fill_col = jnp.asarray(fill_row, jnp.float32).reshape(-1, 1, 1, 1)
    return jnp.where(mask[None] > 0.5, out, fill_col)


# axis -> (transpose bringing that axis last, inverse transpose)
_PLANE_PERMS = {
    2: ((0, 1, 2, 3), (0, 1, 2, 3)),           # K already last
    1: ((0, 1, 3, 2), (0, 1, 3, 2)),           # swap J <-> K
    0: ((0, 2, 3, 1), (0, 3, 1, 2)),           # I to last
}


def resample_fused(
    data,
    matrices,
    control_points,
    *,
    out_shape=None,
    mode: str = "linear",
    fill=0.0,
    use_f16: bool | None = None,
):
    """Resample a (B, C, I, J, K) batch from per-element grid SPECS.

    Args:
        data: (B, C, I, J, K) array.
        matrices: length-B list of 4x4 host float64 output->input maps.
        control_points: length-B list of pre-folded coarse displacement
            fields (input-voxel units) or None entries.
        out_shape: (Io, Jo, Ko) output spatial shape (defaults to the
            input spatial shape).
        mode: "linear" or "nearest".
        fill: scalar / (C,) / (B, C) out-of-bounds fill.
        use_f16: gather the corner block as float16 rows (defaults to
            :func:`torchio_tpu.config.gather16`).

    Equivalent to building the dense (B, Io, Jo, Ko, 3) grid and calling
    :func:`resample`, but never materializes it.
    """
    from ..config import gather16

    if use_f16 is None:
        use_f16 = gather16()
    data = jnp.asarray(data)
    b = data.shape[0]
    if isinstance(fill, jax.Array):
        # device-computed fill (e.g. the per-element "minimum" policy):
        # stays on device as a traced argument — np.asarray here would
        # be a BLOCKING device->host pull before the resample could
        # even dispatch
        fill_arr = fill.astype(jnp.float32)
        if fill_arr.ndim != 2:
            fill_arr = fill_arr.reshape(-1)
        apply_fill = True
    else:
        fill_arr = np.asarray(fill, np.float32)
        if fill_arr.ndim != 2:
            fill_arr = fill_arr.reshape(-1)
        apply_fill = not (
            fill_arr.size == 1 and float(fill_arr.reshape(-1)[0]) == 0.0
        )
    out_spatial = tuple(
        int(s) for s in (out_shape if out_shape is not None else data.shape[-3:])
    )
    from .window_resample import window_eligible, window_resample_fused

    window = window_eligible(
        data.shape, out_spatial, matrices, control_points, mode, data=data
    )
    if window is not None:
        # bounded-offset elastic maps: the whole batch runs as ONE
        # Pallas program at VPU rate instead of the per-index gather
        padi, padj = window
        try:
            return window_resample_fused(
                data, matrices, control_points, fill_arr,
                padi=padi, padj=padj, apply_fill=apply_fill, mode=mode,
            )
        except Exception as error:
            _kernel_fallback_warn("window_resample_fused", error)
    if not any(
        cp is None
        and (
            _diagonal_map(matrices[bi]) is not None
            or _plane_map(matrices[bi]) is not None
        )
        for bi, cp in enumerate(control_points)
    ):
        # general affine (+elastic): the sheared window kernel beats the
        # per-index gather ~3-4x (skipped when any element has a faster
        # separable/plane decomposition)
        from .shear_resample import shear_eligible, shear_resample_fused

        plan = shear_eligible(
            data.shape, out_spatial, matrices, control_points, mode,
            data=data,
        )
        if plan is not None:
            try:
                return shear_resample_fused(
                    data, matrices, control_points, fill_arr, plan,
                    mode=mode, apply_fill=apply_fill,
                )
            except Exception as error:
                _kernel_fallback_warn("shear_resample_fused", error)
    outs = []
    for bi in range(b):
        cp = control_points[bi]
        fill_row = jnp.asarray(
            fill_arr[bi] if fill_arr.ndim == 2 else fill_arr, jnp.float32
        )
        diag = None if cp is not None else _diagonal_map(matrices[bi])
        if diag is not None:
            # axis-aligned: three per-axis matmuls beat the 3-D gather
            # by orders of magnitude (see _resample_element_separable)
            scales, offsets = diag
            outs.append(
                _resample_element_separable(
                    data[bi],
                    jnp.asarray(scales, jnp.float32),
                    jnp.asarray(offsets, jnp.float32),
                    fill_row, out_spatial, mode, apply_fill,
                )
            )
            continue
        plane = None if cp is not None else _plane_map(matrices[bi])
        if plane is not None:
            # single-plane rotation: Io*Jo-index 2-D gather + one matmul
            axis, a2, b2, scale_u, offset_u = plane
            fwd, inv = _PLANE_PERMS[axis]
            out_t = tuple(out_spatial[p - 1] for p in fwd[1:])
            result = _resample_element_plane(
                jnp.transpose(data[bi], fwd),
                jnp.asarray(a2, jnp.float32),
                jnp.asarray(b2, jnp.float32),
                jnp.float32(scale_u), jnp.float32(offset_u),
                fill_row, out_t, mode, apply_fill,
            )
            outs.append(jnp.transpose(result, inv))
            continue
        m = jnp.asarray(np.asarray(matrices[bi], np.float64), jnp.float32)
        cp = None if cp is None else jnp.asarray(
            np.asarray(cp, np.float64), jnp.float32
        )
        outs.append(
            _resample_element_fused(
                data[bi], m, cp, fill_row, out_spatial, mode, apply_fill,
                bool(use_f16),
            )
        )
    return jnp.stack(outs)


@partial(jax.jit, static_argnames=("out_spatial", "has_cp"))
def _resample_element_label(
    data, matrix, control_points, pad_label,
    out_spatial: tuple[int, int, int], has_cp: bool,
):
    """Partial-volume label resampling from the 8 corner labels directly.

    Equivalent to one-hot(unique labels) -> trilinear -> argmax
    (reference ``spatial.py:1275-1389``) when no antialias smoothing
    applies: the winning label is the one maximizing the summed corner
    weight, i.e. ``argmax_l sum_j w_j [label_j = l]`` — computable from
    the 8 gathered corner labels without EVER knowing the label set.
    This removes the blocking ``unique`` host pull and the L-channel
    one-hot gather: ONE single-channel take per element, exactly the
    cost of a scalar resample. Ties pick the smallest label, matching
    argmax over sorted unique labels.
    """
    c, si, sj, sk = data.shape
    coords = _build_coords_kernel(matrix, out_spatial)
    if has_cp:
        coords = coords + upsample_field(control_points, out_spatial)
    pts = coords.reshape(-1, 3)
    ci, cj, ck = pts[:, 0], pts[:, 1], pts[:, 2]
    if si == 1:
        ci = jnp.zeros_like(ci)
    if sj == 1:
        cj = jnp.zeros_like(cj)
    if sk == 1:
        ck = jnp.zeros_like(ck)
    i0 = jnp.floor(ci).astype(jnp.int32)
    j0 = jnp.floor(cj).astype(jnp.int32)
    k0 = jnp.floor(ck).astype(jnp.int32)
    fi, fj, fk = ci - i0, cj - j0, ck - k0
    wi = ((1.0 - fi) * ((i0 >= 0) & (i0 < si)),
          fi * ((i0 + 1 >= 0) & (i0 + 1 < si)))
    wj = ((1.0 - fj) * ((j0 >= 0) & (j0 < sj)),
          fj * ((j0 + 1 >= 0) & (j0 + 1 < sj)))
    wk = ((1.0 - fk) * ((k0 >= 0) & (k0 < sk)),
          fk * ((k0 + 1 >= 0) & (k0 + 1 < sk)))
    weights = jnp.stack(
        [
            wi[di] * wj[dj] * wk[dk]
            for di in (0, 1)
            for dj in (0, 1)
            for dk in (0, 1)
        ],
        axis=-1,
    )  # (M, 8)
    sip, sjp, skp = si + 1, sj + 1, sk + 1
    padded = jnp.pad(data, ((0, 0), (1, 1), (1, 1), (1, 1)))
    block = jnp.stack(
        [
            padded[:, di : di + sip, dj : dj + sjp, dk : dk + skp]
            for di in (0, 1)
            for dj in (0, 1)
            for dk in (0, 1)
        ],
        axis=-1,
    ).reshape(c, -1, 8)
    ib = jnp.clip(i0, -1, si - 1) + 1
    jb = jnp.clip(j0, -1, sj - 1) + 1
    kb = jnp.clip(k0, -1, sk - 1) + 1
    idx = ib * (sjp * skp) + jb * skp + kb
    labs = jnp.take(block[0], idx, axis=0)  # (M, 8) corner labels
    # score of each corner's label: total corner weight carrying it
    same = labs[:, :, None] == labs[:, None, :]  # (M, j, i)
    scores = jnp.sum(weights[:, :, None] * same, axis=1)  # (M, 8)
    top = jnp.max(scores, axis=1, keepdims=True)
    if jnp.issubdtype(data.dtype, jnp.floating):
        big = jnp.asarray(jnp.inf, data.dtype)
    else:
        big = jnp.asarray(jnp.iinfo(data.dtype).max, data.dtype)
    winner = jnp.min(jnp.where(scores == top, labs, big), axis=1)
    wsum = jnp.sum(weights, axis=1)
    pad_cast = jnp.asarray(pad_label).astype(data.dtype)
    out = jnp.where(wsum > 0.5, winner, pad_cast)
    return out.reshape(c, *out_spatial)


def resample_label_fused(
    data, matrices, control_points, *, out_shape=None, pad_label=0.0
):
    """Partial-volume label resampling of a (B, 1, I, J, K) batch from
    per-element grid specs (see :func:`_resample_element_label`)."""
    data = jnp.asarray(data)
    out_spatial = tuple(
        int(s) for s in (out_shape if out_shape is not None else data.shape[-3:])
    )
    from .window_resample import (
        window_eligible,
        window_resample_label_fused,
    )

    window = window_eligible(
        data.shape, out_spatial, matrices, control_points, "linear",
        data=data,
    )
    if window is not None:
        padi, padj = window
        try:
            return window_resample_label_fused(
                data, matrices, control_points, pad_label,
                padi=padi, padj=padj,
            )
        except Exception as error:
            _kernel_fallback_warn("window_resample_label_fused", error)
    from .shear_resample import (
        shear_eligible,
        shear_resample_label_fused,
    )

    plan = shear_eligible(
        data.shape, out_spatial, matrices, control_points, "linear",
        data=data,
    )
    if plan is not None:
        try:
            return shear_resample_label_fused(
                data, matrices, control_points, pad_label, plan
            )
        except Exception as error:
            _kernel_fallback_warn("shear_resample_label_fused", error)
    outs = []
    for bi in range(data.shape[0]):
        m = jnp.asarray(np.asarray(matrices[bi], np.float64), jnp.float32)
        cp = control_points[bi]
        cp_arr = (
            jnp.zeros((1, 1, 1, 3), jnp.float32)
            if cp is None
            else jnp.asarray(np.asarray(cp, np.float64), jnp.float32)
        )
        outs.append(
            _resample_element_label(
                data[bi], m, cp_arr, pad_label, out_spatial, cp is not None
            )
        )
    return jnp.stack(outs)


def _resample_kernel(data, coords, fill, mode: str, apply_fill: bool = True):
    """data (B, C, I, J, K); coords (B, Io, Jo, Ko, 3); fill scalar /
    (C,) / (B, C). Returns (B, C, Io, Jo, Ko) float32.

    The batch loop runs on host calling ONE jit-compiled single-element
    kernel: calls dispatch asynchronously and pipeline on device, and
    the executable is compiled once per shape signature regardless of
    batch size (compiling a B-unrolled or batched-gather variant costs
    minutes of XLA time on TPU and the batched gather lowers to a
    pathologically slow scalar loop — see ``_resample_one``).
    """
    b = data.shape[0]
    out_spatial = tuple(int(s) for s in coords.shape[1:4])
    fill_arr = jnp.asarray(fill, jnp.float32)
    outs = []
    for bi in range(b):
        fill_row = fill_arr[bi] if fill_arr.ndim == 2 else fill_arr
        outs.append(
            _resample_element(
                data[bi], coords[bi], fill_row, out_spatial, mode, apply_fill
            )
        )
    return jnp.stack(outs)


def resample(data, coords, *, mode: str = "linear", fill=0.0):
    """Resample a (B, C, I, J, K) batch at input-voxel coordinates.

    Args:
        data: (B, C, I, J, K) array.
        coords: (Io, Jo, Ko, 3) shared grid or (B, Io, Jo, Ko, 3)
            per-sample grids, in input voxel coordinates.
        mode: "linear" or "nearest".
        fill: scalar, per-channel (C,), or per-element-per-channel (B, C)
            fill for out-of-bounds voxels.

    Returns:
        (B, C, Io, Jo, Ko) float32 array.
    """
    data = jnp.asarray(data)
    coords = jnp.asarray(coords, jnp.float32)
    if coords.ndim == 4:
        coords = jnp.broadcast_to(coords[None], (data.shape[0],) + coords.shape)
    if mode not in ("linear", "nearest"):
        raise ValueError(f"Unsupported resampling mode: {mode!r}")
    if isinstance(fill, jax.Array):
        # device fill stays on device (see resample_fused)
        fill_arr = fill.astype(jnp.float32)
        if fill_arr.ndim not in (0, 1, 2):
            raise ValueError(f"fill must be scalar/(C,)/(B, C), got {fill.shape}")
        return _resample_kernel(data, coords, fill_arr, mode, True)
    fill_arr = np.asarray(fill, np.float32)
    if fill_arr.ndim == 2:
        if fill_arr.shape != (data.shape[0], data.shape[1]):
            raise ValueError(
                f"2D fill must have shape (B, C) = {data.shape[:2]},"
                f" got {fill_arr.shape}"
            )
    else:
        fill_arr = fill_arr.reshape(-1)
        if fill_arr.shape[0] not in (1, data.shape[1]):
            raise ValueError(
                f"fill must be scalar, per-channel ({data.shape[1]},), or"
                f" (B, C); got shape {fill_arr.shape}"
            )
    apply_fill = not (fill_arr.size == 1 and float(fill_arr.reshape(-1)[0]) == 0.0)
    return _resample_kernel(data, coords, jnp.asarray(fill_arr), mode, apply_fill)


@partial(jax.jit, static_argnames=("out_shape",))
def upsample_field(control_points, out_shape: tuple[int, int, int]):
    """Trilinearly upsample a coarse (n_i, n_j, n_k, 3) field to
    ``(*out_shape, 3)`` with align_corners=True semantics
    (equivalent to ``F.interpolate(mode="trilinear", align_corners=True)``,
    reference ``spatial.py:2171-2189``)."""
    cp = jnp.asarray(control_points, jnp.float32)
    ni, nj, nk = cp.shape[:3]

    def axis_coords(n_in: int, n_out: int):
        if n_out == 1:
            return jnp.zeros((1,), jnp.float32)
        return jnp.arange(n_out, dtype=jnp.float32) * ((n_in - 1) / (n_out - 1))

    gi = axis_coords(ni, out_shape[0])
    gj = axis_coords(nj, out_shape[1])
    gk = axis_coords(nk, out_shape[2])

    def lerp_axis(arr, g, size, axis):
        i0 = jnp.clip(jnp.floor(g).astype(jnp.int32), 0, size - 1)
        i1 = jnp.clip(i0 + 1, 0, size - 1)
        f = (g - i0).reshape([-1 if a == axis else 1 for a in range(arr.ndim)])
        a0 = jnp.take(arr, i0, axis=axis)
        a1 = jnp.take(arr, i1, axis=axis)
        return a0 * (1.0 - f) + a1 * f

    out = lerp_axis(cp, gi, ni, 0)
    out = lerp_axis(out, gj, nj, 1)
    out = lerp_axis(out, gk, nk, 2)
    return out


@partial(jax.jit, static_argnames=("out_shape",))
def upsample_volume(x, out_shape: tuple[int, int, int]):
    """Trilinear align_corners=True upsampling over the LAST 3 axes.

    Equivalent to ``F.interpolate(mode="trilinear", align_corners=True)``
    for (B, C, I, J, K) inputs.
    """
    x = jnp.asarray(x, jnp.float32)
    nd = x.ndim

    def axis_coords(n_in: int, n_out: int):
        if n_out == 1:
            return jnp.zeros((1,), jnp.float32)
        return jnp.arange(n_out, dtype=jnp.float32) * ((n_in - 1) / max(n_out - 1, 1))

    out = x
    for rel, n_out in enumerate(out_shape):
        axis = nd - 3 + rel
        n_in = out.shape[axis]
        g = axis_coords(n_in, n_out)
        i0 = jnp.clip(jnp.floor(g).astype(jnp.int32), 0, n_in - 1)
        i1 = jnp.clip(i0 + 1, 0, n_in - 1)
        shape = [1] * out.ndim
        shape[axis] = -1
        f = (g - i0).reshape(shape)
        a0 = jnp.take(out, i0, axis=axis)
        a1 = jnp.take(out, i1, axis=axis)
        out = a0 * (1.0 - f) + a1 * f
    return out


def build_coords(out_shape: tuple[int, int, int], matrix) -> jax.Array:
    """(Io, Jo, Ko, 3) input-voxel coordinates of each output voxel.

    ``matrix`` is the 4x4 output-voxel -> input-voxel map (float64 host
    math, shipped as float32). The affine map is separable, so the grid
    is built from three broadcast 1D ramps instead of a dense matmul —
    negligible HBM traffic.
    """
    m = jnp.asarray(np.asarray(matrix, np.float64), jnp.float32)
    return _build_coords_kernel(m, tuple(out_shape))


@partial(jax.jit, static_argnames=("out_shape",))
def _build_coords_kernel(m, out_shape: tuple[int, int, int]) -> jax.Array:
    io, jo, ko = out_shape
    ri = jnp.arange(io, dtype=jnp.float32)[:, None, None, None]
    rj = jnp.arange(jo, dtype=jnp.float32)[None, :, None, None]
    rk = jnp.arange(ko, dtype=jnp.float32)[None, None, :, None]
    return (
        ri * m[:3, 0]
        + rj * m[:3, 1]
        + rk * m[:3, 2]
        + m[:3, 3]
    )

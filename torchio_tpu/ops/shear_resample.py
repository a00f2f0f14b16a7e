"""Sheared-window resample: the bounded-window kernel for GENERAL
affine (+elastic) maps.

:mod:`.window_resample` handles near-identity maps (elastic) — its
joint (i, j) candidate loop costs O(per-tile offset range squared), and
a rotation/scale's k-coupling (``in_i = m00*i + m01*j + m02*k + t``)
makes offsets sweep ``|m02| * K`` across each 128-lane tile, exploding
the loop. The fix is a change of variables: pre-shear the volume by the
integer k-profile

    V_shear[r, c, k] = V[r + si(k), c + sj(k), k],
    si(k) = round(m02 * k),  sj(k) = round(m12 * k)

so the kernel's residual offsets lose their k-coupling entirely and
shrink to the in-tile scale/rotation terms (a few voxels). The window
kernel then runs against ``V_shear`` with per-corner shear lookups
(``si`` at ``floor(ck)`` and ``floor(ck)+1`` differ where the table
steps) and per-tile slab BASES: the scalar-prefetched tile bounds feed
the slab's index_map, so each tile DMAs only its locally active rows
even though the global residual range (scale * extent) is large.

The shear itself is a masked multi-shift (one pass per integer shift in
the per-k-chunk range — shift tables are HOST-computed in float64;
computing round(m02*k) in f32 in-kernel rounds differently at
half-integer products, measured at k=50 for m02=0.17).

k is never a constraint: the lane-gather resolves it per element, with
a two-chunk select for K up to 256.

Exactness: same corner weights as the gather kernel; only f32
accumulation order differs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .window_resample import (
    _bucket,
    _build_batch_coords,
    _corner_vote,
    _fill_bc,
    _marshal_maps,
    _offsets,
    _tpu_dispatch,
    _use_interpret,
    ratchet_seen,
    ratchet_statics,
    tile_align_coords,
)

#: v2 tile size: 16x16 halves the grid-step count vs the v1 kernel's
#: 8x8 (the scalar-prefetch pipeline state lives in 1 MiB SMEM and
#: scales with steps x inputs), at a modest in-tile-range cost
TI = 16
TJ = 16

#: cost guard on the in-tile candidate range per axis (the loop uses
#: exact per-tile bounds; this only sizes the static slab/clamp window
#: — the VMEM slab is (TI + maxr + 7) x ~(TJ + maxr + 14) x 128 f32
#: per k-chunk, ~2.3 MiB at 40)
MAX_RANGE = 40
#: capacity guard on the global residual pad of the sheared volume;
#: costs pad HBM traffic only (slab size is maxr-bound), and 192 covers
#: the real corner deviation of +-10-degree/0.9-1.1-scale draws at
#: 256^3 (measured res_j ~90: caps of 128 rejected ~3/10 headline
#: draws and forced the gather path)
MAX_PAD = 192


# --------------------------------------------------------------------
# pre-shear pass
# --------------------------------------------------------------------

def _shear_kernel(bnd_ref, vol_ref, table_ref, out_ref, *, pad_s):
    """out (1, 8, J, 128) of the EXTENDED sheared volume: extended row
    r' = orig + pad_s reads source-padded row r' + s (source pre-padded
    by 2*pad_s) on lanes where table[k] == s.

    The slab block holds only the rows this (tile, chunk) can touch:
    its index_map starts at the chunk's own s_lo (8-aligned), so slab
    DMA tracks the LOCAL shift range instead of the full 2*pad_s + 8
    extent (measured 33x row over-fetch on 256^3 rotations before)."""
    n = pl.program_id(0)
    tk = pl.program_id(3)
    s_lo = bnd_ref[n, tk, 0]
    s_hi = bnd_ref[n, tk, 1]
    nj = out_ref.shape[2]
    dt = vol_ref.dtype
    s_of_k = jnp.broadcast_to(table_ref[0, 0:1, :], (8 * nj, 128))
    # the index_map aligned the slab base down to a multiple of 8;
    # recover the intra-8 remainder with the same arithmetic
    base = pl.program_id(1) * 8 + s_lo + pad_s
    rem = base - (base // 8) * 8

    def body(s, acc):
        rows = vol_ref[0, pl.ds(rem + (s - s_lo), 8), :, :].reshape(
            8 * nj, 128
        )
        return acc + (s_of_k == s).astype(dt) * rows

    acc = jax.lax.fori_loop(
        s_lo, s_hi + 1, body, jnp.zeros((8 * nj, 128), dt)
    )
    out_ref[0] = acc.reshape(8, nj, 128)


def _round4(x: int) -> int:
    return 4 * ((x + 3) // 4)


def _shear_axis(vol, tables, chunk_bounds, pad_s, max_chunk_range):
    """vol (N, I, J, Kp) -> out (N, I + 2*pad_s, J, Kp) with
    out[n, r, j, k] = vol[n, r - pad_s + tables[n, k], j, k] (OOB zero).

    The output is EXTENDED by pad_s rows each side: in the sheared
    frame, real data lives at rows [-max(si), I + max(-si)) — the
    window kernel reads those rows with nonzero weight near volume
    edges. pad_s must be a multiple of 4 (8-divisible grid) and
    >= max |shift|. ``max_chunk_range`` is a static bound on
    ``s_hi - s_lo`` over every (element, k-chunk) — it sizes the slab.
    """
    N, I, J, Kp = vol.shape
    ntk = Kp // 128
    i_ext = I + 2 * pad_s
    # slab rows: 8 output rows + the chunk's shift range + 8 alignment
    nrows = 8 * ((8 + max_chunk_range + 7 + 7) // 8)
    # trailing extra pad: the last tiles' slab blocks extend up to
    # nrows - 8 rows past the sheared extent (zero rows, never matched)
    vp = jnp.pad(vol, ((0, 0), (2 * pad_s, 2 * pad_s + nrows), (0, 0), (0, 0)))
    # tile J so the slab stays within VMEM at large shift ranges;
    # tiles must divide J and be multiples of 8
    budget = 4 * 1024 * 1024 // (nrows * 128 * 4)
    tj_s = 8
    for t in range(8 * (min(J, max(budget, 8)) // 8), 7, -8):
        if J % t == 0:
            tj_s = t
            break
    kern = functools.partial(_shear_kernel, pad_s=pad_s)

    def slab_map(n, ti, tj, tk, bnd):
        base = ti * 8 + bnd[n, tk, 0] + pad_s
        return (n, pl.multiple_of((base // 8) * 8, 8), tj * tj_s, tk * 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N, i_ext // 8, J // tj_s, ntk),
        in_specs=[
            pl.BlockSpec(
                (
                    pl.Element(1),
                    pl.Element(nrows),
                    pl.Element(tj_s),
                    pl.Element(128),
                ),
                slab_map,
            ),
            pl.BlockSpec(
                (1, 8, 128), lambda n, ti, tj, tk, *_: (n, 0, tk)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, tj_s, 128),
            lambda n, ti, tj, tk, *_: (n, ti, tj, tk),
        ),
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, i_ext, J, Kp), vol.dtype),
        grid_spec=grid_spec,
        interpret=_use_interpret(),
    )(chunk_bounds, vp, tables)


def shear_ij(vol, si_tables, sj_tables, si_chunk_bounds, sj_chunk_bounds,
             pad_si, pad_sj, rng_si=None, rng_sj=None):
    """Apply the i-shear then the j-shear (transpose trick for j).
    Pass None to skip an all-zero shear axis. ``rng_si``/``rng_sj`` are
    static per-chunk shift-range bounds (default: worst case 2*pad)."""
    out = vol
    if pad_si is not None:
        out = _shear_axis(
            out, si_tables, si_chunk_bounds, pad_si,
            2 * pad_si if rng_si is None else rng_si,
        )
    if pad_sj is not None:
        out = out.transpose(0, 2, 1, 3)
        out = _shear_axis(
            out, sj_tables, sj_chunk_bounds, pad_sj,
            2 * pad_sj if rng_sj is None else rng_sj,
        )
        out = out.transpose(0, 2, 1, 3)
    return out


# --------------------------------------------------------------------
# the sheared window kernel
# --------------------------------------------------------------------

def _table_lookup(table_ref, idx, ntk):
    """Per-element lookup from a (1, 8, Kp) int32 table row; idx
    (M, 128) in [0, Kp)."""
    m = idx.shape[0]
    t0 = jnp.broadcast_to(table_ref[0, 0:1, 0:128], (m, 128))
    if ntk == 1:
        return jnp.take_along_axis(t0, idx, axis=1)
    t1 = jnp.broadcast_to(table_ref[0, 0:1, 128:256], (m, 128))
    low = jnp.take_along_axis(t0, jnp.minimum(idx, 127), axis=1)
    high = jnp.take_along_axis(t1, jnp.maximum(idx - 128, 0), axis=1)
    return jnp.where(idx < 128, low, high)


def _kernel2(bnd_ref, fill_ref, ci_ref, cj_ref, ck_ref, si_ref, sj_ref,
             *vol_and_out, spatial, ntk, padi_g, padj_g, mode,
             apply_fill, pad_label):
    """One (TI, TJ, 128) output tile against the SHEARED slab.

    The slab's index_map already positioned it at this tile's base
    offsets (bnd[..., 0], bnd[..., 2]), so candidate r corresponds to
    absolute offset lo + r and slab row slice [r, r + TI)."""
    I, J, K = spatial
    if ntk == 1:
        vol_ref, out_ref = vol_and_out
        vol_hi_ref = None
    else:
        vol_ref, vol_hi_ref, out_ref = vol_and_out
    corners = mode == "corners"
    b = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    tk = pl.program_id(3)

    ci = ci_ref[0].reshape(TI * TJ, 128)
    cj = cj_ref[0].reshape(TI * TJ, 128)
    ck = ck_ref[0].reshape(TI * TJ, 128)

    fi, fj, fk, mi0, mi1, mj0, mj1, mk0, mk1 = _offsets(
        ci, cj, ck, spatial
    )
    kc0 = jnp.clip(fk, 0, K - 1)
    kc1 = jnp.clip(fk + 1, 0, K - 1)

    iout = jax.lax.broadcasted_iota(jnp.int32, (TI, TJ, 128), 0).reshape(
        TI * TJ, 128) + ti * TI
    jout = jax.lax.broadcasted_iota(jnp.int32, (TI, TJ, 128), 1).reshape(
        TI * TJ, 128) + tj * TJ

    # per-corner residual offsets in the SHEARED frame
    si0 = _table_lookup(si_ref, kc0, ntk)
    si1 = _table_lookup(si_ref, kc1, ntk)
    sj0 = _table_lookup(sj_ref, kc0, ntk)
    sj1 = _table_lookup(sj_ref, kc1, ntk)
    fic = jnp.clip(fi, -1, I - 1)
    fjc = jnp.clip(fj, -1, J - 1)

    oi_lo = bnd_ref[b, ti, tj, tk, 0]
    oi_hi = bnd_ref[b, ti, tj, tk, 1]
    oj_lo = bnd_ref[b, ti, tj, tk, 2]
    oj_hi = bnd_ref[b, ti, tj, tk, 3]

    # residuals clamped into the tile's candidate window: zero-weight
    # (out-of-bounds) corners may hold arbitrary clipped-minus-shear
    # values and must not be able to match rows outside the slab
    roi0 = jnp.clip(fic - si0 - iout, oi_lo, oi_hi)
    roi1 = jnp.clip(fic - si1 - iout, oi_lo, oi_hi)
    roj0 = jnp.clip(fjc - sj0 - jout, oj_lo, oj_hi)
    roj1 = jnp.clip(fjc - sj1 - jout, oj_lo, oj_hi)

    if mode == "nearest":
        ri = jnp.round(ci).astype(jnp.int32)
        rj = jnp.round(cj).astype(jnp.int32)
        rk = jnp.round(ck).astype(jnp.int32)
        valid = (
            (ri >= 0) & (ri < I) & (rj >= 0) & (rj < J)
            & (rk >= 0) & (rk < K)
        ).astype(jnp.float32)
        rkc = jnp.clip(rk, 0, K - 1)
        sin = _table_lookup(si_ref, rkc, ntk)
        sjn = _table_lookup(sj_ref, rkc, ntk)
        # the rounded offset can land one past the floor-based hi (the
        # candidate loop covers hi+1 for the +1 corner)
        oin = jnp.clip(
            jnp.clip(ri, 0, I - 1) - sin - iout, oi_lo, oi_hi + 1
        )
        ojn = jnp.clip(
            jnp.clip(rj, 0, J - 1) - sjn - jout, oj_lo, oj_hi + 1
        )

    # label volumes ride in their (int32) dtype — casting labels to f32
    # would round values above 2^24; intensity volumes are f32 already
    acc_dtype = vol_ref.dtype if corners else jnp.float32
    if corners:
        init = (jnp.zeros((TI * TJ, 128), acc_dtype),) * 8
    else:
        init = (jnp.zeros((TI * TJ, 128), acc_dtype),)

    # the slab's index_map aligned its base down to a multiple of 8;
    # recover the intra-8 remainder with the same arithmetic
    off_i = padi_g + ti * TI + oi_lo
    rem_i = off_i - (off_i // 8) * 8
    off_j = padj_g + tj * TJ + oj_lo
    rem_j = off_j - (off_j // 8) * 8

    # hoist the per-corner k-chunk select arithmetic out of the
    # candidate loop: only the row loads vary per candidate
    if ntk == 1:
        prep0 = prep1 = prepn = None
    else:
        prep = lambda idx: (
            jnp.minimum(idx, 127), jnp.maximum(idx - 128, 0), idx < 128
        )
        prep0, prep1 = prep(kc0), prep(kc1)
        prepn = prep(rkc) if mode == "nearest" else None

    def gather(rows, rows_hi, idx, pre):
        if rows_hi is None:
            return jnp.take_along_axis(rows, idx, axis=1)
        lo_i, hi_i, sel = pre
        return jnp.where(
            sel,
            jnp.take_along_axis(rows, lo_i, axis=1),
            jnp.take_along_axis(rows_hi, hi_i, axis=1),
        )

    def load(r_i, r_j):
        rows = vol_ref[
            0, pl.ds(rem_i + r_i, TI), pl.ds(rem_j + r_j, TJ), :
        ].reshape(TI * TJ, 128)
        rows_hi = None
        if vol_hi_ref is not None:
            rows_hi = vol_hi_ref[
                0, pl.ds(rem_i + r_i, TI), pl.ds(rem_j + r_j, TJ), :
            ].reshape(TI * TJ, 128)
        return rows, rows_hi

    # the inner loop accumulates the two k-corners separately and
    # applies the (loop-invariant) k-weights once at the end:
    # sum(m * mk * l) == mk * sum(m * l) elementwise, one f32 rounding
    # step moved outside the sum
    def jbody(r_j, carry):
        accs, r_i, wi = carry
        cjo = oj_lo + r_j
        rows, rows_hi = load(r_i, r_j)
        if mode == "nearest":
            ln = gather(rows, rows_hi, rkc, prepn)
            sel = (ojn == cjo).astype(jnp.float32)
            return (accs[0] + (wi[0] * sel) * ln,), r_i, wi
        l0 = gather(rows, rows_hi, kc0, prep0)
        l1 = gather(rows, rows_hi, kc1, prep1)
        if corners:
            ei0, ei0m, ei1, ei1m = wi
            ej0 = roj0 == cjo
            ej0m = roj0 == cjo - 1
            ej1 = roj1 == cjo
            ej1m = roj1 == cjo - 1
            new = (
                accs[0] + (ei0 & ej0).astype(acc_dtype) * l0,
                accs[1] + (ei1 & ej1).astype(acc_dtype) * l1,
                accs[2] + (ei0 & ej0m).astype(acc_dtype) * l0,
                accs[3] + (ei1 & ej1m).astype(acc_dtype) * l1,
                accs[4] + (ei0m & ej0).astype(acc_dtype) * l0,
                accs[5] + (ei1m & ej1).astype(acc_dtype) * l1,
                accs[6] + (ei0m & ej0m).astype(acc_dtype) * l0,
                accs[7] + (ei1m & ej1m).astype(acc_dtype) * l1,
            )
        else:
            wi0, wi1 = wi
            wj0 = (
                jnp.where(roj0 == cjo, mj0, 0.0)
                + jnp.where(roj0 == cjo - 1, mj1, 0.0)
            )
            wj1 = (
                jnp.where(roj1 == cjo, mj0, 0.0)
                + jnp.where(roj1 == cjo - 1, mj1, 0.0)
            )
            new = (
                accs[0] + (wi0 * wj0) * l0,
                accs[1] + (wi1 * wj1) * l1,
            )
        return new, r_i, wi

    def ibody(r_i, accs):
        cio = oi_lo + r_i
        if mode == "nearest":
            wi = ((oin == cio).astype(jnp.float32) * valid,)
        elif corners:
            wi = (
                roi0 == cio, roi0 == cio - 1,
                roi1 == cio, roi1 == cio - 1,
            )
        else:
            wi = (
                jnp.where(roi0 == cio, mi0, 0.0)
                + jnp.where(roi0 == cio - 1, mi1, 0.0),
                jnp.where(roi1 == cio, mi0, 0.0)
                + jnp.where(roi1 == cio - 1, mi1, 0.0),
            )
        accs, _, _ = jax.lax.fori_loop(
            0, oj_hi - oj_lo + 2, jbody, (accs, r_i, wi)
        )
        return accs

    if mode == "nearest" or corners:
        init_accs = init
    else:
        init_accs = (init[0], init[0])
    accs = jax.lax.fori_loop(0, oi_hi - oi_lo + 2, ibody, init_accs)

    if corners:
        out = _corner_vote(accs, mi0, mi1, mj0, mj1, mk0, mk1, pad_label)
        out_ref[0] = out.reshape(TI, TJ, 128)
    else:
        if mode == "nearest":
            acc = accs[0]
        else:
            acc = accs[0] * mk0 + accs[1] * mk1
        if apply_fill:
            mask = (mi0 + mi1) * (mj0 + mj1) * (mk0 + mk1)
            acc = jnp.where(mask > 0.5, acc, fill_ref[b])
        out_ref[0] = acc.reshape(TI, TJ, 128)


def _tile_bounds2(ci, cj, ck, m02, m03, m12, m13, deltas, spatial,
                  out_true, padi_g, padj_g, maxr, reach_i, reach_j):
    """Per-tile residual offset bounds in the sheared frame.

    The kernel uses exact host tables for the shear; here the analytic
    f32 form stands in, corrected by host-computed per-k-chunk bounds on
    (table - analytic) — ``deltas`` (B, 2 axes, 2 chunks, 2 lo/hi) int32
    from :class:`ShearPlan`. The correction is usually [0, 0], so the
    candidate windows shrink by 2 per axis vs the former blanket +-1
    widening. Conservative bounds only widen the candidate loop;
    per-element masks keep exactness.

    ``spatial`` is the INPUT extent (in-bounds corner masking);
    ``out_true`` the true (Io, Jo) output extent — grid rows/cols at or
    beyond it are tile-alignment padding and excluded from the bounds.
    """
    I, J, K = spatial
    Io, Jo = out_true
    B, Ip, Jp, _ = ci.shape
    nti, ntj = Ip // TI, Jp // TJ
    ntk = ci.shape[-1] // 128
    ii = jax.lax.broadcasted_iota(jnp.int32, ci.shape, 1)
    jj = jax.lax.broadcasted_iota(jnp.int32, ci.shape, 2)
    fi = jnp.clip(jnp.floor(ci).astype(jnp.int32), -1, I - 1)
    fj = jnp.clip(jnp.floor(cj).astype(jnp.int32), -1, J - 1)
    fk = jnp.floor(ck).astype(jnp.int32)
    kc0 = jnp.clip(fk, 0, K - 1).astype(jnp.float32)
    kc1 = jnp.clip(fk + 1, 0, K - 1).astype(jnp.float32)
    m02c = m02[:, None, None, None]
    m03c = m03[:, None, None, None]
    m12c = m12[:, None, None, None]
    m13c = m13[:, None, None, None]
    si0 = jnp.round(m02c * kc0 + m03c).astype(jnp.int32)
    si1 = jnp.round(m02c * kc1 + m03c).astype(jnp.int32)
    sj0 = jnp.round(m12c * kc0 + m13c).astype(jnp.int32)
    sj1 = jnp.round(m12c * kc1 + m13c).astype(jnp.int32)

    def dsel(axis, side, kc):
        d = deltas[:, axis, :, side]
        return jnp.where(
            kc < 128.0, d[:, 0, None, None, None], d[:, 1, None, None, None]
        )
    # only corners with nonzero weight constrain the candidate window:
    # a clipped out-of-bounds corner minus the shear lands ~|s| rows
    # away and would blow the slab range (its weight is zero, so the
    # kernel's residual clamp makes it harmless)
    fi_raw = jnp.floor(ci).astype(jnp.int32)
    fj_raw = jnp.floor(cj).astype(jnp.int32)
    fk_raw = jnp.floor(ck).astype(jnp.int32)
    vij = (
        (fi_raw >= -1) & (fi_raw <= I - 1)
        & (fj_raw >= -1) & (fj_raw <= J - 1)
    )
    # tile-alignment padding rows/cols (grid index >= true extent) must
    # not constrain the window: their edge-replicated coordinates keep
    # fi fixed while the iota keeps growing, dragging lo down by up to
    # TI-1 — the maxr span clamp on hi then CUTS real candidates and
    # the kernel's residual clip misattributes real corners (verified:
    # 0.75 max error on a (33, 33, 24) volume under a 1.4deg rotation).
    # Their outputs are cropped, so exclusion is free.
    vij = vij & (ii <= Io - 1) & (jj <= Jo - 1)
    v0 = vij & (fk_raw >= 0) & (fk_raw <= K - 1)
    v1 = vij & (fk_raw + 1 >= 0) & (fk_raw + 1 <= K - 1)
    big = jnp.int32(1 << 20)

    def masked(x, valid, sentinel):
        return jnp.where(valid, x, sentinel)

    # actual table value = analytic + delta, delta in [dmin, dmax] per
    # chunk: the residual's extremes use the opposite delta side
    oi_min = jnp.minimum(
        masked(fi - (si0 + dsel(0, 1, kc0)), v0, big),
        masked(fi - (si1 + dsel(0, 1, kc1)), v1, big),
    ) - ii
    oi_max = jnp.maximum(
        masked(fi - (si0 + dsel(0, 0, kc0)), v0, -big),
        masked(fi - (si1 + dsel(0, 0, kc1)), v1, -big),
    ) - ii
    oj_min = jnp.minimum(
        masked(fj - (sj0 + dsel(1, 1, kc0)), v0, big),
        masked(fj - (sj1 + dsel(1, 1, kc1)), v1, big),
    ) - jj
    oj_max = jnp.maximum(
        masked(fj - (sj0 + dsel(1, 0, kc0)), v0, -big),
        masked(fj - (sj1 + dsel(1, 0, kc1)), v1, -big),
    ) - jj

    def tile_reduce(x, op):
        t = x.reshape(B, nti, TI, ntj, TJ, ntk, 128)
        return op(t, axis=(2, 4, 6))

    lo_i = tile_reduce(oi_min, jnp.min)
    hi_i = tile_reduce(oi_max, jnp.max)
    lo_j = tile_reduce(oj_min, jnp.min)
    hi_j = tile_reduce(oj_max, jnp.max)
    # all-invalid tiles (entirely out of bounds): collapse to an empty
    # one-candidate window
    lo_i = jnp.minimum(lo_i, big // 2)
    hi_i = jnp.maximum(jnp.minimum(hi_i, big // 2), lo_i)
    lo_j = jnp.minimum(lo_j, big // 2)
    hi_j = jnp.maximum(jnp.minimum(hi_j, big // 2), lo_j)
    # clamp into the slab-reachable window: lo so the block start stays
    # inside the padded array (reach = block extent beyond the tile),
    # hi so hi - lo < maxr
    lo_i = jnp.clip(lo_i, -padi_g, padi_g - reach_i)
    hi_i = jnp.clip(hi_i, lo_i, lo_i + maxr - 2)
    lo_j = jnp.clip(lo_j, -padj_g, padj_g - reach_j)
    hi_j = jnp.clip(hi_j, lo_j, lo_j + maxr - 2)
    return jnp.stack([lo_i, hi_i, lo_j, hi_j], axis=-1).astype(jnp.int32)


def _pallas_window2(bounds, fill, vol_sheared_padded, ci, cj, ck,
                    si_t, sj_t, *, spatial, padi_g, padj_g, maxr, mode,
                    apply_fill, pad_label=0.0):
    """vol (B, Ip+2padi_g, Jp+2padj_g, Kp); coords (B, Ip, Jp, Kp);
    tables (B, 8, Kp); bounds (B, nti, ntj, ntk, 4).

    (Ip, Jp) is the tile-aligned grid; ``spatial`` carries the TRUE
    (I, J, K) used for in-bounds masking — callers crop the result.

    The grid's k dimension iterates OUTPUT 128-lane chunks (from the
    coordinate arrays); the slab/table/lane-gather chunk count is the
    INPUT one (from the sheared volume) — out_shape support decouples
    the two."""
    I, J, K = spatial
    B, Ip, Jp, Kp_out = ci.shape
    Kp_in = vol_sheared_padded.shape[-1]
    ntk_out = Kp_out // 128
    ntk = Kp_in // 128
    nti, ntj = Ip // TI, Jp // TJ
    nrows = TI + maxr + 7
    ncols = 8 * ((TJ + maxr + 7 + 7) // 8)

    kern = functools.partial(
        _kernel2, spatial=spatial, ntk=ntk, padi_g=padi_g,
        padj_g=padj_g, mode=mode, apply_fill=apply_fill,
        pad_label=pad_label,
    )
    coord_spec = pl.BlockSpec(
        (1, TI, TJ, 128), lambda b, ti, tj, tk, *_: (b, ti, tj, tk)
    )
    table_spec = pl.BlockSpec(
        (1, 8, Kp_in), lambda b, ti, tj, tk, *_: (b, 0, 0)
    )

    def slab_map(b, ti, tj, tk, bnd, fl):
        off_i = padi_g + ti * TI + bnd[b, ti, tj, tk, 0]
        off_j = padj_g + tj * TJ + bnd[b, ti, tj, tk, 2]
        return (
            b,
            pl.multiple_of((off_i // 8) * 8, 8),
            pl.multiple_of((off_j // 8) * 8, 8),
            0,
        )

    slab_spec = pl.BlockSpec(
        (
            pl.Element(1),
            pl.Element(nrows),
            pl.Element(ncols),
            pl.Element(128),
        ),
        slab_map,
    )
    # the slab rides as 128-lane k-halves: Mosaic cannot prove dynamic
    # sublane alignment for 256-lane 4D vector loads
    if ntk == 1:
        vols = (vol_sheared_padded,)
        slab_specs = [slab_spec]
    else:
        vols = (
            vol_sheared_padded[..., :128],
            vol_sheared_padded[..., 128:],
        )
        slab_specs = [slab_spec, slab_spec]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, nti, ntj, ntk_out),
        in_specs=[
            coord_spec,
            coord_spec,
            coord_spec,
            table_spec,
            table_spec,
            *slab_specs,
        ],
        out_specs=pl.BlockSpec(
            (1, TI, TJ, 128), lambda b, ti, tj, tk, *_: (b, ti, tj, tk)
        ),
    )
    out_dtype = (
        vol_sheared_padded.dtype if mode == "corners" else jnp.float32
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, Ip, Jp, Kp_out), out_dtype),
        grid_spec=grid_spec,
        interpret=_use_interpret(),
    )(bounds, fill, ci, cj, ck, si_t, sj_t, *vols)


# --------------------------------------------------------------------
# host-side planning
# --------------------------------------------------------------------

class ShearPlan:
    """Static (shape-defining) and per-call host data for the sheared
    window pipeline."""

    def __init__(self, matrices, control_points, spatial,
                 out_spatial=None):
        I, J, K = spatial
        if out_spatial is None:
            out_spatial = spatial
        Io, Jo, Ko = (int(s) for s in out_spatial)
        self.spatial = spatial
        self.out_spatial = (Io, Jo, Ko)
        self.Kp = 128 * ((K + 127) // 128)
        ks = np.arange(self.Kp, dtype=np.float64)
        si_list, sj_list = [], []
        res_i = res_j = 0.0
        tile_i = tile_j = 0.0
        for m, cp in zip(matrices, control_points):
            m = np.asarray(m, np.float64)
            # fold the constant translation into the tables: it is
            # then absorbed by the shear instead of the global pad
            si = np.round(m[0, 2] * ks + m[0, 3]).astype(np.int32)
            sj = np.round(m[1, 2] * ks + m[1, 3]).astype(np.int32)
            si_list.append(si)
            sj_list.append(sj)
            cpi = cpj = cpk = 0.0
            if cp is not None:
                cpa = np.asarray(cp, np.float64)
                if cpa.size:
                    cpi = float(np.max(np.abs(cpa[..., 0])))
                    cpj = float(np.max(np.abs(cpa[..., 1])))
                    cpk = float(np.max(np.abs(cpa[..., 2])))
            kres_i = float(np.max(np.abs(m[0, 2] * ks + m[0, 3] - si)))
            kres_j = float(np.max(np.abs(m[1, 2] * ks + m[1, 3] - sj)))
            # k-coupling cross-term: the shear table is looked up at the
            # INPUT coordinate kc = clip(floor(ck), 0, K-1), not at the
            # output lane k, so the residual carries m02 * (k - kc).
            # These bounds only need to cover corners that can actually
            # constrain the device candidate window, and _tile_bounds2's
            # v0/v1 masks admit a corner ONLY when its floor(ck) (resp.
            # floor(ck)+1) already lies in [0, K-1] — where the clip is
            # a no-op and kc equals the unclipped floor. So |k - kc| is
            # bounded by the k-row's deviation from identity over the
            # OUTPUT grid (+2: floor and the kc+1 corner); no clip
            # allowance (pricing the clip distance in was measured to
            # push maxr to 44 and padj_g past MAX_PAD on the 256^3
            # +-10-degree headline draws, disabling the kernel for maps
            # it handles exactly). Within a tile the term varies by the
            # per-tile spans of that deviation (k spans one 128-lane
            # chunk of output lanes, i/j span TI/TJ).
            dk_glob = (
                abs(m[2, 2] - 1.0) * (Ko - 1)
                + abs(m[2, 0]) * (Io - 1)
                + abs(m[2, 1]) * (Jo - 1)
                + abs(m[2, 3]) + cpk + 2.0
            )
            dk_tile = (
                abs(m[2, 2] - 1.0) * min(127, Ko - 1)
                + abs(m[2, 0]) * (TI - 1)
                + abs(m[2, 1]) * (TJ - 1)
                + 2 * cpk + 2.0
            )
            # global residual bound (sheared frame) over the OUTPUT grid
            ri = (
                abs(m[0, 0] - 1.0) * (Io - 1)
                + abs(m[0, 1]) * (Jo - 1)
                + kres_i + cpi + abs(m[0, 2]) * dk_glob
            )
            rj = (
                abs(m[1, 0]) * (Io - 1)
                + abs(m[1, 1] - 1.0) * (Jo - 1)
                + kres_j + cpj + abs(m[1, 2]) * dk_glob
            )
            res_i = max(res_i, ri)
            res_j = max(res_j, rj)
            # in-tile range bound (+1 shear table step, +1 floor, +-1
            # analytic-vs-table margin in _tile_bounds2)
            tile_i = max(
                tile_i,
                abs(m[0, 0] - 1.0) * (TI - 1)
                + abs(m[0, 1]) * (TJ - 1)
                + 2 * kres_i + 2 * cpi + abs(m[0, 2]) * dk_tile + 4,
            )
            tile_j = max(
                tile_j,
                abs(m[1, 0]) * (TI - 1)
                + abs(m[1, 1] - 1.0) * (TJ - 1)
                + 2 * kres_j + 2 * cpj + abs(m[1, 2]) * dk_tile + 4,
            )
        self.si = np.stack(si_list)
        self.sj = np.stack(sj_list)
        ntk_in = self.Kp // 128
        # per-chunk bounds on (table - device analytic f32) so the tile
        # bounds need no blanket widening; the device round(m*k + t) is
        # emulated in numpy f32, and k's within ~1e-4 of a half-integer
        # (where an fma-fused device product could round differently)
        # widen that chunk by one
        ks32 = ks.astype(np.float32)
        deltas = np.zeros((len(matrices), 2, 2, 2), np.int32)
        for n, m in enumerate(matrices):
            m = np.asarray(m, np.float64)
            for axis, (slope, off, table) in enumerate(
                ((m[0, 2], m[0, 3], self.si[n]), (m[1, 2], m[1, 3], self.sj[n]))
            ):
                lin32 = np.float32(slope) * ks32 + np.float32(off)
                ana = np.round(lin32).astype(np.int64)
                lin64 = slope * ks + off
                near = (np.abs(lin64 - np.floor(lin64) - 0.5) < 1e-4).astype(
                    np.int64
                )
                d = table.astype(np.int64) - ana
                dmin = (d - near).reshape(ntk_in, 128).min(axis=1)
                dmax = (d + near).reshape(ntk_in, 128).max(axis=1)
                if ntk_in == 1:
                    dmin = np.repeat(dmin, 2)
                    dmax = np.repeat(dmax, 2)
                deltas[n, axis, :, 0] = dmin
                deltas[n, axis, :, 1] = dmax
        self.deltas = deltas
        # BUCKET every shape-defining value to coarse levels, then
        # RATCHET to the process high-water mark: the statics are pure
        # capacity bounds, and any per-draw variation means a fresh
        # executable per pipeline iteration (measured: the 256^3
        # headline Compose spending 3.5-22 s/iteration on compiles).
        # Level sets respect the kernels' alignment requirements
        # (maxr multiple of 4, shear pads multiple of 8 — _shear_axis
        # needs 8-divisible extended grids — global pads multiple of 16).
        self._key = ("shear", tuple(spatial), self.out_spatial, self.Kp)
        hr = 0 if ratchet_seen(self._key) else 1
        self.maxr = _bucket(
            int(np.ceil(max(tile_i, tile_j))) + 2, (8, 16, 24, 32, 40), hr
        )
        pad_si = _bucket(
            int(max(np.max(np.abs(self.si)), 1)),
            (8, 16, 32, 64, 128, 192), hr,
        )
        pad_sj = _bucket(
            int(max(np.max(np.abs(self.sj)), 1)),
            (8, 16, 32, 64, 128, 192), hr,
        )
        self.pad_si = pad_si
        self.pad_sj = pad_sj
        pad_levels = (32, 64, 96, 128, 160, 192)
        self.padi_g = max(
            _bucket(
                int(np.ceil(res_i)) + self.maxr + 10, pad_levels, hr
            ),
            pad_si,
        )
        self.padj_g = max(
            _bucket(
                int(np.ceil(res_j)) + self.maxr + 18, pad_levels, hr
            ),
            pad_sj,
        )
        ntk = self.Kp // 128
        self.si_chunk = np.stack(
            [
                np.stack(
                    [t.reshape(ntk, 128).min(1), t.reshape(ntk, 128).max(1)],
                    axis=1,
                )
                for t in self.si
            ]
        ).astype(np.int32)
        self.sj_chunk = np.stack(
            [
                np.stack(
                    [t.reshape(ntk, 128).min(1), t.reshape(ntk, 128).max(1)],
                    axis=1,
                )
                for t in self.sj
            ]
        ).astype(np.int32)
        self.need_sj = bool(np.any(self.sj != 0))
        self.need_si = bool(np.any(self.si != 0))
        # static per-chunk shift-range bound sizing the shear pass's
        # slab (DMA tracks the local range, not 2*pad)
        rng_levels = (8, 16, 24, 32, 48, 64, 96, 128, 192, 256, 384)
        self.rng_si = _bucket(
            int((self.si_chunk[..., 1] - self.si_chunk[..., 0]).max()) + 1,
            rng_levels, hr,
        )
        self.rng_sj = _bucket(
            int((self.sj_chunk[..., 1] - self.sj_chunk[..., 0]).max()) + 1,
            rng_levels, hr,
        )
        if self.ok:
            # share one executable across random draws of the same
            # shape class (only guard-passing plans feed the ratchet,
            # so the stored marks stay under MAX_RANGE / MAX_PAD)
            (
                self.maxr, self.pad_si, self.pad_sj,
                self.padi_g, self.padj_g, need_si, need_sj,
                self.rng_si, self.rng_sj,
            ) = ratchet_statics(
                self._key,
                (
                    self.maxr, self.pad_si, self.pad_sj,
                    self.padi_g, self.padj_g,
                    int(self.need_si), int(self.need_sj),
                    self.rng_si, self.rng_sj,
                ),
            )
            self.need_si = bool(need_si)
            self.need_sj = bool(need_sj)

    @property
    def ok(self) -> bool:
        return (
            self.maxr <= MAX_RANGE
            and self.padi_g <= MAX_PAD
            and self.padj_g <= MAX_PAD
        )


def shear_eligible(data_shape, out_spatial, matrices, control_points,
                   mode: str, data=None):
    """Dispatch decision: a :class:`ShearPlan` or None."""
    from ..config import window_resample as enabled

    if not enabled():
        return None
    if mode not in ("linear", "nearest"):
        return None
    if not _tpu_dispatch(data):
        return None
    b, c, I, J, K = data_shape
    Io, Jo, Ko = (int(s) for s in out_spatial)
    if K > 256 or I < 2 or J < 2 or K < 2:
        return None
    if Io < 1 or Jo < 1 or Ko < 1:
        return None
    plan = ShearPlan(matrices, control_points, (I, J, K), (Io, Jo, Ko))
    if not plan.ok:
        return None
    return plan


# --------------------------------------------------------------------
# fused wrappers
# --------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=(
        "spatial", "out_spatial", "padi_g", "padj_g", "maxr", "pad_si",
        "pad_sj", "need_si", "need_sj", "has_cp", "apply_fill", "mode",
        "pad_label", "rng_si", "rng_sj",
    ),
)
def _shear_resample_impl(
    data, matrices, control_points, fill, si_t, sj_t, si_chunk, sj_chunk,
    deltas, *, spatial, out_spatial, padi_g, padj_g, maxr, pad_si,
    pad_sj, need_si, need_sj, has_cp, apply_fill, mode, pad_label,
    rng_si, rng_sj,
):
    B, C, I, J, K = data.shape
    Io, Jo, Ko = out_spatial
    # the shear tables / slab ride at the INPUT k chunking; the grid and
    # coordinates at the OUTPUT one — out_shape support decouples them
    Kp_in = si_t.shape[-1]
    Kp_out = 128 * ((Ko + 127) // 128)
    ci, cj, ck, Ip, Jp = tile_align_coords(
        matrices, control_points if has_cp else None, out_spatial, TI, TJ,
        kp=Kp_out,
    )
    nrows = TI + maxr + 7
    ncols = 8 * ((TJ + maxr + 7 + 7) // 8)
    bounds = _tile_bounds2(
        ci, cj, ck,
        matrices[:, 0, 2], matrices[:, 0, 3],
        matrices[:, 1, 2], matrices[:, 1, 3],
        deltas, spatial, (Io, Jo),
        padi_g, padj_g, maxr, nrows - TI, ncols - TJ,
    )
    # labels ride in int32 — an f32 cast would round values above 2^24
    work = (
        jnp.int32
        if mode == "corners" and jnp.issubdtype(data.dtype, jnp.integer)
        else jnp.float32
    )
    vol = data.astype(work)
    # the slab's clamped index maps reach rows up to Ipad + 2*padi_g
    # where Ipad is the OUTPUT tile grid — pad the input volume to at
    # least that extent (zero rows carry zero weight)
    Ipad = max(Ip, TI * (-(-I // TI)))
    Jpad = max(Jp, TJ * (-(-J // TJ)))
    if (Ipad, Jpad, Kp_in) != (I, J, K):
        vol = jnp.pad(
            vol,
            (
                (0, 0), (0, 0),
                (0, Ipad - I), (0, Jpad - J), (0, Kp_in - K),
            ),
        )
    # shear all (B, C) volumes with per-element tables; the sheared
    # volume comes back EXTENDED by (pad_si, pad_sj) on the sheared axes
    voln = vol.reshape(B * C, Ipad, Jpad, Kp_in)
    rep = lambda t: jnp.repeat(t, C, axis=0)
    ext_i = pad_si if need_si else 0
    ext_j = pad_sj if need_sj else 0
    sheared = shear_ij(
        voln,
        rep(si_t), rep(sj_t), rep(si_chunk), rep(sj_chunk),
        pad_si if need_si else None,
        pad_sj if need_sj else None,
        rng_si=rng_si, rng_sj=rng_sj,
    ).reshape(B, C, Ipad + 2 * ext_i, Jpad + 2 * ext_j, Kp_in)
    padded = jnp.pad(
        sheared,
        (
            (0, 0),
            (0, 0),
            (padi_g - ext_i, padi_g - ext_i),
            (padj_g - ext_j, padj_g - ext_j),
            (0, 0),
        ),
    )
    # one pallas_call per (element, channel): keeps the scalar-prefetch
    # bounds within the 1 MiB SMEM at 256^3 tile counts; identical
    # shapes reuse one compiled kernel
    def one(b, c, fill_b, mode_, pad_label_):
        return _pallas_window2(
            bounds[b : b + 1], fill_b, padded[b, c][None],
            ci[b : b + 1], cj[b : b + 1], ck[b : b + 1],
            si_t[b : b + 1], sj_t[b : b + 1],
            spatial=spatial, padi_g=padi_g, padj_g=padj_g, maxr=maxr,
            mode=mode_, apply_fill=apply_fill and mode_ != "corners",
            pad_label=pad_label_,
        )[0, :Io, :Jo, :Ko]

    if mode == "corners":
        outs = [
            one(b, 0, jnp.zeros((1,), jnp.float32), "corners", pad_label)
            for b in range(B)
        ]
        return jnp.stack(outs)[:, None]
    outs = [
        jnp.stack(
            [one(b, c, fill[b : b + 1, c], mode, 0.0) for c in range(C)]
        )
        for b in range(B)
    ]
    return jnp.stack(outs)


def shear_resample_fused(data, matrices, control_points, fill, plan,
                         *, mode="linear", apply_fill=True):
    """Batched sheared-window resample for general affine(+elastic).

    data (B, C, I, J, K); matrices length-B host 4x4; control_points
    length-B or None entries; plan a :class:`ShearPlan`.
    """
    data = jnp.asarray(data)
    B, C, I, J, K = data.shape
    m, cps, has_cp = _marshal_maps(matrices, control_points)
    t8 = lambda t: jnp.asarray(np.repeat(t[:, None, :], 8, axis=1))
    return _shear_resample_impl(
        data, m, cps, _fill_bc(fill, B, C),
        t8(plan.si), t8(plan.sj),
        jnp.asarray(plan.si_chunk), jnp.asarray(plan.sj_chunk),
        jnp.asarray(plan.deltas),
        spatial=(I, J, K), out_spatial=plan.out_spatial,
        padi_g=plan.padi_g, padj_g=plan.padj_g,
        maxr=plan.maxr, pad_si=plan.pad_si, pad_sj=plan.pad_sj,
        need_si=plan.need_si, need_sj=plan.need_sj, has_cp=has_cp,
        apply_fill=apply_fill, mode=mode, pad_label=0.0,
        rng_si=plan.rng_si, rng_sj=plan.rng_sj,
    )


def shear_resample_label_fused(data, matrices, control_points, pad_label,
                               plan):
    """Partial-volume label mode through the sheared window kernel."""
    data = jnp.asarray(data)
    B, C, I, J, K = data.shape
    m, cps, has_cp = _marshal_maps(matrices, control_points)
    t8 = lambda t: jnp.asarray(np.repeat(t[:, None, :], 8, axis=1))
    out = _shear_resample_impl(
        data, m, cps, jnp.zeros((B, C), jnp.float32),
        t8(plan.si), t8(plan.sj),
        jnp.asarray(plan.si_chunk), jnp.asarray(plan.sj_chunk),
        jnp.asarray(plan.deltas),
        spatial=(I, J, K), out_spatial=plan.out_spatial,
        padi_g=plan.padi_g, padj_g=plan.padj_g,
        maxr=plan.maxr, pad_si=plan.pad_si, pad_sj=plan.pad_sj,
        need_si=plan.need_si, need_sj=plan.need_sj, has_cp=has_cp,
        apply_fill=False, mode="corners", pad_label=float(pad_label),
        rng_si=plan.rng_si, rng_sj=plan.rng_sj,
    )
    return out.astype(data.dtype)

"""Bounded-offset windowed resample: a Pallas TPU kernel for elastic maps.

The general 3-D resample pays XLA's per-index gather rate (~8-10 ns per
index, BASELINE.md round-2 analysis) — the single-chip wall for
256^3-scale grids. But an ELASTIC deformation (reference
``/root/reference/src/torchio/transforms/spatial/spatial.py:2192-2266``)
samples within ``max_displacement`` of each output voxel, so the
in-plane integer offsets are tightly bounded, and on TPU a bounded
gather can run at VPU rate instead:

- **joint (i, j) multi-shift**: for each candidate integer offset pair
  ``(cio, cjo)``, an aligned slab slice IS the candidate corner plane;
  per-element masks pick out the elements whose floor offsets match.
- **k axis: Mosaic lane-gather** (``take_along_axis`` over lanes of
  exactly 128) — fully per-element, measured ~0.003 ns/element, ~3000x
  the XLA per-index take rate. It must be the LAST step: after the
  (i, j) shifts the rows are output-aligned, so the per-element k index
  is consistent (gathering i or j per-element *before* k would bake the
  wrong lane interpretation into the rows).
- **per-tile dynamic candidate bounds**: exact min/max integer offsets
  per (8, 8, K) output tile (a few cheap device reduce passes; ride in
  as scalar-prefetch values), so the candidate loop runs only over the
  locally active window. Conservative host-side bounds from the coarse
  control grid were measured SLOWER: their covering boxes span the full
  k axis and inflate the loop ~2x.

Out-of-bounds fill and the partial-volume label vote both run inside
the kernel (the vote's 8x8 corner-label comparison stays in VMEM
instead of materializing a (B, 8, 8, I, J, K) tensor in HBM).

Exactness: identical corner weights and in-bounds masking as
:func:`torchio_tpu.ops.resample._resample_one` — the only difference is
floating-point accumulation order (validated to ~1e-6 at 128^3).
"""

from __future__ import annotations

import functools
import os
import threading

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TI = 8
TJ = 8

#: maximum in-plane offset bound the kernel will accept (cost guard:
#: the candidate loop is O(local_range^2) per tile)
MAX_BOUND = 24

#: process-level high-water marks for shape statics (see
#: :func:`ratchet_statics`) keyed by (kernel, shape...) tuples.
#: Guarded by a lock: concurrent pipelines (e.g. SubjectsLoader worker
#: threads) must not lose a componentwise max to an interleaved
#: read-modify-write, which would resurrect the per-draw recompiles
#: the ratchet exists to prevent.
_STATIC_RATCHET: dict = {}
_RATCHET_LOCK = threading.Lock()


def _bucket(x: int, levels: tuple, headroom: int = 0) -> int:
    """Smallest level >= x (x itself when above every level).

    ``headroom`` moves up that many extra levels (clamped to the last
    level, which call sites align with the kernel's hard guard) — used
    on the first draw of a shape class so subsequent, slightly larger
    draws rarely raise the high-water mark and recompile.
    """
    for idx, v in enumerate(levels):
        if x <= v:
            return levels[min(idx + headroom, len(levels) - 1)]
    return x


def ratchet_seen(key) -> bool:
    """Whether a shape class already has high-water marks."""
    return key in _STATIC_RATCHET


def ratchet_statics(key, needed):
    """Monotone high-water marks for pallas shape statics.

    The windowed/sheared kernels' pads and candidate ranges are
    CAPACITY bounds — any value >= the per-call requirement is correct,
    but every distinct value is a distinct executable. Random parameter
    draws (a new affine matrix and elastic field per pipeline
    iteration) would otherwise hit a fresh static combination almost
    every call and recompile inside the training loop (measured: the
    256^3 headline Compose oscillating between ~1.0 s warm and 3.5-22 s
    compile iterations). Bucketing alone is not enough at bucket
    boundaries; the componentwise running maximum makes the statics
    converge after the first few draws, at a small slack-DMA cost.
    """
    with _RATCHET_LOCK:
        cur = _STATIC_RATCHET.get(key)
        if cur is not None:
            needed = tuple(max(a, b) for a, b in zip(cur, needed))
        _STATIC_RATCHET[key] = needed
    return needed


def reset_static_ratchet() -> None:
    """Forget the high-water marks (tests)."""
    with _RATCHET_LOCK:
        _STATIC_RATCHET.clear()


def _use_interpret() -> bool:
    """Interpret mode: used on CPU (tests); Mosaic needs a real TPU."""
    if os.environ.get("TORCHIO_TPU_WINDOW_INTERPRET"):
        return True
    return jax.default_backend() != "tpu"


def _tpu_dispatch(data=None) -> bool:
    """Whether a pallas kernel would actually LAND on a TPU.

    ``jax.default_backend()`` alone is wrong under a
    ``jax.default_device(cpu)`` scope (it still reports the
    highest-priority platform) and for arrays committed to another
    device — jit follows the argument placement, and a Mosaic kernel
    traced for CPU execution fails to lower. The default-device scope
    is consulted FIRST: with it set to CPU, even TPU-resident but
    uncommitted arrays execute on CPU. A false negative only costs the
    gather fallback; a false positive crashes — so ties break to False.
    """
    if os.environ.get("TORCHIO_TPU_WINDOW_INTERPRET"):
        return True
    default = jax.config.jax_default_device
    if default is not None:
        # may be a Device or a platform string ("cpu")
        platform = (
            default if isinstance(default, str)
            else getattr(default, "platform", None)
        )
        return platform == "tpu"
    if data is not None:
        devices = getattr(data, "devices", None)
        if devices is not None:
            devs = devices()
            if devs:
                return all(d.platform == "tpu" for d in devs)
    return jax.default_backend() == "tpu"


def _offsets(ci, cj, ck, spatial):
    """Floor indices, lerp weights, and in-bounds corner weights —
    formula-identical to :func:`..resample._resample_one`."""
    I, J, K = spatial
    fi = jnp.floor(ci)
    fj = jnp.floor(cj)
    fk = jnp.floor(ck)
    wi = ci - fi
    wj = cj - fj
    wk = ck - fk
    fi = fi.astype(jnp.int32)
    fj = fj.astype(jnp.int32)
    fk = fk.astype(jnp.int32)
    mi0 = (1.0 - wi) * ((fi >= 0) & (fi < I)).astype(jnp.float32)
    mi1 = wi * ((fi + 1 >= 0) & (fi + 1 < I)).astype(jnp.float32)
    mj0 = (1.0 - wj) * ((fj >= 0) & (fj < J)).astype(jnp.float32)
    mj1 = wj * ((fj + 1 >= 0) & (fj + 1 < J)).astype(jnp.float32)
    mk0 = (1.0 - wk) * ((fk >= 0) & (fk < K)).astype(jnp.float32)
    mk1 = wk * ((fk + 1 >= 0) & (fk + 1 < K)).astype(jnp.float32)
    return fi, fj, fk, mi0, mi1, mj0, mj1, mk0, mk1


def _fold_mirror(x, n: int):
    """Fold a coordinate into [0, n-1] under mirror (dct1) symmetry —
    same model as :func:`..bspline._fold_coord`, reproduced here so the
    kernel can run it on (sublane, lane) tiles."""
    period = 2.0 * (n - 1)
    y = jnp.mod(jnp.abs(x), period)
    return jnp.where(y > n - 1, period - y, y)


#: static kernel-mode strings for the spline orders the windowed kernel
#: serves (the reference reaches 2-7 via interpol.grid_pull,
#: /root/reference/src/torchio/transforms/spatial/spatial.py:1746-1761)
_MODE_TO_SPLINE = {
    "quadratic": 2,
    "cubic": 3,
    "spline4": 4,
    "spline5": 5,
    "spline6": 6,
    "spline7": 7,
}
_SPLINE_TO_MODE = {v: k for k, v in _MODE_TO_SPLINE.items()}


def _reflect_idx(idx, n: int):
    """Mirror (dct1) reflection of an INTEGER tap index: -1 -> 1,
    n -> n-2. Taps of a folded coordinate lie in [-1, n+1], so one
    select pair per side suffices (no modular fold needed)."""
    idx = jnp.where(idx < 0, -idx, idx)
    return jnp.where(idx > n - 1, 2 * (n - 1) - idx, idx)


def _b3_weights(t):
    """Cubic cardinal B-spline B_3 evaluated at the 4 taps of a folded
    coordinate: ``t`` is the fractional part (x - floor(x)); returns
    weights for taps floor(x)-1 .. floor(x)+2 (Cox-de Boor closed
    form; matches :func:`..bspline._bspline_kernel` order 3)."""
    # u = distance from the tap: tap0 -> t+1 in [1,2); tap1 -> t in
    # [0,1); tap2 -> 1-t in (0,1]; tap3 -> 2-t in (1,2]
    w0 = (2.0 - (t + 1.0)) ** 3 / 6.0
    w1 = (4.0 - 6.0 * t * t + 3.0 * t * t * t) / 6.0
    u2 = 1.0 - t
    w2 = (4.0 - 6.0 * u2 * u2 + 3.0 * u2 * u2 * u2) / 6.0
    w3 = (2.0 - (2.0 - t)) ** 3 / 6.0
    return w0, w1, w2, w3


def _b2_weights(t):
    """Quadratic cardinal B-spline B_2 at the 3 taps of a folded
    coordinate: ``t = x - start`` where ``start = floor(x+0.5) - 1``
    (even-order centered base, matching :mod:`..bspline`)."""
    # tap distances: u0 = t in [0.5, 1.5); u1 = t-1 in [-0.5, 0.5);
    # u2 = t-2 in [-1.5, -0.5)
    w0 = (t - 1.5) ** 2 / 2.0
    u1 = t - 1.0
    w1 = 0.75 - u1 * u1
    w2 = (t - 0.5) ** 2 / 2.0
    return w0, w1, w2


def _spline_taps(c, n: int, order: int):
    """Folded-coordinate B-spline taps: ``order + 1`` reflected integer
    indices (each in [0, n-1]) and their basis weights.

    Tap base matches :func:`..bspline._sample_element`: even orders
    center on ``floor(x + 0.5)``, odd orders on ``floor(x)``; the
    (order + 1) taps start ``order // 2`` below the base. Orders 2-3
    use closed-form weights; 4-7 evaluate the Cox-de Boor recursion
    (pure elementwise jnp — Mosaic-safe on (sublane, lane) tiles)."""
    cf = _fold_mirror(c, n)
    if order % 2 == 0:
        base = jnp.floor(cf + 0.5)
    else:
        base = jnp.floor(cf)
    start_f = base - float(order // 2)
    t = cf - start_f
    start = start_f.astype(jnp.int32)
    offs = tuple(range(order + 1))
    if order == 2:
        weights = _b2_weights(t)
    elif order == 3:
        weights = _b3_weights(t - 1.0)
    else:
        from .bspline import _bspline_kernel

        weights = tuple(
            _bspline_kernel(t - float(o), order) for o in offs
        )
    # clip after reflection: the outermost tap can land one past the
    # single-reflection range exactly where its weight is zero (e.g.
    # cubic tap floor+2 at cf == n-1) — the clamp keeps the gather
    # index defined without changing the weighted sum
    idx = tuple(
        jnp.clip(_reflect_idx(start + d, n), 0, n - 1) for d in offs
    )
    return idx, weights


def _fill_bc(fill, b, c):
    """Normalize a scalar / (C,) / (B, C) fill — host array or device
    array — to a broadcast (B, C) float32 device array."""
    if isinstance(fill, jax.Array):
        f = fill.astype(jnp.float32)
    else:
        f = jnp.asarray(np.asarray(fill, np.float32))
    if f.ndim != 2:
        f = f.reshape(1, -1)
    return jnp.broadcast_to(f, (b, c))


def _marshal_maps(matrices, control_points):
    """Stack host per-element maps for the fused kernels: (B, 4, 4) f32
    matrices (via float64), stacked control points (zero-filled for None
    entries), and whether any element is elastic."""
    has_cp = any(cp is not None for cp in control_points)
    m = jnp.asarray(
        np.stack([np.asarray(mm, np.float64) for mm in matrices]),
        jnp.float32,
    )
    if has_cp:
        cps = _stack_control_points(control_points)
    else:
        cps = jnp.zeros((len(control_points), 1, 1, 1, 3), jnp.float32)
    return m, cps, has_cp


def _corner_vote(labs, mi0, mi1, mj0, mj1, mk0, mk1, pad_label):
    """In-VMEM partial-volume vote over 8 gathered corner-label planes:
    argmax over labels by summed corner weight, ties to the smallest
    label, fill where total in-bounds weight is zero (same semantics as
    ``_resample_element_label``). ``labs`` are (M, 128) planes in (a, b,
    c) lexicographic corner order, float32 or int32; weights are f32."""
    w = [
        (mi0, mi1)[a] * (mj0, mj1)[bb] * (mk0, mk1)[cc]
        for a in (0, 1)
        for bb in (0, 1)
        for cc in (0, 1)
    ]
    shape = labs[0].shape
    scores = []
    for c in range(8):
        s = jnp.zeros(shape, jnp.float32)
        for c2 in range(8):
            s = s + w[c2] * (labs[c2] == labs[c]).astype(jnp.float32)
        scores.append(s)
    top = scores[0]
    for c in range(1, 8):
        top = jnp.maximum(top, scores[c])
    if jnp.issubdtype(labs[0].dtype, jnp.integer):
        big = jnp.asarray(jnp.iinfo(labs[0].dtype).max, labs[0].dtype)
    else:
        big = jnp.asarray(jnp.inf, labs[0].dtype)
    winner = jnp.full(shape, big, labs[0].dtype)
    for c in range(8):
        winner = jnp.minimum(
            winner, jnp.where(scores[c] == top, labs[c], big)
        )
    wsum = w[0]
    for c in range(1, 8):
        wsum = wsum + w[c]
    pad = jnp.asarray(pad_label).astype(labs[0].dtype)
    return jnp.where(wsum > 0.5, winner, pad)


def _kernel(bnd_ref, fill_ref, ci_ref, cj_ref, ck_ref, vol_ref, out_ref,
            *, padi, padj, spatial, mode, apply_fill, pad_label):
    """One (TI, TJ, 128) output tile; see module docstring."""
    I, J, K = spatial
    corners = mode == "corners"
    spline_order = _MODE_TO_SPLINE.get(mode)
    cubic = spline_order is not None
    b = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)

    ci = ci_ref[0].reshape(TI * TJ, 128)
    cj = cj_ref[0].reshape(TI * TJ, 128)
    ck = ck_ref[0].reshape(TI * TJ, 128)

    # the raw-coordinate bilinear corner weights double as the
    # out-of-bounds fill mask for every mode (incl. cubic, matching
    # ops.bspline.bspline_resample's mask-and-fill semantics)
    fi, fj, fk, mi0, mi1, mj0, mj1, mk0, mk1 = _offsets(
        ci, cj, ck, spatial
    )
    kc0 = jnp.clip(fk, 0, K - 1)
    kc1 = jnp.clip(fk + 1, 0, K - 1)

    iout = jax.lax.broadcasted_iota(jnp.int32, (TI, TJ, 128), 0).reshape(
        TI * TJ, 128) + ti * TI
    jout = jax.lax.broadcasted_iota(jnp.int32, (TI, TJ, 128), 1).reshape(
        TI * TJ, 128) + tj * TJ
    oi = jnp.clip(fi, -1, I - 1) - iout
    oj = jnp.clip(fj, -1, J - 1) - jout

    if cubic:
        # 4-tap B-spline windows over mirror-folded coordinates: the
        # reflected tap indices all lie in [0, n-1], so the per-tile
        # candidate bounds (computed by _tile_bounds_cubic over the
        # same taps) cover every contribution exactly and the k taps
        # need no halo
        itaps, wi_taps = _spline_taps(ci, I, spline_order)
        jtaps, wj_taps = _spline_taps(cj, J, spline_order)
        ktaps, wk_taps = _spline_taps(ck, K, spline_order)
        oi_taps = tuple(t - iout for t in itaps)
        oj_taps = tuple(t - jout for t in jtaps)

    if mode == "nearest":
        # rounded single-corner pick (same semantics as the gather
        # kernel's nearest path); the floor-based candidate bounds cover
        # the rounded offsets: round(x) in {floor(x), floor(x)+1} and
        # the loop already extends one past oi_hi/oj_hi for the +1
        # corner
        ri = jnp.round(ci).astype(jnp.int32)
        rj = jnp.round(cj).astype(jnp.int32)
        rk = jnp.round(ck).astype(jnp.int32)
        valid = (
            (ri >= 0) & (ri < I) & (rj >= 0) & (rj < J)
            & (rk >= 0) & (rk < K)
        ).astype(jnp.float32)
        oin = jnp.clip(ri, 0, I - 1) - iout
        ojn = jnp.clip(rj, 0, J - 1) - jout
        rkc = jnp.clip(rk, 0, K - 1)

    oi_lo = bnd_ref[b, ti, tj, 0]
    oi_hi = bnd_ref[b, ti, tj, 1]
    oj_lo = bnd_ref[b, ti, tj, 2]
    oj_hi = bnd_ref[b, ti, tj, 3]

    # label volumes ride in their (int32) dtype — casting labels to f32
    # would round values above 2^24; intensity volumes are f32 already
    acc_dtype = vol_ref.dtype if corners else jnp.float32
    if corners:
        # 8 per-corner label accumulators, (a, b, c) lexicographic —
        # matches ``_resample_element_label``'s weight stack order
        init = (jnp.zeros((TI * TJ, 128), acc_dtype),) * 8
    else:
        init = (jnp.zeros((TI * TJ, 128), acc_dtype),)

    def jbody(cjo, carry):
        accs, cio = carry
        rows = vol_ref[0, pl.ds(cio + padi, TI), pl.ds(cjo + padj, TJ), :]
        rows = rows.reshape(TI * TJ, 128)
        if mode == "nearest":
            ln = jnp.take_along_axis(rows, rkc, axis=1)
            sel = ((oin == cio) & (ojn == cjo)).astype(jnp.float32)
            return (accs[0] + sel * valid * ln,), cio
        if cubic:
            kv = wk_taps[0] * jnp.take_along_axis(rows, ktaps[0], axis=1)
            for t in range(1, len(ktaps)):
                kv = kv + wk_taps[t] * jnp.take_along_axis(
                    rows, ktaps[t], axis=1
                )
            mi = jnp.zeros_like(kv)
            for o, w in zip(oi_taps, wi_taps):
                mi = mi + jnp.where(o == cio, w, 0.0)
            mj = jnp.zeros_like(kv)
            for o, w in zip(oj_taps, wj_taps):
                mj = mj + jnp.where(o == cjo, w, 0.0)
            return (accs[0] + (mi * mj) * kv,), cio
        l0 = jnp.take_along_axis(rows, kc0, axis=1)
        l1 = jnp.take_along_axis(rows, kc1, axis=1)
        if corners:
            s00 = ((oi == cio) & (oj == cjo)).astype(acc_dtype)
            s01 = ((oi == cio) & (oj == cjo - 1)).astype(acc_dtype)
            s10 = ((oi == cio - 1) & (oj == cjo)).astype(acc_dtype)
            s11 = ((oi == cio - 1) & (oj == cjo - 1)).astype(acc_dtype)
            new = (
                accs[0] + s00 * l0, accs[1] + s00 * l1,
                accs[2] + s01 * l0, accs[3] + s01 * l1,
                accs[4] + s10 * l0, accs[5] + s10 * l1,
                accs[6] + s11 * l0, accs[7] + s11 * l1,
            )
        else:
            mi = (
                jnp.where(oi == cio, mi0, 0.0)
                + jnp.where(oi == cio - 1, mi1, 0.0)
            )
            mj = (
                jnp.where(oj == cjo, mj0, 0.0)
                + jnp.where(oj == cjo - 1, mj1, 0.0)
            )
            new = (accs[0] + (mi * mj) * (mk0 * l0 + mk1 * l1),)
        return new, cio

    # linear/corner bounds track only the floor corner (+2 covers the
    # +1 corner); cubic bounds already cover all four taps (+1)
    extend = 1 if cubic else 2

    def ibody(cio, accs):
        accs, _ = jax.lax.fori_loop(
            oj_lo, oj_hi + extend, jbody, (accs, cio)
        )
        return accs

    accs = jax.lax.fori_loop(oi_lo, oi_hi + extend, ibody, init)

    if corners:
        out = _corner_vote(accs, mi0, mi1, mj0, mj1, mk0, mk1, pad_label)
        out_ref[0] = out.reshape(TI, TJ, 128)
    else:
        acc = accs[0]
        if apply_fill:
            mask = (mi0 + mi1) * (mj0 + mj1) * (mk0 + mk1)
            acc = jnp.where(mask > 0.5, acc, fill_ref[b])
        out_ref[0] = acc.reshape(TI, TJ, 128)


def _tile_bounds(ci, cj, spatial, padi, padj):
    """(B, nti, ntj, 4) exact per-tile offset bounds, clamped to the
    slab's reachable candidate range. ~10 cheap elementwise/reduce
    passes — measured faster than conservative host-side bounds, which
    over-cover (coarse-cell boxes span the full k axis) and inflate the
    kernel's candidate loop.

    ``spatial`` carries the TRUE in-bounds extents (the clamp targets);
    the tiling grid comes from the coordinate arrays themselves, which
    may be padded up to tile multiples for non-aligned volumes."""
    I, J, _ = spatial
    B, Ip, Jp, _ = ci.shape
    nti, ntj = Ip // TI, Jp // TJ
    ii = jax.lax.broadcasted_iota(jnp.int32, ci.shape, 1)
    jj = jax.lax.broadcasted_iota(jnp.int32, ci.shape, 2)
    oi = jnp.clip(jnp.floor(ci).astype(jnp.int32), -1, I - 1) - ii
    oj = jnp.clip(jnp.floor(cj).astype(jnp.int32), -1, J - 1) - jj
    oi_t = oi.reshape(B, nti, TI, ntj, TJ, -1)
    oj_t = oj.reshape(B, nti, TI, ntj, TJ, -1)
    bounds = jnp.stack(
        [
            jnp.clip(oi_t.min(axis=(2, 4, 5)), -padi, padi - 1),
            jnp.clip(oi_t.max(axis=(2, 4, 5)), -padi, padi - 1),
            jnp.clip(oj_t.min(axis=(2, 4, 5)), -padj, padj - 1),
            jnp.clip(oj_t.max(axis=(2, 4, 5)), -padj, padj - 1),
        ],
        axis=-1,
    ).astype(jnp.int32)
    return bounds


def _tile_bounds_spline(ci, cj, spatial, padi, padj, order):
    """(B, nti, ntj, 4) per-tile offset bounds over ALL FOUR reflected
    cubic taps (min of tap 0 / max of tap 3 do not suffice: reflection
    at the boundary reorders taps). Clamped to [-pad, pad] — the slab
    carries ``pad`` rows each side and the kernel's inclusive loop end
    reaches ``pad``."""
    I, J, _ = spatial
    B, Ip, Jp, _ = ci.shape
    nti, ntj = Ip // TI, Jp // TJ
    ii = jax.lax.broadcasted_iota(jnp.int32, ci.shape, 1)
    jj = jax.lax.broadcasted_iota(jnp.int32, ci.shape, 2)

    def tap_minmax(c, n, pos):
        taps, _ = _spline_taps(c, n, order)
        lo = taps[0]
        hi = taps[0]
        for t in taps[1:]:
            lo = jnp.minimum(lo, t)
            hi = jnp.maximum(hi, t)
        return lo - pos, hi - pos

    oi_lo, oi_hi = tap_minmax(ci, I, ii)
    oj_lo, oj_hi = tap_minmax(cj, J, jj)

    def per_tile(arr, reduce_max: bool):
        t = arr.reshape(B, nti, TI, ntj, TJ, -1)
        return t.max(axis=(2, 4, 5)) if reduce_max else t.min(axis=(2, 4, 5))

    bounds = jnp.stack(
        [
            jnp.clip(per_tile(oi_lo, False), -padi, padi),
            jnp.clip(per_tile(oi_hi, True), -padi, padi),
            jnp.clip(per_tile(oj_lo, False), -padj, padj),
            jnp.clip(per_tile(oj_hi, True), -padj, padj),
        ],
        axis=-1,
    ).astype(jnp.int32)
    return bounds


def _pallas_window(bounds, fill, vol_padded, ci, cj, ck, *, padi, padj,
                   spatial, mode, apply_fill, pad_label=0.0):
    """vol_padded (B, Ip+2padi, Jp+2padj, 128); coords (B, Ip, Jp, 128);
    bounds (B, nti, ntj, 4) int32; fill (B,) f32. -> (B, Ip, Jp, 128).

    (Ip, Jp) is the tile-aligned output grid; ``spatial`` carries the
    TRUE (I, J, K) used for in-bounds masking — callers crop rows
    >= I / J from the result."""
    I, J, K = spatial
    B, Ip, Jp, _ = ci.shape
    nti, ntj = Ip // TI, Jp // TJ
    nrows = TI + 2 * padi
    ncols = TJ + 2 * padj

    kern = functools.partial(
        _kernel, padi=padi, padj=padj, spatial=spatial, mode=mode,
        apply_fill=apply_fill, pad_label=pad_label,
    )
    coord_spec = pl.BlockSpec(
        (1, TI, TJ, 128), lambda b, ti, tj, *_: (b, ti, tj, 0)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, nti, ntj),
        in_specs=[
            coord_spec,
            coord_spec,
            coord_spec,
            pl.BlockSpec(
                (
                    pl.Element(1),
                    pl.Element(nrows),
                    pl.Element(ncols),
                    pl.Element(128),
                ),
                lambda b, ti, tj, *_: (b, ti * TI, tj * TJ, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, TI, TJ, 128), lambda b, ti, tj, *_: (b, ti, tj, 0)
        ),
    )
    out_dtype = vol_padded.dtype if mode == "corners" else jnp.float32
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, Ip, Jp, 128), out_dtype),
        grid_spec=grid_spec,
        interpret=_use_interpret(),
    )(bounds, fill, ci, cj, ck, vol_padded)


def _build_batch_coords(matrices, control_points, out_spatial):
    """Per-element affine ramps + upsampled elastic displacement.

    matrices (B, 4, 4) f32; control_points (B, ni, nj, nk, 3) or None.
    Returns three (B, Io, Jo, Ko) f32 coordinate arrays.
    """
    from .resample import upsample_field

    io, jo, ko = out_spatial
    m = matrices
    ri = jnp.arange(io, dtype=jnp.float32)[None, :, None, None]
    rj = jnp.arange(jo, dtype=jnp.float32)[None, None, :, None]
    rk = jnp.arange(ko, dtype=jnp.float32)[None, None, None, :]

    def axis(a):
        return (
            ri * m[:, a, 0, None, None, None]
            + rj * m[:, a, 1, None, None, None]
            + rk * m[:, a, 2, None, None, None]
            + m[:, a, 3, None, None, None]
        )

    ci, cj, ck = axis(0), axis(1), axis(2)
    if control_points is not None:
        disp = jax.vmap(
            functools.partial(upsample_field, out_shape=out_spatial)
        )(control_points)
        ci = ci + disp[..., 0]
        cj = cj + disp[..., 1]
        ck = ck + disp[..., 2]
    return ci, cj, ck


def tile_align_coords(matrices, control_points, spatial, ti, tj,
                      kp=None):
    """Output-grid coordinates, tile-aligned for the pallas kernels.

    Builds the per-element coordinates over the TRUE ``spatial`` grid
    (the elastic field spans it — extrapolating the ramps would
    mis-place the field), then edge-replicates the last real
    row/column/lane into the alignment padding: zero-padded coordinates
    would poison the per-tile candidate bounds with huge fake offsets.
    The padded rows' outputs are meaningless and must be cropped; their
    offsets must also be EXCLUDED from any bounded candidate window
    (see ``_tile_bounds2``). Returns ``(ci, cj, ck, Ip, Jp)``.
    """
    I, J, K = spatial
    Ip = ti * (-(-I // ti))
    Jp = tj * (-(-J // tj))
    kp = K if kp is None else kp
    ci, cj, ck = _build_batch_coords(matrices, control_points, spatial)
    if (Ip, Jp, kp) != (I, J, K):
        pad = ((0, 0), (0, Ip - I), (0, Jp - J), (0, kp - K))
        ci = jnp.pad(ci, pad, mode="edge")
        cj = jnp.pad(cj, pad, mode="edge")
        ck = jnp.pad(ck, pad, mode="edge")
    return ci, cj, ck, Ip, Jp


@functools.partial(
    jax.jit,
    static_argnames=(
        "spatial", "padi", "padj", "has_cp", "apply_fill", "mode"
    ),
)
def _window_resample_scalar(
    data, matrices, control_points, fill, *,
    spatial, padi, padj, has_cp, apply_fill, mode,
):
    """(B, C, I, J, K) trilinear bounded-offset resample, one program."""
    B, C, I, J, K = data.shape
    ci, cj, ck, Ip, Jp = tile_align_coords(
        matrices, control_points if has_cp else None, spatial, TI, TJ
    )
    bounds = _tile_bounds(ci, cj, spatial, padi, padj)
    vol = jnp.pad(
        data.astype(jnp.float32),
        (
            (0, 0), (0, 0),
            (padi, padi + Ip - I), (padj, padj + Jp - J),
            (0, 128 - K),
        ),
    )
    outs = []
    for c in range(C):
        out = _pallas_window(
            bounds, fill[:, c], vol[:, c], ci, cj, ck,
            padi=padi, padj=padj, spatial=spatial, mode=mode,
            apply_fill=apply_fill,
        )
        outs.append(out[:, :I, :J, :K])
    return jnp.stack(outs, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("spatial", "padi", "padj", "has_cp", "pad_label"),
)
def _window_resample_label(
    data, matrices, control_points, *,
    spatial, padi, padj, has_cp, pad_label,
):
    """Partial-volume label mode: 8 gathered corner labels + in-kernel
    argmax by summed corner weight (same vote as
    ``_resample_element_label``)."""
    B, C, I, J, K = data.shape
    ci, cj, ck, Ip, Jp = tile_align_coords(
        matrices, control_points if has_cp else None, spatial, TI, TJ
    )
    bounds = _tile_bounds(ci, cj, spatial, padi, padj)
    # labels ride in int32 — an f32 cast would round values above 2^24
    work = (
        jnp.int32
        if jnp.issubdtype(data.dtype, jnp.integer)
        else jnp.float32
    )
    vol = jnp.pad(
        data.astype(work),
        (
            (0, 0), (0, 0),
            (padi, padi + Ip - I), (padj, padj + Jp - J),
            (0, 128 - K),
        ),
    )
    fill = jnp.zeros((B,), jnp.float32)
    out = _pallas_window(
        bounds, fill, vol[:, 0], ci, cj, ck,
        padi=padi, padj=padj, spatial=spatial, mode="corners",
        apply_fill=False, pad_label=pad_label,
    )[:, :I, :J, :K]
    return out[:, None].astype(data.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("spatial", "padi", "padj", "has_cp", "order"),
)
def _window_resample_spline(
    data, matrices, control_points, fill, *,
    spatial, padi, padj, has_cp, order,
):
    """(B, C, I, J, K) B-spline (order 2-7) bounded-offset resample:
    the IIR prefilter (ops.bspline.prefilter) and the (order+1)-tap
    windowed evaluation run in ONE program. Boundary model: mirror
    (dct1), identical to :func:`..bspline.bspline_resample`;
    out-of-bounds voxels are replaced through the same raw-coordinate
    bilinear mask, so the fill is ALWAYS applied (without it the
    mirror-folded sample would leak outside the volume)."""
    from .bspline import prefilter

    B, C, I, J, K = data.shape
    ci, cj, ck, Ip, Jp = tile_align_coords(
        matrices, control_points if has_cp else None, spatial, TI, TJ
    )
    bounds = _tile_bounds_spline(ci, cj, spatial, padi, padj, order)
    coeffs = prefilter(data.astype(jnp.float32), order)
    vol = jnp.pad(
        coeffs,
        (
            (0, 0), (0, 0),
            (padi, padi + Ip - I), (padj, padj + Jp - J),
            (0, 128 - K),
        ),
    )
    outs = []
    for c in range(C):
        out = _pallas_window(
            bounds, fill[:, c], vol[:, c], ci, cj, ck,
            padi=padi, padj=padj, spatial=spatial,
            mode=_SPLINE_TO_MODE[order],
            apply_fill=True,
        )
        outs.append(out[:, :I, :J, :K])
    return jnp.stack(outs, axis=1)


#: cubic candidate windows are ~3x the linear deviation bound (mirror
#: folding of boundary-overhanging coordinates plus the 4-tap reach),
#: and the candidate loop is O(range^2) per tile — cap the padding
MAX_BOUND_CUBIC = 32


def cubic_window_eligible(data_shape, out_spatial, matrices,
                          control_points, data=None, order: int = 3):
    """Dispatch decision for the spline (order 2-7) windowed kernel:
    (padi, padj) paddings, or None. Unlike the linear kernel,
    affine-only maps are accepted too — there is no faster high-order
    path to defer to."""
    from ..config import window_resample as enabled

    if not enabled():
        return None
    if not _tpu_dispatch(data):
        return None
    if order not in _SPLINE_TO_MODE:
        return None
    b, c, I, J, K = data_shape
    if tuple(out_spatial) != (I, J, K):
        return None
    if K > 128 or min(I, J, K) < 2:
        return None
    if order >= 4 and min(I, J, K) < order + 2:
        # wide taps need axes long enough that one mirror reflection
        # pass covers every tap index (the kernel's _reflect_idx does
        # not fold modularly)
        return None
    bounds = window_bounds(matrices, control_points, (I, J, K))
    if bounds is None:
        return None
    # worst case |fold(x) - out|: the overhang e <= dev reflects to
    # 2e inside, on top of the in-range deviation -> 3*dev; plus the
    # tap reach past the base (order // 2 + 1)
    reach = order // 2 + 1
    bci = 3 * bounds[0] + reach
    bcj = 3 * bounds[1] + reach
    if bci > MAX_BOUND_CUBIC or bcj > MAX_BOUND_CUBIC:
        return None
    key = ("spline", order, tuple(data_shape), tuple(out_spatial))
    hr = 0 if ratchet_seen(key) else 1
    padi = _bucket(bci + 1, (6, 10, 16, 24, 33), hr)
    padj = _bucket(8 * ((bcj + 1 + 7) // 8), (8, 16, 24, 32, 40), hr)
    return ratchet_statics(key, (padi, padj))


def cubic_resample_fused(data, matrices, control_points, fill,
                         *, padi, padj, order: int = 3):
    """Batched bounded-offset B-spline resample (orders 2-7).

    Same contract as :func:`window_resample_fused`; parity oracle is
    :func:`torchio_tpu.ops.bspline.bspline_resample` at the same order.
    """
    if order not in _SPLINE_TO_MODE:
        raise ValueError(f"spline kernel supports orders 2-7, got {order}")
    data = jnp.asarray(data)
    B, C, I, J, K = data.shape
    m, cps, has_cp = _marshal_maps(matrices, control_points)
    return _window_resample_spline(
        data, m, cps, _fill_bc(fill, B, C),
        spatial=(I, J, K), padi=padi, padj=padj, has_cp=has_cp,
        order=order,
    )


def window_bounds(matrices, control_points, spatial):
    """Host-side eligibility: per-axis (i, j) offset bounds, or None.

    A batch is eligible when, for EVERY element, the output->input map
    keeps ``|in_i - out_i|`` and ``|in_j - out_j|`` under
    :data:`MAX_BOUND` across the whole volume (affine deviation bounded
    via the volume's 8 corners, float64 host math; elastic displacement
    bounded by the max |control point|). The k offset never matters —
    the lane-gather is fully per-element.
    """
    I, J, K = spatial
    di = dj = 0.0
    corners = np.array(
        [
            [i, j, k, 1.0]
            for i in (0.0, I - 1.0)
            for j in (0.0, J - 1.0)
            for k in (0.0, K - 1.0)
        ]
    )
    for m, cp in zip(matrices, control_points):
        m = np.asarray(m, np.float64)
        dev = (corners @ m.T)[:, :3] - corners[:, :3]
        ei = float(np.max(np.abs(dev[:, 0])))
        ej = float(np.max(np.abs(dev[:, 1])))
        if cp is not None:
            cp = np.asarray(cp, np.float64)
            if cp.size:
                ei += float(np.max(np.abs(cp[..., 0])))
                ej += float(np.max(np.abs(cp[..., 1])))
        di = max(di, ei)
        dj = max(dj, ej)
    bi = int(np.ceil(di)) + 1
    bj = int(np.ceil(dj)) + 1
    if bi > MAX_BOUND or bj > MAX_BOUND:
        return None
    return bi, bj


def window_eligible(data_shape, out_spatial, matrices, control_points,
                    mode: str, data=None):
    """Dispatch decision for the windowed kernel. Returns per-axis
    (padi, padj) paddings or None.

    Requirements: TPU backend (or interpret override), linear mode, an
    elastic component (affine-only maps already have faster paths),
    output grid == input grid shape, K <= 128, and bounded in-plane
    offsets (:func:`window_bounds`). I/J need NOT be tile multiples —
    the wrapper tile-aligns the output grid and crops.
    """
    from ..config import window_resample as enabled

    if not enabled():
        return None
    if mode not in ("linear", "nearest"):
        return None
    if not _tpu_dispatch(data):
        return None
    if all(cp is None for cp in control_points):
        return None
    b, c, I, J, K = data_shape
    if tuple(out_spatial) != (I, J, K):
        return None
    if K > 128 or I < 2 or J < 2 or K < 2:
        return None
    bounds = window_bounds(matrices, control_points, (I, J, K))
    if bounds is None:
        return None
    bi, bj = bounds
    # bucket to coarse levels, then ratchet: pads are pure capacity, so
    # any value >= the draw's requirement is correct, and stable values
    # keep one executable across random draws (see ratchet_statics);
    # the first draw of a shape class takes one level of headroom
    key = ("window", tuple(data_shape), tuple(out_spatial), mode)
    hr = 0 if ratchet_seen(key) else 1
    padi = _bucket(bi + 1, (4, 8, 12, 16, 25), hr)
    padj = _bucket(8 * ((bj + 1 + 7) // 8), (8, 16, 24, 32), hr)
    return ratchet_statics(key, (padi, padj))


def window_resample_fused(data, matrices, control_points, fill,
                          *, padi, padj, apply_fill, mode="linear"):
    """Batched bounded-offset trilinear resample (see module docstring).

    data (B, C, I, J, K); matrices length-B host 4x4; control_points
    length-B (pre-folded, input-voxel units) possibly with None entries.
    """
    data = jnp.asarray(data)
    B, C, I, J, K = data.shape
    m, cps, has_cp = _marshal_maps(matrices, control_points)
    return _window_resample_scalar(
        data, m, cps, _fill_bc(fill, B, C),
        spatial=(I, J, K), padi=padi, padj=padj, has_cp=has_cp,
        apply_fill=apply_fill, mode=mode,
    )


def window_resample_label_fused(data, matrices, control_points,
                                pad_label, *, padi, padj):
    """Batched bounded-offset partial-volume label resample."""
    data = jnp.asarray(data)
    B, C, I, J, K = data.shape
    m, cps, has_cp = _marshal_maps(matrices, control_points)
    return _window_resample_label(
        data, m, cps,
        spatial=(I, J, K), padi=padi, padj=padj, has_cp=has_cp,
        pad_label=float(pad_label),
    )


def _stack_control_points(control_points):
    """Stack per-element coarse fields, zero-filling None entries."""
    shape = None
    for cp in control_points:
        if cp is not None:
            shape = np.asarray(cp).shape
            break
    stacked = [
        np.zeros(shape, np.float64) if cp is None else np.asarray(
            cp, np.float64
        )
        for cp in control_points
    ]
    return jnp.asarray(np.stack(stacked), jnp.float32)

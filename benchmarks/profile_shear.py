"""Roofline decomposition of the sheared-window resample (VERDICT r4 #1).

Times each stage of ``ops/shear_resample.py`` in isolation on the
headline workload (B=4 x 256^3, +-10 deg rotation + 0.9-1.1 scale +
translation + 7.5-voxel elastic) and prints a bytes-moved model next to
the measured times. Every timing forces completion with a device
reduction pulled to host (the axon tunnel's ``block_until_ready`` can
return early; see BASELINE.md round-1 caveats).

Usage: python benchmarks/profile_shear.py [reps]
"""

import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import torchio_tpu  # noqa: F401  (enables the persistent compile cache)
import jax
import jax.numpy as jnp

from torchio_tpu.ops import shear_resample as sr
from torchio_tpu.ops.window_resample import (
    _marshal_maps,
    tile_align_coords,
)

B, S = 4, 256
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[::4097][:16]))


def timeit(label, fn, *args, reps=REPS):
    fn(*args)  # compile + settle
    fn(*args)
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        best.append(time.perf_counter() - t0)
    ms = 1000 * float(np.median(best))
    print(f"{label:<42s} {ms:9.1f} ms   (min {1000*min(best):7.1f})")
    return ms


def headline_maps(rng):
    """B voxel-space output->input matrices like the headline draw."""
    mats, cps = [], []
    for _ in range(B):
        ang = np.deg2rad(rng.uniform(-10, 10, 3))
        cx, sx = np.cos(ang[0]), np.sin(ang[0])
        cy, sy = np.cos(ang[1]), np.sin(ang[1])
        cz, sz = np.cos(ang[2]), np.sin(ang[2])
        rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        rot = rx @ ry @ rz * rng.uniform(0.9, 1.1)
        m = np.eye(4)
        m[:3, :3] = rot
        center = (S - 1) / 2
        m[:3, 3] = center - rot @ np.full(3, center) + rng.uniform(-5, 5, 3)
        mats.append(m)
        cps.append(rng.uniform(-7.5, 7.5, (7, 7, 7, 3)).astype(np.float32))
    return mats, cps


def main():
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.random((B, 1, S, S, S), np.float32))
    mats, cps = headline_maps(rng)
    fill = np.zeros((B, 1), np.float32)

    plan = sr.shear_eligible(data.shape, (S, S, S), mats, cps, "linear", data=data)
    assert plan is not None, "headline draw must ride the sheared kernel"
    print(
        f"plan: maxr={plan.maxr} pad_si={plan.pad_si} pad_sj={plan.pad_sj}"
        f" padi_g={plan.padi_g} padj_g={plan.padj_g}"
        f" need_si={plan.need_si} need_sj={plan.need_sj} Kp={plan.Kp}"
    )

    total = timeit(
        "full shear_resample_fused (B=4, 256^3)",
        lambda: sr.shear_resample_fused(
            data, mats, cps, fill, plan, mode="linear"
        ),
    )

    # ---- stage isolation (all jitted, steady state) ----
    m, cp_arr, has_cp = _marshal_maps(mats, cps)
    Kp_out = 128 * ((S + 127) // 128)

    coords_fn = jax.jit(
        functools.partial(
            tile_align_coords, spatial=(S, S, S), ti=sr.TI, tj=sr.TJ,
            kp=Kp_out,
        )
    )
    t_coords = timeit(
        "tile_align_coords (ramps + elastic upsample)",
        lambda: coords_fn(m, cp_arr)[0],
    )
    ci, cj, ck = coords_fn(m, cp_arr)[:3]
    Ip = sr.TI * (-(-S // sr.TI))
    Jp = sr.TJ * (-(-S // sr.TJ))

    nrows = sr.TI + plan.maxr + 7
    ncols = 8 * ((sr.TJ + plan.maxr + 7 + 7) // 8)
    deltas = jnp.asarray(plan.deltas)
    bounds_fn = jax.jit(
        functools.partial(
            sr._tile_bounds2,
            spatial=(S, S, S), out_true=(S, S),
            padi_g=plan.padi_g, padj_g=plan.padj_g, maxr=plan.maxr,
            reach_i=nrows - sr.TI, reach_j=ncols - sr.TJ,
        )
    )
    t_bounds = timeit(
        "_tile_bounds2 (per-tile candidate windows)",
        lambda: bounds_fn(
            ci, cj, ck, m[:, 0, 2], m[:, 0, 3], m[:, 1, 2], m[:, 1, 3],
            deltas,
        ),
    )
    bounds = bounds_fn(
        ci, cj, ck, m[:, 0, 2], m[:, 0, 3], m[:, 1, 2], m[:, 1, 3], deltas
    )

    # pads + shear pass
    t8 = lambda t: jnp.asarray(np.repeat(t[:, None, :], 8, axis=1))
    si_t, sj_t = t8(plan.si), t8(plan.sj)
    si_c, sj_c = jnp.asarray(plan.si_chunk), jnp.asarray(plan.sj_chunk)
    Kp_in = plan.Kp
    Ipad = max(Ip, sr.TI * (-(-S // sr.TI)))
    Jpad = max(Jp, sr.TJ * (-(-S // sr.TJ)))

    @jax.jit
    def pad_stage(vol):
        return jnp.pad(
            vol.astype(jnp.float32),
            ((0, 0), (0, 0), (0, Ipad - S), (0, Jpad - S), (0, Kp_in - S)),
        )

    t_pad1 = timeit("input pad to tile grid", pad_stage, data)
    vol = pad_stage(data)

    ext_i = plan.pad_si if plan.need_si else 0
    ext_j = plan.pad_sj if plan.need_sj else 0

    @jax.jit
    def shear_stage(v):
        vn = v.reshape(B * 1, Ipad, Jpad, Kp_in)
        return sr.shear_ij(
            vn, si_t, sj_t, si_c, sj_c,
            plan.pad_si if plan.need_si else None,
            plan.pad_sj if plan.need_sj else None,
            rng_si=plan.rng_si, rng_sj=plan.rng_sj,
        )

    t_shear = timeit("pre-shear pass (masked multi-shift i+j)", shear_stage, vol)
    sheared = shear_stage(vol).reshape(
        B, 1, Ipad + 2 * ext_i, Jpad + 2 * ext_j, Kp_in
    )

    @jax.jit
    def pad_stage2(sh):
        return jnp.pad(
            sh,
            (
                (0, 0), (0, 0),
                (plan.padi_g - ext_i, plan.padi_g - ext_i),
                (plan.padj_g - ext_j, plan.padj_g - ext_j),
                (0, 0),
            ),
        )

    t_pad2 = timeit("global residual pad", pad_stage2, sheared)
    padded = pad_stage2(sheared)

    @jax.jit
    def window_stage(padded, bounds, ci, cj, ck):
        outs = []
        for b in range(B):
            outs.append(
                sr._pallas_window2(
                    bounds[b : b + 1],
                    jnp.zeros((1,), jnp.float32),
                    padded[b, 0][None],
                    ci[b : b + 1], cj[b : b + 1], ck[b : b + 1],
                    si_t[b : b + 1], sj_t[b : b + 1],
                    spatial=(S, S, S), padi_g=plan.padi_g,
                    padj_g=plan.padj_g, maxr=plan.maxr, mode="linear",
                    apply_fill=True,
                )[0, :S, :S, :S]
            )
        return jnp.stack(outs)[:, None]

    t_window = timeit(
        "window kernel (4x per-(b,c) pallas calls)",
        window_stage, padded, bounds, ci, cj, ck,
    )

    # ---- bytes model ----
    nti, ntj = Ip // sr.TI, Jp // sr.TJ
    ntk_out = Kp_out // 128
    ntk_in = Kp_in // 128
    steps = nti * ntj * ntk_out
    slab_bytes = nrows * ncols * 128 * 4 * ntk_in
    coord_bytes = 3 * sr.TI * sr.TJ * 128 * 4
    out_bytes = sr.TI * sr.TJ * 128 * 4
    per_call = steps * (slab_bytes + coord_bytes + out_bytes)
    print("\nbytes model (window kernel):")
    print(f"  grid steps/call: {steps}   slab/step: {slab_bytes/2**20:.2f} MiB")
    print(f"  DMA per call: {per_call/2**30:.2f} GiB; x{B} calls = "
          f"{B*per_call/2**30:.2f} GiB")
    if t_window > 0:
        bw = B * per_call / (t_window / 1000) / 2**30
        print(f"  implied slab bandwidth: {bw:.0f} GiB/s (v5e HBM ~819 GB/s)")
    vol_bytes = B * S**3 * 4
    print(f"  useful traffic (read+write volume once): "
          f"{2*vol_bytes/2**30:.2f} GiB -> speed-of-light "
          f"{2*vol_bytes/819e9*1000:.1f} ms")

    staged = t_coords + t_bounds + t_pad1 + t_shear + t_pad2 + t_window
    print(f"\nstage sum {staged:.1f} ms vs full {total:.1f} ms "
          f"(gap = fusion/dispatch/sync)")
    print(f"volumes/sec (full): {B / (total / 1000):.2f}")


if __name__ == "__main__":
    main()

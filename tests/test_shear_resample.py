"""Sheared-window resample kernel (ops/shear_resample.py).

Interpret-mode equality against the exact gather dispatch for general
affine maps (full 3-axis rotations, scales, translations) with and
without elastic components, across single- and two-chunk K. Reference
semantics: ``/root/reference/src/torchio/transforms/spatial/spatial.py``
(grid_sample geometry) — pinned transitively through the gather path's
golden tests.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

import torchio_tpu.config as config
from torchio_tpu.ops.resample import resample_fused, resample_label_fused
from torchio_tpu.ops.shear_resample import (
    ShearPlan,
    shear_eligible,
    shear_resample_fused,
    shear_resample_label_fused,
)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("TORCHIO_TPU_WINDOW_INTERPRET", "1")
    monkeypatch.setenv("TORCHIO_TPU_GATHER16", "0")
    yield


def _rot(ax, ay, az, scale=1.0):
    cx, sx = np.cos(ax), np.sin(ax)
    cy, sy = np.cos(ay), np.sin(ay)
    cz, sz = np.cos(az), np.sin(az)
    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    m = np.eye(4)
    m[:3, :3] = (rx @ ry @ rz) * scale
    return m


def _center(m, shape):
    c = np.array(shape, np.float64) / 2
    m[:3, 3] = c - m[:3, :3] @ c
    return m


def _gather(data, ms, cps, **kw):
    config.use_window_resample = False
    try:
        return resample_fused(data, ms, cps, use_f16=False, **kw)
    finally:
        config.use_window_resample = None


class TestShearEquality:
    def test_full_rotation_with_fill(self):
        rng = np.random.default_rng(0)
        b, c, i, j, k = 2, 2, 16, 16, 40
        data = rng.random((b, c, i, j, k), np.float32)
        d = np.deg2rad(10)
        ms = [
            _center(_rot(d, -d / 2, d / 3), (i, j, k)),
            _center(_rot(-d / 2, d, -d), (i, j, k)),
        ]
        cps = [None, None]
        plan = shear_eligible(data.shape, (i, j, k), ms, cps, "linear")
        assert plan is not None
        out = shear_resample_fused(data, ms, cps, 1.5, plan)
        ref = _gather(data, ms, cps, fill=1.5)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5
        )

    def test_two_chunk_k_rot_scale_elastic(self):
        rng = np.random.default_rng(1)
        b, c, i, j, k = 2, 1, 16, 16, 200
        data = rng.random((b, c, i, j, k), np.float32)
        d = np.deg2rad(8)
        ms = []
        for _ in range(b):
            m = _rot(d / 2, d, -d / 2)
            m[:3, :3] *= 1.05
            ms.append(_center(m, (i, j, k)))
        cps = [rng.uniform(-2, 2, (3, 3, 4, 3)) for _ in range(b)]
        plan = shear_eligible(data.shape, (i, j, k), ms, cps, "linear")
        assert plan is not None and plan.Kp == 256
        out = shear_resample_fused(data, ms, cps, 0.5, plan)
        ref = _gather(data, ms, cps, fill=0.5)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5
        )

    def test_nearest_exact(self):
        rng = np.random.default_rng(2)
        data = rng.random((1, 1, 16, 16, 140), np.float32)
        m = _center(_rot(0.1, -0.15, 0.12), (16, 16, 140))
        cps = [rng.uniform(-1.5, 1.5, (3, 3, 3, 3))]
        plan = shear_eligible(data.shape, (16, 16, 140), [m], cps, "nearest")
        assert plan is not None
        # fill=0.0 means NO fill pass (grid_sample zero-padding
        # semantics) — match the gather reference's apply_fill
        out = shear_resample_fused(
            data, [m], cps, 0.0, plan, mode="nearest", apply_fill=False
        )
        ref = _gather(data, [m], cps, fill=0.0, mode="nearest")
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_zero_fill_through_dispatch(self):
        # the dispatch passes apply_fill through; fill=0 must reproduce
        # the gather path's partial boundary sums exactly
        rng = np.random.default_rng(9)
        data = rng.random((1, 1, 16, 16, 128), np.float32)
        m = np.eye(4)
        m[0, 2] = 0.15
        m = _center(m, (16, 16, 128))
        out = resample_fused(data, [m], [None], fill=0.0, use_f16=False)
        ref = _gather(data, [m], [None], fill=0.0)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5
        )

    def test_label_vote_exact(self):
        rng = np.random.default_rng(3)
        lab = rng.integers(0, 4, (2, 1, 16, 16, 40)).astype(np.int32)
        d = np.deg2rad(9)
        ms = [
            _center(_rot(d, d / 3, -d / 2), (16, 16, 40)) for _ in range(2)
        ]
        cps = [rng.uniform(-2, 2, (3, 3, 3, 3)) for _ in range(2)]
        plan = shear_eligible(lab.shape, (16, 16, 40), ms, cps, "linear")
        assert plan is not None
        out = shear_resample_label_fused(lab, ms, cps, 3, plan)
        config.use_window_resample = False
        try:
            ref = resample_label_fused(lab, ms, cps, pad_label=3)
        finally:
            config.use_window_resample = None
        assert out.dtype == lab.dtype
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_labels_above_2_24_exact(self):
        # int32 labels stay in integer accumulators end to end — an f32
        # round trip would merge values that differ by 1 above 2^24
        rng = np.random.default_rng(11)
        base = 2**24
        lab = (base + rng.integers(0, 4, (1, 1, 16, 16, 40))).astype(
            np.int32
        )
        d = np.deg2rad(6)
        ms = [_center(_rot(d, -d / 2, d / 4), (16, 16, 40))]
        cps = [rng.uniform(-1.5, 1.5, (3, 3, 3, 3))]
        plan = shear_eligible(lab.shape, (16, 16, 40), ms, cps, "linear")
        assert plan is not None
        out = shear_resample_label_fused(lab, ms, cps, 0, plan)
        config.use_window_resample = False
        try:
            ref = resample_label_fused(lab, ms, cps, pad_label=0)
        finally:
            config.use_window_resample = None
        assert out.dtype == lab.dtype
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_k_coupling_cross_term_bounds(self):
        # strong i<-k shear COMBINED with k-row deviation (k scale):
        # the shear table is looked up at the input k, so the residual
        # carries m02 * (k - kc) — bounds omitting that cross-term
        # produced wrong voxels near the k extremes
        rng = np.random.default_rng(12)
        data = rng.random((1, 1, 16, 16, 128), np.float32)
        m = np.eye(4)
        m[0, 2] = 0.15
        m[2, 2] = 0.75
        m = _center(m, (16, 16, 128))
        cps = [None]
        plan = shear_eligible(data.shape, (16, 16, 128), [m], cps, "linear")
        assert plan is not None
        out = shear_resample_fused(data, [m], cps, 0.25, plan)
        ref = _gather(data, [m], cps, fill=0.25)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5
        )

    def test_translation_folded_into_tables(self):
        # a large translation rides in the shear tables, not the pad
        rng = np.random.default_rng(4)
        data = rng.random((1, 1, 16, 16, 24), np.float32)
        m = np.eye(4)
        m[:3, 3] = [11.0, -9.0, 5.0]
        m[0, 2] = 0.1
        cps = [None]
        plan = shear_eligible(data.shape, (16, 16, 24), [m], cps, "linear")
        assert plan is not None
        assert plan.si[0][0] == 11 and plan.sj[0][0] == -9
        out = shear_resample_fused(data, [m], cps, 2.0, plan)
        ref = _gather(data, [m], cps, fill=2.0)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5
        )

    def test_dispatch_routes_general_affine(self, monkeypatch):
        import torchio_tpu.ops.shear_resample as sr

        calls = []
        orig = sr.shear_resample_fused

        def spy(*a, **k):
            calls.append(1)
            return orig(*a, **k)

        monkeypatch.setattr(sr, "shear_resample_fused", spy)
        rng = np.random.default_rng(5)
        data = rng.random((1, 1, 16, 16, 24), np.float32)
        m = _center(_rot(0.15, 0.1, -0.12), (16, 16, 24))
        out = resample_fused(data, [m], [None], fill=0.0, use_f16=False)
        assert calls and out.shape == data.shape

    def test_diagonal_map_keeps_separable_path(self, monkeypatch):
        import torchio_tpu.ops.shear_resample as sr

        calls = []
        monkeypatch.setattr(
            sr, "shear_resample_fused",
            lambda *a, **k: calls.append(1) or None,
        )
        rng = np.random.default_rng(6)
        data = rng.random((1, 1, 16, 16, 24), np.float32)
        m = np.diag([2.0, 1.5, 0.5, 1.0])
        resample_fused(data, [m], [None], fill=0.0, use_f16=False)
        assert not calls


class TestEligibility:
    def test_k_over_256_rejected(self):
        cp = np.ones((3, 3, 3, 3))
        assert (
            shear_eligible(
                (1, 1, 16, 16, 257), (16, 16, 257), [np.eye(4)], [cp],
                "linear",
            )
            is None
        )

    def test_huge_rotation_rejected(self):
        m = _rot(1.2, 0.0, 0.0)  # ~70 degrees
        assert (
            shear_eligible(
                (1, 1, 256, 256, 256), (256, 256, 256), [m], [None],
                "linear",
            )
            is None
        )

    def test_plan_pads_cover_shear_tables(self):
        m = _rot(0.17, 0.1, 0.0)
        plan = ShearPlan([m], [None], (128, 128, 128))
        assert plan.padi_g >= plan.pad_si
        assert plan.padj_g >= plan.pad_sj
        assert plan.pad_si % 4 == 0


class TestStaticRatchet:
    def test_concurrent_ratchet_never_loses_a_max(self):
        # concurrent pipelines (loader worker threads) race on the
        # process-level high-water marks; an interleaved
        # read-modify-write must not regress a component
        import threading

        from torchio_tpu.ops.window_resample import (
            _STATIC_RATCHET,
            ratchet_statics,
            reset_static_ratchet,
        )

        reset_static_ratchet()
        try:
            n = 500

            def worker(tid):
                for i in range(n):
                    ratchet_statics(("race",), (i, n - i, tid))

            threads = [
                threading.Thread(target=worker, args=(t,)) for t in range(8)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert _STATIC_RATCHET[("race",)] == (n - 1, n, 7)
        finally:
            reset_static_ratchet()

    def test_plans_in_one_range_share_one_static_tuple(self):
        from torchio_tpu.ops.window_resample import reset_static_ratchet

        reset_static_ratchet()
        try:
            rng = np.random.default_rng(0)
            statics = set()
            for _ in range(12):
                ms, cps = [], []
                for _ in range(2):
                    ang = rng.uniform(-0.17, 0.17, 3)
                    m = _rot(*ang, scale=rng.uniform(0.9, 1.1))
                    m[:3, 3] = rng.uniform(-5.0, 5.0, 3)
                    ms.append(m)
                    cps.append(rng.uniform(-7.5, 7.5, (3, 3, 3, 3)))
                plan = ShearPlan(ms, cps, (64, 64, 64))
                assert plan.ok
                statics.add(
                    (plan.maxr, plan.pad_si, plan.pad_sj,
                     plan.padi_g, plan.padj_g,
                     plan.need_si, plan.need_sj)
                )
            # the first plan takes one level of headroom; later draws
            # from the same parameter range reuse its high-water marks
            assert len(statics) <= 2
        finally:
            reset_static_ratchet()

    def test_ratcheted_pads_still_cover_the_tables(self):
        from torchio_tpu.ops.window_resample import reset_static_ratchet

        reset_static_ratchet()
        try:
            m1 = _rot(0.05, 0.0, 0.0)
            m2 = _rot(0.17, 0.1, 0.05)
            p1 = ShearPlan([m1], [None], (64, 64, 64))
            p2 = ShearPlan([m2], [None], (64, 64, 64))
            p3 = ShearPlan([m1], [None], (64, 64, 64))
            for p in (p1, p2, p3):
                assert p.pad_si >= int(np.max(np.abs(p.si)))
                assert p.pad_sj >= int(np.max(np.abs(p.sj)))
                assert p.padi_g >= p.pad_si
                assert p.padj_g >= p.pad_sj
            # monotone reuse: the small-rotation replan adopts the
            # bigger plan's marks instead of creating a third combo
            assert (p3.maxr, p3.padi_g, p3.padj_g) == (
                p2.maxr, p2.padi_g, p2.padj_g
            )
        finally:
            reset_static_ratchet()


class TestNonAlignedShapes:
    """Arbitrary (non-multiple-of-16) extents: the wrapper tile-aligns
    the grid, masks with the TRUE bounds, and crops — general rotations
    of clinical volumes (e.g. 181x217x181) no longer fall back to the
    per-index gather."""

    @pytest.mark.parametrize(
        "shape", [(2, 1, 21, 19, 140), (1, 2, 30, 17, 9)]
    )
    def test_matches_gather_path(self, shape):
        rng = np.random.default_rng(7)
        b = shape[0]
        data = rng.random(shape, np.float32)
        mats = []
        for _ in range(b):
            m = _rot(0.1, -0.08, 0.12, scale=0.97)
            m[:3, 3] = rng.uniform(-3, 3, 3)
            mats.append(m)
        out_s = resample_fused(
            data, mats, [None] * b, fill=1.5, mode="linear"
        )
        out_g = _gather(
            data, mats, [None] * b, fill=1.5, mode="linear"
        )
        np.testing.assert_allclose(
            np.asarray(out_s), np.asarray(out_g), atol=2e-5
        )

    def test_label_vote_matches_gather_path(self):
        rng = np.random.default_rng(8)
        lab = rng.integers(0, 5, (1, 1, 21, 19, 140)).astype(np.int32)
        m = _rot(0.1, -0.08, 0.12, scale=0.97)
        m[:3, 3] = [1.5, -2.0, 0.5]
        out_s = resample_label_fused(lab, [m], [None], pad_label=0)
        config.use_window_resample = False
        try:
            out_g = resample_label_fused(lab, [m], [None], pad_label=0)
        finally:
            config.use_window_resample = None
        np.testing.assert_array_equal(np.asarray(out_s), np.asarray(out_g))

    def test_affine_plus_elastic_non_aligned(self):
        rng = np.random.default_rng(9)
        data = rng.random((1, 1, 30, 17, 9), np.float32)
        m = _rot(0.08, 0.05, -0.06)
        cps = [rng.uniform(-2.0, 2.0, (3, 3, 3, 3))]
        out_s = resample_fused(data, [m], cps, fill=0.5, mode="linear")
        out_g = _gather(data, [m], cps, fill=0.5, mode="linear")
        np.testing.assert_allclose(
            np.asarray(out_s), np.asarray(out_g), atol=2e-5
        )


class TestAlignmentPaddingBounds:
    """Regression: edge-replicated alignment rows must not constrain
    the per-tile candidate window. Their offsets ramp down one per pad
    row; including them dragged ``lo`` down by up to TI-1, the ``maxr``
    span clamp then cut real candidates, and the kernel's residual clip
    misattributed real corners (0.75 max error on (33, 33, 24) under a
    1.4-degree rotation before the fix). Maximal-pad shapes
    (I % 16 == 1) with near-identity rotations sit at the minimum
    ``maxr`` bucket — exactly where the budget was tightest."""

    @staticmethod
    def _centered(m, spatial):
        c = (np.asarray(spatial, np.float64) - 1.0) / 2.0
        m = np.asarray(m, np.float64).copy()
        m[:3, 3] = c - m[:3, :3] @ c
        return m

    @pytest.mark.parametrize(
        "shape,ang",
        [
            ((1, 1, 33, 33, 24), (0.02, 0.015, 0.025)),
            ((1, 1, 17, 49, 24), (0.01, 0.01, 0.01)),
        ],
    )
    def test_maximal_pad_near_identity_rotation(self, shape, ang):
        rng = np.random.default_rng(0)
        data = rng.random(shape, np.float32)
        m = self._centered(_rot(*ang), shape[2:])
        out_s = resample_fused(data, [m], [None], fill=1.5, mode="linear")
        out_g = _gather(data, [m], [None], fill=1.5, mode="linear")
        np.testing.assert_allclose(
            np.asarray(out_s), np.asarray(out_g), atol=2e-5
        )

    def test_maximal_pad_label_vote(self):
        rng = np.random.default_rng(1)
        lab = rng.integers(0, 5, (1, 1, 33, 33, 24)).astype(np.int32)
        m = self._centered(_rot(0.02, 0.015, 0.025), (33, 33, 24))
        out_s = resample_label_fused(lab, [m], [None], pad_label=0)
        config.use_window_resample = False
        try:
            out_g = resample_label_fused(lab, [m], [None], pad_label=0)
        finally:
            config.use_window_resample = None
        np.testing.assert_array_equal(np.asarray(out_s), np.asarray(out_g))

class TestOutShape:
    """Target-space (out_shape != input shape) through the sheared
    kernel: rotation + resample-to-a-different-grid combos (BASELINE
    config 3) ride the kernel instead of the per-index gather.
    Reference target-space resolution:
    ``/root/reference/src/torchio/transforms/spatial/spatial.py:1392-1501``.
    """

    @pytest.mark.parametrize(
        "in_spatial,out_spatial",
        [
            # downsample, non-tile-multiple target
            ((32, 32, 48), (23, 21, 36)),
            # upsample, target k crosses into the second 128-lane chunk
            # while the input stays single-chunk (Kp_out != Kp_in)
            ((24, 24, 100), (30, 28, 150)),
            # input two-chunk, output single-chunk
            ((20, 20, 200), (16, 18, 60)),
        ],
    )
    def test_matches_gather_path(self, in_spatial, out_spatial):
        rng = np.random.default_rng(20)
        data = rng.random((2, 1) + in_spatial, np.float32)
        ms = []
        for _ in range(2):
            m = _rot(0.1, -0.08, 0.12, scale=0.95)
            m[:3, 3] = rng.uniform(-2, 2, 3)
            ms.append(_center(m, in_spatial))
        cps = [None, rng.uniform(-1.5, 1.5, (3, 3, 3, 3))]
        plan = shear_eligible(data.shape, out_spatial, ms, cps, "linear")
        assert plan is not None and plan.out_spatial == out_spatial
        out = resample_fused(
            data, ms, cps, out_shape=out_spatial, fill=1.25
        )
        ref = _gather(data, ms, cps, out_shape=out_spatial, fill=1.25)
        assert out.shape == (2, 1) + out_spatial
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5
        )

    def test_out_shape_label_vote(self):
        rng = np.random.default_rng(21)
        lab = rng.integers(0, 4, (1, 1, 24, 24, 40)).astype(np.int32)
        m = _center(_rot(0.09, 0.07, -0.05), (24, 24, 40))
        out_spatial = (18, 20, 30)
        out = resample_label_fused(
            lab, [m], [None], out_shape=out_spatial, pad_label=2
        )
        config.use_window_resample = False
        try:
            ref = resample_label_fused(
                lab, [m], [None], out_shape=out_spatial, pad_label=2
            )
        finally:
            config.use_window_resample = None
        assert out.shape == (1, 1) + out_spatial
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_nearest_out_shape(self):
        rng = np.random.default_rng(22)
        data = rng.random((1, 1, 24, 24, 40), np.float32)
        m = _center(_rot(0.08, -0.06, 0.1), (24, 24, 40))
        out_spatial = (30, 26, 50)
        plan = shear_eligible(
            data.shape, out_spatial, [m], [None], "nearest"
        )
        assert plan is not None
        out = shear_resample_fused(
            data, [m], [None], 0.0, plan, mode="nearest", apply_fill=False
        )
        ref = _gather(
            data, [m], [None], out_shape=out_spatial, fill=0.0,
            mode="nearest",
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


class TestDispatchFallbackGuard:
    """A kernel bug must degrade to the gather path with a warning, not
    crash the public transform (round-3 regression: a half-landed
    kernel change made ``tio.Affine`` raise on TPU)."""

    def test_shear_kernel_exception_falls_back(self, monkeypatch):
        import torchio_tpu.ops.shear_resample as sr

        def boom(*a, **k):
            raise TypeError("simulated kernel bug")

        monkeypatch.setattr(sr, "shear_resample_fused", boom)
        rng = np.random.default_rng(30)
        data = rng.random((1, 1, 16, 16, 24), np.float32)
        m = _center(_rot(0.15, 0.1, -0.12), (16, 16, 24))
        with pytest.warns(RuntimeWarning, match="falling back"):
            out = resample_fused(data, [m], [None], fill=0.5)
        ref = _gather(data, [m], [None], fill=0.5)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5
        )

    def test_label_kernel_exception_falls_back(self, monkeypatch):
        import torchio_tpu.ops.shear_resample as sr

        def boom(*a, **k):
            raise ValueError("simulated kernel bug")

        monkeypatch.setattr(sr, "shear_resample_label_fused", boom)
        rng = np.random.default_rng(31)
        lab = rng.integers(0, 4, (1, 1, 16, 16, 24)).astype(np.int32)
        m = _center(_rot(0.12, 0.09, -0.07), (16, 16, 24))
        with pytest.warns(RuntimeWarning, match="falling back"):
            out = resample_label_fused(lab, [m], [None], pad_label=0)
        config.use_window_resample = False
        try:
            ref = resample_label_fused(lab, [m], [None], pad_label=0)
        finally:
            config.use_window_resample = None
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_window_kernel_exception_falls_back(self, monkeypatch):
        import torchio_tpu.ops.window_resample as wr

        def boom(*a, **k):
            raise RuntimeError("simulated kernel bug")

        monkeypatch.setattr(wr, "window_resample_fused", boom)
        rng = np.random.default_rng(32)
        data = rng.random((1, 1, 16, 16, 24), np.float32)
        cps = [rng.uniform(-1.5, 1.5, (3, 3, 3, 3))]
        with pytest.warns(RuntimeWarning, match="falling back"):
            out = resample_fused(data, [np.eye(4)], cps, fill=0.5)
        ref = _gather(data, [np.eye(4)], cps, fill=0.5)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5
        )


class TestHeadlineEligibility:
    def test_ten_consecutive_headline_draws_ride_the_kernel(self):
        """BASELINE north-star draws (+-10 deg, 0.9-1.1 scale, +-5
        translation, 7.5-voxel elastic at 256^3) must ALL produce ok
        plans sharing one static tuple — per-draw fallback made the
        round-3 headline oscillate 0.23 s / 1.0 s per batch."""
        from torchio_tpu.ops.window_resample import reset_static_ratchet

        reset_static_ratchet()
        try:
            rng = np.random.default_rng(0)
            S = 256
            statics = set()
            for _ in range(10):
                ms, cps = [], []
                for _ in range(4):
                    ang = np.deg2rad(rng.uniform(-10, 10, 3))
                    m = _rot(*ang, scale=1.0 / rng.uniform(0.9, 1.1))
                    c = np.full(3, S / 2)
                    m[:3, 3] = c - m[:3, :3] @ c + rng.uniform(-5, 5, 3)
                    ms.append(m)
                    cps.append(rng.uniform(-7.5, 7.5, (7, 7, 7, 3)))
                plan = ShearPlan(ms, cps, (S, S, S))
                assert plan.ok
                statics.add(
                    (plan.maxr, plan.padi_g, plan.padj_g,
                     plan.pad_si, plan.pad_sj)
                )
            assert len(statics) == 1
        finally:
            reset_static_ratchet()


# --- consolidated from test_coverage_edges2.py (round 5) ---
import gzip
import warnings
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torchio_tpu as tio


class TestShearPlanEdges:
    def test_round4(self):
        from torchio_tpu.ops.shear_resample import _round4

        assert _round4(1) == 4
        assert _round4(4) == 4
        assert _round4(5) == 8

    def test_ineligible_mode_and_empty_output(self, rng, monkeypatch):
        monkeypatch.setenv("TORCHIO_TPU_WINDOW_INTERPRET", "1")
        from torchio_tpu.ops.shear_resample import shear_eligible

        mats = [np.eye(4, dtype=np.float64)]
        shape = (1, 1, 32, 32, 32)
        assert (
            shear_eligible(shape, (32, 32, 32), mats, [None], "cubic")
            is None
        )
        assert (
            shear_eligible(shape, (0, 32, 32), mats, [None], "linear")
            is None
        )

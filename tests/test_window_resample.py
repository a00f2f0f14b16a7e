"""Bounded-offset windowed resample kernel (ops/window_resample.py).

Runs the Pallas kernel in interpret mode on the CPU test mesh
(TORCHIO_TPU_WINDOW_INTERPRET) and pins it against the exact gather
path — same corner weights, same fill semantics, only f32 accumulation
order differs. Mirrors the reference's elastic numerics
(``/root/reference/src/torchio/transforms/spatial/spatial.py:2192-2266``).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import torchio_tpu as tio
import torchio_tpu.config as config
from torchio_tpu.ops.resample import resample_fused, resample_label_fused
from torchio_tpu.ops.window_resample import (
    MAX_BOUND,
    window_bounds,
    window_eligible,
)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("TORCHIO_TPU_WINDOW_INTERPRET", "1")
    # the gather comparisons assume exact-f32 corner rows; another test
    # may have left the f16 opt-in enabled
    monkeypatch.setenv("TORCHIO_TPU_GATHER16", "0")
    yield


def _gather_reference(data, matrices, cps, **kw):
    """Run the production dispatch with the window kernel disabled."""
    config.use_window_resample = False
    try:
        return resample_fused(data, matrices, cps, use_f16=False, **kw)
    finally:
        config.use_window_resample = None


def _gather_reference_label(data, matrices, cps, **kw):
    config.use_window_resample = False
    try:
        return resample_label_fused(data, matrices, cps, **kw)
    finally:
        config.use_window_resample = None


class TestKernelEquality:
    def test_matches_gather_path_with_fill(self):
        rng = np.random.default_rng(0)
        b, c, i, j, k = 2, 2, 16, 24, 20
        data = rng.random((b, c, i, j, k), np.float32)
        matrices = [np.eye(4)] * b
        cps = [rng.uniform(-3.0, 3.0, (4, 5, 4, 3)) for _ in range(b)]
        out_w = resample_fused(data, matrices, cps, fill=1.5)
        out_g = _gather_reference(data, matrices, cps, fill=1.5)
        np.testing.assert_allclose(
            np.asarray(out_w), np.asarray(out_g), atol=2e-5
        )

    def test_zero_fill_skips_mask(self):
        rng = np.random.default_rng(1)
        data = rng.random((1, 1, 8, 8, 8), np.float32)
        cps = [rng.uniform(-2.0, 2.0, (3, 3, 3, 3))]
        out_w = resample_fused(data, [np.eye(4)], cps, fill=0.0)
        out_g = _gather_reference(data, [np.eye(4)], cps, fill=0.0)
        np.testing.assert_allclose(
            np.asarray(out_w), np.asarray(out_g), atol=2e-5
        )

    def test_near_identity_affine_plus_elastic(self):
        rng = np.random.default_rng(2)
        data = rng.random((1, 1, 16, 16, 16), np.float32)
        m = np.eye(4)
        m[:3, 3] = [0.75, -1.25, 0.5]  # small translation
        cps = [rng.uniform(-2.0, 2.0, (3, 3, 3, 3))]
        assert window_eligible(
            data.shape, (16, 16, 16), [m], cps, "linear"
        )
        out_w = resample_fused(data, [m], cps, fill=2.0)
        out_g = _gather_reference(data, [m], cps, fill=2.0)
        np.testing.assert_allclose(
            np.asarray(out_w), np.asarray(out_g), atol=2e-5
        )

    def test_per_element_device_fill(self):
        rng = np.random.default_rng(3)
        b, c = 2, 1
        data = rng.random((b, c, 8, 8, 8), np.float32)
        cps = [rng.uniform(-2.5, 2.5, (3, 3, 3, 3)) for _ in range(b)]
        fill = jnp.asarray([[5.0], [9.0]], jnp.float32)
        out_w = resample_fused(data, [np.eye(4)] * b, cps, fill=fill)
        out_g = _gather_reference(data, [np.eye(4)] * b, cps, fill=fill)
        np.testing.assert_allclose(
            np.asarray(out_w), np.asarray(out_g), atol=2e-5
        )

    def test_large_k_displacement_is_fine(self):
        # k offsets don't bound eligibility: the lane-gather is fully
        # per-element along k
        rng = np.random.default_rng(4)
        data = rng.random((1, 1, 8, 8, 32), np.float32)
        cp = np.zeros((3, 3, 3, 3))
        cp[..., 2] = rng.uniform(-20.0, 20.0, (3, 3, 3))
        assert window_eligible(
            data.shape, (8, 8, 32), [np.eye(4)], [cp], "linear"
        )
        out_w = resample_fused(data, [np.eye(4)], [cp], fill=0.5)
        out_g = _gather_reference(data, [np.eye(4)], [cp], fill=0.5)
        np.testing.assert_allclose(
            np.asarray(out_w), np.asarray(out_g), atol=2e-5
        )


class TestLabelMode:
    def test_matches_corner_vote_path(self):
        rng = np.random.default_rng(5)
        lab = rng.integers(0, 5, (2, 1, 16, 16, 12)).astype(np.int32)
        cps = [rng.uniform(-3.0, 3.0, (3, 4, 3, 3)) for _ in range(2)]
        out_w = resample_label_fused(lab, [np.eye(4)] * 2, cps, pad_label=7)
        out_g = _gather_reference_label(
            lab, [np.eye(4)] * 2, cps, pad_label=7
        )
        assert out_w.dtype == lab.dtype
        np.testing.assert_array_equal(np.asarray(out_w), np.asarray(out_g))

    def test_labels_above_2_24_exact(self):
        # int32 labels stay in integer accumulators end to end — an f32
        # round trip would merge values that differ by 1 above 2^24
        rng = np.random.default_rng(9)
        lab = (2**24 + rng.integers(0, 4, (1, 1, 16, 16, 12))).astype(
            np.int32
        )
        cps = [rng.uniform(-2.0, 2.0, (3, 4, 3, 3))]
        out_w = resample_label_fused(lab, [np.eye(4)], cps, pad_label=0)
        out_g = _gather_reference_label(lab, [np.eye(4)], cps, pad_label=0)
        assert out_w.dtype == lab.dtype
        np.testing.assert_array_equal(np.asarray(out_w), np.asarray(out_g))

    def test_exact_half_ties_pick_smallest_label(self):
        # coordinates at exact .5 offsets produce 0.5/0.5 corner ties;
        # both paths must break them identically (smallest label)
        lab = np.arange(8 * 8 * 8).reshape(1, 1, 8, 8, 8).astype(np.int32) % 3
        cp = np.full((2, 2, 2, 3), 0.5)
        out_w = resample_label_fused(lab, [np.eye(4)], [cp], pad_label=0)
        out_g = _gather_reference_label(lab, [np.eye(4)], [cp], pad_label=0)
        np.testing.assert_array_equal(np.asarray(out_w), np.asarray(out_g))


class TestEligibility:
    def test_affine_only_not_eligible(self):
        shape = (1, 1, 16, 16, 16)
        assert (
            window_eligible(shape, (16, 16, 16), [np.eye(4)], [None], "linear")
            is None
        )

    def test_large_rotation_not_eligible(self):
        theta = np.deg2rad(30.0)
        m = np.eye(4)
        m[0, 0] = m[1, 1] = np.cos(theta)
        m[0, 1] = -np.sin(theta)
        m[1, 0] = np.sin(theta)
        shape = (1, 1, 128, 128, 128)
        cp = np.zeros((3, 3, 3, 3))
        assert (
            window_eligible(shape, (128, 128, 128), [m], [cp], "linear")
            is None
        )

    def test_shape_change_not_eligible(self):
        shape = (1, 1, 16, 16, 16)
        cp = np.ones((3, 3, 3, 3))
        assert (
            window_eligible(shape, (16, 16, 8), [np.eye(4)], [cp], "linear")
            is None
        )

    def test_non_multiple_of_8_is_eligible(self):
        # arbitrary in-plane extents: the wrapper tile-aligns the output
        # grid, masks with the true bounds, and crops (clinical volumes
        # are rarely tile multiples)
        shape = (1, 1, 12, 13, 16)
        cp = np.ones((3, 3, 3, 3))
        assert window_eligible(
            shape, (12, 13, 16), [np.eye(4)], [cp], "linear"
        )

    def test_k_over_128_not_eligible(self):
        shape = (1, 1, 16, 16, 130)
        cp = np.ones((3, 3, 3, 3))
        assert (
            window_eligible(shape, (16, 16, 130), [np.eye(4)], [cp], "linear")
            is None
        )

    def test_nearest_mode_eligible_bspline_not(self):
        shape = (1, 1, 16, 16, 16)
        cp = np.ones((3, 3, 3, 3))
        assert window_eligible(
            shape, (16, 16, 16), [np.eye(4)], [cp], "nearest"
        )
        assert (
            window_eligible(shape, (16, 16, 16), [np.eye(4)], [cp], "cubic")
            is None
        )

    def test_config_disable(self):
        shape = (1, 1, 16, 16, 16)
        cp = np.ones((3, 3, 3, 3))
        config.use_window_resample = False
        try:
            assert (
                window_eligible(
                    shape, (16, 16, 16), [np.eye(4)], [cp], "linear"
                )
                is None
            )
        finally:
            config.use_window_resample = None

    def test_bounds_math(self):
        # identity + cp max 3.2 -> ceil + 1 = 5 on both axes
        cp = np.zeros((2, 2, 2, 3))
        cp[..., 0] = 3.2
        cp[..., 1] = -2.1
        assert window_bounds([np.eye(4)], [cp], (16, 16, 16)) == (5, 4)
        # deviation beyond MAX_BOUND -> None
        m = np.eye(4)
        m[0, 3] = MAX_BOUND + 1
        assert window_bounds([m], [None], (16, 16, 16)) is None


class TestEndToEnd:
    def test_elastic_transform_routes_through_window(self, monkeypatch):
        import torchio_tpu.ops.window_resample as wr

        calls = []
        orig = wr.window_resample_fused

        def spy(*a, **k):
            calls.append(1)
            return orig(*a, **k)

        monkeypatch.setattr(wr, "window_resample_fused", spy)
        # the dispatch imports the symbol lazily from the module, so the
        # monkeypatch is visible
        tio.seed(0)
        subject = tio.Subject(
            t1=tio.ScalarImage(
                np.random.default_rng(0).random((1, 16, 16, 16), np.float32)
            )
        )
        elastic = tio.ElasticDeformation(
            max_displacement=3.0, num_control_points=5
        )
        out = elastic(subject)
        assert calls, "elastic did not dispatch to the window kernel"
        assert out.t1.data.shape == (1, 16, 16, 16)

    def test_elastic_window_matches_gather_end_to_end(self):
        rng = np.random.default_rng(7)
        data = rng.random((1, 16, 16, 16), np.float32)
        subject = tio.Subject(t1=tio.ScalarImage(data))
        elastic = tio.ElasticDeformation(
            max_displacement=3.0, num_control_points=5
        )
        tio.seed(123)
        out_w = np.asarray(elastic(subject).t1.data)
        config.use_window_resample = False
        try:
            tio.seed(123)
            out_g = np.asarray(elastic(subject).t1.data)
        finally:
            config.use_window_resample = None
        np.testing.assert_allclose(out_w, out_g, atol=2e-5)


class TestNearestMode:
    def test_matches_gather_nearest(self):
        rng = np.random.default_rng(8)
        b, c = 2, 2
        data = rng.random((b, c, 16, 16, 12), np.float32)
        cps = [rng.uniform(-3.0, 3.0, (3, 4, 3, 3)) for _ in range(b)]
        out_w = resample_fused(
            data, [np.eye(4)] * b, cps, fill=2.5, mode="nearest"
        )
        out_g = _gather_reference(
            data, [np.eye(4)] * b, cps, fill=2.5, mode="nearest"
        )
        np.testing.assert_array_equal(np.asarray(out_w), np.asarray(out_g))

    def test_half_integer_rounding_ties(self):
        # round-half-to-even coordinates: both paths must round the same
        data = np.arange(8 * 8 * 8, dtype=np.float32).reshape(1, 1, 8, 8, 8)
        cp = np.full((2, 2, 2, 3), 0.5)
        out_w = resample_fused(
            data, [np.eye(4)], [cp], fill=0.0, mode="nearest"
        )
        out_g = _gather_reference(
            data, [np.eye(4)], [cp], fill=0.0, mode="nearest"
        )
        np.testing.assert_array_equal(np.asarray(out_w), np.asarray(out_g))


class TestStaticRatchet:
    """Shape statics must not vary with the random parameter draw —
    every distinct (padi, padj) is a distinct pallas executable, and a
    training loop redraws parameters each iteration (measured on v5e:
    recompiles inside the timed loop cost 3.5-22 s/iteration)."""

    def test_draws_in_one_range_share_one_static_tuple(self):
        from torchio_tpu.ops.window_resample import reset_static_ratchet

        reset_static_ratchet()
        try:
            shape = (2, 1, 64, 64, 64)
            rng = np.random.default_rng(0)
            pads = set()
            for _ in range(12):
                cps = [
                    rng.uniform(-6.0, 6.0, (3, 3, 3, 3)) for _ in range(2)
                ]
                pads.add(
                    window_eligible(
                        shape, (64, 64, 64), [np.eye(4)] * 2, cps, "linear"
                    )
                )
            assert len(pads) == 1
        finally:
            reset_static_ratchet()

    def test_marks_are_monotone_and_cover_the_need(self):
        from torchio_tpu.ops.window_resample import reset_static_ratchet

        reset_static_ratchet()
        try:
            shape = (1, 1, 32, 32, 32)
            small = [np.full((2, 2, 2, 3), 1.5)]
            big = [np.full((2, 2, 2, 3), 9.0)]
            eye = [np.eye(4)]
            p1 = window_eligible(shape, (32, 32, 32), eye, small, "linear")
            p2 = window_eligible(shape, (32, 32, 32), eye, big, "linear")
            p3 = window_eligible(shape, (32, 32, 32), eye, small, "linear")
            # a bigger draw raises the marks; a later small draw reuses
            # them (monotone: never shrinks back, never recompiles)
            assert p2[0] >= p1[0] and p2[1] >= p1[1]
            assert p3 == p2
            bi, bj = window_bounds(eye, big, (32, 32, 32))
            assert p2[0] >= bi + 1 and p2[1] >= bj + 1
        finally:
            reset_static_ratchet()


class TestNonAlignedShapes:
    """Arbitrary (non-tile-multiple) in-plane extents: the wrapper
    tile-aligns the output grid, masks with the TRUE bounds, and crops;
    the elastic field replicates its edge coordinates into the
    alignment padding so rows inside the true volume are untouched."""

    @pytest.mark.parametrize(
        "shape", [(2, 1, 13, 19, 11), (1, 2, 21, 8, 17), (1, 1, 9, 9, 9)]
    )
    def test_matches_gather_path(self, shape):
        rng = np.random.default_rng(3)
        b = shape[0]
        data = rng.random(shape, np.float32)
        mats = [np.eye(4) for _ in range(b)]
        cps = [rng.uniform(-2.5, 2.5, (3, 3, 3, 3)) for _ in range(b)]
        out_w = resample_fused(data, mats, cps, fill=1.5, mode="linear")
        out_g = _gather_reference(data, mats, cps, fill=1.5, mode="linear")
        np.testing.assert_allclose(
            np.asarray(out_w), np.asarray(out_g), atol=2e-6
        )

    def test_label_vote_matches_gather_path(self):
        rng = np.random.default_rng(4)
        b, i, j, k = 2, 13, 19, 11
        lab = rng.integers(0, 5, (b, 1, i, j, k)).astype(np.int32)
        mats = [np.eye(4)] * b
        cps = [rng.uniform(-2.5, 2.5, (3, 3, 3, 3)) for _ in range(b)]
        out_w = resample_label_fused(lab, mats, cps, pad_label=0)
        out_g = _gather_reference_label(lab, mats, cps, pad_label=0)
        np.testing.assert_array_equal(np.asarray(out_w), np.asarray(out_g))

    def test_nearest_matches_gather_path(self):
        rng = np.random.default_rng(5)
        data = rng.random((1, 1, 10, 14, 6), np.float32)
        cps = [rng.uniform(-1.5, 1.5, (2, 2, 2, 3))]
        out_w = resample_fused(
            data, [np.eye(4)], cps, fill=0.5, mode="nearest"
        )
        out_g = _gather_reference(
            data, [np.eye(4)], cps, fill=0.5, mode="nearest"
        )
        np.testing.assert_array_equal(np.asarray(out_w), np.asarray(out_g))


class TestCubicMode:
    """Order-3 B-spline windowed kernel vs the ops.bspline oracle."""

    @staticmethod
    def _dense_coords(matrices, cps, out_spatial):
        from torchio_tpu.ops.resample import build_coords, upsample_field

        coords = []
        for m, cp in zip(matrices, cps):
            cc = build_coords(out_spatial, m)
            if cp is not None:
                cc = cc + upsample_field(
                    jnp.asarray(np.asarray(cp), jnp.float32), out_spatial
                )
            coords.append(cc)
        return jnp.stack(coords)

    def _run_pair(self, data, matrices, cps, fill):
        from torchio_tpu.ops.bspline import bspline_resample
        from torchio_tpu.ops.window_resample import (
            cubic_resample_fused,
            cubic_window_eligible,
        )

        spatial = data.shape[2:]
        pads = cubic_window_eligible(
            data.shape, spatial, matrices, cps, data=jnp.asarray(data)
        )
        assert pads is not None
        out = cubic_resample_fused(
            data, matrices, cps, fill, padi=pads[0], padj=pads[1]
        )
        ref = bspline_resample(
            data, self._dense_coords(matrices, cps, spatial), order=3,
            fill=fill,
        )
        return np.asarray(out), np.asarray(ref)

    def test_matches_bspline_oracle_affine_plus_elastic(self):
        rng = np.random.default_rng(0)
        b, c = 2, 2
        data = rng.random((b, c, 16, 24, 20), np.float32)
        ms = []
        for bi in range(b):
            th = 0.03 * (bi + 1)
            m = np.eye(4)
            m[0, 0] = m[1, 1] = np.cos(th)
            m[0, 1] = -np.sin(th)
            m[1, 0] = np.sin(th)
            m[0, 3] = 0.7
            m[2, 3] = -0.4
            ms.append(m)
        cps = [rng.uniform(-2.0, 2.0, (4, 5, 4, 3)), None]
        out, ref = self._run_pair(data, ms, cps, np.float32(0.25))
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_matches_oracle_non_tile_multiple_extents(self):
        rng = np.random.default_rng(1)
        data = rng.random((1, 1, 13, 19, 17), np.float32)
        cps = [rng.uniform(-1.5, 1.5, (3, 4, 3, 3))]
        out, ref = self._run_pair(data, [np.eye(4)], cps, 0.0)
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_identity_reproduces_input(self):
        # interpolating-spline property: prefiltered coefficients
        # reproduce the samples exactly at integer coordinates
        rng = np.random.default_rng(2)
        data = rng.random((1, 1, 12, 16, 14), np.float32)
        out, ref = self._run_pair(data, [np.eye(4)], [None], 0.0)
        np.testing.assert_allclose(out[0, 0], data[0, 0], atol=2e-5)
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_per_element_device_fill(self):
        rng = np.random.default_rng(3)
        b = 2
        data = rng.random((b, 1, 12, 16, 12), np.float32)
        m = np.eye(4)
        m[0, 3] = 4.5  # pushes a band out of bounds
        fill = jnp.asarray(np.array([[1.5], [-2.0]], np.float32))
        out, ref = self._run_pair(data, [m] * b, [None] * b, fill)
        np.testing.assert_allclose(out, ref, atol=2e-5)
        assert np.any(np.isclose(out[0], 1.5))
        assert np.any(np.isclose(out[1], -2.0))

    def test_affine_only_is_eligible(self):
        from torchio_tpu.ops.window_resample import cubic_window_eligible

        # no elastic component: cubic has no faster path to defer to
        shape = (1, 1, 16, 16, 16)
        m = np.eye(4)
        m[0, 3] = 2.0
        assert cubic_window_eligible(shape, (16, 16, 16), [m], [None]) \
            is not None

    def test_large_deviation_not_eligible(self):
        from torchio_tpu.ops.window_resample import cubic_window_eligible

        shape = (1, 1, 64, 64, 64)
        m = np.eye(4)
        m[0, 3] = 30.0
        assert cubic_window_eligible(shape, (64, 64, 64), [m], [None]) is None

    def test_shape_change_and_large_k_not_eligible(self):
        from torchio_tpu.ops.window_resample import cubic_window_eligible

        m = np.eye(4)
        assert cubic_window_eligible(
            (1, 1, 16, 16, 16), (12, 16, 16), [m], [None]
        ) is None
        assert cubic_window_eligible(
            (1, 1, 16, 16, 130), (16, 16, 130), [m], [None]
        ) is None

    def test_spatial_order3_routes_through_cubic_kernel(self, monkeypatch):
        import torchio_tpu.ops.window_resample as wr

        calls = []
        orig = wr.cubic_resample_fused

        def spy(*a, **k):
            calls.append(1)
            return orig(*a, **k)

        monkeypatch.setattr(wr, "cubic_resample_fused", spy)
        tio.seed(0)
        subject = tio.Subject(
            t1=tio.ScalarImage(
                np.random.default_rng(0).random((1, 16, 16, 16), np.float32)
            )
        )
        elastic = tio.ElasticDeformation(
            max_displacement=3.0, num_control_points=5, image_interpolation=3
        )
        out = elastic(subject)
        assert calls, "order-3 elastic did not dispatch to the cubic kernel"
        assert out.t1.data.shape == (1, 16, 16, 16)

    def test_spatial_order3_matches_bspline_path_end_to_end(self):
        rng = np.random.default_rng(7)
        data = rng.random((1, 16, 16, 16), np.float32)
        subject = tio.Subject(t1=tio.ScalarImage(data))
        elastic = tio.ElasticDeformation(
            max_displacement=3.0, num_control_points=5, image_interpolation=3
        )
        tio.seed(123)
        out_k = np.asarray(elastic(subject).t1.data)
        config.use_window_resample = False
        try:
            tio.seed(123)
            out_b = np.asarray(elastic(subject).t1.data)
        finally:
            config.use_window_resample = None
        np.testing.assert_allclose(out_k, out_b, atol=2e-5)

    def test_fallback_guard_degrades_to_bspline(self, monkeypatch):
        import torchio_tpu.ops.window_resample as wr

        def boom(*a, **k):
            raise RuntimeError("injected kernel failure")

        monkeypatch.setattr(wr, "cubic_resample_fused", boom)
        subject = tio.Subject(
            t1=tio.ScalarImage(
                np.random.default_rng(0).random((1, 16, 16, 16), np.float32)
            )
        )
        elastic = tio.ElasticDeformation(
            max_displacement=3.0, num_control_points=5, image_interpolation=3
        )
        with pytest.warns(RuntimeWarning, match="cubic_resample_fused"):
            out = elastic(subject)
        assert out.t1.data.shape == (1, 16, 16, 16)


class TestQuadraticMode:
    """Order-2 B-spline windowed kernel vs the ops.bspline oracle."""

    def test_matches_bspline_oracle(self):
        from torchio_tpu.ops.bspline import bspline_resample
        from torchio_tpu.ops.window_resample import (
            cubic_resample_fused,
            cubic_window_eligible,
        )

        rng = np.random.default_rng(4)
        b = 2
        data = rng.random((b, 1, 14, 18, 16), np.float32)
        m = np.eye(4)
        m[1, 3] = -1.3
        cps = [rng.uniform(-1.5, 1.5, (3, 4, 3, 3)), None]
        spatial = data.shape[2:]
        pads = cubic_window_eligible(
            data.shape, spatial, [m] * b, cps,
            data=jnp.asarray(data), order=2,
        )
        assert pads is not None
        out = cubic_resample_fused(
            data, [m] * b, cps, 0.5, padi=pads[0], padj=pads[1], order=2
        )
        coords = jnp.stack(
            [TestCubicMode._dense_coords([m] * b, cps, spatial)[i] for i in range(b)]
        )
        ref = bspline_resample(data, coords, order=2, fill=0.5)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5
        )

    def test_identity_reproduces_input(self):
        from torchio_tpu.ops.window_resample import cubic_resample_fused

        rng = np.random.default_rng(5)
        data = rng.random((1, 1, 12, 16, 12), np.float32)
        out = cubic_resample_fused(
            data, [np.eye(4)], [None], 0.0, padi=6, padj=8, order=2
        )
        np.testing.assert_allclose(
            np.asarray(out)[0, 0], data[0, 0], atol=2e-5
        )

    def test_order2_transform_routes_through_kernel(self, monkeypatch):
        import torchio_tpu.ops.window_resample as wr

        orders = []
        orig = wr.cubic_resample_fused

        def spy(*a, **k):
            orders.append(k.get("order"))
            return orig(*a, **k)

        monkeypatch.setattr(wr, "cubic_resample_fused", spy)
        tio.seed(0)
        subject = tio.Subject(
            t1=tio.ScalarImage(
                np.random.default_rng(0).random((1, 16, 16, 16), np.float32)
            )
        )
        elastic = tio.ElasticDeformation(
            max_displacement=3.0, num_control_points=5, image_interpolation=2
        )
        elastic(subject)
        assert orders == [2]

    def test_bad_order_raises(self):
        from torchio_tpu.ops.window_resample import cubic_resample_fused

        with pytest.raises(ValueError, match="orders 2-7"):
            cubic_resample_fused(
                np.zeros((1, 1, 8, 8, 8), np.float32),
                [np.eye(4)], [None], 0.0, padi=6, padj=8, order=8,
            )


class TestHighOrderSplineModes:
    """Orders 4-7 in the windowed kernel vs the ops.bspline oracle
    (the reference serves 2-7 via interpol.grid_pull in its hot path,
    /root/reference/src/torchio/transforms/spatial/spatial.py:1746-1761)."""

    def _run_pair(self, data, matrices, cps, fill, order):
        from torchio_tpu.ops.bspline import bspline_resample
        from torchio_tpu.ops.window_resample import (
            cubic_resample_fused,
            cubic_window_eligible,
        )

        spatial = data.shape[2:]
        pads = cubic_window_eligible(
            data.shape, spatial, matrices, cps,
            data=jnp.asarray(data), order=order,
        )
        assert pads is not None
        out = cubic_resample_fused(
            data, matrices, cps, fill,
            padi=pads[0], padj=pads[1], order=order,
        )
        ref = bspline_resample(
            data, TestCubicMode._dense_coords(matrices, cps, spatial),
            order=order, fill=fill,
        )
        return np.asarray(out), np.asarray(ref)

    @pytest.mark.parametrize("order", [4, 5, 6, 7])
    def test_matches_oracle_elastic(self, order):
        rng = np.random.default_rng(10 + order)
        data = rng.random((1, 1, 14, 18, 16), np.float32)
        cps = [rng.uniform(-1.5, 1.5, (3, 4, 3, 3))]
        out, ref = self._run_pair(data, [np.eye(4)], cps, 0.25, order)
        np.testing.assert_allclose(out, ref, atol=5e-5)

    @pytest.mark.parametrize("order", [4, 7])
    def test_matches_oracle_affine_rotation(self, order):
        rng = np.random.default_rng(20 + order)
        data = rng.random((2, 1, 13, 17, 15), np.float32)
        th = 0.05
        m = np.eye(4)
        m[0, 0] = m[1, 1] = np.cos(th)
        m[0, 1] = -np.sin(th)
        m[1, 0] = np.sin(th)
        m[0, 3] = 0.6
        out, ref = self._run_pair(data, [m, np.eye(4)], [None, None], 0.0, order)
        np.testing.assert_allclose(out, ref, atol=5e-5)

    @pytest.mark.parametrize("order", [4, 6])
    def test_identity_reproduces_input(self, order):
        rng = np.random.default_rng(30 + order)
        data = rng.random((1, 1, 12, 14, 12), np.float32)
        out, _ = self._run_pair(data, [np.eye(4)], [None], 0.0, order)
        np.testing.assert_allclose(out[0, 0], data[0, 0], atol=5e-5)

    def test_tiny_axis_not_eligible_for_wide_taps(self):
        from torchio_tpu.ops.window_resample import cubic_window_eligible

        shape = (1, 1, 6, 16, 16)
        assert (
            cubic_window_eligible(
                shape, (6, 16, 16), [np.eye(4)], [None], order=7
            )
            is None
        )

    def test_public_transform_rides_kernel(self, monkeypatch, rng):
        """tio.ElasticDeformation at order 5 dispatches to the windowed
        spline kernel (spied), matching the gather-path output."""
        import torchio_tpu as tio
        import torchio_tpu.ops.window_resample as wr

        calls = []
        orig = wr.cubic_resample_fused

        def spy(*args, **kwargs):
            calls.append(kwargs.get("order"))
            return orig(*args, **kwargs)

        monkeypatch.setattr(wr, "cubic_resample_fused", spy)
        monkeypatch.setattr(
            "torchio_tpu.transforms.spatial.spatial.cubic_resample_fused",
            spy,
            raising=False,
        )
        data = rng.random((1, 20, 20, 20)).astype(np.float32)
        subject = tio.Subject(t1=tio.ScalarImage(jnp.asarray(data)))
        tio.seed(5)
        out = tio.ElasticDeformation(
            max_displacement=2.0, image_interpolation="fifth"
        )(subject)
        assert calls and calls[0] == 5
        assert np.asarray(out.t1.data).shape == (1, 20, 20, 20)


# --- consolidated from test_coverage_edges2.py (round 5) ---
import gzip
import warnings
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torchio_tpu as tio


class TestWindowResampleEdges:
    def test_tpu_dispatch_default_device_scope(self, monkeypatch):
        from torchio_tpu.ops.window_resample import _tpu_dispatch

        # this module's autouse fixture forces interpret mode, which
        # short-circuits _tpu_dispatch — clear it for the probe
        monkeypatch.delenv("TORCHIO_TPU_WINDOW_INTERPRET", raising=False)
        cpu = jax.devices("cpu")[0]
        try:
            jax.config.update("jax_default_device", cpu)
            assert _tpu_dispatch() is False
        finally:
            jax.config.update("jax_default_device", None)

    def test_tpu_dispatch_platform_string_scope(self, monkeypatch):
        from torchio_tpu.ops.window_resample import _tpu_dispatch

        monkeypatch.delenv("TORCHIO_TPU_WINDOW_INTERPRET", raising=False)
        try:
            jax.config.update("jax_default_device", "cpu")
            assert _tpu_dispatch() is False
        finally:
            jax.config.update("jax_default_device", None)

    def test_use_interpret_on_cpu(self, monkeypatch):
        from torchio_tpu.ops.window_resample import _use_interpret

        monkeypatch.delenv("TORCHIO_TPU_WINDOW_INTERPRET", raising=False)
        assert _use_interpret() is True  # tests force the CPU backend

    def test_float_label_vote(self, rng, monkeypatch):
        # float-dtype label volumes ride the jnp.inf sentinel branch
        monkeypatch.setenv("TORCHIO_TPU_WINDOW_INTERPRET", "1")
        from torchio_tpu.ops.window_resample import (
            window_resample_label_fused,
        )

        labels = jnp.asarray(
            rng.integers(0, 3, size=(1, 1, 16, 16, 16)).astype(np.float32)
        )
        mats = [np.eye(4, dtype=np.float64)]
        out = window_resample_label_fused(
            labels, mats, [None], 0.0, padi=6, padj=8
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(labels))

    def test_cubic_bounds_cap_returns_none(self, monkeypatch):
        monkeypatch.setenv("TORCHIO_TPU_WINDOW_INTERPRET", "1")
        from torchio_tpu.ops import window_resample as wr

        # displacement far beyond MAX_BOUND_CUBIC -> planner bails
        big = float(wr.MAX_BOUND_CUBIC) * 2
        cps = [np.full((2, 2, 2, 3), big, np.float64)]
        mats = [np.eye(4, dtype=np.float64)]
        out = wr.cubic_window_eligible(
            (1, 1, 32, 32, 32), (32, 32, 32), mats, cps
        )
        assert out is None


class TestEligibilityEdgeLines:
    def test_tpu_dispatch_backend_fallback(self, monkeypatch):
        from torchio_tpu.ops.window_resample import _tpu_dispatch

        monkeypatch.delenv("TORCHIO_TPU_WINDOW_INTERPRET", raising=False)
        assert jax.config.jax_default_device is None
        # no default-device scope, no data: falls through to the
        # backend probe (cpu here)
        assert _tpu_dispatch() is False

    def test_cubic_eligibility_shape_change_rejected(self, monkeypatch):
        from torchio_tpu.ops.window_resample import cubic_window_eligible

        monkeypatch.setenv("TORCHIO_TPU_WINDOW_INTERPRET", "1")
        eye = [np.eye(4)]
        assert (
            cubic_window_eligible((1, 1, 16, 16, 16), (8, 8, 8), eye, [None])
            is None
        )
        # displacement far past MAX_BOUND_CUBIC
        m = np.eye(4)
        m[0, 3] = 1e5
        assert (
            cubic_window_eligible((1, 1, 16, 16, 16), (16, 16, 16), [m], [None])
            is None
        )


class TestCubicEligibilityMoreLines:
    def test_unsupported_order_rejected(self, monkeypatch):
        from torchio_tpu.ops.window_resample import cubic_window_eligible

        monkeypatch.setenv("TORCHIO_TPU_WINDOW_INTERPRET", "1")
        assert (
            cubic_window_eligible(
                (1, 1, 16, 16, 16), (16, 16, 16), [np.eye(4)], [None],
                order=1,
            )
            is None
        )

    def test_bound_between_linear_and_cubic_caps(self, monkeypatch):
        from torchio_tpu.ops.window_resample import cubic_window_eligible

        monkeypatch.setenv("TORCHIO_TPU_WINDOW_INTERPRET", "1")
        # displacement passes window_bounds (<= MAX_BOUND = 24) but
        # 3*dev + reach exceeds MAX_BOUND_CUBIC = 32
        m = np.eye(4)
        m[0, 3] = 12.0
        assert (
            cubic_window_eligible(
                (1, 1, 64, 64, 64), (64, 64, 64), [m], [None], order=3
            )
            is None
        )

"""Tests for the MRI-physics intensity transforms."""

import numpy as np
import pytest

import torchio_tpu as tio


@pytest.fixture
def subject(rng):
    return tio.Subject(
        t1=tio.ScalarImage(
            rng.normal(size=(1, 12, 12, 12)).astype(np.float32),
            affine=np.diag([2.0, 2.0, 2.0, 1.0]),
        ),
        seg=tio.LabelMap(rng.integers(0, 3, size=(1, 12, 12, 12)).astype(np.int32)),
    )


class TestBlur:
    def test_reduces_variance(self, subject):
        out = tio.Blur(std=4.0)(subject)
        assert np.asarray(out.t1.data).std() < 0.6 * np.asarray(subject.t1.data).std()

    def test_spacing_conversion(self, rng):
        # same mm sigma on 2mm-spacing image blurs half as much (in voxels)
        data = rng.normal(size=(1, 16, 16, 16)).astype(np.float32)
        fine = tio.Subject(t1=tio.ScalarImage(data))
        coarse = tio.Subject(t1=tio.ScalarImage(data, affine=np.diag([2.0, 2, 2, 1])))
        out_fine = tio.Blur(std=2.0)(fine)
        out_coarse = tio.Blur(std=2.0)(coarse)
        assert (
            np.asarray(out_fine.t1.data).std()
            < np.asarray(out_coarse.t1.data).std()
        )

    def test_labels_untouched(self, subject):
        out = tio.Blur(std=2.0)(subject)
        np.testing.assert_array_equal(
            np.asarray(out.seg.data), np.asarray(subject.seg.data)
        )

    def test_zero_std_noop(self, subject):
        with pytest.warns(RuntimeWarning):
            t = tio.Blur()
        out = t(subject)
        np.testing.assert_array_equal(
            np.asarray(out.t1.data), np.asarray(subject.t1.data)
        )


class TestBiasField:
    def test_positive_field(self, rng):
        x = np.ones((1, 16, 16, 16), np.float32)
        out = tio.BiasField(std=0.5)(x)
        assert (out > 0).all()
        assert out.std() > 0.01

    def test_inverse_exact_field(self, subject):
        out = tio.BiasField(std=0.8)(subject)
        back = out.apply_inverse_transform()
        np.testing.assert_allclose(
            np.asarray(back.t1.data), np.asarray(subject.t1.data), rtol=1e-4, atol=1e-5
        )

    def test_seed_recorded(self, subject):
        out = tio.BiasField(std=0.5)(subject)
        assert "seed" in out.applied_transforms[-1].params

    def test_per_instance_inverse(self, make_batch):
        tio.seed(4)
        batch = make_batch(3)
        out = tio.BiasField(std=(0.3, 0.8))(batch)
        for i, sub in enumerate(out.unbatch()):
            back = sub.apply_inverse_transform()
            orig = make_batch(3).unbatch()[i]
            np.testing.assert_allclose(
                np.asarray(back.t1.data),
                np.asarray(orig.t1.data),
                rtol=1e-4,
                atol=1e-5,
            )


class TestKSpace:
    def test_motion_changes_data(self, subject):
        tio.seed(0)
        out = tio.Motion(degrees=10, translation=5)(subject)
        assert not np.allclose(np.asarray(out.t1.data), np.asarray(subject.t1.data))
        assert np.asarray(out.t1.data).shape == (1, 12, 12, 12)

    def test_ghosting(self, subject):
        out = tio.Ghosting(intensity=1.0, num_ghosts=4)(subject)
        assert not np.allclose(np.asarray(out.t1.data), np.asarray(subject.t1.data))

    def test_ghosting_zero_intensity_noop(self, subject):
        with pytest.warns(RuntimeWarning):
            t = tio.Ghosting()
        out = t(subject)
        np.testing.assert_array_equal(
            np.asarray(out.t1.data), np.asarray(subject.t1.data)
        )

    def test_ghosting_restore_center(self, rng):
        x = rng.normal(size=(1, 16, 16, 16)).astype(np.float32)
        strong = tio.Ghosting(intensity=1.0, num_ghosts=2, axes=(0,), restore=0.9)(x)
        weak = tio.Ghosting(intensity=1.0, num_ghosts=2, axes=(0,), restore=None)(x)
        # restoring most of k-space keeps the image closer to the input
        assert np.abs(strong - x).mean() < np.abs(weak - x).mean()

    def test_spike(self, subject):
        out = tio.Spike(intensity=2.0)(subject)
        assert not np.allclose(np.asarray(out.t1.data), np.asarray(subject.t1.data))

    def test_mean_preserved_by_ghosting(self, rng):
        # DC line is restored via the attenuation pattern hitting only
        # periodic lines; with restore, center is explicitly kept
        x = rng.normal(size=(1, 16, 16, 16)).astype(np.float32) + 10
        out = tio.Ghosting(intensity=0.5, num_ghosts=4, restore=0.1)(x)
        np.testing.assert_allclose(out.mean(), x.mean(), rtol=0.05)


class TestSwap:
    def test_content_preserved(self, rng):
        x = rng.normal(size=(1, 16, 16, 16)).astype(np.float32)
        out = tio.Swap(patch_size=4, num_iterations=5)(x)
        assert not np.allclose(out, x)
        # swapping preserves the multiset of values
        np.testing.assert_allclose(np.sort(out.ravel()), np.sort(x.ravel()), rtol=1e-6)

    def test_label_warning(self, subject):
        with pytest.warns(UserWarning):
            tio.Swap(patch_size=4, num_iterations=2)(subject)

    def test_patch_too_large(self, rng):
        x = rng.normal(size=(1, 8, 8, 8)).astype(np.float32)
        with pytest.raises(ValueError):
            tio.Swap(patch_size=10, num_iterations=1)(x)


class TestHistogramStandardization:
    def test_landmark_training_and_apply(self, rng):
        images = [
            tio.ScalarImage(rng.normal(loc=i, size=(1, 12, 12, 12)).astype(np.float32))
            for i in range(3)
        ]
        landmarks = tio.compute_histogram_landmarks(images)
        assert landmarks.ndim == 1
        assert len(landmarks) == 13
        t = tio.HistogramStandardization(landmarks)
        out = t(images[0])
        data = np.asarray(out.data)
        # output is mapped into the standard range neighborhood
        assert -50 < data.mean() < 150

    def test_monotonic(self, rng):
        images = [tio.ScalarImage(rng.normal(size=(1, 10, 10, 10)).astype(np.float32))]
        landmarks = tio.compute_histogram_landmarks(images)
        x = rng.normal(size=(1, 10, 10, 10)).astype(np.float32)
        out = tio.HistogramStandardization(landmarks)(x)
        order_in = np.argsort(x.ravel())
        sorted_out = out.ravel()[order_in]
        assert (np.diff(sorted_out) >= -1e-3).all()


class TestLabelsToImage:
    def test_generates_image(self, subject):
        out = tio.LabelsToImage(label_key="seg")(subject)
        assert "image_from_labels" in out.images
        img = out.image_from_labels
        assert isinstance(img, tio.ScalarImage)
        assert img.spatial_shape == (12, 12, 12)

    def test_background_zero(self, rng):
        seg = np.zeros((1, 8, 8, 8), np.int32)
        seg[0, 2:6, 2:6, 2:6] = 1
        sub = tio.Subject(seg=tio.LabelMap(seg))
        out = tio.LabelsToImage(
            mean=[(0.9, 1.0)], std=[(0.0, 0.001)], ignore_background=True
        )(sub)
        gen = np.asarray(out.image_from_labels.data)
        assert np.abs(gen[0, 0, 0, 0]) < 1e-6  # background stays 0
        assert gen[0, 4, 4, 4] > 0.5


class TestAnisotropy:
    def test_degrades(self, rng):
        x = rng.normal(size=(1, 16, 16, 16)).astype(np.float32)
        out = tio.Anisotropy(axes=(0,), downsampling=4.0)(x)
        assert out.shape == x.shape
        assert not np.allclose(out, x)
        # heavy downsampling along axis 0 makes neighbors more similar
        assert np.abs(np.diff(out, axis=1)).mean() < np.abs(np.diff(x, axis=1)).mean()

    def test_labels_nearest(self, subject):
        out = tio.Anisotropy(axes=(0,), downsampling=3.0)(subject)
        seg = np.asarray(out.seg.data)
        assert set(np.unique(seg)) <= set(np.unique(np.asarray(subject.seg.data)))

    def test_noop_factor(self, rng):
        x = rng.normal(size=(1, 8, 8, 8)).astype(np.float32)
        with pytest.warns(RuntimeWarning):
            t = tio.Anisotropy()
        out = t(x)
        np.testing.assert_array_equal(out, x)


class TestMaskPCA:
    def test_mask_label_key(self, subject):
        out = tio.Mask(masking_method="seg")(subject)
        t1 = np.asarray(out.t1.data)
        seg = np.asarray(subject.seg.data).astype(bool)
        assert (t1[~seg] == 0).all()

    def test_mask_labels_subset(self, subject):
        out = tio.Mask(masking_method="seg", labels=[2], outside_value=-1.0)(subject)
        t1 = np.asarray(out.t1.data)
        seg = np.asarray(subject.seg.data)
        assert (t1[seg != 2] == -1.0).all()

    def test_mask_callable(self, rng):
        x = rng.normal(size=(1, 8, 8, 8)).astype(np.float32)
        sub = tio.Subject(t1=tio.ScalarImage(x))
        out = tio.Mask(masking_method=lambda t: t > 0)(sub)
        res = np.asarray(out.t1.data)
        assert (res[x <= 0] == 0).all()

    def test_pca_channels(self, rng):
        x = rng.normal(size=(8, 6, 6, 6)).astype(np.float32)
        out = tio.PCA(num_components=3)(x)
        assert out.shape == (3, 6, 6, 6)
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_pca_too_few_channels(self, rng):
        x = rng.normal(size=(2, 4, 4, 4)).astype(np.float32)
        with pytest.raises(ValueError):
            tio.PCA(num_components=3)(x)


class TestHistogramLandmarkLoading:
    """Landmark sources: arrays and .npy / .pt files (reference
    histogram_standardization.py:237-245)."""

    def _landmarks(self, rng):
        images = [rng.random((1, 8, 8, 8)).astype(np.float32) for _ in range(3)]
        return tio.compute_histogram_landmarks(images)

    def test_load_from_npy(self, tmp_path, rng):
        lm = self._landmarks(rng)
        path = tmp_path / "lm.npy"
        np.save(path, lm)
        t = tio.HistogramStandardization(path)
        np.testing.assert_allclose(t.landmarks, lm, rtol=1e-6)

    def test_load_from_pt(self, tmp_path, rng):
        import torch

        lm = self._landmarks(rng)
        path = tmp_path / "lm.pt"
        torch.save(torch.as_tensor(lm), path)
        t = tio.HistogramStandardization(str(path))
        np.testing.assert_allclose(t.landmarks, lm, rtol=1e-6)

    def test_pt_with_wrong_type_raises(self, tmp_path):
        import torch

        path = tmp_path / "bad.pt"
        torch.save({"not": "a tensor"}, path)
        with pytest.raises((TypeError, Exception)):
            tio.HistogramStandardization(path)

    def test_unsupported_format_raises(self, tmp_path):
        path = tmp_path / "lm.csv"
        path.write_text("1,2,3")
        with pytest.raises(ValueError, match="Unsupported"):
            tio.HistogramStandardization(path)

    def test_landmark_count_mismatch_raises(self, rng):
        t = tio.HistogramStandardization(np.linspace(0, 100, 7, dtype=np.float32))
        x = rng.random((1, 8, 8, 8)).astype(np.float32)
        with pytest.raises(ValueError, match="landmarks"):
            t(x)

    def test_leaves_labels_unchanged(self, rng):
        lm = self._landmarks(rng)
        subject = tio.Subject(
            t1=tio.ScalarImage(rng.random((1, 8, 8, 8)).astype(np.float32)),
            seg=tio.LabelMap(np.ones((1, 8, 8, 8), np.uint8)),
        )
        out = tio.HistogramStandardization(lm)(subject)
        np.testing.assert_array_equal(np.asarray(out.seg.data), 1)


def test_blur_per_element_honors_truncate(rng):
    """truncate must change the per-element kernel support (review
    finding: it was silently ignored)."""
    import jax.numpy as jnp

    from torchio_tpu.ops.gaussian import gaussian_blur_per_element

    data = jnp.asarray(rng.normal(size=(1, 1, 1, 32, 1)).astype(np.float32))
    sig = np.array([[0.0, 2.0, 0.0]])
    out3 = np.asarray(gaussian_blur_per_element(data, sig, truncate=3.0))
    out5 = np.asarray(gaussian_blur_per_element(data, sig, truncate=5.0))
    assert np.abs(out3 - out5).max() > 0  # wider support -> different taps


# --- consolidated from test_coverage_edges.py (round 5) ---
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torchio_tpu as tio
from torchio_tpu.data.batch import SubjectsBatch

def _batch_edge(rng, names=("t1",), shape=(6, 6, 6), value=None):
    kwargs = {}
    for name in names:
        if value is None:
            data = rng.random((1, *shape)).astype(np.float32)
        else:
            data = np.full((1, *shape), value, np.float32)
        cls = tio.LabelMap if name.startswith("seg") else tio.ScalarImage
        kwargs[name] = cls(jnp.asarray(data))
    return SubjectsBatch.from_subjects([tio.Subject(**kwargs)])


class TestNormalizeEdges:
    def test_replayed_host_bounds(self, rng):
        """History replay delivers plain (low, high) tuples — the
        non-deferred apply branch."""
        batch = _batch_edge(rng)
        t = tio.RescaleIntensity(out_min=0.0, out_max=1.0)
        params = {
            "out_min": 0.0,
            "out_max": 1.0,
            "in_ranges": {"t1": (0.25, 0.75)},
        }
        out = t.apply_transform(batch, params)
        data = np.asarray(out.images["t1"].data)
        assert data.min() >= 0.0 and data.max() <= 1.0

    def test_replayed_zero_range_warns_and_noops(self, rng):
        batch = _batch_edge(rng)
        before = np.asarray(batch.images["t1"].data)
        t = tio.RescaleIntensity(out_min=0.0, out_max=1.0)
        params = {"out_min": 0.0, "out_max": 1.0, "in_ranges": {"t1": (3.0, 3.0)}}
        with pytest.warns(RuntimeWarning, match="input range is zero"):
            out = t.apply_transform(batch, params)
        np.testing.assert_array_equal(np.asarray(out.images["t1"].data), before)

    def test_missing_image_in_ranges_skipped(self, rng):
        batch = _batch_edge(rng)
        before = np.asarray(batch.images["t1"].data)
        t = tio.RescaleIntensity(out_min=0.0, out_max=1.0)
        params = {"out_min": 0.0, "out_max": 1.0, "in_ranges": {"other": (0, 1)}}
        out = t.apply_transform(batch, params)
        np.testing.assert_array_equal(np.asarray(out.images["t1"].data), before)

    def test_masking_method_unknown_key(self, rng):
        batch = _batch_edge(rng)
        with pytest.raises(KeyError, match="not found in batch"):
            tio.RescaleIntensity(masking_method="nope")(batch)

    def test_masking_method_not_labelmap(self, rng):
        batch = _batch_edge(rng, names=("t1", "other"))
        with pytest.raises(TypeError, match="must refer to a LabelMap"):
            tio.RescaleIntensity(masking_method="other")(batch)

    def test_masking_method_bad_type(self, rng):
        batch = _batch_edge(rng)
        with pytest.raises(TypeError, match="masking_method must be"):
            tio.RescaleIntensity(masking_method=42)(batch)

    def test_empty_mask_warns_full_range(self, rng):
        batch = _batch_edge(rng, names=("t1", "seg"))
        batch.images["seg"].data = jnp.zeros_like(batch.images["seg"].data)
        with pytest.warns(RuntimeWarning, match="mask is empty"):
            out = tio.RescaleIntensity(
                out_min=0.0, out_max=1.0, masking_method="seg"
            )(batch)
        data = np.asarray(out.images["t1"].data)
        np.testing.assert_allclose(data.min(), 0.0, atol=1e-6)
        np.testing.assert_allclose(data.max(), 1.0, atol=1e-6)

    def test_masked_minmax_pair(self, rng):
        """(0, 100) percentiles inside a mask: the min/max short-circuit."""
        base = rng.random((1, 6, 6, 6)).astype(np.float32)
        seg = (base > 0.5).astype(np.int32)
        batch = SubjectsBatch.from_subjects(
            [
                tio.Subject(
                    t1=tio.ScalarImage(jnp.asarray(base)),
                    seg=tio.LabelMap(jnp.asarray(seg)),
                )
            ]
        )
        out = tio.RescaleIntensity(
            out_min=0.0, out_max=1.0, masking_method="seg"
        )(batch)
        (trace,) = out.applied_transforms
        low, high = trace.params["in_ranges"]["t1"]
        np.testing.assert_allclose(low, base[seg.astype(bool)].min(), rtol=1e-6)
        np.testing.assert_allclose(high, base[seg.astype(bool)].max(), rtol=1e-6)

    def test_masked_percentiles(self, rng):
        base = rng.random((1, 8, 8, 8)).astype(np.float32)
        seg = np.ones_like(base, np.int32)
        batch = SubjectsBatch.from_subjects(
            [
                tio.Subject(
                    t1=tio.ScalarImage(jnp.asarray(base)),
                    seg=tio.LabelMap(jnp.asarray(seg)),
                )
            ]
        )
        out = tio.RescaleIntensity(
            out_min=0.0,
            out_max=1.0,
            percentile_low=5.0,
            percentile_high=95.0,
            masking_method="seg",
        )(batch)
        (trace,) = out.applied_transforms
        low, high = trace.params["in_ranges"]["t1"]
        np.testing.assert_allclose(low, np.quantile(base, 0.05), atol=1e-4)
        np.testing.assert_allclose(high, np.quantile(base, 0.95), atol=1e-4)

    def test_inverse_branches(self, rng):
        from torchio_tpu.transforms.intensity.normalize import _RescaleInverse

        batch = _batch_edge(rng)
        before = np.asarray(batch.images["t1"].data)
        # explicit in_min/in_max branch
        inv = _RescaleInverse(
            out_min=0.0, out_max=1.0, in_min=0.0, in_max=2.0, in_ranges=None
        )
        out = inv.apply_transform(batch, {})
        np.testing.assert_allclose(
            np.asarray(out.images["t1"].data), before * 2.0, rtol=1e-6
        )
        # zero in_range -> no-op
        batch2 = _batch_edge(rng)
        before2 = np.asarray(batch2.images["t1"].data)
        inv_zero = _RescaleInverse(
            out_min=0.0, out_max=1.0, in_min=1.0, in_max=1.0, in_ranges=None
        )
        out2 = inv_zero.apply_transform(batch2, {})
        np.testing.assert_array_equal(np.asarray(out2.images["t1"].data), before2)
        # image missing from in_ranges -> no-op
        batch3 = _batch_edge(rng)
        before3 = np.asarray(batch3.images["t1"].data)
        inv_missing = _RescaleInverse(
            out_min=0.0, out_max=1.0, in_min=None, in_max=None,
            in_ranges={"other": (0.0, 1.0)},
        )
        out3 = inv_missing.apply_transform(batch3, {})
        np.testing.assert_array_equal(np.asarray(out3.images["t1"].data), before3)
        # randomized (per-element array) out range with a zero entry
        inv_arr = _RescaleInverse(
            out_min=[0.0], out_max=[0.0], in_min=0.0, in_max=2.0, in_ranges=None
        )
        batch4 = _batch_edge(rng)
        before4 = np.asarray(batch4.images["t1"].data)
        out4 = inv_arr.apply_transform(batch4, {})
        np.testing.assert_array_equal(np.asarray(out4.images["t1"].data), before4)

class TestStandardizeEdges:
    def test_empty_mask_raises(self, rng):
        batch = _batch_edge(rng, names=("t1", "seg"))
        batch.images["seg"].data = jnp.zeros_like(batch.images["seg"].data)
        with pytest.raises(RuntimeError, match="mask.*is empty"):
            tio.Standardize(masking_method="seg")(batch)

    def test_replayed_host_stats(self, rng):
        batch = _batch_edge(rng)
        t = tio.Standardize()
        out = t.apply_transform(batch, {"stats": {"t1": (0.5, 2.0)}})
        assert np.isfinite(np.asarray(out.images["t1"].data)).all()

    def test_stats_missing_image_skipped(self, rng):
        batch = _batch_edge(rng)
        before = np.asarray(batch.images["t1"].data)
        out = tio.Standardize().apply_transform(batch, {"stats": {}})
        np.testing.assert_array_equal(np.asarray(out.images["t1"].data), before)

    def test_inverse_missing_image_skipped(self, rng):
        from torchio_tpu.transforms.intensity.standardize import (
            _StandardizeInverse,
        )

        batch = _batch_edge(rng)
        before = np.asarray(batch.images["t1"].data)
        out = _StandardizeInverse(stats={"other": (0.0, 1.0)}).apply_transform(
            batch, {}
        )
        np.testing.assert_array_equal(np.asarray(out.images["t1"].data), before)

class TestLabelsToImageEdges:
    def test_label_key_not_found(self, rng):
        batch = _batch_edge(rng, names=("t1", "seg"))
        with pytest.raises(KeyError, match="not found"):
            tio.LabelsToImage(label_key="missing")(batch)

    def test_no_labelmap_raises(self, rng):
        batch = _batch_edge(rng)
        with pytest.raises(KeyError, match="No LabelMap"):
            tio.LabelsToImage()(batch)

    def test_per_instance_params(self, rng):
        seg = rng.integers(0, 3, (1, 6, 6, 6)).astype(np.int32)
        subjects = [
            tio.Subject(seg=tio.LabelMap(jnp.asarray(seg))) for _ in range(2)
        ]
        batch = SubjectsBatch.from_subjects(subjects)
        tio.seed(5)
        out = tio.LabelsToImage(per_instance=True)(batch)
        (trace,) = out.applied_transforms
        assert trace.params["_batched_keys"] == ["means", "stds"]
        assert len(trace.params["means"]) == 2


# --- consolidated from test_coverage_edges2.py (round 5) ---
import gzip
import warnings
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torchio_tpu as tio


class TestGaussianEdges:
    def test_sharded_axes_under_trace_is_false(self, rng):
        from torchio_tpu.ops.gaussian import sharded_spatial_axes

        seen = []

        @jax.jit
        def f(x):
            seen.append(sharded_spatial_axes(x))
            return x

        f(jnp.zeros((1, 1, 2, 2, 2), jnp.float32))
        assert seen[0] == (False, False, False)

    def test_sharding_probe_exception_is_false(self):
        from torchio_tpu.ops.gaussian import sharded_spatial_axes

        class Weird:
            ndim = 5

            @property
            def sharding(self):
                raise RuntimeError("no sharding")

        assert sharded_spatial_axes(Weird()) == (False, False, False)

    def test_unbatched_input_promotes(self, rng):
        from torchio_tpu.ops.gaussian import gaussian_blur

        vol = jnp.asarray(rng.normal(size=(1, 8, 8, 8)).astype(np.float32))
        out = gaussian_blur(vol, (1.0, 1.0, 1.0))
        assert out.shape == vol.shape

    def test_tap_axis_path(self, rng):
        # per-element blur with one sharded axis rides the tap form
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from torchio_tpu.ops.gaussian import gaussian_blur_per_element

        devs = np.array(jax.devices()[:2]).reshape(2)
        mesh = Mesh(devs, ("space",))
        data = jnp.asarray(rng.normal(size=(2, 1, 8, 8, 8)).astype(np.float32))
        sharded = jax.device_put(
            data, NamedSharding(mesh, P(None, None, None, "space", None))
        )
        sigmas = np.full((2, 3), 1.0, np.float32)
        out = gaussian_blur_per_element(sharded, sigmas)
        ref = gaussian_blur_per_element(data, sigmas)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
        )


# --- consolidated from test_coverage_edges3.py (round 5) ---
import warnings
import numpy as np
import pytest
import torchio_tpu as tio
from torchio_tpu.data import LabelMap, ScalarImage, Subject
from torchio_tpu.data.batch import SubjectsBatch

def _subject_edge3(rng, shape=(1, 6, 7, 8), with_label=False):
    kwargs = {"t1": ScalarImage(rng.normal(size=shape).astype(np.float32))}
    if with_label:
        kwargs["seg"] = LabelMap(
            rng.integers(0, 3, size=shape).astype(np.int32)
        )
    return Subject(**kwargs)


class TestIntensityEdges:
    def test_bias_field_std_zero_identity(self, make_batch):
        batch = make_batch(batch_size=2)
        before = np.asarray(batch.images["t1"].data).copy()
        out = tio.BiasField(std=0.0, p=1.0)(batch)
        np.testing.assert_array_equal(
            np.asarray(out.images["t1"].data), before
        )

    def test_bias_field_per_element_all_zero_std(self, make_batch):
        batch = make_batch(batch_size=2)
        before = np.asarray(batch.images["t1"].data).copy()
        tr = tio.BiasField(std=0.0, p=1.0, per_instance=True)
        out = tr(batch)
        np.testing.assert_array_equal(
            np.asarray(out.images["t1"].data), before
        )

    def test_bias_field_scale_validation(self):
        with pytest.raises(ValueError, match="scale"):
            tio.BiasField(scale=0.0)

    def test_blur_zero_sigma_identity(self, make_batch):
        batch = make_batch(batch_size=2)
        before = np.asarray(batch.images["t1"].data).copy()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            out = tio.Blur(std=0.0, p=1.0)(batch)
        np.testing.assert_array_equal(
            np.asarray(out.images["t1"].data), before
        )

    def test_clamp_min_gt_max_raises(self):
        with pytest.raises(ValueError, match="out_min"):
            tio.Clamp(out_min=2.0, out_max=1.0)

    def test_gamma_per_element_inverse(self, make_batch):
        batch = make_batch(batch_size=3)
        before = np.abs(np.asarray(batch.images["t1"].data)) + 0.5
        batch.images["t1"].data = before
        tr = tio.Gamma(log_gamma=(-0.4, 0.4), per_instance=True, p=1.0)
        out = tr(batch)
        restored = out.apply_inverse_transform()
        np.testing.assert_allclose(
            np.asarray(restored.images["t1"].data), before,
            rtol=1e-4, atol=1e-5,
        )

    def test_histogram_landmark_edges(self, rng):
        from torchio_tpu.transforms.intensity.histogram_standardization import (
            compute_histogram_landmarks,
        )

        imgs = [
            ScalarImage(rng.normal(size=(1, 8, 8, 8)).astype(np.float32))
            for _ in range(2)
        ]
        # custom quantiles (deduped + sorted), with a masking callable
        lm = compute_histogram_landmarks(
            imgs,
            quantiles=(0.9, 0.1, 0.5, 0.5),
            masking_method=lambda t: t > 0,
        )
        assert lm.ndim == 1
        with pytest.raises(ValueError, match="at least 2"):
            compute_histogram_landmarks(imgs, quantiles=(0.5,))
        with pytest.raises(ValueError, match=r"in \[0, 1\]"):
            compute_histogram_landmarks(imgs, quantiles=(0.1, 1.5))

    def test_motion_validation_and_tiny_volume(self, rng):
        with pytest.raises(ValueError, match="num_transforms"):
            tio.Motion(num_transforms=0)
        img = ScalarImage(rng.normal(size=(1, 2, 8, 8)).astype(np.float32))
        with pytest.raises(ValueError, match="motion segments"):
            tio.Motion(num_transforms=5, p=1.0)(Subject(t1=img))

    def test_normalize_zero_ranges_skip(self, rng):
        data = np.full((1, 4, 4, 4), 3.0, np.float32)  # constant input
        subject = Subject(t1=ScalarImage(data))
        out = tio.RescaleIntensity(out_min=0.0, out_max=1.0, p=1.0)(subject)
        # constant image: in_range == 0 -> skipped, unchanged
        np.testing.assert_array_equal(np.asarray(out.t1.data), data)

    def test_rescale_inverse_zero_out_range(self, rng):
        subject = _subject_edge3(rng)
        tr = tio.RescaleIntensity(out_min=1.0, out_max=1.0, p=1.0)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            out = tr(subject)
        restored = out.apply_inverse_transform(warn=False)
        assert restored.t1.data.shape == subject.t1.data.shape

    def test_pca_validation(self):
        with pytest.raises(ValueError, match="num_components"):
            tio.PCA(num_components=0)

    def test_swap_per_element_gating(self, make_batch, monkeypatch):
        batch = make_batch(batch_size=3, shape=(1, 12, 12, 12))
        tr = tio.Swap(
            patch_size=3, num_iterations=2, p=0.5, per_instance=True
        )
        # run until the keep mask actually gates someone out AND someone in
        for seed in range(20):
            tio.seed(seed)
            fresh = make_batch(batch_size=3, shape=(1, 12, 12, 12))
            out = tr(fresh)
            if not out.applied_transforms:
                continue
            keep = out.applied_transforms[-1].params.get("_keep")
            if keep is not None and any(keep) and not all(keep):
                break
        assert out is not None


class TestNormalizeIntegerZeroRange:
    def test_constant_int_image_noops_with_warning(self):
        import torchio_tpu as tio
        from torchio_tpu.data.batch import SubjectsBatch

        subjects = [
            tio.Subject(
                t1=tio.ScalarImage(np.full((1, 4, 4, 4), 7, np.int32))
            )
            for _ in range(2)
        ]
        batch = SubjectsBatch.from_subjects(subjects)
        import jax.numpy as jnp

        for ib in batch.images.values():
            ib.data = jnp.asarray(ib.data)
        with pytest.warns(RuntimeWarning, match="input range is zero"):
            out = tio.RescaleIntensity(out_min=0.0, out_max=1.0, copy=False)(
                batch
            )
        result = np.asarray(out.images["t1"].data)
        assert result.dtype == np.int32
        np.testing.assert_array_equal(result, 7)

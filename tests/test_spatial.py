"""Geometry correctness for the unified Spatial transform."""

import numpy as np
import pytest
from scipy import ndimage

import torchio_tpu as tio


def smooth_volume(rng, shape):
    """Band-limited volume: interpolation roundtrips are accurate on it
    (white noise is destroyed by any interpolation, by design)."""
    raw = rng.normal(size=shape).astype(np.float32)
    return ndimage.gaussian_filter(raw, sigma=(0, 2, 2, 2)).astype(np.float32)


@pytest.fixture
def subject(rng):
    data = rng.normal(size=(1, 9, 9, 9)).astype(np.float32)
    seg = rng.integers(0, 4, size=(1, 9, 9, 9)).astype(np.int32)
    return tio.Subject(
        t1=tio.ScalarImage(data),
        seg=tio.LabelMap(seg),
    )


def test_identity_is_noop(subject):
    out = tio.Spatial()(subject)
    np.testing.assert_array_equal(np.asarray(out.t1.data), np.asarray(subject.t1.data))


def test_translation_one_voxel(rng):
    data = rng.normal(size=(1, 9, 9, 9)).astype(np.float32)
    sub = tio.Subject(t1=tio.ScalarImage(data))
    out = tio.Affine(translation=(1.0, 0.0, 0.0))(sub)
    result = np.asarray(out.t1.data)
    # content moves +1 voxel along i; compare interior
    np.testing.assert_allclose(result[0, 1:], data[0, :-1], rtol=1e-4, atol=1e-4)


def test_translation_respects_spacing(rng):
    data = rng.normal(size=(1, 9, 9, 9)).astype(np.float32)
    sub = tio.Subject(t1=tio.ScalarImage(data, affine=np.diag([2.0, 2, 2, 1])))
    out = tio.Affine(translation=(2.0, 0.0, 0.0))(sub)  # 2mm == 1 voxel
    result = np.asarray(out.t1.data)
    np.testing.assert_allclose(result[0, 1:], data[0, :-1], rtol=1e-4, atol=1e-4)


def test_rotation_90_matches_rot90(rng):
    data = rng.normal(size=(1, 9, 9, 9)).astype(np.float32)
    sub = tio.Subject(t1=tio.ScalarImage(data))
    out = tio.Affine(degrees=(0.0, 0.0, 90.0))(sub)
    expected = np.rot90(data[0], k=1, axes=(0, 1))
    np.testing.assert_allclose(np.asarray(out.t1.data)[0], expected, rtol=1e-3, atol=1e-3)


def test_scale_zoom_in_keeps_center(rng):
    data = np.zeros((1, 9, 9, 9), np.float32)
    data[0, 4, 4, 4] = 1.0
    sub = tio.Subject(t1=tio.ScalarImage(data))
    out = tio.Affine(scales=2.0)(sub)
    result = np.asarray(out.t1.data)
    assert result[0, 4, 4, 4] == pytest.approx(1.0, abs=1e-4)


def test_labels_use_nearest(subject):
    out = tio.Affine(degrees=(0.0, 0.0, 30.0))(subject)
    seg = np.asarray(out.seg.data)
    assert set(np.unique(seg)) <= set(np.unique(np.asarray(subject.seg.data))) | {0}
    assert seg.dtype == np.asarray(subject.seg.data).dtype or seg.dtype == np.float32


def test_resample_spacing(rng):
    data = rng.normal(size=(1, 10, 10, 10)).astype(np.float32)
    sub = tio.Subject(t1=tio.ScalarImage(data, affine=np.diag([2.0, 2, 2, 1])))
    out = tio.Resample(target=1.0)(sub)
    assert out.t1.spacing == (1.0, 1.0, 1.0)
    assert out.t1.spatial_shape == (20, 20, 20)
    # physical center preserved
    c_in = np.asarray(sub.t1.affine.apply([[4.5, 4.5, 4.5]]))[0]
    c_out = np.asarray(out.t1.affine.apply([[9.5, 9.5, 9.5]]))[0]
    np.testing.assert_allclose(c_in, c_out, atol=1e-9)


def test_resample_history_and_inverse(rng):
    data = smooth_volume(rng, (1, 12, 12, 12))
    sub = tio.Subject(t1=tio.ScalarImage(data, affine=np.diag([2.0, 2, 2, 1])))
    out = tio.Resample(target=1.0)(sub)
    back = out.apply_inverse_transform()
    assert back.t1.spatial_shape == (12, 12, 12)
    np.testing.assert_allclose(back.t1.affine.data, sub.t1.affine.data, atol=1e-9)
    interior = (slice(None), slice(2, -2), slice(2, -2), slice(2, -2))
    np.testing.assert_allclose(
        np.asarray(back.t1.data)[interior], data[interior], atol=0.02
    )


def test_affine_inverse_roundtrip(rng):
    data = smooth_volume(rng, (1, 16, 16, 16))
    sub = tio.Subject(t1=tio.ScalarImage(data))
    out = tio.Affine(degrees=(0.0, 0.0, 15.0), translation=(1.0, -1.0, 0.0))(sub)
    back = out.apply_inverse_transform()
    interior = (slice(None), slice(4, -4), slice(4, -4), slice(4, -4))
    diff = np.abs(np.asarray(back.t1.data)[interior] - data[interior])
    assert np.median(diff) < 0.01


def test_elastic_deterministic_control_points(rng):
    data = rng.normal(size=(1, 12, 12, 12)).astype(np.float32)
    cp = np.zeros((5, 5, 5, 3), np.float32)
    cp[2, 2, 2] = (2.0, 0.0, 0.0)
    sub = tio.Subject(t1=tio.ScalarImage(data))
    out = tio.Spatial(control_points=cp)(sub)
    assert not np.allclose(np.asarray(out.t1.data), data)
    params = out.applied_transforms[-1].params
    np.testing.assert_allclose(params["control_points"], cp, rtol=1e-6)


def test_elastic_inverse_approx(rng):
    data = smooth_volume(rng, (1, 16, 16, 16))
    sub = tio.Subject(t1=tio.ScalarImage(data))
    tio.seed(3)
    out = tio.ElasticDeformation(max_displacement=2.0)(sub)
    back = out.apply_inverse_transform()
    interior = (slice(None), slice(3, -3), slice(3, -3), slice(3, -3))
    diff = np.abs(np.asarray(back.t1.data)[interior] - data[interior])
    assert np.median(diff) < 0.02


def test_pad_value_minimum(rng):
    data = rng.uniform(5.0, 10.0, size=(1, 8, 8, 8)).astype(np.float32)
    sub = tio.Subject(t1=tio.ScalarImage(data))
    out = tio.Affine(translation=(4.0, 0.0, 0.0))(sub)
    result = np.asarray(out.t1.data)
    np.testing.assert_allclose(result[0, 0], data.min(), atol=1e-5)


def test_pad_value_numeric(rng):
    data = rng.normal(size=(1, 8, 8, 8)).astype(np.float32)
    sub = tio.Subject(t1=tio.ScalarImage(data))
    out = tio.Spatial(translation=(4.0, 0.0, 0.0), default_pad_value=-7.0)(sub)
    np.testing.assert_allclose(np.asarray(out.t1.data)[0, 0], -7.0, atol=1e-5)


def test_label_partial_volume_mode(rng):
    seg = rng.integers(0, 3, size=(1, 10, 10, 10)).astype(np.int32) * 2  # labels 0,2,4
    sub = tio.Subject(seg=tio.LabelMap(seg))
    out = tio.Spatial(
        degrees=(0.0, 0.0, 20.0), label_interpolation="label"
    )(sub)
    result = np.asarray(out.seg.data)
    assert set(np.unique(result)) <= {0, 2, 4}
    assert result.dtype == seg.dtype


def test_antialias_runs(rng):
    data = rng.normal(size=(1, 16, 16, 16)).astype(np.float32)
    sub = tio.Subject(t1=tio.ScalarImage(data))
    out = tio.Resample(target=2.0, antialias=True)(sub)
    assert out.t1.spatial_shape == (8, 8, 8)


def test_per_instance_affine(make_batch, assert_vectorized):
    tio.seed(17)
    transform = tio.Affine(degrees=(-10.0, 10.0), translation=(-2.0, 2.0))
    batch = make_batch(4, shape=(1, 8, 8, 8))
    assert_vectorized(transform, batch, rtol=1e-4, atol=1e-4)


def test_per_instance_gated_bit_exact(make_batch, assert_vectorized):
    tio.seed(23)
    transform = tio.Affine(degrees=(5.0, 10.0), p=0.5)
    batch = make_batch(8, shape=(1, 8, 8, 8))
    assert_vectorized(transform, batch, rtol=1e-4, atol=1e-4)


def test_target_image_name(rng):
    hi = tio.ScalarImage(rng.normal(size=(1, 8, 8, 8)).astype(np.float32))
    lo = tio.ScalarImage(
        rng.normal(size=(1, 4, 4, 4)).astype(np.float32),
        affine=np.diag([2.0, 2, 2, 1]),
    )
    sub = tio.Subject(hi=hi, lo=lo)
    out = tio.Resample(target="lo", include=["hi"])(sub)
    assert out.hi.spatial_shape == (4, 4, 4)
    assert out.hi.spacing == (2.0, 2.0, 2.0)


def test_random_spacing_target(rng):
    data = rng.normal(size=(1, 12, 12, 12)).astype(np.float32)
    sub = tio.Subject(t1=tio.ScalarImage(data))
    out = tio.Resample(target=(1.5, 3.0))(sub)
    sp = out.t1.spacing
    assert all(1.5 <= s <= 3.0 for s in sp)


def test_isotropic_scales(rng):
    tio.seed(5)
    data = rng.normal(size=(1, 8, 8, 8)).astype(np.float32)
    out = tio.Affine(scales=(0.8, 1.2), isotropic=True)(
        tio.Subject(t1=tio.ScalarImage(data))
    )
    m = np.asarray(out.applied_transforms[-1].params["affine_matrix"])
    scales = np.linalg.norm(m[:3, :3], axis=0)
    np.testing.assert_allclose(scales, scales[0], rtol=1e-6)


def test_bspline_orders_supported(rng):
    data = rng.normal(size=(1, 8, 8, 8)).astype(np.float32)
    sub = tio.Subject(t1=tio.ScalarImage(data))
    out = tio.Affine(degrees=(0.0, 0.0, 10.0), image_interpolation="cubic")(sub)
    assert np.isfinite(np.asarray(out.t1.data)).all()
    with pytest.raises(ValueError):
        tio.Affine(image_interpolation="octic")


def test_inconsistent_space_raises(rng):
    sub = tio.Subject(
        a=tio.ScalarImage(rng.normal(size=(1, 8, 8, 8)).astype(np.float32)),
        b=tio.ScalarImage(
            rng.normal(size=(1, 8, 8, 8)).astype(np.float32),
            affine=np.diag([2.0, 2, 2, 1]),
        ),
    )
    with pytest.raises(RuntimeError):
        tio.Affine(degrees=(0.0, 0.0, 10.0))(sub)

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


class TestSpatialEdges:
    def _subject(self, rng, shape=(8, 8, 8)):
        return tio.Subject(
            t1=tio.ScalarImage(rng.random((1, *shape)).astype(np.float32))
        )

    def test_interpolation_parsing(self):
        from torchio_tpu.transforms.spatial.spatial import _parse_interpolation

        assert _parse_interpolation(1) == "linear"
        assert _parse_interpolation(3) == "cubic"
        assert _parse_interpolation("bspline") == "cubic"
        assert _parse_interpolation("trilinear") == "linear"
        with pytest.raises(ValueError, match="order must be 0-7"):
            _parse_interpolation(9)

    def test_spacing_parsing(self):
        from torchio_tpu.transforms.spatial.spatial import _parse_spacing

        assert _parse_spacing(2.0) == (2.0, 2.0, 2.0)
        assert _parse_spacing((1.0,)) == (1.0, 1.0, 1.0)
        with pytest.raises(ValueError, match="1 or 3 values"):
            _parse_spacing((1.0, 2.0))
        with pytest.raises(ValueError, match="positive"):
            _parse_spacing(-1.0)

    def test_target_from_file_path(self, rng, tmp_path):
        ref = self._subject(rng)
        path = tmp_path / "ref.nii.gz"
        ref.t1.save(path)
        out = tio.Resample(target=str(path))(self._subject(rng, (5, 6, 7)))
        assert tuple(out.t1.spatial_shape) == (8, 8, 8)

    def test_target_unknown_string(self, rng):
        with pytest.raises(ValueError, match='Unknown target'):
            tio.Resample(target="not_an_image")(self._subject(rng))

    def test_target_not_understood(self, rng):
        with pytest.raises(ValueError, match="not understood"):
            tio.Resample(target=object())(self._subject(rng))

    def test_mean_and_otsu_fill(self, rng):
        for policy in ("mean", "otsu"):
            out = tio.Affine(
                degrees=(5.0, 5.0),
                translation=(3.0, 3.0),
                default_pad_value=policy,
            )(self._subject(rng))
            assert np.isfinite(np.asarray(out.t1.data)).all()

    def test_pad_value_type_errors(self, rng):
        with pytest.raises(ValueError, match="Unknown default_pad_value"):
            tio.Affine(degrees=(5.0, 5.0), default_pad_value="bogus")
        from torchio_tpu.transforms.spatial.spatial import _batch_fill_value
        from torchio_tpu.data.batch import ImagesBatch

        batch = SubjectsBatch.from_subjects([self._subject(rng)])
        with pytest.raises(TypeError, match="default_pad_value must be"):
            _batch_fill_value(
                batch.images["t1"], default_pad_value=[], default_pad_label=0
            )
        with pytest.raises(ValueError, match="Unknown default_pad_value"):
            _batch_fill_value(
                batch.images["t1"],
                default_pad_value="median",
                default_pad_label=0,
            )

    def test_constructor_validation(self):
        with pytest.raises(ValueError, match="isotropic"):
            tio.Affine(scales=(0.9, 1.1, 0.9, 1.1, 0.9, 1.1), isotropic=True)
        with pytest.raises(ValueError, match="center must be"):
            tio.Affine(center="corner")
        with pytest.raises(ValueError, match=r"\(n_i, n_j, n_k, 3\)"):
            tio.Spatial(control_points=np.zeros((3, 3, 3, 2), np.float32))
        with pytest.raises(ValueError, match="num_control_points"):
            tio.ElasticDeformation(num_control_points=3)
        with pytest.raises(ValueError, match="max_displacement"):
            tio.ElasticDeformation(max_displacement=-1.0)
        with pytest.raises(ValueError, match="locked_borders"):
            tio.ElasticDeformation(locked_borders=5)
        with pytest.raises(ValueError, match="identity elastic field"):
            tio.ElasticDeformation(num_control_points=4, locked_borders=2)
        with pytest.raises(ValueError, match='cannot be "label"'):
            tio.Spatial(image_interpolation="label")
        with pytest.raises(ValueError, match="one_hot_label_interpolation"):
            tio.Spatial(one_hot_label_interpolation="label")
        with pytest.raises(TypeError, match="default_pad_label"):
            tio.Spatial(default_pad_label="zero")

    def test_empty_include_is_noop(self, rng):
        subject = self._subject(rng)
        before = np.asarray(subject.t1.data)
        out = tio.Affine(degrees=(10.0, 10.0), include=[])(subject)
        np.testing.assert_array_equal(np.asarray(out.t1.data), before)

    def test_inverse_requires_original_space(self):
        from torchio_tpu.transforms.spatial.spatial import Spatial

        shell = object.__new__(Spatial)
        with pytest.raises(RuntimeError, match="original output space"):
            shell.inverse({"affine_matrix": None, "control_points": None,
                           "affine_first": True, "original": None,
                           "image_interpolation": "linear",
                           "label_interpolation": "nearest",
                           "default_pad_value": 0.0, "default_pad_label": 0.0})

    def test_shared_space_mismatch(self, rng):
        subject = tio.Subject(
            a=tio.ScalarImage(rng.random((1, 6, 6, 6)).astype(np.float32)),
            b=tio.ScalarImage(rng.random((1, 5, 6, 6)).astype(np.float32)),
        )
        with pytest.raises(RuntimeError, match="shared space"):
            tio.Affine(degrees=(5.0, 5.0))(subject)

    def test_label_mode_with_antialias_downsample(self, rng):
        """Downsampling a LabelMap in label mode: antialias smoothing
        engages, routing through the one-hot path."""
        seg = (rng.random((1, 12, 12, 12)) > 0.5).astype(np.int32)
        subject = tio.Subject(seg=tio.LabelMap(seg))
        out = tio.Resample(
            target=2.0, label_interpolation="label", antialias=True
        )(subject)
        assert tuple(out.seg.spatial_shape) == (6, 6, 6)
        assert set(np.unique(np.asarray(out.seg.data))) <= {0, 1}

    def test_label_mode_multichannel(self, rng):
        """C>1 'labels' (e.g. one-hot probabilities) interpolate as
        float channels."""
        probs = rng.random((3, 8, 8, 8)).astype(np.float32)
        subject = tio.Subject(seg=tio.LabelMap(probs))
        out = tio.Affine(degrees=(5.0, 5.0), label_interpolation="label")(
            subject
        )
        assert out.seg.data.shape == (3, 8, 8, 8)
        assert np.isfinite(np.asarray(out.seg.data)).all()

    def test_elastic_inverse_replay_from_params(self, rng):
        """Inverse built from recorded (shared) params — the shell path
        computing max_displacement from the recorded control points."""
        subject = self._subject(rng)
        tio.seed(3)
        out = tio.ElasticDeformation(max_displacement=2.0)(subject)
        restored = out.apply_inverse_transform()
        assert restored.t1.data.shape == subject.t1.data.shape

    def test_bspline_per_sample_grid_materialization(self, rng):
        """Per-instance elastic at B-spline order: the list-of-grids
        materialize path."""
        subjects = [self._subject(rng) for _ in range(2)]
        batch = SubjectsBatch.from_subjects(subjects)
        tio.seed(1)
        out = tio.ElasticDeformation(
            max_displacement=1.5,
            image_interpolation="cubic",
            per_instance=True,
        )(batch)
        assert np.isfinite(np.asarray(out.images["t1"].data)).all()


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


class TestSpatialZooEdges:
    def test_int_statistical_padding_warns(self, rng):
        vol = rng.integers(0, 9, size=(1, 4, 4, 4)).astype(np.int32)
        subject = Subject(seg=LabelMap(vol))
        with pytest.warns(RuntimeWarning, match="truncated"):
            tio.Pad(padding=1, padding_mode="mean", p=1.0)(subject)

    def test_anisotropy_validation(self, make_batch):
        with pytest.raises(ValueError, match=">= 1"):
            tio.Anisotropy(downsampling=(0.2, 0.5))
        # out-of-range axis arrives through params replay
        batch = make_batch(batch_size=1, shape=(1, 8, 8, 8))
        tr = tio.Anisotropy(downsampling=2.0)
        with pytest.raises(ValueError, match="axis"):
            tr.apply_transform(
                batch,
                {
                    "axis": [5],
                    "factor": [2.0],
                    "_batch_size": 1,
                    "_batched_keys": ["axis", "factor"],
                },
            )

    def test_anisotropy_singleton_axis(self, rng):
        subject = _subject_edge3(rng, shape=(1, 1, 8, 8))
        out = tio.Anisotropy(axes=(0,), downsampling=2.0, p=1.0)(subject)
        assert out.t1.spatial_shape == (1, 8, 8)

    def test_crop_or_pad_validation(self):
        with pytest.raises(ValueError, match="1 or 3 values"):
            tio.CropOrPad(target_shape=(2, 2))
        with pytest.raises(ValueError, match="units"):
            tio.CropOrPad(target_shape=4, units="parsecs")
        with pytest.raises(ValueError, match="location"):
            tio.CropOrPad(target_shape=4, location="corner")

    def test_crop_or_pad_lazy_statistical_pad(self, rng):
        img = ScalarImage(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
        out = tio.CropOrPad(
            target_shape=6, padding_mode="mean", p=1.0
        )(img)
        assert out.spatial_shape == (6, 6, 6)

    def test_crop_or_pad_lazy_p_gated(self, rng):
        img = ScalarImage(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
        out = tio.CropOrPad(target_shape=6, p=0.0)(img)
        assert out.spatial_shape == (4, 4, 4)

    def test_crop_or_pad_lazy_include_exclude(self, rng):
        subject = _subject_edge3(rng, shape=(1, 4, 4, 4), with_label=True)
        out = tio.CropOrPad(target_shape=6, include=["t1"], p=1.0)(subject)
        assert out.t1.spatial_shape == (6, 6, 6)
        assert out.seg.spatial_shape == (4, 4, 4)
        subject2 = _subject_edge3(rng, shape=(1, 4, 4, 4), with_label=True)
        out2 = tio.CropOrPad(target_shape=6, exclude=["seg"], p=1.0)(subject2)
        assert out2.t1.spatial_shape == (6, 6, 6)
        assert out2.seg.spatial_shape == (4, 4, 4)

    def test_ensure_shape_multiple_validation(self):
        with pytest.raises(ValueError, match=">= 1"):
            tio.EnsureShapeMultiple(target_multiple=0)
        with pytest.raises(ValueError, match="positive ints"):
            tio.EnsureShapeMultiple(target_multiple=(2, 2))
        with pytest.raises(ValueError, match="method"):
            tio.EnsureShapeMultiple(target_multiple=4, method="stretch")

    def test_flip_anatomical_without_orientation_raises(self):
        from torchio_tpu.transforms.spatial.flip import _resolve_axes

        with pytest.raises(ValueError, match="orientation"):
            _resolve_axes(("L",), None)

    def test_flip_empty_batch_params(self, rng):
        subject = _subject_edge3(rng, with_label=True)
        # Flip excluding every image -> params fall back to empty axes
        out = tio.Flip(axes=0, p=1.0, include=["missing"])(subject)
        np.testing.assert_array_equal(
            np.asarray(out.t1.data), np.asarray(subject.t1.data)
        )

    def test_reorient_validation(self):
        with pytest.raises(ValueError, match="3-letter"):
            tio.Reorient(orientation="RASX")

    def test_copy_affine_missing_target_raises(self, rng):
        subject = _subject_edge3(rng)
        with pytest.raises(KeyError, match="not found"):
            tio.CopyAffine(target="t2")(subject)

class TestSpatialKernelEdges:
    def test_border_mean_and_otsu_fill(self, rng):
        from torchio_tpu.transforms.spatial.spatial import _border_mean

        channel = rng.normal(size=(6, 6, 6)).astype(np.float32)
        mean_fill = _border_mean(channel, filter_otsu=False)
        otsu_fill = _border_mean(channel, filter_otsu=True)
        assert np.isfinite(mean_fill) and np.isfinite(otsu_fill)

    def test_mean_fill_policy_end_to_end(self, rng):
        subject = _subject_edge3(rng, shape=(1, 8, 8, 8))
        out = tio.Affine(
            translation=3.0, default_pad_value="mean", p=1.0
        )(subject)
        assert np.isfinite(np.asarray(out.t1.data)).all()

    def test_otsu_fill_policy_end_to_end(self, rng):
        subject = _subject_edge3(rng, shape=(1, 8, 8, 8))
        out = tio.Affine(
            translation=3.0, default_pad_value="otsu", p=1.0
        )(subject)
        assert np.isfinite(np.asarray(out.t1.data)).all()

    def test_otsu_singleton(self):
        from torchio_tpu.transforms.spatial.spatial import _otsu_threshold

        assert _otsu_threshold(np.asarray([5.0])) == 5.0
        assert _otsu_threshold(np.asarray([], np.float32)) == 0.0

    def test_elastic_control_points_tuple(self, rng):
        subject = _subject_edge3(rng, shape=(1, 10, 10, 10))
        out = tio.ElasticDeformation(
            num_control_points=(5, 6, 7), max_displacement=1.0, p=1.0
        )(subject)
        assert out.t1.spatial_shape == (10, 10, 10)

    def test_antialias_zero_sigma_identity(self, rng):
        from torchio_tpu.transforms.spatial.spatial import _antialias

        import jax.numpy as jnp

        from torchio_tpu.core.affine import AffineMatrix

        data = jnp.asarray(rng.normal(size=(1, 1, 4, 4, 4)).astype(np.float32))
        out = _antialias(data, AffineMatrix(np.eye(4)), AffineMatrix(np.eye(4)))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(data))

    def test_label_mode_antialias(self, rng):
        vol = rng.integers(0, 3, size=(1, 12, 12, 12)).astype(np.int32)
        subject = Subject(seg=LabelMap(vol))
        out = tio.Resample(
            target=2.0,
            label_interpolation="label",
            antialias=True,
            p=1.0,
        )(subject)
        assert out.seg.spatial_shape == (6, 6, 6)


# --- consolidated from test_coverage_edges7.py (round 5) ---
import numpy as np
import pytest
import jax.numpy as jnp
import torchio_tpu as tio
from torchio_tpu.data.batch import SubjectsBatch

def _batch_edge7(rng, n=2, shape=(1, 6, 6, 6), label=False):
    subjects = []
    for _ in range(n):
        if label:
            img = tio.LabelMap(rng.integers(0, 3, shape).astype(np.int32))
        else:
            img = tio.ScalarImage(rng.random(shape).astype(np.float32))
        subjects.append(tio.Subject(img=img))
    return SubjectsBatch.from_subjects(subjects)


class TestGridBuilderDefaults:
    def test_build_grid_infers_max_displacement(self, rng):
        from torchio_tpu.core.affine import AffineMatrix
        from torchio_tpu.transforms.spatial.spatial import _build_grid

        cp = rng.uniform(-0.5, 0.5, (3, 3, 3, 3))
        grid, plan = _build_grid(
            input_shape=(8, 8, 8),
            input_affine=AffineMatrix(np.eye(4)),
            output_shape=(8, 8, 8),
            output_affine=AffineMatrix(np.eye(4)),
            affine_matrix=np.eye(4),
            control_points=cp,
            max_displacement=None,
            affine_first=True,
        )
        assert grid.control_points is not None


class TestSpatialCoverageLines:
    def test_include_matching_nothing_is_noop(self):
        tio.seed(0)
        data = np.random.default_rng(0).random((1, 6, 6, 6), np.float32)
        sub = tio.Subject(t1=tio.ScalarImage(data))
        out = tio.Spatial(degrees=(1.0, 2.0), include=["missing"])(sub)
        np.testing.assert_array_equal(np.asarray(out.t1.data), data)

    def test_multichannel_label_antialias_linear(self):
        tio.seed(0)
        rng = np.random.default_rng(1)
        seg = rng.integers(0, 2, (2, 10, 10, 10)).astype(np.int32)
        sub = tio.Subject(seg=tio.LabelMap(seg))
        out = tio.Spatial(
            scales=(0.5, 0.5),
            antialias=True,
            label_interpolation="linear",
        )(sub)
        result = np.asarray(out.seg.data)
        assert result.dtype == seg.dtype  # int path returns unconverted
        assert result.shape[0] == 2


class TestSpatialInternalBranches:
    def test_pipeline_with_no_image_names_returns(self):
        from torchio_tpu.data.batch import SubjectsBatch
        from torchio_tpu.transforms.spatial.spatial import (
            _run_spatial_pipeline,
        )

        batch = SubjectsBatch.from_subjects(
            [tio.Subject(t1=tio.ScalarImage(np.zeros((1, 4, 4, 4), np.float32)))]
        )
        # inverse replay with an include list matching nothing routes
        # here with an empty selection; must be a clean no-op
        assert (
            _run_spatial_pipeline(
                batch=batch,
                image_names=[],
                target_space=None,
                affine_matrix=np.eye(4),
                control_points=None,
                max_displacement=None,
                affine_first=True,
                image_interpolation="linear",
                label_interpolation="nearest",
                antialias=False,
                default_pad_value=0.0,
                default_pad_label=0.0,
            )
            is None
        )

    def test_multichannel_label_mode_antialias_int(self):
        tio.seed(3)
        rng = np.random.default_rng(3)
        seg = rng.integers(0, 3, (2, 12, 12, 12)).astype(np.int32)
        sub = tio.Subject(seg=tio.LabelMap(seg))
        out = tio.Spatial(
            scales=(0.6, 0.6),
            antialias=True,
            label_interpolation="label",
        )(sub)
        result = np.asarray(out.seg.data)
        # reference parity: multi-channel inputs are treated as a
        # partial-volume map; integer inputs return float32 so the
        # interpolated fractions are not truncated (reference
        # spatial.py:1335-1339)
        assert result.dtype == np.float32
        assert result.shape[0] == 2
        assert float(result.min()) >= 0.0 and float(result.max()) <= 2.0

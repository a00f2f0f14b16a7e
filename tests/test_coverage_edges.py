"""Edge/error-path tests for the coverage ratchet (VERDICT r2 item 9).

Each test targets branches the main suites never reach: replayed
(non-deferred) params, masking errors, inverse edge branches, buffer
validation, serialization helpers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchio_tpu as tio
from torchio_tpu.data.batch import SubjectsBatch


def _batch(rng, names=("t1",), shape=(6, 6, 6), value=None):
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
        batch = _batch(rng)
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
        batch = _batch(rng)
        before = np.asarray(batch.images["t1"].data)
        t = tio.RescaleIntensity(out_min=0.0, out_max=1.0)
        params = {"out_min": 0.0, "out_max": 1.0, "in_ranges": {"t1": (3.0, 3.0)}}
        with pytest.warns(RuntimeWarning, match="input range is zero"):
            out = t.apply_transform(batch, params)
        np.testing.assert_array_equal(np.asarray(out.images["t1"].data), before)

    def test_missing_image_in_ranges_skipped(self, rng):
        batch = _batch(rng)
        before = np.asarray(batch.images["t1"].data)
        t = tio.RescaleIntensity(out_min=0.0, out_max=1.0)
        params = {"out_min": 0.0, "out_max": 1.0, "in_ranges": {"other": (0, 1)}}
        out = t.apply_transform(batch, params)
        np.testing.assert_array_equal(np.asarray(out.images["t1"].data), before)

    def test_masking_method_unknown_key(self, rng):
        batch = _batch(rng)
        with pytest.raises(KeyError, match="not found in batch"):
            tio.RescaleIntensity(masking_method="nope")(batch)

    def test_masking_method_not_labelmap(self, rng):
        batch = _batch(rng, names=("t1", "other"))
        with pytest.raises(TypeError, match="must refer to a LabelMap"):
            tio.RescaleIntensity(masking_method="other")(batch)

    def test_masking_method_bad_type(self, rng):
        batch = _batch(rng)
        with pytest.raises(TypeError, match="masking_method must be"):
            tio.RescaleIntensity(masking_method=42)(batch)

    def test_empty_mask_warns_full_range(self, rng):
        batch = _batch(rng, names=("t1", "seg"))
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

        batch = _batch(rng)
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
        batch2 = _batch(rng)
        before2 = np.asarray(batch2.images["t1"].data)
        inv_zero = _RescaleInverse(
            out_min=0.0, out_max=1.0, in_min=1.0, in_max=1.0, in_ranges=None
        )
        out2 = inv_zero.apply_transform(batch2, {})
        np.testing.assert_array_equal(np.asarray(out2.images["t1"].data), before2)
        # image missing from in_ranges -> no-op
        batch3 = _batch(rng)
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
        batch4 = _batch(rng)
        before4 = np.asarray(batch4.images["t1"].data)
        out4 = inv_arr.apply_transform(batch4, {})
        np.testing.assert_array_equal(np.asarray(out4.images["t1"].data), before4)


class TestStandardizeEdges:
    def test_empty_mask_raises(self, rng):
        batch = _batch(rng, names=("t1", "seg"))
        batch.images["seg"].data = jnp.zeros_like(batch.images["seg"].data)
        with pytest.raises(RuntimeError, match="mask.*is empty"):
            tio.Standardize(masking_method="seg")(batch)

    def test_replayed_host_stats(self, rng):
        batch = _batch(rng)
        t = tio.Standardize()
        out = t.apply_transform(batch, {"stats": {"t1": (0.5, 2.0)}})
        assert np.isfinite(np.asarray(out.images["t1"].data)).all()

    def test_stats_missing_image_skipped(self, rng):
        batch = _batch(rng)
        before = np.asarray(batch.images["t1"].data)
        out = tio.Standardize().apply_transform(batch, {"stats": {}})
        np.testing.assert_array_equal(np.asarray(out.images["t1"].data), before)

    def test_inverse_missing_image_skipped(self, rng):
        from torchio_tpu.transforms.intensity.standardize import (
            _StandardizeInverse,
        )

        batch = _batch(rng)
        before = np.asarray(batch.images["t1"].data)
        out = _StandardizeInverse(stats={"other": (0.0, 1.0)}).apply_transform(
            batch, {}
        )
        np.testing.assert_array_equal(np.asarray(out.images["t1"].data), before)


class TestAppliedTransformSurface:
    def test_equality_and_repr(self):
        a = tio.AppliedTransform(name="Flip", params={"axes": [0]})
        b = tio.AppliedTransform(name="Flip", params={"axes": [0]})
        c = tio.AppliedTransform(name="Flip", params={"axes": [1]})
        assert a == b and a != c
        assert a.__eq__(42) is NotImplemented
        assert "Flip" in repr(a) and "axes" in repr(a)

    def test_deferred_deepcopy_shares(self):
        import copy

        from torchio_tpu.transforms.transform import DeferredParam

        d = DeferredParam(jnp.ones((2,)))
        assert copy.deepcopy(d) is d

    def test_resolve_walks_tuples(self):
        from torchio_tpu.transforms.transform import (
            DeferredParam,
            resolve_deferred_params,
        )

        tree = {"pair": (DeferredParam(jnp.ones(())), 3)}
        resolved = resolve_deferred_params(tree)
        assert resolved["pair"][0] == 1.0 and resolved["pair"][1] == 3


class TestRingBufferEdges:
    def test_push_shape_mismatch(self):
        from torchio_tpu.ops.patches import RingPatchBuffer

        buf = RingPatchBuffer(4, (1, 2, 2, 2))
        with pytest.raises(ValueError, match="does not match buffer"):
            buf.push(jnp.zeros((1, 1, 3, 3, 3)))

    def test_push_overflow_keeps_latest(self):
        from torchio_tpu.ops.patches import RingPatchBuffer

        buf = RingPatchBuffer(2, (1,))
        buf.push(jnp.arange(5, dtype=jnp.float32).reshape(5, 1))
        assert buf.filled == 2
        stored = set(np.asarray(buf._buffer).ravel().tolist())
        assert stored <= {3.0, 4.0}

    def test_empty_buffer_raises(self):
        from torchio_tpu.ops.patches import RingPatchBuffer

        buf = RingPatchBuffer(2, (1,))
        with pytest.raises(RuntimeError, match="empty"):
            buf.sample(1)
        with pytest.raises(RuntimeError, match="empty"):
            buf.gather(jnp.zeros((1,), jnp.int32))

    def test_sample_default_seed(self):
        from torchio_tpu.ops.patches import RingPatchBuffer

        buf = RingPatchBuffer(2, (1,))
        buf.push(jnp.ones((2, 1)))
        out = buf.sample(3)
        assert out.shape == (3, 1)


class TestSmallModuleEdges:
    def test_mask_transform_errors(self, rng):
        batch = _batch(rng)
        with pytest.raises(KeyError, match="not found in batch"):
            tio.Mask(masking_method="nope")(batch)
        batch2 = _batch(rng, names=("t1", "other"))
        with pytest.raises(TypeError, match="must refer to a LabelMap"):
            tio.Mask(masking_method="other")(batch2)
        with pytest.raises(TypeError, match="masking_method must be"):
            tio.Mask(masking_method=3.5)(batch)

    def test_lambda_bad_output_rank(self, rng):
        batch = _batch(rng)
        with pytest.raises(ValueError, match="must return a 4D"):
            tio.Lambda(function=lambda x: jnp.zeros((2, 2)))(batch)

    def test_patch_location_json_round_trip(self):
        from torchio_tpu.data.patch import PatchLocation

        loc = PatchLocation(index=(1, 2, 3), size=(4, 4, 4), subject_index=7)
        back = PatchLocation.from_json(loc.to_json())
        assert back == loc

    def test_invertible_history_accessors(self, rng):
        subject = tio.Subject(
            t1=tio.ScalarImage(rng.random((1, 4, 4, 4)).astype(np.float32))
        )
        out = tio.Flip(axes=(0,))(subject)
        assert len(out.history) == 1
        out.clear_history()
        assert out.applied_transforms == []

    def test_logging_enable_twice(self):
        from torchio_tpu.logging import disable_logging, enable_logging

        enable_logging("INFO")
        enable_logging("DEBUG")  # second call removes the old handler
        disable_logging()

    def test_padding_bad_rank(self):
        from torchio_tpu.transforms.spatial._padding import pad_tensor

        with pytest.raises(ValueError, match="4D or 5D"):
            pad_tensor(jnp.zeros((3, 3)), (1, 1, 1, 1, 1, 1), "constant", 0.0)

    def test_make_mesh_defaults_and_divisibility(self):
        from torchio_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()  # devices=None -> jax.devices()
        assert mesh.devices.size == len(jax.devices())
        with pytest.raises(ValueError, match="not divisible"):
            make_mesh(jax.devices(), space=3)

    def test_distributed_sampler_rank_validation(self):
        from torchio_tpu.parallel import DistributedSubjectSampler

        with pytest.raises(ValueError, match="outside world"):
            DistributedSubjectSampler(4, rank=5, world_size=2)

    def test_distributed_sampler_jax_defaults(self):
        from torchio_tpu.parallel import DistributedSubjectSampler

        sampler = DistributedSubjectSampler(4)
        assert sampler.rank == jax.process_index()
        assert sampler.world_size == jax.process_count()


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


class TestComposeEdges:
    def test_empty_compose(self, rng):
        pipeline = tio.Compose([])
        assert list(pipeline) == []
        subject = tio.Subject(
            t1=tio.ScalarImage(rng.random((1, 4, 4, 4)).astype(np.float32))
        )
        out = pipeline(subject)
        np.testing.assert_array_equal(
            np.asarray(out.t1.data), np.asarray(subject.t1.data)
        )

    def test_p_gated_one_of_and_some_of(self, rng):
        subject = tio.Subject(
            t1=tio.ScalarImage(rng.random((1, 4, 4, 4)).astype(np.float32))
        )
        before = np.asarray(subject.t1.data)
        tio.seed(0)
        one = tio.OneOf([tio.Flip(axes=(0,))], p=0.0)
        np.testing.assert_array_equal(np.asarray(one(subject).t1.data), before)
        some = tio.SomeOf([tio.Flip(axes=(0,))], num_transforms=1, p=0.0)
        np.testing.assert_array_equal(np.asarray(some(subject).t1.data), before)

    def test_some_of_to_hydra(self):
        cfg = tio.SomeOf(
            [tio.Flip(axes=(1,))], num_transforms=1
        ).to_hydra()
        assert cfg["transforms"][0]["_target_"].endswith("Flip")

    def test_per_instance_schema_mismatch_raises(self, rng):
        """A shape-changing transform under per-element OneOf cannot
        re-stack."""
        subjects = [
            tio.Subject(
                t1=tio.ScalarImage(rng.random((1, 6, 6, 6)).astype(np.float32))
            )
            for _ in range(2)
        ]
        batch = SubjectsBatch.from_subjects(subjects)
        tio.seed(3)
        one = tio.OneOf(
            {
                tio.CropOrPad(target_shape=4): 0.5,
                tio.CropOrPad(target_shape=6): 0.5,
            },
            per_instance=True,
        )
        with pytest.raises(RuntimeError, match="different"):
            # draw until the two elements take different branches
            for _ in range(20):
                one(batch)


class TestLabelsToImageEdges:
    def test_label_key_not_found(self, rng):
        batch = _batch(rng, names=("t1", "seg"))
        with pytest.raises(KeyError, match="not found"):
            tio.LabelsToImage(label_key="missing")(batch)

    def test_no_labelmap_raises(self, rng):
        batch = _batch(rng)
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


class TestQueueEdges:
    def test_device_batches_empty_subjects(self):
        queue = tio.Queue(
            [], patch_sampler=tio.UniformSampler(patch_size=4),
            shuffle_subjects=False,
        )
        assert list(queue.device_batches(batch_size=2)) == []

    def test_sampler_without_corner_support_falls_back(self, rng):
        """A sampler that cannot produce corner locations routes through
        the per-patch iterator path."""

        class OldStyleSampler(tio.UniformSampler):
            def _sample_corners(self, subject, num_patches):
                raise NotImplementedError

        subject = tio.Subject(
            t1=tio.ScalarImage(
                jnp.asarray(rng.random((1, 6, 6, 6)).astype(np.float32))
            )
        )
        queue = tio.Queue(
            [subject],
            patch_sampler=OldStyleSampler(patch_size=4),
            patches_per_volume=2,
            shuffle_subjects=False,
        )
        patches = list(queue)
        assert len(patches) == 2

    def test_subject_sampler_length(self, rng):
        subject = tio.Subject(
            t1=tio.ScalarImage(rng.random((1, 6, 6, 6)).astype(np.float32))
        )
        queue = tio.Queue(
            [subject, subject],
            patch_sampler=tio.UniformSampler(patch_size=4),
            shuffle_subjects=False,
            subject_sampler=[0],
        )
        assert queue.num_subjects == 1
        assert queue.patches_per_epoch == queue.patches_per_volume

    def test_max_memory_pretty_tib(self, rng):
        subject = tio.Subject(
            t1=tio.ScalarImage(rng.random((1, 6, 6, 6)).astype(np.float32))
        )
        queue = tio.Queue(
            [subject],
            patch_sampler=tio.UniformSampler(patch_size=512),
            max_length=100000,
            shuffle_subjects=False,
        )
        assert "TiB" in queue.max_memory_pretty


class TestHaloFallbacks:
    def _mesh(self):
        from torchio_tpu.parallel.mesh import make_mesh

        return make_mesh(jax.devices())

    def test_unsupported_sharding_kinds(self):
        from jax.sharding import NamedSharding, PartitionSpec

        from torchio_tpu.parallel.halo import (
            HaloUnsupported,
            halo_resample_spec,
        )

        mesh = self._mesh()
        x = jnp.zeros((4, 1, 4, 16, 4), jnp.float32)
        mats = [np.eye(4)] * 4
        cps = [None] * 4
        with pytest.raises(HaloUnsupported, match="NamedSharding"):
            halo_resample_spec(x, mats, cps, sharding="cpu")
        batch_only = NamedSharding(mesh, PartitionSpec("data"))
        with pytest.raises(HaloUnsupported, match="not spatially sharded"):
            halo_resample_spec(x, mats, cps, sharding=batch_only)
        weird = NamedSharding(
            mesh, PartitionSpec(None, "data", None, "space", None)
        )
        with pytest.raises(HaloUnsupported, match="unsupported partition"):
            halo_resample_spec(x, mats, cps, sharding=weird)

    def test_divisibility_and_matrix_count(self):
        from jax.sharding import NamedSharding, PartitionSpec

        from torchio_tpu.parallel.halo import (
            HaloUnsupported,
            halo_resample_spec,
        )

        mesh = self._mesh()
        spatial = NamedSharding(
            mesh, PartitionSpec("data", None, None, "space", None)
        )
        bad_j = jnp.zeros((4, 1, 4, 15, 4), jnp.float32)
        with pytest.raises(HaloUnsupported, match="J=15"):
            halo_resample_spec(bad_j, [np.eye(4)] * 4, [None] * 4, sharding=spatial)
        bad_b = jnp.zeros((3, 1, 4, 16, 4), jnp.float32)
        with pytest.raises(HaloUnsupported, match="B=3"):
            halo_resample_spec(bad_b, [np.eye(4)] * 3, [None] * 3, sharding=spatial)
        x = jnp.zeros((4, 1, 4, 16, 4), jnp.float32)
        with pytest.raises(HaloUnsupported, match="4x4 matrices"):
            halo_resample_spec(x, [np.eye(4)] * 2, [None] * 2, sharding=spatial)

    def test_differing_control_point_shapes(self):
        from jax.sharding import NamedSharding, PartitionSpec

        from torchio_tpu.parallel.halo import (
            HaloUnsupported,
            halo_resample_spec,
        )

        mesh = self._mesh()
        spatial = NamedSharding(
            mesh, PartitionSpec("data", None, None, "space", None)
        )
        x = jnp.zeros((4, 1, 4, 16, 4), jnp.float32)
        cps = [
            np.zeros((2, 2, 2, 3), np.float32),
            np.zeros((3, 3, 3, 3), np.float32),
            None,
            None,
        ]
        with pytest.raises(HaloUnsupported, match="control-point fields differ"):
            halo_resample_spec(x, [np.eye(4)] * 4, cps, sharding=spatial)

    def test_host_scalar_fill(self):
        """Non-zero host fill broadcasts to (B, C) rows."""
        from jax.sharding import NamedSharding, PartitionSpec

        from torchio_tpu.ops.resample import resample_fused
        from torchio_tpu.parallel.halo import halo_resample_spec

        mesh = self._mesh()
        spatial = NamedSharding(
            mesh, PartitionSpec("data", None, None, "space", None)
        )
        rng = np.random.default_rng(0)
        x = rng.random((4, 1, 4, 16, 4)).astype(np.float32)
        m = np.eye(4)
        m[1, 3] = 2.5
        ref = np.asarray(
            resample_fused(
                jnp.asarray(x), [m] * 4, [None] * 4, fill=7.5, use_f16=False
            )
        )
        xs = jax.device_put(jnp.asarray(x), spatial)
        got = np.asarray(
            halo_resample_spec(xs, [m] * 4, [None] * 4, sharding=spatial, fill=7.5)
        )
        np.testing.assert_allclose(got, ref, atol=1e-5)


class TestVisualizationEdges:
    def test_title_and_show(self, rng, monkeypatch):
        import matplotlib.pyplot as plt

        shown = []
        monkeypatch.setattr(plt, "show", lambda: shown.append(1))
        img = tio.ScalarImage(rng.random((1, 6, 6, 6)).astype(np.float32))
        fig = img.plot(title="hello", show=True)
        assert shown
        subject = tio.Subject(t1=img)
        subject.plot(show=True)
        assert len(shown) == 2


class TestResampleEdges:
    def test_size_one_axes(self):
        """2D images stored as (C, I, J, 1): size-1 axes never go out of
        bounds (align_corners semantics) — all three kernels."""
        from torchio_tpu.ops.resample import (
            build_coords,
            resample,
            resample_fused,
            resample_label_fused,
        )

        rng = np.random.default_rng(0)
        data = rng.random((1, 1, 5, 5, 1)).astype(np.float32)
        m = np.eye(4)
        m[1, 3] = 0.5
        out = np.asarray(
            resample(jnp.asarray(data), build_coords((1, 5, 1), m), fill=2.0)
        )
        assert np.isfinite(out).all()
        out2 = np.asarray(
            resample_fused(
                jnp.asarray(data), [m], [np.zeros((2, 2, 2, 3), np.float32)],
                fill=2.0, use_f16=False,
            )
        )
        assert np.isfinite(out2).all()
        labels = (data > 0.5).astype(np.int32)
        out3 = np.asarray(
            resample_label_fused(jnp.asarray(labels), [m], [None], pad_label=9)
        )
        assert set(np.unique(out3)) <= {0, 1, 9}

    def test_float_label_volume(self):
        """Float-dtype labels use the inf sentinel in the corner kernel."""
        from torchio_tpu.ops.resample import resample_label_fused

        labels = np.array([[1.0, 3.0], [3.0, 1.0]], np.float32).reshape(1, 1, 2, 2, 1)
        m = np.eye(4)
        out = np.asarray(
            resample_label_fused(jnp.asarray(labels), [m], [None], pad_label=0)
        )
        np.testing.assert_array_equal(out, labels)

    def test_fill_validation(self):
        from torchio_tpu.ops.resample import build_coords, resample

        data = jnp.zeros((2, 3, 4, 4, 4), jnp.float32)
        coords = build_coords((4, 4, 4), np.eye(4))
        with pytest.raises(ValueError, match="2D fill"):
            resample(data, coords, fill=np.zeros((3, 3), np.float32))
        with pytest.raises(ValueError, match="per-channel"):
            resample(data, coords, fill=np.zeros((5,), np.float32))
        with pytest.raises(ValueError, match="scalar"):
            resample(data, coords, fill=jnp.zeros((1, 2, 3), jnp.float32))
        with pytest.raises(ValueError, match="Unsupported resampling mode"):
            resample(data, coords, mode="quintic")

    def test_device_fill_on_resample(self):
        from torchio_tpu.ops.resample import build_coords, resample

        rng = np.random.default_rng(1)
        data = jnp.asarray(rng.random((1, 1, 4, 4, 4)).astype(np.float32))
        m = np.eye(4)
        m[0, 3] = 10.0  # everything out of bounds
        out = np.asarray(
            resample(data, build_coords((4, 4, 4), m), fill=jnp.float32(5.0))
        )
        np.testing.assert_array_equal(out, 5.0)


class TestBackendAndImageEdges:
    def test_normalize_index_errors(self):
        from torchio_tpu.io.backends import normalize_index

        with pytest.raises(IndexError, match="Unsupported index type"):
            normalize_index({"bad": 1}, (1, 4, 4, 4))

    def test_backend_data_rank_validation(self):
        from torchio_tpu.io.backends import ArrayBackend

        with pytest.raises(ValueError, match="3D or 4D"):
            ArrayBackend(np.zeros((2, 2)), np.eye(4))
        b = ArrayBackend(np.zeros((2, 2, 2)), np.eye(4))
        assert b.shape == (1, 2, 2, 2)

    def test_is_nifti_on_garbage(self, tmp_path):
        from torchio_tpu.io.nifti import is_nifti

        bad = tmp_path / "x.nii"
        bad.write_bytes(b"garbage")
        assert not is_nifti(bad)

    def test_nifti_bad_datatype(self):
        from torchio_tpu.io.nifti import parse_header

        import struct

        raw = bytearray(348)
        struct.pack_into("<i", raw, 0, 348)
        raw[344:348] = b"n+1\x00"
        struct.pack_into("<h", raw, 40, 3)  # dim0
        struct.pack_into("<h", raw, 70, 9999)  # datatype
        with pytest.raises(ValueError, match="datatype"):
            parse_header(bytes(raw))

    def test_image_from_torch_tensor(self):
        import torch

        img = tio.ScalarImage(torch.rand(1, 4, 4, 4))
        assert img.shape == (1, 4, 4, 4)
        arr = img.numpy()
        assert isinstance(arr, np.ndarray)

    def test_unsupported_source_type(self):
        with pytest.raises(ValueError, match="Unsupported Image source"):
            tio.ScalarImage(12345)

    def test_image_getattr_missing(self, rng):
        img = tio.ScalarImage(rng.random((1, 4, 4, 4)).astype(np.float32))
        with pytest.raises(AttributeError):
            img.definitely_not_an_attr


class TestSamplerEdges:
    def test_required_argument_errors(self):
        with pytest.raises(TypeError, match="patch_size is required"):
            tio.UniformSampler(patch_size=None)
        with pytest.raises(TypeError, match="patch_size is required"):
            tio.WeightedSampler(patch_size=None, probability_map="p")
        with pytest.raises(TypeError, match="probability_map is required"):
            tio.WeightedSampler(patch_size=4, probability_map=None)
        with pytest.raises(TypeError, match="label_name is required"):
            tio.LabelSampler(patch_size=4, label_name=None)

    def test_iterating_without_subject_raises(self):
        with pytest.raises(RuntimeError, match="needs a subject"):
            iter(tio.UniformSampler(patch_size=4))
        with pytest.raises(RuntimeError, match="needs a subject"):
            iter(tio.WeightedSampler(patch_size=4, probability_map="p"))

    def test_base_sampler_abstract(self, rng):
        from torchio_tpu.data.sampler import PatchSampler

        subject = tio.Subject(
            t1=tio.ScalarImage(rng.random((1, 6, 6, 6)).astype(np.float32))
        )
        with pytest.raises(NotImplementedError, match="__call__"):
            PatchSampler(patch_size=4)(subject, 1)
        with pytest.raises(NotImplementedError, match="corner sampling"):
            PatchSampler(patch_size=4).sample_locations(subject, 1)

    def test_label_probabilities_device_and_host(self, rng):
        seg = np.zeros((1, 8, 8, 8), np.int32)
        seg[0, 2:6, 2:6, 2:6] = 1
        seg[0, 3:5, 3:5, 3:5] = 2
        probs = {0: 0.0, 1: 1.0, 2: 3.0}
        # host path
        host_subject = tio.Subject(seg=tio.LabelMap(seg))
        sampler = tio.LabelSampler(
            patch_size=4, label_name="seg", label_probabilities=probs
        )
        locs = sampler.sample_locations(host_subject, 4)
        assert len(locs) == 4
        # device path
        dev_subject = tio.Subject(seg=tio.LabelMap(jnp.asarray(seg)))
        locs2 = sampler.sample_locations(dev_subject, 4)
        assert len(locs2) == 4


class TestWriteAndReprEdges:
    def test_zarr_writer_gated(self, tmp_path):
        from torchio_tpu.io.write import write_image

        try:
            import zarr  # noqa: F401

            has_zarr = True
        except ImportError:
            has_zarr = False
        if has_zarr:
            pytest.skip("zarr installed; gate not reachable")
        with pytest.raises(ImportError, match="zarr"):
            write_image(
                tmp_path / "x.nii.zarr", np.zeros((1, 2, 2, 2), np.float32)
            )

    def test_unsupported_suffix(self, tmp_path):
        from torchio_tpu.io.write import write_image

        with pytest.raises(ValueError, match="Unsupported output format"):
            write_image(tmp_path / "x.png", np.zeros((1, 2, 2, 2), np.float32))

    def test_repr_html_lazy_image_no_preview(self, tmp_path, rng):
        img = tio.ScalarImage(rng.random((1, 4, 4, 4)).astype(np.float32))
        path = tmp_path / "x.nii.gz"
        img.save(path)
        lazy = tio.ScalarImage(path)
        out = lazy._repr_html_()
        assert "lazy" in out

    def test_repr_html_render_failure_is_safe(self, rng, monkeypatch):
        import torchio_tpu.repr_html as rh

        def boom(*a, **k):
            raise RuntimeError("no plot")

        monkeypatch.setattr("torchio_tpu.visualization.plot_image", boom)
        img = tio.ScalarImage(rng.random((1, 4, 4, 4)).astype(np.float32))
        out = img._repr_html_()
        assert "data:image/png" not in out  # preview skipped, no crash

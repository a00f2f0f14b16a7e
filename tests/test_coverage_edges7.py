"""Edge-branch tests: identity/no-op gates in intensity transforms,
imageless subjects through spatial/adapter paths, halo slab upsampling
with singleton axes, and history-attribute robustness."""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

import torchio_tpu as tio
from torchio_tpu.data.batch import SubjectsBatch


def _batch(rng, n=2, shape=(1, 6, 6, 6), label=False):
    subjects = []
    for _ in range(n):
        if label:
            img = tio.LabelMap(rng.integers(0, 3, shape).astype(np.int32))
        else:
            img = tio.ScalarImage(rng.random(shape).astype(np.float32))
        subjects.append(tio.Subject(img=img))
    return SubjectsBatch.from_subjects(subjects)


class TestNoOpGates:
    def test_bias_field_zero_std_shared_is_identity(self, rng):
        x = rng.random((1, 5, 5, 5)).astype(np.float32)
        out = tio.BiasField(std=0.0, per_instance=False, p=1.0)(
            tio.ScalarImage(x)
        )
        np.testing.assert_array_equal(np.asarray(out.data), x)

    def test_rescale_constant_input_skipped(self, rng):
        x = np.full((1, 5, 5, 5), 3.0, np.float32)
        out = tio.RescaleIntensity(out_min=0.0, out_max=1.0)(tio.ScalarImage(x))
        np.testing.assert_array_equal(np.asarray(out.data), x)

    def test_swap_all_elements_gated_out(self, rng):
        batch = _batch(rng)
        t = tio.Swap(patch_size=2, p=1.0)
        before = np.asarray(batch.images["img"].data).copy()
        params = {
            "patch_size": [2, 2, 2],
            "locations": [[], []],
            "_batched_keys": ["locations"],
        }
        out = t.apply_transform(batch, params)
        np.testing.assert_array_equal(
            np.asarray(out.images["img"].data), before
        )

    def test_motion_all_elements_gated_out(self, rng):
        batch = _batch(rng)
        t = tio.Motion(p=1.0)
        before = np.asarray(batch.images["img"].data).copy()
        params = {"transforms": [[], []], "_batched_keys": ["transforms"]}
        out = t.apply_transform(batch, params)
        np.testing.assert_array_equal(
            np.asarray(out.images["img"].data), before
        )


class TestImagelessSubjects:
    def test_spatial_on_imageless_batch_is_noop(self):
        subject = tio.Subject(label=3)
        out = tio.Affine(degrees=(5.0, 5.0), p=1.0)(subject)
        assert out.label == 3
        assert not out.images


class TestHaloSlabUpsample:
    def test_singleton_axes_match_global_upsample(self, rng):
        from torchio_tpu.ops.resample import upsample_field
        from torchio_tpu.parallel.halo import _upsample_field_slab

        cp = rng.uniform(-2.0, 2.0, (3, 3, 3, 3)).astype(np.float32)
        for out_shape in [(1, 4, 1), (4, 1, 4)]:
            io_, jo, ko = out_shape
            full = np.asarray(upsample_field(jnp.asarray(cp), out_shape))
            slab = np.asarray(
                _upsample_field_slab(cp, out_shape, 0, jo)
            )
            np.testing.assert_allclose(slab, full, atol=1e-5)


class TestHistoryAttrRobustness:
    def test_batch_without_applied_transforms_attr(self, rng):
        batch = _batch(rng)
        del batch.applied_transforms
        out = tio.Flip(axes=0, p=1.0)(batch)
        assert len(out.applied_transforms) == 1


class TestShardAxisProbe:
    def test_named_sharding_space_axis(self):
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        from torchio_tpu.transforms.spatial.spatial import _spatial_shard_axis

        devices = np.array(jax.devices()[:2]).reshape(2)
        mesh = Mesh(devices, ("space",))
        sharding = NamedSharding(
            mesh, PartitionSpec(None, None, None, "space", None)
        )
        assert _spatial_shard_axis(sharding) == "space"
        assert _spatial_shard_axis(object()) is None


class TestMultiChannelIntegerLabels:
    def test_resample_preserves_integer_dtype_multichannel(self, rng):
        seg = tio.LabelMap(
            rng.integers(0, 2, (2, 8, 8, 8)).astype(np.int32)
        )
        out = tio.Resample(target=2.0)(seg)
        assert np.asarray(out.data).shape[0] == 2

    def test_antialiased_downsample_multichannel_int(self, rng):
        # the one-hot path smooths channels before sampling and returns
        # the integer dtype unchanged (spatial.py multi-channel branch)
        seg = tio.LabelMap(
            rng.integers(0, 2, (2, 8, 8, 8)).astype(np.int32)
        )
        out = tio.Resample(target=2.0, antialias=True)(seg)
        arr = np.asarray(out.data)
        assert arr.shape[0] == 2
        assert arr.dtype == np.int32


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


class TestHelperBranches:
    def test_reflect_index_mirrors(self):
        from torchio_tpu.ops.bspline import _reflect_index

        idx = jnp.asarray([-3, -1, 0, 4, 5, 9])
        out = np.asarray(_reflect_index(idx, 5))
        # period 8: -1 -> 1, 5 -> 3, 9 -> |9| mod 8 = 1
        np.testing.assert_array_equal(out, [3, 1, 0, 4, 3, 1])
        np.testing.assert_array_equal(
            np.asarray(_reflect_index(jnp.asarray([2, -7]), 1)), [0, 0]
        )

    def test_nifti_disk_to_cijk_odd_ranks(self):
        from torchio_tpu.io.nifti import _disk_to_cijk

        header = None  # unused by the rank logic
        five_d = np.zeros((4, 5, 6, 1, 3))
        out = _disk_to_cijk(five_d, header)
        assert out.shape == (3, 4, 5, 6)
        two_d = np.zeros((7, 9))
        assert _disk_to_cijk(two_d, header).shape == (1, 7, 9, 1)
        one_d = np.zeros((7,))
        assert _disk_to_cijk(one_d, header).shape == (1, 7, 1, 1)
        with pytest.raises(ValueError, match="ndim"):
            _disk_to_cijk(np.zeros(()), header)

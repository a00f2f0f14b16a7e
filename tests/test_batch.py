"""ImagesBatch / SubjectsBatch container behaviors.

Mirrors the reference's ``tests/test_batch.py`` contract: construction
and validation, per-sample affines, unbatch round-trips, metadata lists,
device/dtype moves, reprs, adopt_history, and transform application to
raw batch containers (reference ``/root/reference/src/torchio/data/batch.py``).
"""

from __future__ import annotations

import numpy as np
import pytest

import torchio_tpu as tio
from torchio_tpu.data.batch import ImagesBatch, SubjectsBatch


def _rand(*shape):
    return np.random.rand(*shape).astype(np.float32)


class TestImagesBatch:
    def test_from_images(self):
        images = [tio.ScalarImage(_rand(1, 8, 8, 8)) for _ in range(4)]
        batch = ImagesBatch.from_images(images)
        assert batch.data.shape == (4, 1, 8, 8, 8)
        assert batch.batch_size == 4
        assert len(batch) == 4

    def test_unbatch(self):
        images = [tio.ScalarImage(_rand(1, 8, 8, 8)) for _ in range(3)]
        restored = ImagesBatch.from_images(images).unbatch()
        assert len(restored) == 3
        for img, orig in zip(restored, images):
            assert isinstance(img, tio.ScalarImage)
            assert img.shape == (1, 8, 8, 8)
            np.testing.assert_array_equal(
                np.asarray(img.data), np.asarray(orig.data)
            )

    def test_getitem_int(self):
        images = [tio.ScalarImage(_rand(1, 8, 8, 8)) for _ in range(4)]
        img = ImagesBatch.from_images(images)[0]
        assert isinstance(img, tio.ScalarImage)
        assert img.shape == (1, 8, 8, 8)

    def test_label_map_class_preserved(self):
        labels = [tio.LabelMap(np.zeros((1, 4, 4, 4), np.int32)) for _ in range(2)]
        batch = ImagesBatch.from_images(labels)
        assert batch.image_class is tio.LabelMap
        assert all(isinstance(img, tio.LabelMap) for img in batch.unbatch())

    def test_per_sample_affines(self):
        affine_a = tio.AffineMatrix.from_spacing((1.0, 1.0, 1.0))
        affine_b = tio.AffineMatrix.from_spacing((2.0, 2.0, 2.0))
        images = [
            tio.ScalarImage(_rand(1, 8, 8, 8), affine=affine_a),
            tio.ScalarImage(_rand(1, 8, 8, 8), affine=affine_b),
        ]
        batch = ImagesBatch.from_images(images)
        assert batch[0].affine.spacing == pytest.approx((1.0, 1.0, 1.0))
        assert batch[1].affine.spacing == pytest.approx((2.0, 2.0, 2.0))

    def test_to_dtype(self):
        images = [tio.ScalarImage(_rand(1, 4, 4, 4)) for _ in range(2)]
        batch = ImagesBatch.from_images(images)
        moved = batch.to(dtype=np.float16)
        assert np.asarray(moved.data).dtype == np.float16

    def test_repr(self):
        images = [tio.ScalarImage(_rand(1, 4, 4, 4)) for _ in range(2)]
        r = repr(ImagesBatch.from_images(images))
        assert "ImagesBatch" in r

    def test_transform_on_images_batch_preserves_affines(self):
        affine_a = tio.AffineMatrix.from_spacing((1.0, 1.0, 1.0))
        affine_b = tio.AffineMatrix.from_spacing((2.0, 2.0, 2.0))
        images = [
            tio.ScalarImage(_rand(1, 8, 8, 8), affine=affine_a),
            tio.ScalarImage(_rand(1, 8, 8, 8), affine=affine_b),
        ]
        result = tio.Flip(axes=(0,))(ImagesBatch.from_images(images))
        assert result.affines[0].spacing == pytest.approx((1.0, 1.0, 1.0))
        assert result.affines[1].spacing == pytest.approx((2.0, 2.0, 2.0))

    def test_transform_copy_preserves_original(self):
        images = [tio.ScalarImage(np.zeros((1, 4, 4, 4), np.float32))] * 2
        batch = ImagesBatch.from_images(images)
        original = np.asarray(batch.data).copy()
        tio.Noise(std=1.0)(batch)
        np.testing.assert_array_equal(np.asarray(batch.data), original)


class TestImagesBatchValidation:
    def test_non_5d_raises(self):
        with pytest.raises(ValueError, match="5"):
            ImagesBatch(_rand(1, 10, 10), [tio.AffineMatrix()])

    def test_affine_count_mismatch_raises(self):
        with pytest.raises(ValueError, match="affines"):
            ImagesBatch(_rand(2, 1, 5, 5, 5), [tio.AffineMatrix()])

    def test_from_images_empty_raises(self):
        with pytest.raises(ValueError, match="empty"):
            ImagesBatch.from_images([])

    def test_data_setter_non_5d_raises(self):
        batch = ImagesBatch(_rand(1, 1, 5, 5, 5), [tio.AffineMatrix()])
        with pytest.raises(ValueError, match="5D"):
            batch.data = _rand(5, 5, 5)


class TestSubjectsBatch:
    def _subjects(self, n=3, **extra):
        return [
            tio.Subject(t1=tio.ScalarImage(_rand(1, 8, 8, 8)), **extra)
            for _ in range(n)
        ]

    def test_from_subjects(self):
        batch = SubjectsBatch.from_subjects(self._subjects(3))
        assert batch.batch_size == 3
        assert len(batch) == 3
        assert batch.images["t1"].data.shape == (3, 1, 8, 8, 8)

    def test_attribute_access(self):
        batch = SubjectsBatch.from_subjects(self._subjects(2))
        assert batch.t1.data.shape == (2, 1, 8, 8, 8)
        assert batch["t1"].data.shape == (2, 1, 8, 8, 8)

    def test_getattr_invalid_raises(self):
        batch = SubjectsBatch.from_subjects(self._subjects(1))
        with pytest.raises(AttributeError):
            _ = batch.nonexistent_key

    def test_metadata_preserved(self):
        subjects = [
            tio.Subject(
                t1=tio.ScalarImage(_rand(1, 8, 8, 8)),
                age=42 + i,
                name=f"sub_{i}",
            )
            for i in range(3)
        ]
        batch = SubjectsBatch.from_subjects(subjects)
        assert batch.metadata["age"] == [42, 43, 44]
        assert batch.metadata["name"] == ["sub_0", "sub_1", "sub_2"]
        for i, subject in enumerate(batch.unbatch()):
            assert subject.age == 42 + i

    def test_unbatch_count_and_type(self):
        restored = SubjectsBatch.from_subjects(self._subjects(4)).unbatch()
        assert len(restored) == 4
        assert all(isinstance(s, tio.Subject) for s in restored)

    def test_from_subjects_empty_raises(self):
        with pytest.raises(ValueError, match="empty"):
            SubjectsBatch.from_subjects([])

    def test_repr(self):
        batch = SubjectsBatch.from_subjects(self._subjects(1))
        r = repr(batch)
        assert "SubjectsBatch" in r
        assert "t1" in r

    def test_transform_on_subjects_batch(self):
        batch = SubjectsBatch.from_subjects(self._subjects(2))
        result = tio.Gamma(log_gamma=0.2)(batch)
        assert isinstance(result, SubjectsBatch)
        assert result.t1.data.shape == (2, 1, 8, 8, 8)


class TestPerElementHistory:
    def _batch(self, n=4):
        return SubjectsBatch.from_subjects(
            [tio.Subject(t1=tio.ScalarImage(_rand(1, 6, 6, 6))) for _ in range(n)]
        )

    def test_adopt_history_preserves_per_element(self):
        tio.seed(0)
        branched = tio.OneOf([tio.Flip(axes=(0,)), tio.Flip(axes=(1,))])(
            self._batch()
        )
        subjects = branched.unbatch()
        rebuilt = SubjectsBatch.from_subjects(subjects)
        rebuilt.adopt_history(branched, subjects)
        for original, restored in zip(branched.unbatch(), rebuilt.unbatch()):
            assert [t.name for t in restored.applied_transforms] == [
                t.name for t in original.applied_transforms
            ]

    def test_adopt_history_shared_case(self):
        tio.seed(0)
        transformed = tio.Gamma(log_gamma=0.3, per_instance=False)(self._batch())
        subjects = transformed.unbatch()
        rebuilt = SubjectsBatch.from_subjects(subjects)
        rebuilt.adopt_history(transformed, subjects)
        assert rebuilt._per_element_history is None
        for subject in rebuilt.unbatch():
            assert [t.name for t in subject.applied_transforms] == ["Gamma"]

    def test_set_per_element_history_wrong_length_raises(self):
        batch = self._batch(2)
        with pytest.raises(ValueError):
            batch.set_per_element_history([[]])  # 1 history for batch of 2

    def test_history_slicing_on_unbatch(self):
        tio.seed(0)
        batch = self._batch(3)
        transformed = tio.Flip(axes=(0,), per_instance=True)(batch)
        for subject in transformed.unbatch():
            assert len(subject.applied_transforms) == 1
            assert subject.applied_transforms[0].name == "Flip"

    def test_inverse_without_history_is_identity(self):
        # Empty history -> empty Compose (identity), matching the
        # reference's invertible.py:22-47 semantics.
        batch = self._batch(1)
        original = np.asarray(batch.t1.data).copy()
        inverse = batch.get_inverse_transform(warn=False)
        restored = inverse(batch)
        np.testing.assert_array_equal(np.asarray(restored.t1.data), original)

    def test_batch_inverse_with_per_element_history_raises(self):
        tio.seed(0)
        branched = tio.OneOf([tio.Flip(axes=(0,)), tio.Flip(axes=(1,))])(
            self._batch()
        )
        if branched._per_element_history is None:
            pytest.skip("OneOf produced a shared history for this draw")
        with pytest.raises(RuntimeError, match="per-element"):
            branched.get_inverse_transform()


# --- consolidated from test_coverage_edges4.py (round 5) ---
import copy
import sys
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torchio_tpu as tio
from torchio_tpu.core.affine import AffineMatrix
from torchio_tpu.data import LabelMap, ScalarImage, Subject


class TestBatchEdges:
    def _batch(self, b=2):
        from torchio_tpu.data.batch import ImagesBatch

        return ImagesBatch(
            np.ones((b, 1, 4, 4, 4), np.float32),
            [AffineMatrix() for _ in range(b)],
        )

    def test_device_none_on_host(self):
        batch = self._batch()
        assert batch.device is None

    def test_affines_array(self):
        arr = self._batch().affines_array()
        assert arr.shape == (2, 4, 4) and arr.dtype == np.float32

    def test_to_host_from_device(self):
        batch = self._batch()
        batch.to(jax.devices()[0])
        assert isinstance(batch.data, jax.Array)
        batch.to("cpu")
        assert isinstance(batch.data, np.ndarray)

    def test_shard_with_named_sharding_and_drop(self):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
        sharding = NamedSharding(mesh, PartitionSpec("data"))
        batch = self._batch()
        batch.shard_(sharding)
        assert batch.data.sharding == sharding
        # assigning a different batch size drops the sharding
        batch.data = np.ones((3, 1, 4, 4, 4), np.float32)
        assert batch.device is None or batch.data.shape[0] == 3

    def test_per_instance_trace_out_of_range(self, rng):
        subject = Subject(
            t1=ScalarImage(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
        )
        from torchio_tpu.data.batch import SubjectsBatch, _trace_for_element

        batch = SubjectsBatch.from_subjects([subject, copy.deepcopy(subject)])
        out = tio.Noise(std=(0.1, 0.2), per_instance=True)(batch)
        trace = out.applied_transforms[-1]
        with pytest.raises(IndexError, match="outside the batch"):
            _trace_for_element(trace, 7)


class TestBatchDeviceStrings:
    def test_to_device_string(self):
        import torchio_tpu as tio
        from torchio_tpu.data.batch import SubjectsBatch

        batch = SubjectsBatch.from_subjects(
            [tio.Subject(t1=tio.ScalarImage(np.zeros((1, 4, 4, 4), np.float32)))]
        )
        out = batch.to("cpu")
        assert np.asarray(out.images["t1"].data).shape == (1, 1, 4, 4, 4)

    def test_empty_batch_size_raises(self):
        from torchio_tpu.data.batch import SubjectsBatch

        with pytest.raises(ValueError, match="no images or metadata"):
            SubjectsBatch({}).batch_size


class TestBatchNamedDeviceString:
    def test_non_host_device_string_resolves(self, monkeypatch):
        import jax

        import torchio_tpu as tio
        from torchio_tpu.data.batch import SubjectsBatch

        batch = SubjectsBatch.from_subjects(
            [tio.Subject(t1=tio.ScalarImage(np.zeros((1, 4, 4, 4), np.float32)))]
        )
        # a named accelerator string resolves through jax.devices(name);
        # intercept so the routing runs on this CPU-only host
        monkeypatch.setattr(
            "torchio_tpu.data.batch.jax.devices",
            lambda name=None: jax.local_devices(backend="cpu"),
        )
        out = batch.to("tpu")
        assert np.asarray(out.images["t1"].data).shape == (1, 1, 4, 4, 4)

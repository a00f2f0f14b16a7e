import copy

import numpy as np
import pytest

from torchio_tpu.data import (
    BoundingBoxes,
    LabelMap,
    Points,
    ScalarImage,
    Study,
    Subject,
)


@pytest.fixture
def subject(rng):
    return Subject(
        t1=ScalarImage(rng.normal(size=(1, 8, 8, 8)).astype(np.float32)),
        t2=ScalarImage(rng.normal(size=(1, 8, 8, 8)).astype(np.float32)),
        seg=LabelMap(rng.integers(0, 3, size=(1, 8, 8, 8)).astype(np.int32)),
        landmarks=Points(np.array([[1.0, 2.0, 3.0]])),
        lesions=BoundingBoxes(np.array([[0, 0, 0, 2, 2, 2]], np.float32)),
        age=42,
    )


def test_classification(subject):
    assert set(subject.images) == {"t1", "t2", "seg"}
    assert set(subject.points) == {"landmarks"}
    assert set(subject.bounding_boxes) == {"lesions"}
    assert subject.metadata == {"age": 42}


def test_access(subject):
    assert subject.t1 is subject["t1"]
    assert subject.age == 42
    assert subject.metadata["age"] == 42
    assert "t2" in subject
    assert len(subject) == 5  # spatial entries only; metadata excluded
    with pytest.raises(KeyError):
        subject["nope"]
    with pytest.raises(AttributeError):
        subject.nope


def test_study_alias(subject):
    assert Study is Subject


def test_consistency(subject, rng):
    assert subject.spatial_shape == (8, 8, 8)
    subject["bad"] = ScalarImage(rng.normal(size=(1, 4, 4, 4)))
    with pytest.raises(RuntimeError):
        _ = subject.spatial_shape


def test_spatial_slice(subject):
    sub = subject[2:6, 1:5, 0:8]
    assert sub.spatial_shape == (4, 4, 8)
    np.testing.assert_array_equal(
        sub.t1.data, subject.t1.data[:, 2:6, 1:5, :]
    )
    assert sub.age == 42
    assert "landmarks" in sub


def test_get_images_filtering(subject):
    intensity = subject.get_images(intensity_only=True)
    assert len(intensity) == 2
    all_images = subject.get_images(intensity_only=False)
    assert len(all_images) == 3
    only_t1 = subject.get_images_dict(include=["t1"])
    assert set(only_t1) == {"t1"}
    no_t1 = subject.get_images_dict(exclude=["t1"])
    assert set(no_t1) == {"t2"}


def test_all_points_merge(subject, rng):
    subject.t1.points["ac"] = Points(np.array([[0.0, 0.0, 0.0]]))
    merged = subject.all_points()
    assert "landmarks" in merged
    assert ("t1", "ac") in merged


def test_deepcopy_independent(subject):
    sub2 = copy.deepcopy(subject)
    sub2.t1.data[0, 0, 0, 0] = 123.0
    assert subject.t1.data[0, 0, 0, 0] != 123.0


def test_empty_subject_raises():
    with pytest.raises(ValueError):
        Subject()


def test_dict_ctor(rng):
    s = Subject({"t1": ScalarImage(rng.normal(size=(1, 2, 2, 2)))})
    assert "t1" in s


def test_setitem_delitem(subject):
    subject["note"] = "hello"
    assert subject.note == "hello"
    del subject["note"]
    assert "note" not in subject


class TestMappingSemantics:
    """Iteration/len/contains cover spatial entries only (reference
    subject.py:137-154)."""

    def test_iter_excludes_metadata(self, subject):
        keys = list(subject)
        assert "t1" in keys
        assert "landmarks" in keys
        assert "lesions" in keys
        assert "age" not in keys

    def test_len_counts_spatial_entries(self, subject):
        assert len(subject) == 5  # 3 images + 1 points + 1 bboxes

    def test_contains_excludes_metadata(self, subject):
        assert "t1" in subject
        assert "landmarks" in subject
        assert "age" not in subject

    def test_metadata_still_accessible(self, subject):
        assert subject.age == 42
        assert subject.metadata["age"] == 42
        with pytest.raises(KeyError):
            subject["age"]  # mapping view is spatial-only (reference parity)

    def test_metadata_only_subject(self):
        s = Subject(age=45, name="patient_1")
        assert s.age == 45
        assert len(s.images) == 0
        assert len(s) == 0

    def test_points_only_subject(self):
        s = Subject(landmarks=Points(np.zeros((5, 3), np.float32)))
        assert len(s.points) == 1
        assert len(s) == 1


class TestSpatialSlicing:
    def test_slice_with_int(self, subject):
        sliced = subject[3]
        assert sliced.t1.shape == (1, 1, 8, 8)

    def test_slice_with_ellipsis(self, subject):
        sliced = subject[..., 2:6]
        assert sliced.t1.shape == (1, 8, 8, 4)

    def test_slice_preserves_points(self, subject):
        sliced = subject[2:6]
        assert set(sliced.points) == {"landmarks"}

    def test_slice_preserves_bboxes_and_metadata(self, subject):
        sliced = subject[2:6]
        assert set(sliced.bounding_boxes) == {"lesions"}
        assert sliced.age == 42

    def test_slice_preserves_history(self, subject):
        import torchio_tpu as tio

        transformed = tio.Flip(axes=(0,))(subject)
        sliced = transformed[2:6]
        assert [t.name for t in sliced.applied_transforms] == ["Flip"]

    def test_slice_is_new_subject(self, subject):
        sliced = subject[2:6]
        assert sliced is not subject
        assert subject.t1.shape == (1, 8, 8, 8)  # original untouched

    def test_no_images_slice_raises(self):
        s = Subject(age=1)
        with pytest.raises(RuntimeError):
            s[2:4]


class TestConsistencyChecks:
    def test_inconsistent_shapes_raises(self, rng):
        s = Subject(
            a=ScalarImage(rng.random((1, 8, 8, 8)).astype(np.float32)),
            b=ScalarImage(rng.random((1, 4, 4, 4)).astype(np.float32)),
        )
        with pytest.raises(RuntimeError, match="spatial_shape"):
            s.check_consistent_spatial_shape()

    def test_inconsistent_spacing_raises(self, rng):
        from torchio_tpu.core.affine import AffineMatrix

        s = Subject(
            a=ScalarImage(rng.random((1, 8, 8, 8)).astype(np.float32)),
            b=ScalarImage(
                rng.random((1, 8, 8, 8)).astype(np.float32),
                affine=AffineMatrix.from_spacing((2.0, 2.0, 2.0)),
            ),
        )
        with pytest.raises(RuntimeError, match="spacing"):
            s.check_consistent_space()

    def test_single_image_never_inconsistent(self, rng):
        s = Subject(a=ScalarImage(rng.random((1, 8, 8, 8)).astype(np.float32)))
        s.check_consistent_space()


class TestDictProtocol:
    def test_keys_items_values_get(self, subject):
        assert set(subject.keys()) == {"t1", "t2", "seg", "landmarks", "lesions"}
        assert dict(subject.items())["t1"] is subject.t1
        assert subject.t1 in subject.values()
        assert subject.get("t1") is subject.t1
        assert subject.get("nope", "fallback") == "fallback"

    def test_setitem_routes_to_store(self, subject, rng):
        subject["extra"] = ScalarImage(rng.random((1, 8, 8, 8)).astype(np.float32))
        assert "extra" in subject.images
        subject["note"] = "hello"
        assert subject.metadata["note"] == "hello"


class TestProperties:
    def test_shape_spacing_device(self, subject):
        assert subject.shape == (1, 8, 8, 8)
        assert subject.spatial_shape == (8, 8, 8)
        assert subject.spacing == pytest.approx((1.0, 1.0, 1.0))
        # host numpy data has no device; after to() it has one
        assert subject.device is None

    def test_no_images_properties_raise(self):
        s = Subject(age=1)
        with pytest.raises(RuntimeError, match="no images"):
            _ = s.spatial_shape

    def test_all_bounding_boxes_merges_levels(self, subject, rng):
        subject.images["t1"].bounding_boxes["roi"] = BoundingBoxes(
            np.array([[0, 0, 0, 1, 1, 1]], np.float32)
        )
        merged = subject.all_bounding_boxes()
        assert set(merged) == {"lesions", ("t1", "roi")}


class TestBehavior:
    def test_load_unload_roundtrip(self, tmp_path, rng):
        import torchio_tpu as tio

        path = tmp_path / "v.nii.gz"
        tio.ScalarImage(rng.random((1, 6, 6, 6)).astype(np.float32)).save(path)
        s = Subject(t1=tio.ScalarImage(path))
        assert not s.t1.is_loaded
        s.load()
        assert s.t1.is_loaded
        s.unload()
        assert not s.t1.is_loaded

    def test_to_dtype(self, subject):
        subject.to(dtype=np.float64)
        assert np.asarray(subject.t1.data).dtype == np.float64

    def test_repr_lists_stores(self, subject):
        r = repr(subject)
        assert "t1" in r and "landmarks" in r and "lesions" in r and "age" in r

    def test_repr_html_smoke(self, subject):
        html = subject._repr_html_()
        assert "t1" in html


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


class TestSubjectEdges:
    def test_positional_non_dict_raises(self):
        with pytest.raises(ValueError, match="single dict or keyword"):
            Subject("t1.nii.gz")

    def test_setitem_points_and_bboxes(self):
        from torchio_tpu.data.bboxes import BoundingBoxes
        from torchio_tpu.data.points import Points

        subject = Subject(t1=ScalarImage(np.ones((1, 4, 4, 4), np.float32)))
        subject["marks"] = Points(np.zeros((2, 3), np.float32))
        subject["boxes"] = BoundingBoxes(np.array([[0, 0, 0, 1, 1, 1]], np.float32))
        assert "marks" in subject.all_points()
        assert "boxes" in subject.all_bounding_boxes()
        with pytest.raises(KeyError):
            del subject["missing"]

    def test_get_images_include_exclude(self, rng):
        subject = Subject(
            t1=ScalarImage(rng.normal(size=(1, 2, 2, 2)).astype(np.float32)),
            t2=ScalarImage(rng.normal(size=(1, 2, 2, 2)).astype(np.float32)),
            seg=LabelMap(np.zeros((1, 2, 2, 2), np.int32)),
        )
        assert len(subject.get_images(include=["t1"])) == 1
        assert len(subject.get_images(exclude=["t1"])) == 1  # t2 (seg filtered)
        assert len(subject.get_images(intensity_only=False, exclude=["t1"])) == 2

    def test_bad_spatial_index_type(self):
        subject = Subject(t1=ScalarImage(np.ones((1, 4, 4, 4), np.float32)))
        with pytest.raises(TypeError, match="not understood"):
            subject[1.5]

    def test_copy_protocol(self):
        subject = Subject(t1=ScalarImage(np.ones((1, 2, 2, 2), np.float32)))
        dup = copy.copy(subject)
        assert dup is not subject
        np.testing.assert_array_equal(np.asarray(dup.t1.data), np.asarray(subject.t1.data))


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


class TestImagelessSubjects:
    def test_spatial_on_imageless_batch_is_noop(self):
        subject = tio.Subject(label=3)
        out = tio.Affine(degrees=(5.0, 5.0), p=1.0)(subject)
        assert out.label == 3
        assert not out.images

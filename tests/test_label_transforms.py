import numpy as np
import pytest

import torchio_tpu as tio


@pytest.fixture
def subject(rng):
    seg = rng.integers(0, 4, size=(1, 8, 8, 8)).astype(np.int32)
    return tio.Subject(
        t1=tio.ScalarImage(rng.normal(size=(1, 8, 8, 8)).astype(np.float32)),
        seg=tio.LabelMap(seg),
    )


class TestOneHot:
    def test_encode(self, subject):
        out = tio.OneHot()(subject)
        seg = np.asarray(out.seg.data)
        assert seg.shape == (4, 8, 8, 8)
        np.testing.assert_allclose(seg.sum(axis=0), 1.0)
        # scalar images untouched
        assert np.asarray(out.t1.data).shape == (1, 8, 8, 8)

    def test_num_classes(self, subject):
        out = tio.OneHot(num_classes=7)(subject)
        assert np.asarray(out.seg.data).shape[0] == 7

    def test_inverse(self, subject):
        out = tio.OneHot()(subject)
        back = out.apply_inverse_transform()
        np.testing.assert_array_equal(
            np.asarray(back.seg.data).astype(np.int32),
            np.asarray(subject.seg.data),
        )


class TestRemap:
    def test_remap(self, subject):
        out = tio.RemapLabels({1: 10, 2: 20})(subject)
        seg_in = np.asarray(subject.seg.data)
        seg_out = np.asarray(out.seg.data)
        assert (seg_out[seg_in == 1] == 10).all()
        assert (seg_out[seg_in == 2] == 20).all()
        assert (seg_out[seg_in == 3] == 3).all()

    def test_swap_labels(self, subject):
        out = tio.RemapLabels({1: 2, 2: 1})(subject)
        seg_in = np.asarray(subject.seg.data)
        seg_out = np.asarray(out.seg.data)
        assert (seg_out[seg_in == 1] == 2).all()
        assert (seg_out[seg_in == 2] == 1).all()

    def test_inverse(self, subject):
        out = tio.RemapLabels({1: 10, 2: 20})(subject)
        back = out.apply_inverse_transform()
        np.testing.assert_array_equal(
            np.asarray(back.seg.data), np.asarray(subject.seg.data)
        )

    def test_remove(self, subject):
        out = tio.RemoveLabels([2, 3])(subject)
        seg = np.asarray(out.seg.data)
        assert set(np.unique(seg)) <= {0, 1}


class TestSequentialLabels:
    def test_compacts(self, rng):
        seg = rng.choice([0, 5, 10], size=(1, 6, 6, 6)).astype(np.int32)
        sub = tio.Subject(seg=tio.LabelMap(seg))
        out = tio.SequentialLabels()(sub)
        assert set(np.unique(np.asarray(out.seg.data))) == {0, 1, 2}

    def test_inverse(self, rng):
        seg = rng.choice([0, 5, 10], size=(1, 6, 6, 6)).astype(np.int32)
        sub = tio.Subject(seg=tio.LabelMap(seg))
        out = tio.SequentialLabels()(sub)
        back = out.apply_inverse_transform()
        np.testing.assert_array_equal(np.asarray(back.seg.data), seg)


class TestContour:
    def test_sphere_surface(self):
        seg = np.zeros((1, 12, 12, 12), np.int32)
        seg[0, 3:9, 3:9, 3:9] = 1
        sub = tio.Subject(seg=tio.LabelMap(seg))
        out = tio.Contour()(sub)
        contour = np.asarray(out.seg.data)
        assert contour[0, 3, 5, 5] == 1  # face of the cube
        assert contour[0, 5, 5, 5] == 0  # interior
        assert contour[0, 1, 1, 1] == 0  # background away from volume edge
        assert contour[0, 0, 0, 0] == 1  # volume edge counts as boundary (pad=-1)


class TestKeepLargest:
    def test_removes_small_component(self):
        seg = np.zeros((1, 16, 16, 16), np.int32)
        seg[0, 1:8, 1:8, 1:8] = 1  # big blob
        seg[0, 12:14, 12:14, 12:14] = 1  # small blob
        sub = tio.Subject(seg=tio.LabelMap(seg))
        out = tio.KeepLargestComponent()(sub)
        res = np.asarray(out.seg.data)
        assert res[0, 4, 4, 4] == 1
        assert res[0, 13, 13, 13] == 0

    def test_multi_label(self):
        seg = np.zeros((1, 16, 16, 16), np.int32)
        seg[0, 1:8, 1:8, 1:8] = 1
        seg[0, 12:14, 12:14, 12:14] = 1
        seg[0, 9:11, 1:3, 1:3] = 2
        sub = tio.Subject(seg=tio.LabelMap(seg))
        out = tio.KeepLargestComponent(labels=[1])(sub)
        res = np.asarray(out.seg.data)
        assert res[0, 13, 13, 13] == 0
        assert res[0, 9, 1, 1] == 2  # label 2 untouched

    def test_multichannel_raises(self, rng):
        seg = rng.integers(0, 2, size=(2, 6, 6, 6)).astype(np.int32)
        sub = tio.Subject(seg=tio.LabelMap(seg))
        with pytest.raises(RuntimeError):
            tio.KeepLargestComponent()(sub)


def test_vectorization_zoo(make_batch, assert_vectorized):
    """Per-instance equivalence across the newly added zoo, mirroring the
    reference's test matrix (tests/test_vectorization.py)."""
    tio.seed(77)
    for factory in [
        lambda: tio.Blur(std=(0.0, 2.0)),
        lambda: tio.Ghosting(intensity=(0.5, 1.0)),
        lambda: tio.Spike(intensity=(1.0, 2.0)),
        lambda: tio.Anisotropy(downsampling=(1.5, 3.0)),
        lambda: tio.Swap(patch_size=3, num_iterations=4),
        lambda: tio.Motion(degrees=5.0, translation=3.0, num_transforms=1),
    ]:
        transform = factory()
        batch = make_batch(4, shape=(1, 10, 10, 10))
        assert_vectorized(transform, batch, rtol=1e-4, atol=1e-4)


def test_vectorization_zoo_gated(make_batch, assert_vectorized):
    tio.seed(78)
    for factory in [
        lambda: tio.Blur(std=(1.0, 2.0), p=0.5),
        lambda: tio.Ghosting(intensity=(0.5, 1.0), p=0.5),
        lambda: tio.Spike(intensity=(1.0, 2.0), p=0.5),
        lambda: tio.Anisotropy(downsampling=(1.5, 3.0), p=0.5),
    ]:
        transform = factory()
        batch = make_batch(8, shape=(1, 10, 10, 10))
        assert_vectorized(transform, batch, rtol=1e-4, atol=1e-4)


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


class TestLabelEdges:
    def test_contour_skips_scalar_images(self, rng):
        subject = _subject_edge3(rng, with_label=True)
        before = np.asarray(subject.t1.data).copy()
        out = tio.Contour(p=1.0)(subject)
        np.testing.assert_array_equal(np.asarray(out.t1.data), before)

    def test_keep_largest_absent_and_single_component(self, rng):
        vol = np.zeros((1, 8, 8, 8), np.int32)
        vol[0, 1:3, 1:3, 1:3] = 2  # single component of label 2; label 1 absent
        subject = Subject(
            seg=LabelMap(vol),
            t1=ScalarImage(rng.normal(size=(1, 8, 8, 8)).astype(np.float32)),
        )
        out = tio.KeepLargestComponent(labels=[1, 2], p=1.0)(subject)
        np.testing.assert_array_equal(np.asarray(out.seg.data), vol)

    def test_sequential_labels_skips_scalars(self, rng):
        subject = _subject_edge3(rng, with_label=True)
        before = np.asarray(subject.t1.data).copy()
        out = tio.SequentialLabels(p=1.0)(subject)
        np.testing.assert_array_equal(np.asarray(out.t1.data), before)
        restored = out.apply_inverse_transform()
        np.testing.assert_array_equal(np.asarray(restored.t1.data), before)


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

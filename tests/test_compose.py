import numpy as np
import pytest

import torchio_tpu as tio


@pytest.fixture
def subject(rng):
    return tio.Subject(
        t1=tio.ScalarImage(rng.normal(size=(1, 6, 6, 6)).astype(np.float32))
    )


def test_compose_sequential(subject):
    pipeline = tio.Compose([tio.Flip(axes=0), tio.Gamma(log_gamma=0.3)])
    out = pipeline(subject)
    expected = tio.Gamma(log_gamma=0.3, copy=False)(
        tio.Flip(axes=0)(subject)
    )
    np.testing.assert_allclose(
        np.asarray(out.t1.data), np.asarray(expected.t1.data), rtol=1e-5
    )
    assert [t.name for t in out.applied_transforms] == ["Flip", "Gamma"]


def test_compose_mapping(subject):
    pipeline = tio.Compose({"f": tio.Flip(axes=0), "g": tio.Gamma(log_gamma=0.1)})
    assert len(pipeline.transforms) == 2
    pipeline(subject)


def test_compose_inverse(subject):
    pipeline = tio.Compose([
        tio.Flip(axes=(0, 1)),
        tio.Normalize(out_min=0.0, out_max=1.0),
    ])
    out = pipeline(subject)
    back = out.apply_inverse_transform()
    np.testing.assert_allclose(
        np.asarray(back.t1.data), np.asarray(subject.t1.data), atol=1e-4
    )


def test_oneof_applies_exactly_one(subject):
    tio.seed(5)
    t = tio.OneOf([tio.Flip(axes=0), tio.Gamma(log_gamma=0.5)])
    out = t(subject)
    assert len(out.applied_transforms) == 1
    assert out.applied_transforms[0].name in ("Flip", "Gamma")


def test_oneof_weights():
    tio.seed(0)
    counts = {"Flip": 0, "Gamma": 0}
    sub_data = np.random.default_rng(0).normal(size=(1, 2, 2, 2)).astype(np.float32)
    one_of = tio.OneOf({tio.Flip(axes=0): 0.9, tio.Gamma(log_gamma=0.5): 0.1})
    for _ in range(40):
        sub = tio.Subject(t1=tio.ScalarImage(sub_data))
        out = one_of(sub)
        counts[out.applied_transforms[0].name] += 1
    assert counts["Flip"] > 25


def test_oneof_per_element_histories(make_batch):
    tio.seed(11)
    batch = make_batch(6)
    t = tio.OneOf([tio.Flip(axes=0), tio.Gamma(log_gamma=0.5)])
    out = t(batch)
    subjects = out.unbatch()
    names = {s.applied_transforms[0].name for s in subjects}
    assert names <= {"Flip", "Gamma"}
    # per-element histories exist and further transforms append
    out2 = tio.Clamp(out_min=-10, out_max=10, copy=False)(out)
    for s in out2.unbatch():
        assert s.applied_transforms[-1].name == "Clamp"


def test_someof_count(subject):
    tio.seed(2)
    t = tio.SomeOf(
        [tio.Flip(axes=0), tio.Gamma(log_gamma=0.2), tio.Clamp(out_min=-5, out_max=5)],
        num_transforms=2,
    )
    out = t(subject)
    assert len(out.applied_transforms) == 2


def test_someof_range(subject):
    tio.seed(2)
    t = tio.SomeOf(
        [tio.Flip(axes=0), tio.Gamma(log_gamma=0.2)], num_transforms=(0, 2)
    )
    out = t(subject)
    assert 0 <= len(out.applied_transforms) <= 2


def test_per_element_batch_inverse(make_batch):
    tio.seed(21)
    batch = make_batch(4)
    t = tio.OneOf([tio.Flip(axes=0), tio.Flip(axes=1)])
    out = t(batch)
    with pytest.raises(RuntimeError):
        out.get_inverse_transform()
    restored = out.apply_inverse_transform()
    orig = make_batch(4)
    np.testing.assert_allclose(
        np.asarray(restored.images["t1"].data),
        np.asarray(orig.images["t1"].data),
        rtol=1e-5,
    )


# --- behavior parity with reference test_one_of.py / test_some_of.py -------


def test_oneof_per_instance_false_is_batch_wide(make_batch):
    tio.seed(3)
    batch = make_batch(4)
    t = tio.OneOf([tio.Flip(axes=(0,)), tio.Gamma(log_gamma=(0.5, 0.5))],
                  per_instance=False)
    out = t(batch)
    # one shared choice: either every element flipped or every element gamma'd
    assert out._per_element_history is None
    assert len(out.applied_transforms) == 1


def test_oneof_single_subject_runs_whole(subject):
    tio.seed(0)
    out = tio.OneOf([tio.Flip(axes=(0,)), tio.Noise(std=0.5)])(subject)
    assert len(out.applied_transforms) == 1


def test_get_inverse_transform_ignores_intensity(subject):
    tio.seed(0)
    out = tio.Compose([tio.Flip(axes=(0,)), tio.Noise(std=0.5)])(subject)
    inv = tio.get_inverse_transform(out.applied_transforms, ignore_intensity=True)
    assert len(inv) == 1  # only the Flip remains


def test_clear_history(make_batch):
    tio.seed(1)
    batch = make_batch(3)
    out = tio.OneOf([tio.Flip(axes=(0,)), tio.Gamma(log_gamma=(0.3, 0.6))])(batch)
    assert out._per_element_history is not None or out.applied_transforms
    out.clear_history()
    assert out.applied_transforms == []
    assert out._per_element_history is None


def test_compose_does_not_mutate_input(subject):
    before = np.asarray(subject.images["t1"].data).copy()
    tio.Compose([tio.Noise(std=1.0)])(subject)  # copy=True default
    np.testing.assert_array_equal(np.asarray(subject.images["t1"].data), before)


def test_compose_restores_child_copy_flag(subject):
    noise = tio.Noise(std=0.5)
    assert noise.copy is True
    tio.Compose([noise])(subject)
    assert noise.copy is True  # restored after the single top-level copy


def test_oneof_p_zero_is_noop(subject):
    before = np.asarray(subject.images["t1"].data).copy()
    out = tio.OneOf([tio.Noise(std=5.0)], p=0.0)(subject)
    np.testing.assert_array_equal(np.asarray(out.images["t1"].data), before)
    assert out.applied_transforms == []


def test_someof_without_replacement_unique(subject):
    tio.seed(0)
    t = tio.SomeOf(
        [tio.Flip(axes=(0,)), tio.Noise(std=0.1), tio.Gamma(log_gamma=(0.1, 0.2))],
        num_transforms=3,
    )
    out = t(subject)
    names = [tr.name for tr in out.applied_transforms]
    assert len(names) == len(set(names)) == 3


def test_empty_compose_is_identity(subject):
    out = tio.Compose([])(subject)
    np.testing.assert_array_equal(np.asarray(out.t1.data), np.asarray(subject.t1.data))


def test_compose_mapping_values_used(subject):
    pipeline = tio.Compose({"flip": tio.Flip(axes=(0,)), "noise": tio.Noise(std=0.01)})
    out = pipeline(subject)
    assert [t.name for t in out.applied_transforms] == ["Flip", "Noise"]


def test_someof_with_replacement(subject):
    tio.seed(3)
    out = tio.SomeOf(
        [tio.Gamma(log_gamma=0.1)], num_transforms=3, replace=True
    )(subject)
    # same transform can repeat: history shows 3 Gamma applications
    assert [t.name for t in out.applied_transforms] == ["Gamma"] * 3


def test_someof_p_zero_noop(subject):
    out = tio.SomeOf([tio.Noise(std=1.0)], num_transforms=1, p=0.0)(subject)
    np.testing.assert_array_equal(np.asarray(out.t1.data), np.asarray(subject.t1.data))


def test_someof_per_element_batch(make_batch):
    tio.seed(5)
    batch = make_batch(4)
    out = tio.SomeOf(
        [tio.Gamma(log_gamma=(0.0, 0.3)), tio.Noise(std=(0.0, 0.1))],
        num_transforms=(0, 2),
    )(batch)
    subjects = out.unbatch()
    assert len(subjects) == 4  # re-stacked with per-element histories


def test_oneof_shape_changing_transform_errors_cleanly(make_batch):
    tio.seed(0)
    batch = make_batch(3)
    # Crop changes shape per element -> cannot re-stack
    with pytest.raises(RuntimeError, match="re-stacked"):
        tio.OneOf([tio.Crop(cropping=1), tio.Crop(cropping=2)])(batch)


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


class TestComposeEdgesEdge3:
    def test_compose_none_transforms(self, rng):
        pipeline = tio.Compose(None)
        assert pipeline.transforms == []
        subject = _subject_edge3(rng)
        out = pipeline(subject)
        np.testing.assert_array_equal(
            np.asarray(out.t1.data), np.asarray(subject.t1.data)
        )

    def test_oneof_someof_p_zero_per_element(self, make_batch):
        batch = make_batch(batch_size=2)
        one = tio.OneOf([tio.Flip(axes=0)], p=0.0, per_instance=True)
        out = one._forward_per_element(batch)
        assert out is batch
        some = tio.SomeOf(
            [tio.Flip(axes=0)], num_transforms=1, p=0.0, per_instance=True
        )
        out2 = some._forward_per_element(batch)
        assert out2 is batch

    def test_oneof_someof_no_element_applied(self, make_batch, monkeypatch):
        import torchio_tpu.random as tio_random

        batch = make_batch(batch_size=2)
        # force every per-element coin to miss
        monkeypatch.setattr(tio_random, "random", lambda: 1.0)
        one = tio.OneOf([tio.Flip(axes=0)], p=0.5, per_instance=True)
        assert one._forward_per_element(batch) is batch
        some = tio.SomeOf(
            [tio.Flip(axes=0)], num_transforms=1, p=0.5, per_instance=True
        )
        assert some._forward_per_element(batch) is batch

    def test_consistent_schema_empty_and_mismatch(self, rng):
        from torchio_tpu.transforms.compose import _check_consistent_schema

        _check_consistent_schema([], "OneOf")  # no-op on empty
        s1 = _subject_edge3(rng)
        s2 = _subject_edge3(rng, with_label=True)
        with pytest.raises(RuntimeError, match="different"):
            _check_consistent_schema([s1, s2], "OneOf")

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

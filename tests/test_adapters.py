"""MonaiAdapter / CornucopiaAdapter behavior tests.

Mirrors the reference's ``tests/test_cornucopia_adapter.py`` and
``tests/test_monai_adapter.py`` contracts (positional scalar-first
ordering, include/exclude scoping, ScalarImage-only for MONAI, p-gating,
no history, not invertible) without the wheels: CornucopiaAdapter takes
any callable, and MONAI is emulated with an in-memory stub module that
provides ``MetaTensor`` and ``MapTransform`` (the only two symbols the
adapter touches).
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest
import torch

import torchio_tpu as tio


def _make_subject() -> tio.Subject:
    return tio.Subject(
        t1=tio.ScalarImage(np.random.rand(1, 8, 8, 8).astype(np.float32) * 100 + 1),
        seg=tio.LabelMap(np.zeros((1, 8, 8, 8), dtype=np.float32)),
    )


class TestCornucopiaAdapter:
    def test_not_callable_raises(self):
        with pytest.raises(TypeError, match="callable"):
            tio.CornucopiaAdapter(42)

    def test_p_zero_is_identity(self):
        subject = _make_subject()
        original = np.asarray(subject.t1.data).copy()
        result = tio.CornucopiaAdapter(lambda *t: tuple(x + 1 for x in t), p=0.0)(
            subject
        )
        np.testing.assert_array_equal(np.asarray(result.t1.data), original)

    def test_applies_callable(self):
        subject = _make_subject()
        original = np.asarray(subject.t1.data).copy()
        result = tio.CornucopiaAdapter(lambda *t: tuple(x + 1 for x in t))(subject)
        np.testing.assert_allclose(
            np.asarray(result.t1.data), original + 1, rtol=1e-6
        )

    def test_include_filter(self):
        subject = _make_subject()
        original_t1 = np.asarray(subject.t1.data).copy()
        result = tio.CornucopiaAdapter(
            lambda *t: tuple(x + 1 for x in t), include=["seg"]
        )(subject)
        # t1 untouched, seg transformed
        np.testing.assert_array_equal(np.asarray(result.t1.data), original_t1)
        np.testing.assert_allclose(np.asarray(result.seg.data), 1.0)

    def test_exclude_filter(self):
        subject = _make_subject()
        result = tio.CornucopiaAdapter(
            lambda *t: tuple(x + 1 for x in t), exclude=["seg"]
        )(subject)
        np.testing.assert_array_equal(np.asarray(result.seg.data), 0.0)

    def test_scalar_images_come_first(self):
        received: list[str] = []

        def spy(*tensors):
            for t in tensors:
                received.append("scalar" if float(t.sum()) > 0 else "label")
            return tensors

        tio.CornucopiaAdapter(spy)(_make_subject())
        assert received == ["scalar", "label"]

    def test_single_tensor_return_accepted(self):
        subject = tio.Subject(t1=tio.ScalarImage(np.ones((1, 4, 4, 4), np.float32)))
        result = tio.CornucopiaAdapter(lambda t: t * 2)(subject)
        np.testing.assert_allclose(np.asarray(result.t1.data), 2.0)

    def test_numpy_return_accepted(self):
        subject = tio.Subject(t1=tio.ScalarImage(np.ones((1, 4, 4, 4), np.float32)))
        result = tio.CornucopiaAdapter(lambda t: np.asarray(t) * 3)(subject)
        np.testing.assert_allclose(np.asarray(result.t1.data), 3.0)

    def test_not_invertible(self):
        assert tio.CornucopiaAdapter(lambda *t: t).invertible is False

    def test_no_history_recorded(self):
        result = tio.CornucopiaAdapter(lambda *t: t)(_make_subject())
        names = [at.name for at in result.applied_transforms]
        assert "CornucopiaAdapter" not in names

    def test_batch_input(self):
        batch = tio.SubjectsBatch.from_subjects([_make_subject(), _make_subject()])
        result = tio.CornucopiaAdapter(lambda *t: tuple(x + 1 for x in t))(batch)
        assert isinstance(result, tio.SubjectsBatch)
        np.testing.assert_allclose(np.asarray(result.images["seg"].data), 1.0)

    def test_filter_matching_nothing_is_noop(self):
        subject = _make_subject()
        original = np.asarray(subject.t1.data).copy()
        called = []
        result = tio.CornucopiaAdapter(
            lambda *t: called.append(len(t)) or t, include=["no_such_image"]
        )(subject)
        assert called == []  # transform never invoked with zero tensors
        np.testing.assert_array_equal(np.asarray(result.t1.data), original)

    def test_result_count_mismatch_raises(self):
        subject = _make_subject()  # t1 + seg -> 2 tensors in
        with pytest.raises(ValueError, match="2 input images"):
            tio.CornucopiaAdapter(lambda *t: (t[0],))(subject)


# ── MONAI stub ───────────────────────────────────────────────────────


class _MetaTensor(torch.Tensor):
    """Minimal MetaTensor: a torch.Tensor with an .affine attribute.

    Unlike the real MONAI MetaTensor, arithmetic results don't carry
    the affine through, so default it to None at the class level.
    """

    affine = None

    @staticmethod
    def __new__(cls, data, affine=None):
        obj = torch.as_tensor(data).as_subclass(cls)
        obj.affine = affine
        return obj


class _MapTransform:
    pass


@pytest.fixture
def monai_stub(monkeypatch):
    if "monai" in sys.modules and hasattr(sys.modules["monai"], "__version__"):
        pytest.skip("real MONAI installed; stub not needed")
    monai = types.ModuleType("monai")
    data_mod = types.ModuleType("monai.data")
    data_mod.MetaTensor = _MetaTensor
    transforms_mod = types.ModuleType("monai.transforms")
    transforms_mod.MapTransform = _MapTransform
    monai.data = data_mod
    monai.transforms = transforms_mod
    monkeypatch.setitem(sys.modules, "monai", monai)
    monkeypatch.setitem(sys.modules, "monai.data", data_mod)
    monkeypatch.setitem(sys.modules, "monai.transforms", transforms_mod)
    return monai


class TestMonaiAdapter:
    def test_not_callable_raises(self):
        with pytest.raises(TypeError, match="callable"):
            tio.MonaiAdapter(7)

    def test_array_transform_scalars_only(self, monai_stub):
        # Array-style callables receive each ScalarImage tensor; labels
        # are never touched (reference monai_adapter.py:101-109).
        subject = _make_subject()
        result = tio.MonaiAdapter(lambda t: t + 5)(subject)
        np.testing.assert_allclose(
            np.asarray(result.t1.data),
            np.asarray(subject.t1.data) + 5,
            rtol=1e-6,
        )
        np.testing.assert_array_equal(np.asarray(result.seg.data), 0.0)

    def test_array_transform_exclude(self, monai_stub):
        subject = _make_subject()
        original = np.asarray(subject.t1.data).copy()
        result = tio.MonaiAdapter(lambda t: t + 5, exclude=["t1"])(subject)
        np.testing.assert_array_equal(np.asarray(result.t1.data), original)

    def test_dict_transform_receives_all_images_and_metadata(self, monai_stub):
        # Dict-style transforms get EVERY image (their `keys` choose) and
        # the subject metadata — reference monai_adapter.py:167-186.
        seen = {}

        class DictTransform(_MapTransform):
            def __call__(self, data):
                for name, value in data.items():
                    seen[name] = type(value).__name__
                return {
                    name: value * 2
                    for name, value in data.items()
                    if isinstance(value, torch.Tensor)
                }

        subject = _make_subject()
        subject["site"] = "hospital-A"
        result = tio.MonaiAdapter(DictTransform())(subject)
        assert set(seen) == {"t1", "seg", "site"}
        assert seen["t1"] == "_MetaTensor"
        assert seen["seg"] == "_MetaTensor"
        np.testing.assert_allclose(
            np.asarray(result.t1.data),
            np.asarray(subject.t1.data) * 2,
            rtol=1e-6,
        )

    def test_dict_transform_untouched_keys_preserved(self, monai_stub):
        class TouchT1(_MapTransform):
            def __call__(self, data):
                return {"t1": data["t1"] + 1}

        subject = _make_subject()
        result = tio.MonaiAdapter(TouchT1())(subject)
        np.testing.assert_array_equal(np.asarray(result.seg.data), 0.0)

    def test_dict_transform_affine_roundtrip(self, monai_stub):
        class ShiftAffine(_MapTransform):
            def __call__(self, data):
                out = {}
                for name, value in data.items():
                    new = _MetaTensor(torch.as_tensor(value))
                    affine = value.affine.clone()
                    affine[0, 3] += 10.0
                    new.affine = affine
                    out[name] = new
                return out

        subject = _make_subject()
        origin_before = subject.t1.affine.origin[0]
        result = tio.MonaiAdapter(ShiftAffine())(subject)
        assert result.t1.affine.origin[0] == pytest.approx(origin_before + 10.0)

    def test_no_history_recorded(self, monai_stub):
        result = tio.MonaiAdapter(lambda t: t)(_make_subject())
        names = [at.name for at in result.applied_transforms]
        assert "MonaiAdapter" not in names

    def test_not_invertible(self):
        assert tio.MonaiAdapter(lambda t: t).invertible is False


class TestMonaiImageless:
    def test_dict_transform_skips_imageless_subject(self, monai_stub):
        # an imageless (metadata-only) subject passes through the dict
        # path untouched (monai_adapter imageless-continue branch)
        class Identity(_MapTransform):
            def __call__(self, data):
                return data

        subject = tio.Subject(label=3)
        result = tio.MonaiAdapter(Identity())(subject)
        assert result.label == 3
        assert not result.images

import copy

import jax.numpy as jnp
import numpy as np
import pytest

import torchio_tpu as tio
from torchio_tpu.data.batch import ImagesBatch, SubjectsBatch


@pytest.fixture
def subject(rng):
    return tio.Subject(
        t1=tio.ScalarImage(rng.normal(size=(1, 6, 6, 6)).astype(np.float32)),
        seg=tio.LabelMap(rng.integers(0, 2, size=(1, 6, 6, 6)).astype(np.int32)),
        age=7,
    )


class TestInputPolymorphism:
    def test_ndarray(self, rng):
        x = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
        out = tio.Flip(axes=0)(x)
        assert isinstance(out, np.ndarray)
        np.testing.assert_array_equal(out, x[:, ::-1])

    def test_3d_ndarray(self, rng):
        x = rng.normal(size=(4, 4, 4)).astype(np.float32)
        out = tio.Flip(axes=0)(x)
        assert out.shape == (1, 4, 4, 4)

    def test_jax_array(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
        out = tio.Flip(axes=0)(x)
        assert isinstance(out, jnp.ndarray)

    def test_torch_tensor(self, rng):
        torch = pytest.importorskip("torch")
        x = torch.randn(1, 4, 4, 4)
        out = tio.Flip(axes=0)(x)
        assert isinstance(out, torch.Tensor)

    def test_image(self, rng):
        img = tio.ScalarImage(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
        out = tio.Flip(axes=0)(img)
        assert isinstance(out, tio.ScalarImage)
        assert len(out.applied_transforms) == 1

    def test_subject(self, subject):
        out = tio.Flip(axes=0)(subject)
        assert isinstance(out, tio.Subject)
        assert out.age == 7
        assert len(out.applied_transforms) == 1

    def test_dict(self, rng):
        d = {"img": rng.normal(size=(1, 4, 4, 4)).astype(np.float32)}
        out = tio.Flip(axes=0)(d)
        assert isinstance(out, dict)
        assert out["img"].shape == (1, 4, 4, 4)

    def test_subjects_batch(self, make_batch):
        batch = make_batch(3)
        out = tio.Flip(axes=0)(batch)
        assert isinstance(out, SubjectsBatch)
        assert out.batch_size == 3

    def test_images_batch(self, make_batch):
        ib = make_batch(3).images["t1"]
        out = tio.Flip(axes=0)(ib)
        assert isinstance(out, ImagesBatch)

    def test_bad_type(self):
        with pytest.raises(TypeError):
            tio.Flip(axes=0)("a string")


class TestGatingAndHistory:
    def test_p_zero_noop(self, subject):
        out = tio.Flip(axes=0, p=0.0)(subject)
        np.testing.assert_array_equal(out.t1.data, subject.t1.data)
        assert out.applied_transforms == []

    def test_p_one_applies(self, subject):
        out = tio.Flip(axes=0, p=1.0)(subject)
        assert len(out.applied_transforms) == 1
        assert out.applied_transforms[0].name == "Flip"

    def test_copy_false_applies(self, subject):
        t = tio.Gamma(log_gamma=0.5, copy=False)
        before = np.asarray(subject.t1.data).copy()
        out = t(subject)
        assert not np.allclose(np.asarray(out.t1.data), before)

    def test_copy_true_preserves_input(self, subject):
        before = np.asarray(subject.t1.data).copy()
        tio.Gamma(log_gamma=0.5)(subject)
        np.testing.assert_array_equal(np.asarray(subject.t1.data), before)

    def test_params_json_serializable(self, subject):
        import json

        out = tio.Noise(std=0.1)(subject)
        json.dumps(out.applied_transforms[-1].params)


class TestScoping:
    def test_include(self, subject):
        out = tio.Gamma(log_gamma=1.0, include=["t1"])(subject)
        assert len(out.applied_transforms) == 1

    def test_intensity_skips_labels(self, subject):
        seg_before = np.asarray(subject.seg.data).copy()
        out = tio.Noise(std=0.5)(subject)
        np.testing.assert_array_equal(np.asarray(out.seg.data), seg_before)

    def test_exclude(self, subject):
        t1_before = np.asarray(subject.t1.data).copy()
        out = tio.Gamma(log_gamma=1.0, exclude=["t1"])(subject)
        np.testing.assert_array_equal(np.asarray(out.t1.data), t1_before)


class TestOperatorsAndConfig:
    def test_add_composes(self):
        pipeline = tio.Flip(axes=0) + tio.Gamma(log_gamma=0.1)
        assert isinstance(pipeline, tio.Compose)
        assert len(pipeline.transforms) == 2

    def test_or_oneof(self):
        t = tio.Flip(axes=0) | tio.Gamma(log_gamma=0.1)
        assert isinstance(t, tio.OneOf)

    def test_to_hydra_non_defaults_only(self):
        t = tio.Noise(std=0.5)
        cfg = t.to_hydra()
        assert cfg["_target_"] == "torchio_tpu.Noise"
        assert cfg["std"] == 0.5
        assert "mean" not in cfg
        assert "p" not in cfg

    def test_to_hydra_compose(self):
        c = tio.Compose([tio.Flip(axes=1), tio.Gamma(log_gamma=0.3)])
        cfg = c.to_hydra()
        assert len(cfg["transforms"]) == 2
        assert cfg["transforms"][0]["axes"] == 1

    def test_repr_compact(self):
        assert repr(tio.Noise()) == "Noise()"
        assert "std=0.5" in repr(tio.Noise(std=0.5))

    def test_invalid_p(self):
        with pytest.raises(ValueError):
            tio.Flip(axes=0, p=1.5)


class TestUnbatchHistory:
    def test_per_instance_history_sliced(self, make_batch):
        batch = make_batch(4)
        out = tio.Gamma(log_gamma=(-0.5, 0.5))(batch)
        params = out.applied_transforms[-1].params
        assert params["_batch_size"] == 4
        subjects = out.unbatch()
        for i, sub in enumerate(subjects):
            trace = sub.applied_transforms[-1]
            assert trace.params["log_gamma"] == params["log_gamma"][i]
            assert "_batched_keys" not in trace.params

    def test_gated_out_history_dropped(self, make_batch):
        tio.seed(7)
        batch = make_batch(16)
        out = tio.Gamma(log_gamma=(0.4, 0.5), p=0.5)(batch)
        params = out.applied_transforms[-1].params
        keep = params["_keep"]
        assert any(keep) and not all(keep)
        for i, sub in enumerate(out.unbatch()):
            if keep[i]:
                assert len(sub.applied_transforms) == 1
            else:
                assert sub.applied_transforms == []


class TestExternalImagePolymorphism:
    """_wrap accepts duck-typed nibabel / SimpleITK images and returns
    the SAME type (reference transform.py:510-665). Neither library is
    installed here, so minimal fakes exercise the seam."""

    def test_nibabel_like_roundtrip(self, rng):
        class FakeNifti1Image:
            def __init__(self, dataobj, affine):
                self.dataobj = np.asanyarray(dataobj)
                self.affine = np.asarray(affine)

        data = rng.random((5, 6, 7)).astype(np.float32)
        affine = np.diag([2.0, 1.0, 1.5, 1.0])
        nii = FakeNifti1Image(data, affine)
        out = tio.Clamp(out_min=0.2, out_max=0.8)(nii)
        assert isinstance(out, FakeNifti1Image)
        assert out.dataobj.shape == (5, 6, 7)
        np.testing.assert_allclose(
            out.dataobj, np.clip(data, 0.2, 0.8), rtol=1e-6
        )
        np.testing.assert_allclose(out.affine, affine)

    def test_nibabel_like_4d_channels_last(self, rng):
        class FakeNifti1Image:
            def __init__(self, dataobj, affine):
                self.dataobj = np.asanyarray(dataobj)
                self.affine = np.asarray(affine)

        data = rng.random((5, 6, 7, 3)).astype(np.float32)  # (I,J,K,C)
        out = tio.Clamp(out_min=0.0, out_max=0.5)(
            FakeNifti1Image(data, np.eye(4))
        )
        assert out.dataobj.shape == (5, 6, 7, 3)
        np.testing.assert_allclose(
            out.dataobj, np.clip(data, 0.0, 0.5), rtol=1e-6
        )

    def test_sitk_like_roundtrip(self, rng, monkeypatch):
        import sys
        import types

        class FakeSitkImage:
            def __init__(self, kji, spacing, direction, origin):
                self._arr = np.asarray(kji)
                self._spacing = tuple(spacing)
                self._direction = tuple(direction)
                self._origin = tuple(origin)

            def GetSpacing(self):
                return self._spacing

            def GetDirection(self):
                return self._direction

            def GetOrigin(self):
                return self._origin

            def SetSpacing(self, value):
                self._spacing = tuple(value)

            def SetDirection(self, value):
                self._direction = tuple(value)

            def SetOrigin(self, value):
                self._origin = tuple(value)

        fake_mod = types.ModuleType("SimpleITK")
        fake_mod.GetArrayFromImage = lambda img: img._arr
        fake_mod.GetImageFromArray = lambda arr, isVector=False: FakeSitkImage(
            arr, (1, 1, 1), (1, 0, 0, 0, 1, 0, 0, 0, 1), (0, 0, 0)
        )
        monkeypatch.setitem(sys.modules, "SimpleITK", fake_mod)

        kji = rng.random((7, 6, 5)).astype(np.float32)  # sitk (K, J, I)
        img = FakeSitkImage(
            kji, (2.0, 1.0, 1.5), (1, 0, 0, 0, 1, 0, 0, 0, 1), (10.0, -4.0, 2.0)
        )
        out = tio.Clamp(out_min=0.2, out_max=0.8)(img)
        assert isinstance(out, FakeSitkImage)
        np.testing.assert_allclose(
            out._arr, np.clip(kji, 0.2, 0.8), rtol=1e-6
        )
        # LPS -> RAS -> LPS round trip preserves geometry
        np.testing.assert_allclose(out._spacing, (2.0, 1.0, 1.5))
        np.testing.assert_allclose(out._origin, (10.0, -4.0, 2.0))


class TestOperatorFlattening:
    """Chained + / | produce flat Compose/OneOf (reference
    transform.py:173-191)."""

    def test_add_flattens_compose(self):
        result = tio.Flip(axes=(0,)) + tio.Noise(std=0.1) + tio.BiasField()
        assert isinstance(result, tio.Compose)
        assert len(result.transforms) == 3

    def test_add_compose_plus_transform(self):
        c = tio.Compose([tio.Flip(axes=(0,)), tio.Noise(std=0.1)])
        result = c + tio.BiasField()
        assert isinstance(result, tio.Compose)
        assert len(result.transforms) == 3

    def test_add_non_transform_raises(self):
        import pytest

        with pytest.raises(TypeError):
            tio.Flip(axes=(0,)) + 42

    def test_or_flattens_oneof(self):
        result = tio.Flip(axes=(0,)) | tio.Noise(std=0.1) | tio.BiasField()
        assert isinstance(result, tio.OneOf)
        assert len(result.transforms) == 3

    def test_or_non_transform_raises(self):
        import pytest

        with pytest.raises(TypeError):
            tio.Flip(axes=(0,)) | "bad"

    def test_operators_produce_working_pipelines(self, subject):
        out = (tio.Flip(axes=(0,)) + tio.Noise(std=0.01))(subject)
        assert out.t1.shape == subject.t1.shape
        out = (tio.Flip(axes=(0,)) | tio.Noise(std=0.01))(subject)
        assert out.t1.shape == subject.t1.shape


class TestWrapEdges:
    def test_5d_array_raises(self, rng):
        import pytest

        with pytest.raises(ValueError, match="3D or 4D"):
            tio.Flip(axes=(0,))(rng.random((1, 1, 4, 4, 4, 4)).astype(np.float32))

    def test_torch_3d_promoted(self, rng):
        torch = pytest.importorskip("torch")

        out = tio.Flip(axes=(0,))(torch.zeros(4, 4, 4))
        assert out.shape == (4, 4, 4) or out.shape == (1, 4, 4, 4)

    def test_dict_with_torch_values(self, rng):
        torch = pytest.importorskip("torch")

        data = {"image": torch.rand(1, 4, 4, 4), "id": "s1"}
        out = tio.Flip(axes=(0,))(data)
        assert isinstance(out, dict)
        assert out["id"] == "s1"

    def test_jax_array_in_jax_out(self, rng):
        import jax
        import jax.numpy as jnp

        arr = jnp.asarray(rng.random((1, 4, 4, 4)).astype(np.float32))
        out = tio.Flip(axes=(0,))(arr)
        assert isinstance(out, jax.Array)


class TestHydraValues:
    def test_tuple_and_array_values_serialize(self):
        t = tio.Affine(scales=(0.9, 1.1), degrees=(1.0, 2.0, 3.0))
        cfg = t.to_hydra()
        assert cfg["_target_"].endswith("Affine")
        import json

        json.dumps(cfg)  # everything JSON-clean

    def test_base_apply_transform_raises(self):
        import pytest

        t = tio.Transform()
        with pytest.raises(NotImplementedError):
            t.apply_transform(None, {})

    def test_non_invertible_inverse_raises(self):
        import pytest

        with pytest.raises(NotImplementedError, match="not invertible"):
            tio.Lambda(lambda x: x).inverse({})


class TestDeferredParams:
    """Statistics params are recorded device-side and resolved to plain
    JSON values only after the output compute dispatches (the config-1
    host-round-trip fix)."""

    def _subject(self, rng):
        data = rng.random((1, 8, 8, 8)).astype(np.float32)
        import jax.numpy as jnp

        return tio.Subject(t1=tio.ScalarImage(jnp.asarray(data)))

    def test_history_holds_plain_floats(self, rng):
        import json

        out = tio.RescaleIntensity(
            out_min=0.0, out_max=1.0, percentile_low=0.5, percentile_high=99.5
        )(self._subject(rng))
        (trace,) = out.applied_transforms
        low, high = trace.params["in_ranges"]["t1"]
        assert isinstance(low, float) and isinstance(high, float)
        json.dumps(trace.params)  # the JSON contract survives deferral

        out2 = tio.Standardize()(self._subject(rng))
        (trace2,) = out2.applied_transforms
        mean, std = trace2.params["stats"]["t1"]
        assert isinstance(mean, float) and isinstance(std, float)
        json.dumps(trace2.params)

    def test_make_params_defers_the_pull(self, rng):
        from torchio_tpu.transforms.transform import DeferredParam
        from torchio_tpu.data.batch import SubjectsBatch

        batch = SubjectsBatch.from_subjects([self._subject(rng)])
        t = tio.RescaleIntensity(out_min=0.0, out_max=1.0)
        params = t.make_params(batch)
        assert isinstance(params["in_ranges"]["t1"], DeferredParam)
        s = tio.Standardize()
        assert isinstance(
            s.make_params(batch)["stats"]["t1"], DeferredParam
        )

    def test_values_match_eager_computation(self, rng):
        data = rng.random((1, 8, 8, 8)).astype(np.float32)
        import jax.numpy as jnp

        subject = tio.Subject(t1=tio.ScalarImage(jnp.asarray(data)))
        out = tio.Standardize()(subject)
        (trace,) = out.applied_transforms
        mean, std = trace.params["stats"]["t1"]
        np.testing.assert_allclose(mean, data.mean(), rtol=1e-5)
        np.testing.assert_allclose(std, data.std(ddof=1), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out.t1.data),
            (data - data.mean()) / data.std(ddof=1),
            rtol=1e-4,
            atol=1e-5,
        )

    def test_zero_range_still_warns(self):
        import jax.numpy as jnp

        flat = tio.Subject(
            t1=tio.ScalarImage(jnp.full((1, 4, 4, 4), 3.0, jnp.float32))
        )
        out = tio.RescaleIntensity(out_min=0.0, out_max=1.0)(flat)
        # pure statistics resolve lazily: the warning fires when the
        # recorded range is first read, not on the hot path
        with pytest.warns(RuntimeWarning, match="input range is zero"):
            low, high = out.applied_transforms[0].params["in_ranges"]["t1"]
        assert low == high == 3.0
        # zero-range rescale is a no-op, matching the eager path
        np.testing.assert_array_equal(np.asarray(out.t1.data), 3.0)

    def test_zero_std_still_raises(self):
        import jax.numpy as jnp

        flat = tio.Subject(
            t1=tio.ScalarImage(jnp.full((1, 4, 4, 4), 3.0, jnp.float32))
        )
        with pytest.raises(RuntimeError, match="standard deviation"):
            tio.Standardize()(flat)


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


class TestTransformBaseEdges:
    def test_params_setter(self):
        from torchio_tpu.transforms.transform import AppliedTransform

        t = AppliedTransform("Flip", {"axes": [0]})
        t.params = {"axes": [1]}
        assert t.params == {"axes": [1]}

    def test_supports_per_instance_default_false(self):
        assert tio.Lambda(lambda x: x).supports_per_instance_params is False

    def test_serialize_numpy_scalars(self):
        from torchio_tpu.transforms.transform import Transform

        assert Transform._serialize_param(np.float32(1.5)) == 1.5
        assert Transform._serialize_param(np.int64(3)) == 3
        assert Transform._serialize_param(np.asarray([1, 2])) == [1, 2]

    def test_exclude_filters_images(self, rng):
        subject = _subject_edge3(rng, with_label=True)
        out = tio.Noise(std=1.0, p=1.0, exclude=["t1"])(subject)
        np.testing.assert_array_equal(
            np.asarray(out.t1.data), np.asarray(subject.t1.data)
        )

    def test_repr_array_default_not_equal(self):
        tr = tio.Clamp(out_min=-1.0, out_max=1.0)
        assert "out_min" in repr(tr)

    def test_array_input_5d_raises(self, rng):
        with pytest.raises(ValueError, match="3D or 4D"):
            tio.Flip(axes=0)(rng.normal(size=(1, 1, 2, 2, 2)))

    def test_nibabel_5d_raises(self, rng):
        nib = pytest.importorskip("nibabel")
        img = nib.Nifti1Image(
            rng.normal(size=(2, 2, 2, 1, 2)).astype(np.float32), np.eye(4)
        )
        with pytest.raises(ValueError, match="nibabel"):
            tio.Flip(axes=0)(img)

    def test_dict_with_image_value(self, rng):
        img = ScalarImage(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
        out = tio.Flip(axes=0, p=1.0)({"t1": img, "label": 3})
        assert isinstance(out, dict)
        assert out["label"] == 3

    def test_values_equal_exception_and_arrays(self):
        from torchio_tpu.transforms.transform import _values_equal

        class Explosive:
            def __eq__(self, other):
                raise RuntimeError("no compare")

        assert _values_equal(Explosive(), 1) is False
        assert _values_equal(np.asarray([1, 2]), np.asarray([1, 2])) is True
        assert _values_equal(np.asarray([1, 2]), np.asarray([1, 3])) is False

    def test_history_copy_attribute_error_tolerated(self, rng):
        # objects that reject attribute assignment still round-trip
        arr = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
        out = tio.Flip(axes=0, p=1.0)(arr)
        assert out.shape == arr.shape


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


class TestTransformWrapEdges:
    def test_exclude_filters_images(self, rng):
        subject = Subject(
            t1=ScalarImage(rng.normal(size=(1, 4, 4, 4)).astype(np.float32)),
            t2=ScalarImage(rng.normal(size=(1, 4, 4, 4)).astype(np.float32)),
        )
        before = np.asarray(subject.t2.data).copy()
        out = tio.Noise(std=(0.5, 0.5), exclude=["t2"])(subject)
        np.testing.assert_array_equal(np.asarray(out.t2.data), before)
        assert not np.array_equal(np.asarray(out.t1.data), np.asarray(subject.t1.data))

    def test_lambda_exclude_uses_base_filter(self, rng):
        subject = Subject(
            t1=ScalarImage(rng.normal(size=(1, 4, 4, 4)).astype(np.float32)),
            t2=ScalarImage(rng.normal(size=(1, 4, 4, 4)).astype(np.float32)),
        )
        before = np.asarray(subject.t2.data).copy()
        out = tio.Lambda(lambda x: x + 1, exclude=["t2"])(subject)
        np.testing.assert_array_equal(np.asarray(out.t2.data), before)
        np.testing.assert_allclose(
            np.asarray(out.t1.data), np.asarray(subject.t1.data) + 1, rtol=1e-6
        )

    def test_jax_array_5d_raises(self):
        with pytest.raises(ValueError, match="3D or 4D"):
            tio.Flip(axes=0)(jnp.ones((2, 2, 2, 2, 2)))

    def test_nibabel_like_2d_raises(self):
        class FakeNib:
            def __init__(self, arr):
                self.dataobj = arr
                self.affine = np.eye(4)

        with pytest.raises(ValueError, match="3D/4D nibabel"):
            tio.Flip(axes=0)(FakeNib(np.ones((3, 3), np.float32)))

    def test_sitk_like_4d_roundtrip(self, monkeypatch):
        captured = {}

        class FakeSitkImage:
            """Duck-typed SimpleITK image (sitk itself is not installed)."""

            def __init__(self, arr):
                self.arr = arr

            def GetDirection(self):  # noqa: N802
                return (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)

            def GetSpacing(self):  # noqa: N802
                return (1.0, 1.0, 1.0)

            def GetOrigin(self):  # noqa: N802
                return (0.0, 0.0, 0.0)

        class FakeOut:
            __slots__ = ("arr", "spacing", "direction", "origin")

            def __init__(self, arr):
                self.arr = arr

            def SetSpacing(self, v):  # noqa: N802
                self.spacing = v

            def SetDirection(self, v):  # noqa: N802
                self.direction = v

            def SetOrigin(self, v):  # noqa: N802
                self.origin = v

        fake_sitk = type(sys)("SimpleITK")
        fake_sitk.GetArrayFromImage = lambda img: img.arr
        fake_sitk.GetImageFromArray = lambda arr, isVector=False: captured.setdefault(
            "out", FakeOut(arr)
        )
        monkeypatch.setitem(sys.modules, "SimpleITK", fake_sitk)

        arr = np.arange(2 * 3 * 4 * 2, dtype=np.float32).reshape(2, 3, 4, 2)
        out = tio.Flip(axes=0, flip_probability=1.0)(FakeSitkImage(arr))
        assert out is captured["out"]
        # (K, J, I, C) in -> flip along I -> same layout out
        np.testing.assert_allclose(out.arr, arr[:, :, ::-1, :])

        with pytest.raises(ValueError, match="3D/4D SimpleITK"):
            tio.Flip(axes=0)(FakeSitkImage(np.ones((2, 2, 2, 2, 2), np.float32)))

    def test_hydra_value_ndarray(self):
        from torchio_tpu.transforms.transform import _hydra_value

        assert _hydra_value(np.array([1, 2])) == [1, 2]
        assert _hydra_value((1, 2)) == [1, 2]


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


class TestHistoryAttrRobustness:
    def test_batch_without_applied_transforms_attr(self, rng):
        batch = _batch_edge7(rng)
        del batch.applied_transforms
        out = tio.Flip(axes=0, p=1.0)(batch)
        assert len(out.applied_transforms) == 1

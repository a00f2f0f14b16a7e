"""Mock-based remote loading tests + inverse-pipeline suite.

Mirrors the reference strategy (SURVEY.md §4.7): remote tests never touch
the network — fetches are patched; history replay goes through the
serialized params only.
"""

from unittest import mock

import numpy as np
import pytest

import torchio_tpu as tio
from torchio_tpu.io import remote as remote_mod


class TestRemote:
    def test_uri_stored_not_fetched(self):
        img = tio.ScalarImage("https://example.com/data/t1.nii.gz")
        assert img._uri == "https://example.com/data/t1.nii.gz"
        assert img.path is None
        assert not img.is_loaded

    def test_fetch_on_access(self, tmp_path, rng):
        data = rng.normal(size=(1, 4, 5, 6)).astype(np.float32)
        local = tmp_path / "t1.nii.gz"
        tio.write_nifti(local, data)

        with mock.patch.object(
            remote_mod, "_fetch_remote", return_value=local
        ) as fetch:
            img = tio.ScalarImage("https://example.com/t1.nii.gz")
            assert not fetch.called
            assert img.shape == (1, 4, 5, 6)  # triggers resolution
            assert fetch.called
            np.testing.assert_allclose(np.asarray(img.data), data, rtol=1e-6)

    def test_remote_zarr_detection(self):
        assert remote_mod.is_remote_nifti_zarr("s3://bucket/vol.nii.zarr")
        assert not remote_mod.is_remote_nifti_zarr("/local/vol.nii.zarr")
        assert remote_mod.is_nifti_zarr("/local/vol.nii.zarr")
        assert not remote_mod.is_nifti_zarr("/local/vol.nii.gz")

    def test_zarr_backend_gated(self):
        with pytest.raises(ImportError, match="zarr"):
            tio.ScalarImage("some/vol.nii.zarr").shape  # noqa: B018

    def test_resolve_local_passthrough(self, tmp_path):
        p = tmp_path / "x.nii"
        assert remote_mod.resolve_source(str(p)) == p


class TestInversePipelines:
    """History -> inverse across composed pipelines (reference
    tests/test_inverse.py analog)."""

    @pytest.fixture
    def subject(self, rng):
        return tio.Subject(
            t1=tio.ScalarImage(rng.normal(size=(1, 12, 12, 12)).astype(np.float32)),
            seg=tio.LabelMap(rng.integers(0, 3, size=(1, 12, 12, 12)).astype(np.int32)),
        )

    def test_full_pipeline_roundtrip(self, subject):
        tio.seed(1)
        pipeline = tio.Compose(
            [
                tio.Pad(padding=2),
                tio.Flip(axes=(0, 1)),
                tio.RescaleIntensity(out_min=0.0, out_max=1.0),
                tio.Crop(cropping=1),
            ]
        )
        out = pipeline(subject)
        back = out.apply_inverse_transform()
        np.testing.assert_allclose(
            np.asarray(back.t1.data), np.asarray(subject.t1.data), atol=1e-4
        )
        np.testing.assert_allclose(back.t1.affine.data, subject.t1.affine.data)

    def test_replay_from_serialized_history(self, subject):
        """Inversion must work from JSON-serialized params alone."""
        import json

        tio.seed(2)
        out = tio.Flip(axes=(0, 2))(subject)
        trace = out.applied_transforms[-1]
        payload = json.dumps(trace.params)  # must serialize
        params = json.loads(payload)
        inverse = tio.Flip(axes=(0,)).inverse(params)  # rebuild from params
        restored = inverse(out)
        np.testing.assert_array_equal(
            np.asarray(restored.t1.data), np.asarray(subject.t1.data)
        )

    def test_ignore_intensity(self, subject):
        tio.seed(3)
        out = tio.Compose(
            [tio.Flip(axes=(0,)), tio.Normalize(out_min=0.0, out_max=1.0)]
        )(subject)
        inverse = out.get_inverse_transform(ignore_intensity=True)
        restored = inverse(out)
        # geometry restored, intensity NOT restored
        assert not np.allclose(
            np.asarray(restored.t1.data), np.asarray(subject.t1.data)
        )
        # flip undone, rescale kept: equals rescaling the original directly
        rescaled = tio.Normalize(out_min=0.0, out_max=1.0)(subject)
        np.testing.assert_allclose(
            np.asarray(rescaled.t1.data),
            np.asarray(restored.t1.data),
            atol=1e-5,
        )

    def test_noninvertible_warns_and_skips(self, subject):
        out = tio.Noise(std=0.1)(subject)
        with pytest.warns(UserWarning, match="not invertible"):
            back = out.apply_inverse_transform()
        np.testing.assert_array_equal(
            np.asarray(back.t1.data), np.asarray(out.t1.data)
        )

    def test_unknown_transform_in_history(self, subject):
        out = tio.Flip(axes=(0,))(subject)
        out.applied_transforms.append(
            tio.AppliedTransform(name="DoesNotExist", params={})
        )
        with pytest.warns(UserWarning, match="Unknown transform"):
            back = out.apply_inverse_transform()
        np.testing.assert_array_equal(
            np.asarray(back.t1.data), np.asarray(subject.t1.data)
        )

    def test_batch_inverse(self, make_batch):
        tio.seed(5)
        batch = make_batch(3)
        out = tio.Affine(degrees=(0.0, 0.0, 8.0))(batch)
        restored = out.apply_inverse_transform()
        assert restored.images["t1"].data.shape == batch.images["t1"].data.shape


class TestHydra:
    def test_export_shapes(self):
        pipeline = tio.Compose(
            [
                tio.Affine(degrees=(-10.0, 10.0)),
                tio.OneOf([tio.Noise(std=0.1), tio.Gamma(log_gamma=0.2)]),
            ]
        )
        cfg = pipeline.to_hydra()
        assert cfg["_target_"] == "torchio_tpu.Compose"
        assert len(cfg["transforms"]) == 2
        affine_cfg = cfg["transforms"][0]
        assert affine_cfg["_target_"] == "torchio_tpu.Affine"
        assert affine_cfg["degrees"] == [-10.0, 10.0]
        oneof_cfg = cfg["transforms"][1]
        assert [t["_target_"] for t in oneof_cfg["transforms"]] == [
            "torchio_tpu.Noise",
            "torchio_tpu.Gamma",
        ]

    def test_roundtrip_instantiation(self):
        """Configs can be rebuilt without Hydra via the registry."""
        from torchio_tpu.transforms.transform import _TRANSFORM_REGISTRY

        def instantiate(cfg):
            name = cfg["_target_"].split(".")[-1]
            kwargs = {k: v for k, v in cfg.items() if k != "_target_"}
            if "transforms" in kwargs:
                kwargs["transforms"] = [instantiate(c) for c in kwargs["transforms"]]
            cls = _TRANSFORM_REGISTRY[name]
            for key, value in list(kwargs.items()):
                if isinstance(value, list) and all(
                    isinstance(v, (int, float)) for v in value
                ):
                    kwargs[key] = tuple(value)
            return cls(**kwargs)

        original = tio.Noise(std=(0.05, 0.2), rician=True)
        rebuilt = instantiate(original.to_hydra())
        assert isinstance(rebuilt, tio.Noise)
        assert rebuilt.rician


class TestRemoteMemoryFS:
    """End-to-end remote loading without a network: fsspec's memory://
    filesystem plays the remote store (reference pattern: mock-based
    remote tests, tests/test_remote_loading.py)."""

    @pytest.fixture
    def memory_uri(self, tmp_path, rng):
        import fsspec

        img = tio.ScalarImage(rng.random((1, 6, 6, 6)).astype(np.float32))
        local = tmp_path / "t1.nii.gz"
        img.save(local)
        fs = fsspec.filesystem("memory")
        fs.pipe_file("/unit_t1.nii.gz", local.read_bytes())
        yield "memory://unit_t1.nii.gz", img
        fs.rm("/unit_t1.nii.gz")

    def test_any_scheme_is_remote(self):
        from torchio_tpu.io.remote import is_remote

        for uri in (
            "http://x/y.nii",
            "s3://b/k.nii.gz",
            "gs://b/k.nii",
            "memory://t1.nii.gz",
            "abfs://c/p.nii",
        ):
            assert is_remote(uri)
        assert not is_remote("/local/path.nii.gz")
        assert not is_remote("relative.nii")

    def test_construction_is_lazy(self, memory_uri):
        uri, _ = memory_uri
        remote = tio.ScalarImage(uri)
        assert remote._uri == uri
        assert not remote.is_loaded

    def test_data_roundtrip(self, memory_uri):
        uri, original = memory_uri
        remote = tio.ScalarImage(uri)
        assert remote.shape == (1, 6, 6, 6)
        np.testing.assert_allclose(
            np.asarray(remote.data), np.asarray(original.data), rtol=1e-6
        )

    def test_transform_on_remote_image(self, memory_uri):
        uri, original = memory_uri
        out = tio.Flip(axes=(0,))(tio.ScalarImage(uri))
        np.testing.assert_allclose(
            np.asarray(out.data),
            np.asarray(original.data)[:, ::-1],
            rtol=1e-6,
        )

    def test_suffix_inferred_from_uri(self):
        from torchio_tpu.io.remote import _fetch_remote
        import fsspec

        fs = fsspec.filesystem("memory")
        fs.pipe_file("/raw.nii.gz", b"not-really-nifti")
        try:
            local = _fetch_remote("memory://raw.nii.gz")
            assert str(local).endswith(".nii.gz")
            assert local.read_bytes() == b"not-really-nifti"
        finally:
            fs.rm("/raw.nii.gz")


class TestZarrBackendWithStub:
    """ZarrBackend logic exercised through a minimal in-memory zarr
    stub (the wheel is absent here; only `zarr.open` and array duck
    typing are touched)."""

    @pytest.fixture
    def zarr_stub(self, monkeypatch):
        import sys
        import types

        class FakeArray:
            def __init__(self, arr, attrs=None):
                self._arr = arr
                self.shape = arr.shape
                self.dtype = arr.dtype
                self.attrs = attrs or {}

            def __getitem__(self, key):
                return self._arr[key]

            def __array__(self, dtype=None):
                return np.asarray(self._arr, dtype)

        mod = types.ModuleType("zarr")
        stores = {}
        mod._stores = stores
        mod.open = lambda source, mode="r": stores[source]
        mod.FakeArray = FakeArray
        monkeypatch.setitem(sys.modules, "zarr", mod)
        return mod

    def test_3d_store(self, zarr_stub, rng):
        from torchio_tpu.io.remote import ZarrBackend

        arr = rng.random((6, 7, 8)).astype(np.float32)
        affine = np.diag([2.0, 2.0, 2.0, 1.0])
        zarr_stub._stores["store3d"] = zarr_stub.FakeArray(
            arr, attrs={"affine": affine.tolist()}
        )
        backend = ZarrBackend("store3d")
        assert backend.shape == (1, 6, 7, 8)
        np.testing.assert_array_equal(backend.affine, affine)
        np.testing.assert_array_equal(backend.to_array(), arr[None])
        region = backend[
            (slice(None), slice(1, 3), slice(2, 5), slice(0, 4))
        ]
        np.testing.assert_array_equal(region, arr[None][:, 1:3, 2:5, 0:4])

    def test_4d_channel_store(self, zarr_stub, rng):
        from torchio_tpu.io.remote import ZarrBackend

        arr = rng.random((2, 6, 7, 8)).astype(np.float32)
        zarr_stub._stores["store4d"] = zarr_stub.FakeArray(arr)
        backend = ZarrBackend("store4d")
        assert backend.shape == (2, 6, 7, 8)
        np.testing.assert_array_equal(backend.affine, np.eye(4))
        np.testing.assert_array_equal(backend.to_array(), arr)

    def test_missing_zarr_has_actionable_error(self):
        import sys

        if "zarr" in sys.modules:
            pytest.skip("zarr importable here")
        from torchio_tpu.io.remote import ZarrBackend

        with pytest.raises(ImportError, match="zarr"):
            ZarrBackend("anything")


class TestResolveSource:
    def test_path_passthrough(self, tmp_path):
        from pathlib import Path

        from torchio_tpu.io.remote import resolve_source

        p = tmp_path / "x.nii"
        assert resolve_source(p) is p
        assert resolve_source(str(p)) == Path(p)

    def test_openfile_materialized(self, tmp_path):
        import fsspec

        from torchio_tpu.io.remote import resolve_source

        src = tmp_path / "payload.nii.gz"
        src.write_bytes(b"openfile-bytes")
        of = fsspec.open(str(src), "rb")
        local = resolve_source(of, suffix=".nii.gz")
        assert local.read_bytes() == b"openfile-bytes"
        assert str(local).endswith(".nii.gz")

    def test_unsupported_type_raises(self):
        import pytest

        from torchio_tpu.io.remote import resolve_source

        with pytest.raises(TypeError, match="Cannot resolve"):
            resolve_source(12345)

    def test_nifti_zarr_detection(self):
        from torchio_tpu.io.remote import is_nifti_zarr, is_remote_nifti_zarr

        assert is_nifti_zarr("brain.nii.zarr")
        assert is_nifti_zarr("s3://b/brain.ome.zarr")
        assert not is_nifti_zarr("brain.nii.gz")
        assert not is_nifti_zarr(42)
        assert is_remote_nifti_zarr("https://x/b.nii.zarr")
        assert not is_remote_nifti_zarr("/local/b.nii.zarr")


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


class TestInverseEdges:
    def test_no_history_passthrough(self):
        from torchio_tpu.transforms.inverse import apply_inverse_transform

        obj = object()
        assert apply_inverse_transform(obj) is obj

    def test_per_element_history_delegates(self, make_batch):
        batch = make_batch(batch_size=2)
        one = tio.OneOf([tio.Flip(axes=0, p=1.0)], per_instance=True, p=1.0)
        out = one(batch)
        if getattr(out, "_per_element_history", None) is None:
            pytest.skip("per-element history not produced this draw")
        from torchio_tpu.transforms.inverse import apply_inverse_transform

        restored = apply_inverse_transform(out)
        np.testing.assert_allclose(
            np.asarray(restored.images["t1"].data),
            np.asarray(batch.images["t1"].data),
            rtol=1e-5,
        )

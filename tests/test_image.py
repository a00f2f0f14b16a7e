import copy
from pathlib import Path

import numpy as np
import pytest

from torchio_tpu.core.affine import AffineMatrix
from torchio_tpu.data import Image, LabelMap, ScalarImage
from torchio_tpu.io.nifti import write_nifti


@pytest.fixture
def nii_path(tmp_path, rng):
    data = rng.normal(size=(1, 6, 7, 8)).astype(np.float32)
    aff = np.diag([2.0, 2.0, 2.0, 1.0])
    aff[:3, 3] = [1, 2, 3]
    path = tmp_path / "t1.nii.gz"
    write_nifti(path, data, aff)
    return path, data, aff


def test_from_tensor(rng):
    data = rng.normal(size=(1, 4, 5, 6)).astype(np.float32)
    img = ScalarImage(data)
    assert img.is_loaded
    assert img.shape == (1, 4, 5, 6)
    assert img.spatial_shape == (4, 5, 6)
    assert img.num_channels == 1
    np.testing.assert_array_equal(img.data, data)
    assert img.spacing == (1.0, 1.0, 1.0)


def test_3d_promoted(rng):
    img = ScalarImage(rng.normal(size=(4, 5, 6)))
    assert img.shape == (1, 4, 5, 6)


def test_channels_last(rng):
    data = rng.normal(size=(4, 5, 6, 3)).astype(np.float32)
    img = ScalarImage(data, channels_last=True)
    assert img.shape == (3, 4, 5, 6)


def test_lazy_from_path(nii_path):
    path, data, aff = nii_path
    img = ScalarImage(path)
    assert not img.is_loaded
    # metadata without load
    assert img.shape == (1, 6, 7, 8)
    assert img.spacing == (2.0, 2.0, 2.0)
    assert not img.is_loaded
    np.testing.assert_allclose(img.data, data, rtol=1e-6)
    assert img.is_loaded


def test_affine_override(nii_path):
    path, _, _ = nii_path
    img = ScalarImage(path, affine=np.eye(4))
    assert img.spacing == (1.0, 1.0, 1.0)


def test_region_read_lazy(nii_path):
    path, data, aff = nii_path
    img = ScalarImage(path)
    sub = img[:, 2:5, 1:4, 0:8]
    assert not img.is_loaded
    assert sub.shape == (1, 3, 3, 8)
    np.testing.assert_allclose(sub.data, data[:, 2:5, 1:4, :], rtol=1e-6)
    # origin shifted by corner (2, 1, 0) * spacing 2
    np.testing.assert_allclose(sub.affine.origin, [1 + 4, 2 + 2, 3 + 0])


def test_getitem_loaded(rng):
    data = rng.normal(size=(2, 6, 6, 6)).astype(np.float32)
    img = ScalarImage(data)
    sub = img[1, 0:3]
    assert sub.shape == (1, 3, 6, 6)
    np.testing.assert_array_equal(sub.data, data[1:2, 0:3])


def test_metadata_access(rng):
    img = ScalarImage(rng.normal(size=(1, 2, 2, 2)), protocol="MPRAGE", age=30)
    assert img.protocol == "MPRAGE"
    assert img["age"] == 30
    img["site"] = "X"
    assert img.site == "X"
    with pytest.raises(AttributeError):
        _ = img.missing_key


def test_set_data(rng):
    img = ScalarImage(rng.normal(size=(1, 2, 2, 2)))
    img.set_data(np.zeros((1, 3, 3, 3), np.float32))
    assert img.shape == (1, 3, 3, 3)


def test_save_roundtrip(tmp_path, rng):
    data = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
    img = ScalarImage(data, affine=np.diag([2.0, 2, 2, 1]))
    out = tmp_path / "out.nii.gz"
    img.save(out)
    img2 = ScalarImage(out)
    np.testing.assert_allclose(img2.data, data, rtol=1e-6)
    assert img2.spacing == (2.0, 2.0, 2.0)


def test_deepcopy_preserves_laziness(nii_path):
    path, data, _ = nii_path
    img = ScalarImage(path)
    img2 = copy.deepcopy(img)
    assert not img.is_loaded and not img2.is_loaded
    np.testing.assert_allclose(img2.data, data, rtol=1e-6)
    assert not img.is_loaded  # copy loading must not load original


def test_deepcopy_loaded_independent(rng):
    img = ScalarImage(rng.normal(size=(1, 2, 2, 2)).astype(np.float32))
    img2 = copy.deepcopy(img)
    img2.data[0, 0, 0, 0] = 99.0
    assert img.data[0, 0, 0, 0] != 99.0


def test_label_map_is_image(rng):
    lm = LabelMap(rng.integers(0, 3, size=(1, 4, 4, 4)))
    assert isinstance(lm, Image)
    assert not isinstance(lm, ScalarImage)


def test_new_like(rng):
    img = ScalarImage(rng.normal(size=(1, 2, 2, 2)), protocol="X")
    new = img.new_like(data=np.ones((1, 2, 2, 2), np.float32))
    assert type(new) is ScalarImage
    assert new.protocol == "X"
    np.testing.assert_array_equal(new.data, 1.0)


def test_bytes_source(nii_path):
    path, data, _ = nii_path
    img = ScalarImage(path.read_bytes())
    np.testing.assert_allclose(img.data, data, rtol=1e-6)


def test_empty_image_errors():
    img = ScalarImage()
    with pytest.raises(RuntimeError):
        _ = img.data


def test_memory_estimate(rng):
    img = ScalarImage(rng.normal(size=(1, 10, 10, 10)).astype(np.float32))
    assert img.memory == 1000 * 4


class TestImageBehaviors:
    """Container behaviors mirrored from the reference's tests/test_image.py."""

    def test_set_data_keeps_affine(self, rng):
        import torchio_tpu as tio
        from torchio_tpu.core.affine import AffineMatrix

        img = tio.ScalarImage(
            rng.random((1, 4, 4, 4)).astype(np.float32),
            affine=AffineMatrix.from_spacing((2.0, 2.0, 2.0)),
        )
        img.set_data(np.ones((1, 4, 4, 4), np.float32))
        assert img.spacing == pytest.approx((2.0, 2.0, 2.0))
        np.testing.assert_array_equal(np.asarray(img.data), 1.0)

    def test_set_data_3d_promoted(self, rng):
        import torchio_tpu as tio

        img = tio.ScalarImage(rng.random((1, 4, 4, 4)).astype(np.float32))
        img.set_data(np.zeros((4, 4, 4), np.float32))
        assert img.shape == (1, 4, 4, 4)

    def test_set_data_wrong_ndim_raises(self, rng):
        import torchio_tpu as tio

        img = tio.ScalarImage(rng.random((1, 4, 4, 4)).astype(np.float32))
        with pytest.raises(ValueError, match="3D or 4D"):
            img.set_data(np.zeros((4, 4), np.float32))

    def test_numpy_and_jax_views(self, rng):
        import jax

        import torchio_tpu as tio

        img = tio.ScalarImage(rng.random((1, 4, 4, 4)).astype(np.float32))
        assert isinstance(img.numpy(), np.ndarray)
        assert isinstance(img.jax(), jax.Array)

    def test_to_dtype(self, rng):
        import torchio_tpu as tio

        img = tio.ScalarImage(rng.random((1, 4, 4, 4)).astype(np.float32))
        img.to(dtype=np.float16)
        assert np.asarray(img.data).dtype == np.float16

    def test_device_none_on_host(self, rng):
        import torchio_tpu as tio

        img = tio.ScalarImage(rng.random((1, 4, 4, 4)).astype(np.float32))
        assert img.device is None
        img.to("cpu")  # no-op host move works
        assert img.device is None

    def test_metadata_setitem_contains(self, rng):
        import torchio_tpu as tio

        img = tio.ScalarImage(rng.random((1, 4, 4, 4)).astype(np.float32))
        img["te"] = 3.5
        assert "te" in img
        assert img.te == 3.5
        with pytest.raises(AttributeError):
            _ = img.nonexistent

    def test_loaded_and_lazy_repr(self, tmp_path, rng):
        import torchio_tpu as tio

        img = tio.ScalarImage(rng.random((1, 4, 4, 4)).astype(np.float32))
        assert "loaded" in repr(img)
        img.save(tmp_path / "r.nii.gz")
        lazy = tio.ScalarImage(tmp_path / "r.nii.gz")
        assert "lazy" in repr(lazy)

    def test_empty_image_repr(self):
        import torchio_tpu as tio

        assert "empty" in repr(tio.ScalarImage())

    def test_deepcopy_lazy_stays_lazy(self, tmp_path, rng):
        import copy

        import torchio_tpu as tio

        img = tio.ScalarImage(rng.random((1, 4, 4, 4)).astype(np.float32))
        img.save(tmp_path / "d.nii.gz")
        lazy = tio.ScalarImage(tmp_path / "d.nii.gz")
        dup = copy.deepcopy(lazy)
        assert not lazy.is_loaded
        assert not dup.is_loaded
        np.testing.assert_array_equal(np.asarray(dup.data), np.asarray(img.data))

    def test_copy_module_copy(self, rng):
        import copy

        import torchio_tpu as tio

        img = tio.ScalarImage(rng.random((1, 4, 4, 4)).astype(np.float32))
        dup = copy.copy(img)
        dup.data[0, 0, 0, 0] = 99.0
        assert np.asarray(img.data)[0, 0, 0, 0] != 99.0

    def test_plot_to_file(self, tmp_path, rng):
        import torchio_tpu as tio

        img = tio.ScalarImage(rng.random((1, 6, 6, 6)).astype(np.float32))
        out = tmp_path / "p.png"
        img.plot(output_path=out, show=False)
        assert out.stat().st_size > 0

    def test_to_gif(self, tmp_path, rng):
        import torchio_tpu as tio

        img = tio.ScalarImage(rng.random((1, 6, 6, 6)).astype(np.float32))
        out = img.to_gif(tmp_path / "s.gif")
        assert Path(out).stat().st_size > 0

    def test_repr_html(self, rng):
        import torchio_tpu as tio

        img = tio.ScalarImage(rng.random((1, 6, 6, 6)).astype(np.float32))
        html = img._repr_html_()
        assert "6" in html


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


class TestImageEdges:
    def test_jax_source_3d_promotes(self):
        img = ScalarImage(jnp.ones((4, 5, 6)))
        assert img.data.shape == (1, 4, 5, 6)
        assert isinstance(img.jax(), jax.Array)
        # numpy() pulls the device array through _to_host
        assert img.numpy().shape == (1, 4, 5, 6)

    def test_jax_source_channels_last(self):
        img = ScalarImage(jnp.ones((4, 5, 6, 2)), channels_last=True)
        assert img.data.shape == (2, 4, 5, 6)

    def test_jax_source_region_read_and_unload(self):
        img = ScalarImage(jnp.arange(24, dtype=jnp.float32).reshape(1, 2, 3, 4))
        region = img[:, :1, :2, :3]
        assert np.asarray(region.data).shape == (1, 1, 2, 3)
        img.unload()  # no path, no ArrayBackend: a no-op
        assert img.data.shape == (1, 2, 3, 4)

    def test_file_like_source(self, tmp_path):
        path = tmp_path / "t.nii"
        ScalarImage(np.ones((1, 3, 4, 5), np.float32)).save(path)
        with open(path, "rb") as f:
            img = ScalarImage(f)
        assert img.shape == (1, 3, 4, 5)

    def test_set_data_default_affine(self, tmp_path):
        path = tmp_path / "t.nii"
        ScalarImage(np.ones((1, 3, 4, 5), np.float32)).save(path)
        img = ScalarImage(path)  # lazy: affine not resolved yet
        img.set_data(np.zeros((1, 2, 2, 2), np.float32))
        np.testing.assert_array_equal(img.affine.data, np.eye(4))

    def test_to_video_delegates(self, monkeypatch, tmp_path):
        import torchio_tpu.visualization as viz

        calls = {}
        monkeypatch.setattr(
            viz, "make_video", lambda img, out, **kw: calls.setdefault("out", out)
        )
        img = ScalarImage(np.ones((1, 3, 4, 5), np.float32))
        img.to_video(tmp_path / "x.mp4")
        assert calls["out"] == tmp_path / "x.mp4"

    def test_plot_interactive_with_fake_niivue(self, monkeypatch):
        import torchio_tpu.external.imports as ximports

        class FakeViewer:
            def __init__(self, height):
                self.height = height
                self.volumes = None

            def load_volumes(self, volumes):
                self.volumes = volumes

        class FakeNiiVue:
            NiiVue = FakeViewer

        monkeypatch.setattr(ximports, "get_ipyniivue", lambda: FakeNiiVue)
        img = ScalarImage(np.ones((1, 3, 4, 5), np.float32))
        viewer = img.plot_interactive(height=250)
        assert viewer.height == 250
        assert viewer.volumes[0]["path"].endswith(".nii.gz")

    def test_list_source(self):
        img = ScalarImage([[[[1.0, 2.0]]]])
        assert img.data.shape == (1, 1, 1, 2)

    def test_dataobj_materializes_device_image(self):
        from torchio_tpu.io.backends import ArrayBackend

        img = ScalarImage(jnp.ones((1, 2, 3, 4), jnp.float32))
        assert isinstance(img.dataobj, ArrayBackend)

    def test_getattr_edges(self):
        img = ScalarImage(np.ones((1, 2, 2, 2), np.float32))
        with pytest.raises(AttributeError):
            img._not_there  # noqa: B018
        # before __init__ ran (e.g. mid-unpickle) attribute lookup must
        # not recurse through _metadata
        blank = object.__new__(ScalarImage)
        with pytest.raises(AttributeError):
            blank.anything  # noqa: B018


class TestImageDeviceString:
    def test_to_device_string(self):
        img = tio.ScalarImage(np.zeros((1, 4, 4, 4), np.float32))
        out = img.to("cpu")
        assert out.shape == (1, 4, 4, 4)


class TestImageNamedDeviceString:
    def test_non_host_device_string_resolves(self, monkeypatch):
        import jax

        monkeypatch.setattr(
            "torchio_tpu.data.image.jax.devices",
            lambda name=None: jax.local_devices(backend="cpu"),
        )
        img = tio.ScalarImage(np.zeros((1, 4, 4, 4), np.float32))
        out = img.to("tpu")
        assert out.shape == (1, 4, 4, 4)

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

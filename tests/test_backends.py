import numpy as np
import pytest

from torchio_tpu.io.backends import (
    ArrayBackend,
    BackendRequest,
    CroppedBackend,
    ImageDataBackend,
    NiftiBackend,
    PaddedBackend,
    normalize_index,
    register_backend,
    resolve_backend,
    unregister_backend,
)
from torchio_tpu.io.nifti import write_nifti

SHAPE = (2, 5, 6, 7)


def test_normalize_index_variants():
    assert normalize_index((), SHAPE) == (
        slice(0, 2, 1),
        slice(0, 5, 1),
        slice(0, 6, 1),
        slice(0, 7, 1),
    )
    assert normalize_index(0, SHAPE)[0] == slice(0, 1, 1)
    assert normalize_index((Ellipsis, 3), SHAPE)[3] == slice(3, 4, 1)
    assert normalize_index((0, slice(1, 4)), SHAPE)[1] == slice(1, 4, 1)
    assert normalize_index((-1,), SHAPE)[0] == slice(1, 2, 1)


def test_normalize_index_errors():
    with pytest.raises(IndexError):
        normalize_index((0, 0, 0, 0, 0), SHAPE)
    with pytest.raises(IndexError):
        normalize_index(99, SHAPE)
    with pytest.raises(IndexError):
        normalize_index((Ellipsis, Ellipsis), SHAPE)


def test_array_backend(rng):
    data = rng.normal(size=SHAPE).astype(np.float32)
    b = ArrayBackend(data)
    assert isinstance(b, ImageDataBackend)
    assert b.shape == SHAPE
    assert b.dtype == np.float32
    region = b[normalize_index((slice(None), slice(1, 3)), SHAPE)]
    np.testing.assert_array_equal(region, data[:, 1:3])
    np.testing.assert_array_equal(b.to_array(), data)


def test_nifti_backend_lazy(tmp_path, rng):
    data = rng.normal(size=(1, 5, 6, 7)).astype(np.float32)
    aff = np.diag([2.0, 2.0, 2.0, 1.0])
    path = tmp_path / "x.nii"
    write_nifti(path, data, aff)
    b = NiftiBackend(path)
    assert isinstance(b, ImageDataBackend)
    assert b.shape == (1, 5, 6, 7)
    np.testing.assert_allclose(b.affine, aff, atol=1e-5)
    region = b[normalize_index((0, slice(1, 4)), b.shape)]
    np.testing.assert_allclose(region, data[0:1, 1:4], rtol=1e-6)


def test_cropped_backend(rng):
    data = rng.normal(size=SHAPE).astype(np.float32)
    parent = ArrayBackend(data, np.diag([2.0, 2.0, 2.0, 1.0]))
    sl = normalize_index((slice(None), slice(1, 4), slice(2, 5), slice(0, 7)), SHAPE)
    b = CroppedBackend(parent, sl)
    assert b.shape == (2, 3, 3, 7)
    np.testing.assert_array_equal(b.to_array(), data[:, 1:4, 2:5, :])
    # affine origin shifted by corner * spacing
    np.testing.assert_allclose(b.affine[:3, 3], [2.0, 4.0, 0.0])
    # region read through the view
    inner = normalize_index((slice(None), slice(1, 3)), b.shape)
    np.testing.assert_array_equal(b[inner], data[:, 2:4, 2:5, :])


def test_padded_backend(rng):
    data = rng.normal(size=(1, 3, 3, 3)).astype(np.float32)
    parent = ArrayBackend(data)
    b = PaddedBackend(parent, (1, 0, 2), (2, 1, 0), fill=-1.0)
    assert b.shape == (1, 6, 4, 5)
    full = b.to_array()
    np.testing.assert_array_equal(full[:, 1:4, 0:3, 2:5], data)
    assert (full[:, 0] == -1.0).all()
    np.testing.assert_allclose(b.affine[:3, 3], [-1.0, 0.0, -2.0])


def test_padded_backend_region_outside(rng):
    data = rng.normal(size=(1, 3, 3, 3)).astype(np.float32)
    b = PaddedBackend(ArrayBackend(data), (2, 2, 2), (2, 2, 2), fill=0.0)
    region = b[normalize_index((slice(None), slice(0, 2), slice(0, 2), slice(0, 2)), b.shape)]
    assert (region == 0).all()


def test_registry_resolution(tmp_path, rng):
    data = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
    path = tmp_path / "x.nii.gz"
    write_nifti(path, data)
    backend = resolve_backend(BackendRequest(source=path))
    assert isinstance(backend, NiftiBackend)


def test_custom_reader():
    def reader(source):
        return np.ones((1, 2, 2, 2), np.float32), np.eye(4)

    backend = resolve_backend(BackendRequest(source="whatever.xyz", reader=reader))
    assert isinstance(backend, ArrayBackend)
    assert backend.shape == (1, 2, 2, 2)


def test_register_unregister():
    sentinel = ArrayBackend(np.zeros((1, 1, 1, 1), np.float32))

    def matcher(request):
        if request.source == "MAGIC":
            return sentinel
        return None

    register_backend("magic", matcher)
    try:
        assert resolve_backend(BackendRequest(source="MAGIC")) is sentinel
    finally:
        unregister_backend("magic")
    with pytest.raises(ValueError):
        resolve_backend(BackendRequest(source="MAGIC"))


def test_incomplete_backend_rejected_at_resolve():
    """A matcher returning an object missing protocol methods fails fast
    with a clear TypeError instead of a masked AttributeError later."""
    import pytest

    from torchio_tpu.io.backends import (
        BackendRequest,
        register_backend,
        resolve_backend,
        unregister_backend,
    )

    class Incomplete:  # no to_array
        shape = (1, 4, 4, 4)
        affine = np.eye(4)
        dtype = np.float32

        def __getitem__(self, slices):
            return np.zeros((1, 4, 4, 4))[slices]

    register_backend(
        "incomplete", lambda r: Incomplete() if r.source == "x://y" else None
    )
    try:
        with pytest.raises(TypeError, match="to_array"):
            resolve_backend(BackendRequest(source="x://y"))
    finally:
        unregister_backend("incomplete")

import copy

import numpy as np
import pytest

from torchio_tpu.core.affine import AffineMatrix, orientation_codes


def test_identity_defaults():
    a = AffineMatrix()
    assert a.spacing == (1.0, 1.0, 1.0)
    assert a.origin == (0.0, 0.0, 0.0)
    assert a.orientation == ("R", "A", "S")
    assert a.euler_angles == (0.0, 0.0, 0.0)


def test_from_spacing():
    a = AffineMatrix.from_spacing((2.0, 3.0, 4.0), origin=(1.0, -1.0, 5.0))
    assert a.spacing == (2.0, 3.0, 4.0)
    assert a.origin == (1.0, -1.0, 5.0)
    b = AffineMatrix.from_spacing(2.0)
    assert b.spacing == (2.0, 2.0, 2.0)


def test_bad_shape():
    with pytest.raises(ValueError):
        AffineMatrix(np.eye(3))


def test_compose_and_inverse():
    a = AffineMatrix.from_spacing((2.0, 2.0, 2.0), origin=(10, 20, 30))
    inv = a.inverse()
    prod = a @ inv
    np.testing.assert_allclose(prod.data, np.eye(4), atol=1e-12)


def test_apply_points():
    a = AffineMatrix.from_spacing((2.0, 2.0, 2.0), origin=(1.0, 2.0, 3.0))
    pts = np.array([[0, 0, 0], [1, 1, 1]], dtype=float)
    out = a.apply(pts)
    np.testing.assert_allclose(out, [[1, 2, 3], [3, 4, 5]])


def test_orientation_lps():
    m = np.diag([-1.0, -1.0, 1.0, 1.0])
    assert orientation_codes(m) == ("L", "P", "S")


def test_orientation_permuted():
    # voxel axis 0 -> world +z (S), axis 1 -> world -x (L), axis 2 -> world +y (A)
    m = np.zeros((4, 4))
    m[2, 0] = 1.0
    m[0, 1] = -1.0
    m[1, 2] = 1.0
    m[3, 3] = 1.0
    assert orientation_codes(m) == ("S", "L", "A")


def test_orientation_oblique():
    # small rotation should not change nearest-axis codes
    th = np.deg2rad(10)
    rot = np.array(
        [
            [np.cos(th), -np.sin(th), 0],
            [np.sin(th), np.cos(th), 0],
            [0, 0, 1],
        ]
    )
    m = np.eye(4)
    m[:3, :3] = rot
    assert orientation_codes(m) == ("R", "A", "S")


def test_euler_angles():
    th = 30.0
    rad = np.deg2rad(th)
    rot = np.array(
        [
            [np.cos(rad), -np.sin(rad), 0],
            [np.sin(rad), np.cos(rad), 0],
            [0, 0, 1],
        ]
    )
    m = np.eye(4)
    m[:3, :3] = rot
    a = AffineMatrix(m)
    x, y, z = a.euler_angles
    np.testing.assert_allclose([x, y, z], [0.0, 0.0, th], atol=1e-10)


def test_eq_copy_deepcopy():
    a = AffineMatrix.from_spacing((2, 2, 2))
    b = a.clone()
    assert a == b
    c = copy.deepcopy(a)
    assert a == c
    c.data[0, 0] = 99
    assert a != c


def test_array_protocol():
    a = AffineMatrix.from_spacing((2, 2, 2))
    arr = np.asarray(a)
    assert arr.shape == (4, 4)
    assert arr.dtype == np.float64


def test_direction_normalized():
    a = AffineMatrix.from_spacing((2.0, 3.0, 4.0))
    np.testing.assert_allclose(a.direction, np.eye(3))


def test_json_roundtrip():
    a = AffineMatrix.from_spacing((1.5, 2.5, 3.5), origin=(-1, 0, 1))
    b = AffineMatrix(a.tolist())
    assert a == b


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


class TestAffineEdges:
    def test_from_spacing_scalar_with_direction(self):
        aff = AffineMatrix.from_spacing(2.0, direction=np.eye(3))
        assert aff.spacing == (2.0, 2.0, 2.0)

    def test_euler_gimbal_lock(self):
        # 90 deg about Y: r[0,0] = r[1,0] = 0 -> the sy < 1e-6 branch
        m = np.eye(4)
        m[:3, :3] = np.array([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [-1.0, 0.0, 0.0]])
        x, y, z = AffineMatrix(m).euler_angles
        assert y == pytest.approx(90.0)
        assert z == 0.0

    def test_numpy_tolist_to(self):
        aff = AffineMatrix()
        out = aff.numpy()
        assert out.dtype == np.float64
        out[0, 0] = 99  # a copy: the affine must not see the write
        assert aff.data[0, 0] == 1.0
        assert aff.tolist()[3] == [0.0, 0.0, 0.0, 1.0]
        assert aff.to("some-device") is aff

    def test_matmul_non_affine_is_type_error(self):
        with pytest.raises(TypeError):
            AffineMatrix() @ 3  # noqa: B018

    def test_array_protocol_dtype(self):
        arr = np.asarray(AffineMatrix(), dtype=np.float32)
        assert arr.dtype == np.float32

    def test_eq_hash_repr_copy(self):
        aff = AffineMatrix.from_spacing((1, 2, 3))
        assert (aff == object()) is False
        assert hash(aff) == hash(aff.clone())
        assert "spacing=(1.00, 2.00, 3.00)" in repr(aff)
        assert copy.copy(aff) == aff

    def test_direction_object_with_detach_only(self):
        class DetachOnly:
            def __init__(self, arr):
                self._arr = arr

            def detach(self):
                return self

            def cpu(self):
                return self

            def numpy(self):
                return self._arr

        aff = AffineMatrix.from_spacing((1, 1, 1), direction=DetachOnly(np.eye(3)))
        np.testing.assert_array_equal(aff.data, np.eye(4))

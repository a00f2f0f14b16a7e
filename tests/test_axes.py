import itertools

import pytest

from torchio_tpu.core.axes import (
    AxesType,
    axes_type,
    get_axis_mapping,
    validate_axes,
)


def test_validate_voxel():
    for perm in itertools.permutations("IJK"):
        assert validate_axes("".join(perm))


def test_validate_anatomical():
    for combo in itertools.product("RL", "AP", "SI"):
        for perm in itertools.permutations(combo):
            assert validate_axes("".join(perm))


@pytest.mark.parametrize("bad", ["", "IJ", "IJKL", "IIK", "RAP", "RLS", "xyz", "RAs"])
def test_validate_bad(bad):
    with pytest.raises(ValueError):
        validate_axes(bad)


def test_ijk_is_voxel():
    # 'IJK' contains 'I' which is also anatomical (Inferior) but must parse voxel
    assert axes_type("IJK") is AxesType.VOXEL
    assert axes_type("RAS") is AxesType.ANATOMICAL
    assert axes_type("IPL") is AxesType.ANATOMICAL  # I=Inferior here


def test_voxel_mapping():
    perm, flips = get_axis_mapping("IJK", "KIJ")
    assert perm == (2, 0, 1)
    assert flips == (False, False, False)


def test_anatomical_mapping_flips():
    perm, flips = get_axis_mapping("RAS", "LPS")
    assert perm == (0, 1, 2)
    assert flips == (True, True, False)


def test_anatomical_mapping_perm_and_flip():
    perm, flips = get_axis_mapping("RAS", "ASL")
    assert perm == (1, 2, 0)
    assert flips == (False, False, True)


def test_cross_type_raises():
    with pytest.raises(ValueError):
        get_axis_mapping("IJK", "RAS")


def test_mapping_roundtrip():
    perm, flips = get_axis_mapping("LPI", "RAS")
    perm2, flips2 = get_axis_mapping("RAS", "LPI")
    # applying perm then perm2 must be identity
    composed = tuple(perm[perm2[i]] for i in range(3))
    assert composed == (0, 1, 2)
    assert flips == flips2 == (True, True, True)


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


class TestOrientationEdges:
    def test_incompatible_orientations(self):
        from torchio_tpu.core.orientation import axcodes2ornt, ornt_transform

        start = axcodes2ornt("RRS")  # degenerate: axis 0 twice, axis 1 never
        end = axcodes2ornt("RAS")
        with pytest.raises(ValueError, match="Incompatible"):
            ornt_transform(start, end)

    def test_apply_orientation_flip(self):
        from torchio_tpu.core.orientation import (
            apply_orientation,
            axcodes2ornt,
            ornt_transform,
        )

        arr = np.arange(8, dtype=np.float32).reshape(2, 2, 2)
        ornt = ornt_transform(axcodes2ornt("RAS"), axcodes2ornt("LAS"))
        out = apply_orientation(arr, ornt)
        np.testing.assert_array_equal(out, arr[::-1])

import numpy as np
import pytest

from torchio_tpu.core.affine import AffineMatrix
from torchio_tpu.data import (
    BoundingBoxes,
    BoundingBoxFormat,
    Points,
    Representation,
)


def test_points_basics():
    pts = Points([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    assert pts.num_points == 2
    assert len(pts) == 2
    assert pts.axes == "IJK"
    with pytest.raises(ValueError):
        Points([[1.0, 2.0]])


def test_points_to_world():
    aff = AffineMatrix.from_spacing((2.0, 2.0, 2.0), origin=(10, 0, 0))
    pts = Points([[1.0, 1.0, 1.0]], affine=aff)
    np.testing.assert_allclose(pts.to_world(), [[12.0, 2.0, 2.0]])


def test_points_voxel_permutation():
    pts = Points([[1.0, 2.0, 3.0]], axes="IJK")
    out = pts.to_axes("KJI")
    np.testing.assert_allclose(out.data, [[3.0, 2.0, 1.0]])
    assert out.axes == "KJI"


def test_points_anatomical_flip():
    pts = Points([[1.0, 2.0, 3.0]], axes="RAS")
    out = pts.to_axes("LPS")
    np.testing.assert_allclose(out.data, [[-1.0, -2.0, 3.0]])


def test_points_cross_type_roundtrip():
    aff = AffineMatrix.from_spacing((2.0, 2.0, 2.0), origin=(5, 6, 7))
    pts = Points([[1.0, 2.0, 3.0]], axes="IJK", affine=aff)
    ras = pts.to_axes("RAS")
    np.testing.assert_allclose(ras.data, [[7.0, 10.0, 13.0]])
    back = ras.to_axes("IJK")
    np.testing.assert_allclose(back.data, pts.data, atol=1e-5)


def test_bbox_representation_roundtrip():
    boxes = BoundingBoxes(
        [[0.0, 0.0, 0.0, 4.0, 6.0, 8.0]], format=BoundingBoxFormat.IJKIJK
    )
    cs = boxes.to_format(BoundingBoxFormat.IJKWHD)
    np.testing.assert_allclose(cs.data, [[2.0, 3.0, 4.0, 4.0, 6.0, 8.0]])
    back = cs.to_format(BoundingBoxFormat.IJKIJK)
    np.testing.assert_allclose(back.data, boxes.data)


def test_bbox_anatomical_flip_resorts_corners():
    fmt_ras = BoundingBoxFormat("RAS")
    fmt_las = BoundingBoxFormat("LAS")
    boxes = BoundingBoxes([[1.0, 0.0, 0.0, 3.0, 1.0, 1.0]], format=fmt_ras)
    out = boxes.to_format(fmt_las)
    # R-axis flips: [1, 3] -> [-3, -1], min/max re-sorted
    np.testing.assert_allclose(out.data, [[-3.0, 0.0, 0.0, -1.0, 1.0, 1.0]])


def test_bbox_cross_type():
    aff = AffineMatrix.from_spacing((2.0, 2.0, 2.0))
    boxes = BoundingBoxes(
        [[1.0, 1.0, 1.0, 2.0, 2.0, 2.0]],
        format=BoundingBoxFormat.IJKIJK,
        affine=aff,
    )
    world = boxes.to_format(BoundingBoxFormat("RAS"))
    np.testing.assert_allclose(world.data, [[2.0, 2.0, 2.0, 4.0, 4.0, 4.0]])
    back = world.to_format(BoundingBoxFormat.IJKIJK)
    np.testing.assert_allclose(back.data, boxes.data, atol=1e-5)


def test_bbox_labels_validated():
    with pytest.raises(ValueError):
        BoundingBoxes([[0, 0, 0, 1, 1, 1]], labels=[1, 2])
    b = BoundingBoxes([[0, 0, 0, 1, 1, 1]], labels=[7])
    assert b.labels is not None
    assert b.labels[0] == 7


def test_bbox_format_equality():
    assert BoundingBoxFormat("IJK") == BoundingBoxFormat("IJK", "corners")
    assert BoundingBoxFormat("IJK") != BoundingBoxFormat("RAS")
    assert BoundingBoxFormat("IJK", Representation.CENTER_SIZE) == BoundingBoxFormat.IJKWHD


class TestPointsBehaviors:
    """Container behaviors mirrored from the reference's tests/test_points.py."""

    def test_default_affine_is_identity(self):
        pts = Points(np.zeros((2, 3), np.float32))
        np.testing.assert_array_equal(pts.affine.data, np.eye(4))

    def test_default_axes_ijk(self):
        assert Points(np.zeros((1, 3), np.float32)).axes == "IJK"

    def test_empty_points(self):
        pts = Points(np.zeros((0, 3), np.float32))
        assert len(pts) == 0
        assert pts.num_points == 0

    def test_wrong_shape_raises(self):
        with pytest.raises(ValueError):
            Points(np.zeros((3,), np.float32))

    def test_wrong_columns_raises(self):
        with pytest.raises(ValueError):
            Points(np.zeros((2, 4), np.float32))

    def test_invalid_axes_raises(self):
        with pytest.raises(ValueError):
            Points(np.zeros((1, 3), np.float32), axes="XYZ")

    def test_len_and_num_points(self):
        pts = Points(np.zeros((5, 3), np.float32))
        assert len(pts) == 5
        assert pts.num_points == 5

    def test_new_like_preserves_affine_and_axes(self):
        affine = AffineMatrix.from_spacing((2.0, 2.0, 2.0))
        pts = Points(np.zeros((2, 3), np.float32), affine=affine, axes="KJI")
        new = pts.new_like(data=np.ones((2, 3), np.float32))
        assert new.axes == "KJI"
        assert new.affine.spacing == pytest.approx((2.0, 2.0, 2.0))
        np.testing.assert_array_equal(new.data, 1.0)

    def test_same_axes_noop(self):
        pts = Points(np.array([[1.0, 2.0, 3.0]], np.float32))
        same = pts.to_axes("IJK")
        np.testing.assert_array_equal(same.data, pts.data)

    def test_repr_mentions_count(self):
        r = repr(Points(np.zeros((3, 3), np.float32)))
        assert "3" in r

    def test_deepcopy_independent(self):
        import copy

        pts = Points(np.zeros((2, 3), np.float32))
        dup = copy.deepcopy(pts)
        dup.data[0, 0] = 99.0
        assert pts.data[0, 0] == 0.0


class TestBoundingBoxesBehaviors:
    def test_wrong_shape_raises(self):
        with pytest.raises(ValueError):
            BoundingBoxes(np.zeros((2, 5), np.float32))

    def test_format_from_string_representation(self):
        fmt = BoundingBoxFormat("RAS", "center_size")
        assert fmt.representation == Representation.CENTER_SIZE

    def test_format_invalid_axes_raises(self):
        with pytest.raises(ValueError):
            BoundingBoxFormat("XYZ")

    def test_format_hashable(self):
        assert hash(BoundingBoxFormat.IJKIJK) == hash(
            BoundingBoxFormat("IJK", Representation.CORNERS)
        )

    def test_format_inequality(self):
        assert BoundingBoxFormat.IJKIJK != BoundingBoxFormat.IJKWHD
        assert BoundingBoxFormat("IJK") != BoundingBoxFormat("RAS")

    def test_predefined_formats(self):
        assert BoundingBoxFormat.IJKIJK.axes == "IJK"
        assert BoundingBoxFormat.IJKIJK.representation == Representation.CORNERS
        assert BoundingBoxFormat.IJKWHD.representation == Representation.CENTER_SIZE


class TestBoundingBoxesContainer:
    def test_properties_and_len(self):
        boxes = BoundingBoxes(
            np.array([[0, 0, 0, 2, 2, 2], [1, 1, 1, 3, 3, 3]], np.float32),
            labels=[1, 2],
        )
        assert boxes.num_boxes == 2
        assert len(boxes) == 2
        assert boxes.device == "cpu"
        np.testing.assert_array_equal(boxes.labels, [1, 2])
        assert boxes.to() is boxes  # host metadata, no-op

    def test_repr(self):
        boxes = BoundingBoxes(np.zeros((1, 6), np.float32))
        r = repr(boxes)
        assert "num_boxes=1" in r and "IJK" in r
        fmt_r = repr(BoundingBoxFormat.IJKWHD)
        assert "center_size" in fmt_r

    def test_format_eq_non_format(self):
        assert BoundingBoxFormat.IJKIJK != "IJKIJK"

    def test_new_like_preserves_format_and_metadata(self):
        boxes = BoundingBoxes(
            np.zeros((1, 6), np.float32),
            format=BoundingBoxFormat.IJKWHD,
            metadata={"source": "detector-v2"},
        )
        new = boxes.new_like(data=np.ones((2, 6), np.float32))
        assert new.format == BoundingBoxFormat.IJKWHD
        assert new.metadata == {"source": "detector-v2"}
        assert new.num_boxes == 2

    def test_deepcopy_independent(self):
        import copy

        boxes = BoundingBoxes(np.zeros((1, 6), np.float32), labels=[7])
        dup = copy.deepcopy(boxes)
        dup.data[0, 0] = 5.0
        assert boxes.data[0, 0] == 0.0
        np.testing.assert_array_equal(dup.labels, [7])

    def test_same_format_conversion_is_copy(self):
        boxes = BoundingBoxes(np.array([[0, 0, 0, 2, 2, 2]], np.float32))
        same = boxes.to_format(BoundingBoxFormat.IJKIJK)
        assert same is not boxes
        np.testing.assert_array_equal(same.data, boxes.data)

    def test_anatomical_to_voxel_roundtrip(self):
        affine = AffineMatrix.from_spacing((2.0, 2.0, 2.0))
        boxes = BoundingBoxes(
            np.array([[1, 2, 3, 5, 6, 7]], np.float32), affine=affine
        )
        ras = boxes.to_format(BoundingBoxFormat("RAS"))
        back = ras.to_format(BoundingBoxFormat.IJKIJK)
        np.testing.assert_allclose(back.data, boxes.data, atol=1e-5)


class TestPointsConversionEdges:
    def test_device_and_to_noop(self):
        pts = Points(np.zeros((1, 3), np.float32))
        assert pts.device == "cpu"
        assert pts.to("anything") is pts

    def test_metadata_property(self):
        pts = Points(np.zeros((1, 3), np.float32), metadata={"set": "AC-PC"})
        assert pts.metadata == {"set": "AC-PC"}

    def test_non_ijk_voxel_to_anatomical(self):
        # KJI voxel points -> RAS world: permute to IJK first, then affine
        affine = AffineMatrix.from_spacing((2.0, 3.0, 4.0))
        pts = Points(np.array([[7.0, 5.0, 3.0]], np.float32), axes="KJI", affine=affine)
        ras = pts.to_axes("RAS")
        # KJI (7,5,3) == IJK (3,5,7) -> world (6, 15, 28)
        np.testing.assert_allclose(ras.data, [[6.0, 15.0, 28.0]], atol=1e-5)

    def test_anatomical_to_non_ijk_voxel(self):
        affine = AffineMatrix.from_spacing((2.0, 3.0, 4.0))
        pts = Points(np.array([[6.0, 15.0, 28.0]], np.float32), axes="RAS", affine=affine)
        kji = pts.to_axes("KJI")
        np.testing.assert_allclose(kji.data, [[7.0, 5.0, 3.0]], atol=1e-5)

    def test_anatomical_to_different_anatomical_through_world(self):
        affine = AffineMatrix()  # identity: world axes are RAS
        pts = Points(np.array([[1.0, 2.0, 3.0]], np.float32), axes="LPI", affine=affine)
        ijk = pts.to_axes("IJK")
        # LPI -> RAS flips all three signs; identity affine -> voxel == world
        np.testing.assert_allclose(ijk.data, [[-1.0, -2.0, -3.0]], atol=1e-6)


def test_bbox_permuted_voxel_axes_world_round_trip():
    # non-IJK voxel axes through a world convention that differs from
    # the affine's orientation, and back (bboxes.py conversion branches)
    import numpy as np

    from torchio_tpu.data.bboxes import BoundingBoxes, BoundingBoxFormat

    affine = np.diag([2.0, 3.0, 4.0, 1.0])
    affine[:3, 3] = (10.0, -5.0, 7.0)
    boxes = BoundingBoxes(
        [[0.0, 1.0, 2.0, 5.0, 6.0, 7.0]],
        format=BoundingBoxFormat("KJI"),
        affine=affine,
    )
    assert boxes.affine.data.shape == (4, 4)
    world = boxes.to_format(BoundingBoxFormat("LPS"))
    # K-first corners map through the affine: voxel (2, 1, 0) -> RAS
    # (14, -2, 15) -> LPS mins/maxes
    ras_lo = affine @ np.array([2.0, 1.0, 0.0, 1.0])
    ras_hi = affine @ np.array([7.0, 6.0, 5.0, 1.0])
    lo = np.minimum(-ras_lo[:2], -ras_hi[:2])
    np.testing.assert_allclose(world.data[0, :2], lo)
    back = world.to_format(BoundingBoxFormat("KJI"))
    np.testing.assert_allclose(back.data, boxes.data, atol=1e-5)


# --- consolidated from test_coverage_edges6.py (round 5) ---
import struct
import sys
import numpy as np
import pytest
import torchio_tpu as tio
from torchio_tpu.data import ScalarImage

def _python_jpegll_edge6(monkeypatch):
    """Force the pure-Python JPEG-lossless decoder (the oracle)."""
    import torchio_tpu.native as native

    monkeypatch.setattr(native, "jpegll_decode", lambda stream: None)

def _python_jls_edge6(monkeypatch):
    import torchio_tpu.native as native

    monkeypatch.setattr(native, "jls_decode", lambda stream: None)


class TestBBoxAxesConversions:
    def _boxes(self, axes="IJK"):
        from torchio_tpu.core.affine import AffineMatrix
        from torchio_tpu.data.bboxes import (
            BoundingBoxes,
            BoundingBoxFormat,
            Representation,
        )

        fmt = BoundingBoxFormat(axes, Representation.CORNERS)
        return BoundingBoxes(
            np.array([[1.0, 2.0, 3.0, 4.0, 5.0, 6.0]], np.float32),
            format=fmt,
            affine=AffineMatrix(),
        )

    def test_affine_property(self):
        boxes = self._boxes()
        assert boxes.affine.spacing == (1.0, 1.0, 1.0)

    def test_voxel_perm_to_world(self):
        from torchio_tpu.data.bboxes import BoundingBoxFormat, Representation

        boxes = self._boxes("KJI")  # permuted voxel source axes
        out = boxes.to_format(BoundingBoxFormat("RAS", Representation.CORNERS))
        # KJI (1,2,3)-(4,5,6) -> IJK (3,2,1)-(6,5,4) -> RAS via identity
        np.testing.assert_allclose(
            np.asarray(out.data)[0], [3, 2, 1, 6, 5, 4]
        )

    def test_world_to_world_flip(self):
        from torchio_tpu.data.bboxes import BoundingBoxFormat, Representation

        boxes = self._boxes("RAS")
        # identity affine orientation is RAS; LPS flips the first two
        # world axes before mapping back through the inverse affine
        out = boxes.to_format(BoundingBoxFormat("KJI", Representation.CORNERS))
        np.testing.assert_allclose(
            np.asarray(out.data)[0], [3, 2, 1, 6, 5, 4]
        )

import numpy as np
import pytest

import torchio_tpu as tio
from torchio_tpu.io.nifti import write_nifti


@pytest.fixture
def subject(rng):
    return tio.Subject(
        t1=tio.ScalarImage(
            rng.normal(size=(1, 10, 12, 14)).astype(np.float32),
            affine=np.diag([2.0, 2.0, 2.0, 1.0]),
        )
    )


class TestCropOrPad:
    def test_crop_only_needed(self, subject):
        out = tio.CropOrPad(target_shape=(8, 8, 8))(subject)
        assert out.t1.spatial_shape == (8, 8, 8)

    def test_pad_only_needed(self, subject):
        out = tio.CropOrPad(target_shape=16)(subject)
        assert out.t1.spatial_shape == (16, 16, 16)

    def test_mixed(self, subject):
        out = tio.CropOrPad(target_shape=(12, 12, 12))(subject)
        assert out.t1.spatial_shape == (12, 12, 12)

    def test_none_keeps_axis(self, subject):
        out = tio.CropOrPad(target_shape=(8, None, 8))(subject)
        assert out.t1.spatial_shape == (8, 12, 8)

    def test_mm_units(self, subject):
        # 2mm spacing: 16mm target -> 8 voxels
        out = tio.CropOrPad(target_shape=16.0, units="mm")(subject)
        assert out.t1.spatial_shape == (8, 8, 8)

    def test_cm_units(self, subject):
        out = tio.CropOrPad(target_shape=1.6, units="cm")(subject)
        assert out.t1.spatial_shape == (8, 8, 8)

    def test_only_crop(self, subject):
        out = tio.CropOrPad(target_shape=12, only_crop=True)(subject)
        assert out.t1.spatial_shape == (10, 12, 12)

    def test_only_pad(self, subject):
        out = tio.CropOrPad(target_shape=12, only_pad=True)(subject)
        assert out.t1.spatial_shape == (12, 12, 14)

    def test_center_content(self, rng):
        data = np.zeros((1, 9, 9, 9), np.float32)
        data[0, 4, 4, 4] = 1.0
        sub = tio.Subject(t1=tio.ScalarImage(data))
        out = tio.CropOrPad(target_shape=5)(sub)
        assert np.asarray(out.t1.data)[0, 2, 2, 2] == 1.0

    def test_random_location(self, subject):
        tio.seed(0)
        out = tio.CropOrPad(target_shape=6, location="random")(subject)
        assert out.t1.spatial_shape == (6, 6, 6)

    def test_history_invertible(self, subject):
        out = tio.CropOrPad(target_shape=(12, 12, 12))(subject)
        names = [t.name for t in out.applied_transforms]
        assert "Pad" in names and "Crop" in names
        back = out.apply_inverse_transform()
        assert back.t1.spatial_shape == (10, 12, 14)
        np.testing.assert_allclose(back.t1.affine.data, subject.t1.affine.data)

    def test_lazy_no_load(self, tmp_path, rng):
        data = rng.normal(size=(1, 12, 12, 12)).astype(np.float32)
        path = tmp_path / "x.nii"
        write_nifti(path, data)
        img = tio.ScalarImage(path)
        sub = tio.Subject(t1=img)
        out = tio.CropOrPad(target_shape=8)(sub)
        assert not out.t1.is_loaded  # still lazy!
        assert out.t1.spatial_shape == (8, 8, 8)
        np.testing.assert_allclose(
            np.asarray(out.t1.data), data[:, 2:10, 2:10, 2:10], rtol=1e-6
        )

    def test_lazy_pad(self, tmp_path, rng):
        data = rng.normal(size=(1, 6, 6, 6)).astype(np.float32)
        path = tmp_path / "x.nii"
        write_nifti(path, data)
        sub = tio.Subject(t1=tio.ScalarImage(path))
        out = tio.CropOrPad(target_shape=10)(sub)
        assert not out.t1.is_loaded
        result = np.asarray(out.t1.data)
        assert result.shape == (1, 10, 10, 10)
        np.testing.assert_allclose(result[:, 2:8, 2:8, 2:8], data, rtol=1e-6)

    def test_batch_path(self, make_batch):
        batch = make_batch(3, shape=(1, 6, 7, 8))
        out = tio.CropOrPad(target_shape=8)(batch)
        assert out.images["t1"].data.shape == (3, 1, 8, 8, 8)

    def test_mutually_exclusive(self):
        with pytest.raises(ValueError):
            tio.CropOrPad(target_shape=8, only_crop=True, only_pad=True)


class TestEnsureShapeMultiple:
    def test_pad_up(self, subject):
        out = tio.EnsureShapeMultiple(8)(subject)
        assert out.t1.spatial_shape == (16, 16, 16)

    def test_crop_down(self, subject):
        out = tio.EnsureShapeMultiple(4, method="crop")(subject)
        assert out.t1.spatial_shape == (8, 12, 12)

    def test_already_multiple(self, rng):
        sub = tio.Subject(t1=tio.ScalarImage(rng.normal(size=(1, 8, 8, 8)).astype(np.float32)))
        out = tio.EnsureShapeMultiple(4)(sub)
        assert out.t1.spatial_shape == (8, 8, 8)

    def test_batch_path(self, make_batch):
        batch = make_batch(2, shape=(1, 6, 7, 9))
        out = tio.EnsureShapeMultiple(4)(batch)
        assert out.images["t1"].data.shape[-3:] == (8, 8, 12)


class TestReorient:
    def test_ras_noop(self, subject):
        out = tio.Reorient("RAS")(subject)
        np.testing.assert_array_equal(
            np.asarray(out.t1.data), np.asarray(subject.t1.data)
        )

    def test_to_lps(self, subject):
        out = tio.Reorient("LPS")(subject)
        assert out.t1.orientation == ("L", "P", "S")
        np.testing.assert_array_equal(
            np.asarray(out.t1.data), np.asarray(subject.t1.data)[:, ::-1, ::-1, :]
        )

    def test_world_coords_preserved(self, subject):
        out = tio.Reorient("LPS")(subject)
        # voxel (0,0,0) of output = voxel (I-1, J-1, 0) of input in world
        w_out = out.t1.affine.apply([[0.0, 0.0, 0.0]])
        w_in = subject.t1.affine.apply([[9.0, 11.0, 0.0]])
        np.testing.assert_allclose(w_out, w_in, atol=1e-9)

    def test_inverse(self, subject):
        out = tio.Reorient("PIR")(subject)
        back = out.apply_inverse_transform()
        np.testing.assert_array_equal(
            np.asarray(back.t1.data), np.asarray(subject.t1.data)
        )
        np.testing.assert_allclose(back.t1.affine.data, subject.t1.affine.data)

    def test_bad_code(self):
        with pytest.raises(ValueError):
            tio.Reorient("RAX")
        with pytest.raises(ValueError):
            tio.Reorient("RRA")


class TestResizeTranspose:
    def test_resize_shape_and_fov(self, subject):
        out = tio.Resize(20)(subject)
        assert out.t1.spatial_shape == (20, 20, 20)
        # FOV preserved: spacing scales by old/new
        np.testing.assert_allclose(out.t1.spacing, (1.0, 1.2, 1.4))

    def test_resize_label_nearest(self, rng):
        seg = rng.integers(0, 3, size=(1, 8, 8, 8)).astype(np.int32)
        sub = tio.Subject(seg=tio.LabelMap(seg))
        out = tio.Resize(12)(sub)
        assert set(np.unique(np.asarray(out.seg.data))) <= set(np.unique(seg))

    def test_transpose(self, subject):
        out = tio.Transpose()(subject)
        assert out.t1.spatial_shape == (14, 12, 10)
        np.testing.assert_array_equal(
            np.asarray(out.t1.data),
            np.transpose(np.asarray(subject.t1.data), (0, 3, 2, 1)),
        )
        back = out.apply_inverse_transform()
        np.testing.assert_array_equal(
            np.asarray(back.t1.data), np.asarray(subject.t1.data)
        )


class TestCopyAffineToRef:
    def test_copy_affine(self, rng):
        a = tio.ScalarImage(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
        b = tio.ScalarImage(
            rng.normal(size=(1, 4, 4, 4)).astype(np.float32),
            affine=np.diag([2.0, 2, 2, 1]),
        )
        sub = tio.Subject(a=a, b=b)
        out = tio.CopyAffine(target="a")(sub)
        np.testing.assert_allclose(out.b.affine.data, out.a.affine.data)

    def test_to_reference_space(self, rng):
        ref = tio.ScalarImage(
            rng.normal(size=(1, 16, 16, 16)).astype(np.float32),
            affine=np.diag([1.0, 1, 1, 1]),
        )
        emb = rng.normal(size=(8, 4, 4, 4)).astype(np.float32)
        img = tio.ToReferenceSpace.from_tensor(emb, ref)
        assert img.spatial_shape == (4, 4, 4)
        np.testing.assert_allclose(img.spacing, (4.0, 4.0, 4.0))
        # physical centers match
        c_ref = ref.affine.apply([[7.5, 7.5, 7.5]])
        c_img = img.affine.apply([[1.5, 1.5, 1.5]])
        np.testing.assert_allclose(c_ref, c_img, atol=1e-9)


class TestToReferenceSpaceTransform:
    """The transform form (not just the from_tensor helper)."""

    def test_non_image_reference_raises(self):
        with pytest.raises(TypeError, match="Image"):
            tio.ToReferenceSpace(42)

    def test_center_preserved(self, rng):
        from torchio_tpu.core.affine import AffineMatrix

        ref = tio.ScalarImage(
            rng.random((1, 16, 16, 16)).astype(np.float32),
            affine=AffineMatrix.from_spacing((2.0, 2.0, 2.0)),
        )
        # an 8^3 "embedding" of the same subject
        emb = tio.ScalarImage(rng.random((1, 8, 8, 8)).astype(np.float32))
        out = tio.ToReferenceSpace(ref)(tio.Subject(feat=emb))
        # physical center must match the reference's
        def center(img):
            shape = np.asarray(img.spatial_shape, np.float64)
            return img.affine.apply(((shape - 1) / 2)[None])[0]

        np.testing.assert_allclose(center(out.feat), center(ref), atol=1e-9)
        # spacing covers the same FOV with fewer voxels
        assert out.feat.spacing == pytest.approx((4.0, 4.0, 4.0))

    def test_applies_per_element_in_batch(self, rng):
        ref = tio.ScalarImage(rng.random((1, 16, 16, 16)).astype(np.float32))
        subjects = [
            tio.Subject(feat=tio.ScalarImage(rng.random((1, 4, 4, 4)).astype(np.float32)))
            for _ in range(3)
        ]
        batch = tio.SubjectsBatch.from_subjects(subjects)
        out = tio.ToReferenceSpace(ref)(batch)
        spacings = {tuple(round(s, 6) for s in img.affine.spacing) for img in out.images["feat"].unbatch()}
        assert spacings == {(4.0, 4.0, 4.0)}

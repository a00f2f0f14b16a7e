"""Native DICOM series reader (fixture: the reference's DICOM series)."""

from pathlib import Path

import numpy as np
import pytest

import torchio_tpu as tio
from torchio_tpu.io.dicom import is_dicom, read_dicom_dir

FIXTURE = Path(__file__).parent / "image_data_dicom"

pytestmark = pytest.mark.skipif(
    not FIXTURE.is_dir(), reason="DICOM fixture not available"
)


def test_read_series():
    data, affine = read_dicom_dir(FIXTURE)
    assert data.shape == (1, 88, 128, 17)
    assert data.dtype == np.int16
    np.testing.assert_allclose(np.linalg.norm(affine[:3, :3], axis=0), 2.0)
    assert data.max() > 0


def test_is_dicom():
    some_file = sorted(FIXTURE.iterdir())[0]
    assert is_dicom(some_file)
    assert not is_dicom(FIXTURE / "missing.dcm")


def test_image_from_dicom_dir():
    img = tio.ScalarImage(FIXTURE)
    assert img.shape == (1, 88, 128, 17)
    assert img.spacing == (2.0, 2.0, 2.0)
    data = np.asarray(img.data)
    assert np.isfinite(data).all()


def test_single_slice():
    some_file = sorted(FIXTURE.iterdir())[0]
    img = tio.ScalarImage(some_file)
    assert img.shape[3] == 1
    assert img.shape[1:3] == (88, 128)


def test_transform_on_dicom():
    img = tio.ScalarImage(FIXTURE)
    sub = tio.Subject(ct=img)
    out = tio.RescaleIntensity(out_min=0.0, out_max=1.0)(sub)
    data = np.asarray(out.ct.data)
    assert data.min() == pytest.approx(0.0, abs=1e-6)
    assert data.max() == pytest.approx(1.0, abs=1e-6)


def test_convert_dicom_to_nifti(tmp_path):
    img = tio.ScalarImage(FIXTURE)
    out_path = tmp_path / "converted.nii.gz"
    img.save(out_path)
    back = tio.ScalarImage(out_path)
    np.testing.assert_allclose(np.asarray(back.data), np.asarray(img.data), rtol=1e-6)
    np.testing.assert_allclose(back.affine.data, img.affine.data, atol=1e-4)

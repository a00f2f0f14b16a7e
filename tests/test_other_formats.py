"""NRRD and MetaImage readers (synthetic round-trip fixtures)."""

import gzip
import zlib

import numpy as np
import pytest

import torchio_tpu as tio
from torchio_tpu.io.other_formats import read_meta_image, read_nrrd


def write_nrrd(path, data_3d, *, encoding="raw", space="left-posterior-superior",
               directions=((2.0, 0, 0), (0, 2.0, 0), (0, 0, 2.0)),
               origin=(1.0, 2.0, 3.0)):
    dirs = " ".join("({},{},{})".format(*d) for d in directions)
    header = (
        "NRRD0004\n"
        "type: float\n"
        "dimension: 3\n"
        f"space: {space}\n"
        f"sizes: {data_3d.shape[0]} {data_3d.shape[1]} {data_3d.shape[2]}\n"
        f"space directions: {dirs}\n"
        "kinds: domain domain domain\n"
        "endian: little\n"
        f"encoding: {encoding}\n"
        f"space origin: ({origin[0]},{origin[1]},{origin[2]})\n"
        "\n"
    ).encode()
    payload = np.asfortranarray(data_3d.astype("<f4")).tobytes(order="F")
    if encoding == "gzip":
        payload = gzip.compress(payload)
    path.write_bytes(header + payload)


def write_mha(path, data_3d, *, spacing=(1.5, 1.5, 2.0), offset=(5.0, 6.0, 7.0),
              compressed=False):
    payload = np.asfortranarray(data_3d.astype("<f4")).tobytes(order="F")
    if compressed:
        payload = zlib.compress(payload)
    header = (
        "ObjectType = Image\n"
        "NDims = 3\n"
        "BinaryData = True\n"
        "BinaryDataByteOrderMSB = False\n"
        f"CompressedData = {'True' if compressed else 'False'}\n"
        "TransformMatrix = 1 0 0 0 1 0 0 0 1\n"
        f"Offset = {offset[0]} {offset[1]} {offset[2]}\n"
        f"ElementSpacing = {spacing[0]} {spacing[1]} {spacing[2]}\n"
        f"DimSize = {data_3d.shape[0]} {data_3d.shape[1]} {data_3d.shape[2]}\n"
        "ElementType = MET_FLOAT\n"
        "ElementDataFile = LOCAL\n"
    ).encode()
    path.write_bytes(header + payload)


@pytest.fixture
def vol(rng):
    return rng.normal(size=(6, 7, 8)).astype(np.float32)


class TestNRRD:
    def test_raw(self, tmp_path, vol):
        path = tmp_path / "x.nrrd"
        write_nrrd(path, vol)
        data, affine = read_nrrd(path)
        np.testing.assert_allclose(data[0], vol, rtol=1e-6)
        # LPS -> RAS flips x and y of directions and origin
        np.testing.assert_allclose(np.diag(affine)[:3], [-2.0, -2.0, 2.0])
        np.testing.assert_allclose(affine[:3, 3], [-1.0, -2.0, 3.0])

    def test_gzip(self, tmp_path, vol):
        path = tmp_path / "x.nrrd"
        write_nrrd(path, vol, encoding="gzip")
        data, _ = read_nrrd(path)
        np.testing.assert_allclose(data[0], vol, rtol=1e-6)

    def test_ras_space(self, tmp_path, vol):
        path = tmp_path / "x.nrrd"
        write_nrrd(path, vol, space="right-anterior-superior")
        _, affine = read_nrrd(path)
        np.testing.assert_allclose(np.diag(affine)[:3], [2.0, 2.0, 2.0])

    def test_image_integration(self, tmp_path, vol):
        path = tmp_path / "x.nrrd"
        write_nrrd(path, vol)
        img = tio.ScalarImage(path)
        assert img.shape == (1, 6, 7, 8)
        assert img.spacing == (2.0, 2.0, 2.0)


class TestMetaImage:
    def test_local(self, tmp_path, vol):
        path = tmp_path / "x.mha"
        write_mha(path, vol)
        data, affine = read_meta_image(path)
        np.testing.assert_allclose(data[0], vol, rtol=1e-6)
        np.testing.assert_allclose(
            np.abs(np.diag(affine)[:3]), [1.5, 1.5, 2.0]
        )
        np.testing.assert_allclose(affine[:3, 3], [-5.0, -6.0, 7.0])

    def test_compressed(self, tmp_path, vol):
        path = tmp_path / "x.mha"
        write_mha(path, vol, compressed=True)
        data, _ = read_meta_image(path)
        np.testing.assert_allclose(data[0], vol, rtol=1e-6)

    def test_image_integration(self, tmp_path, vol):
        path = tmp_path / "x.mha"
        write_mha(path, vol)
        img = tio.ScalarImage(path)
        assert img.shape == (1, 6, 7, 8)
        out = tio.RescaleIntensity(out_min=0.0, out_max=1.0)(img)
        assert np.asarray(out.data).max() == pytest.approx(1.0, abs=1e-6)

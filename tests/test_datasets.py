"""Dataset constructors, offline.

Mirrors the reference's approach (tests/test_datasets.py: download
tests are slow/skipped; logic is tested without network). Network
fetches are intercepted by monkeypatching the download helpers and
staging fake files into a temp cache, so URL construction, version
dispatch, file layout, caching, and error paths all run.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

import torchio_tpu as tio
from torchio_tpu import datasets


def _stage_nifti(directory, *stems, rng=None):
    rng = rng or np.random.default_rng(0)
    directory.mkdir(parents=True, exist_ok=True)
    for stem in stems:
        img = tio.ScalarImage(rng.random((1, 4, 4, 4)).astype(np.float32))
        img.save(directory / f"{stem}.nii.gz")
    return directory


@pytest.fixture
def mni_cache(tmp_path, monkeypatch):
    """Redirect the MNI cache dir; record download calls and stage the
    requested files only when the 'download' happens."""
    calls = []
    staged_stems: dict[str, tuple[str, ...]] = {}

    monkeypatch.setattr(
        "torchio_tpu.datasets.mni.get_cache_dir", lambda: tmp_path
    )

    def fake_download(url, download_root, filename=None, md5=None, **kw):
        calls.append({"url": url, "root": download_root, "filename": filename})
        name = str(download_root).rstrip("/").split("/")[-1]
        _stage_nifti(tmp_path / name, *staged_stems.get(name, ()))

    monkeypatch.setattr(
        "torchio_tpu.datasets.mni.download_and_extract_archive", fake_download
    )
    return calls, staged_stems


COLIN_1998 = (
    "colin27_t1_tal_lin",
    "colin27_t1_tal_lin_headmask",
    "colin27_t1_tal_lin_mask",
)


class TestColin27:
    def test_invalid_version_raises(self):
        with pytest.raises(ValueError, match="1998 or 2008"):
            datasets.Colin27(version=2020)

    def test_1998_layout_and_url(self, mni_cache):
        calls, staged = mni_cache
        staged["mni_colin27_1998_nifti"] = COLIN_1998
        subject = datasets.Colin27()
        assert set(subject.images) == {"t1", "head", "brain"}
        assert isinstance(subject.t1, tio.ScalarImage)
        assert isinstance(subject.brain, tio.LabelMap)
        assert calls[0]["url"] == (
            "http://packages.bic.mni.mcgill.ca/mni-models/colin27/"
            "mni_colin27_1998_nifti.zip"
        )

    def test_2008_layout(self, mni_cache):
        calls, staged = mni_cache
        staged["mni_colin27_2008_nifti"] = (
            "colin27_t1_tal_hires",
            "colin27_t2_tal_hires",
            "colin27_pd_tal_hires",
            "colin27_cls_tal_hires",
        )
        subject = datasets.Colin27(version=2008)
        assert set(subject.images) == {"t1", "t2", "pd", "cls"}

    def test_cached_dir_skips_download(self, mni_cache):
        calls, staged = mni_cache
        staged["mni_colin27_1998_nifti"] = COLIN_1998
        datasets.Colin27()
        n = len(calls)
        datasets.Colin27()
        assert len(calls) == n  # directory exists -> no new fetch


class TestPediatric:
    def test_invalid_age_range_raises(self, mni_cache):
        with pytest.raises((ValueError, KeyError)):
            datasets.Pediatric((1.0, 2.0))


class TestZonePlate:
    def test_offline_generation(self):
        zp = datasets.ZonePlate(size=16)
        assert zp.image.shape == (1, 16, 16, 16)

    def test_too_small_raises(self):
        with pytest.raises(ValueError):
            datasets.ZonePlate(size=2)

    def test_pattern_is_centered(self):
        zp = datasets.ZonePlate(size=17)
        data = np.asarray(zp.image.data)[0]
        # radial symmetry: mirrored values match about the center
        np.testing.assert_allclose(data, data[::-1, ::-1, ::-1], rtol=1e-5)


class TestMedMNIST:
    @pytest.fixture
    def staged_npz(self, monkeypatch, tmp_path, rng):
        import torchio_tpu.datasets.medmnist as mm

        monkeypatch.setattr(mm, "get_cache_dir", lambda: tmp_path)

        def fake_download(url, root, filename=None, md5=None, **kw):
            root = tmp_path / "MedMNIST"
            root.mkdir(parents=True, exist_ok=True)
            vols = rng.random((3, 28, 28, 28)).astype(np.float32)
            labels = np.array([[0], [1], [2]])
            np.savez(
                root / filename,
                train_images=vols,
                train_labels=labels,
                val_images=vols[:1],
                val_labels=labels[:1],
                test_images=vols[:1],
                test_labels=labels[:1],
            )

        monkeypatch.setattr(mm, "download_url", fake_download)

    def test_invalid_split_raises(self, staged_npz):
        with pytest.raises(ValueError, match="train/val/test"):
            datasets.organ_mnist_3d("bogus_split")

    def test_loader_from_staged_npz(self, staged_npz):
        subjects = datasets.organ_mnist_3d("train")
        assert len(subjects) == 3
        assert subjects[0].image.shape == (1, 28, 28, 28)
        assert int(np.asarray(subjects[2].labels)[0]) == 2

    def test_val_split(self, staged_npz):
        assert len(datasets.nodule_mnist_3d("val")) == 1


class TestITKSNAP:
    def test_construction_from_staged_cache(self, monkeypatch, tmp_path, rng):
        import torchio_tpu.datasets.itk_snap as mod

        monkeypatch.setattr(mod, "get_cache_dir", lambda: tmp_path)
        # stage the extracted layout so no download triggers
        _stage_nifti(tmp_path / "t1t2" / "t1t2", "t1", "t2")
        subject = datasets.T1T2()
        assert set(subject.images) == {"t1", "t2"}

    def test_label_classification(self, monkeypatch, tmp_path, rng):
        import torchio_tpu.datasets.itk_snap as mod

        monkeypatch.setattr(mod, "get_cache_dir", lambda: tmp_path)
        _stage_nifti(tmp_path / "bav" / "bav", "bav01", "bav01_seg")
        subject = datasets.AorticValve()
        assert isinstance(subject.image, tio.ScalarImage)
        assert isinstance(subject.seg, tio.LabelMap)

    def test_download_url_when_missing(self, monkeypatch, tmp_path):
        import torchio_tpu.datasets.itk_snap as mod

        monkeypatch.setattr(mod, "get_cache_dir", lambda: tmp_path)
        calls = []

        def fake(url, download_root, filename=None, **kw):
            calls.append(url)
            _stage_nifti(tmp_path / "t1t2" / "t1t2", "t1", "t2")

        monkeypatch.setattr(mod, "download_and_extract_archive", fake)
        datasets.T1T2()
        assert calls and calls[0].endswith("10794/t1t2.zip")


class TestIXI:
    def test_missing_without_download_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError, match="download=True"):
            datasets.ixi(root=tmp_path)

    def test_pairs_only_complete_subjects(self, tmp_path, rng):
        # IXI012 has both modalities; IXI013 only T1 -> excluded
        t1 = tmp_path / "T1"
        t2 = tmp_path / "T2"
        for d, stems in (
            (t1, ("IXI012-HH-1211-T1", "IXI013-HH-1212-T1")),
            (t2, ("IXI012-HH-1211-T2",)),
        ):
            _stage_nifti(d, *stems)
        subjects = datasets.ixi(root=tmp_path, modalities=("T1", "T2"))
        assert len(subjects) == 1
        assert set(subjects[0].images) == {"t1", "t2"}
        assert subjects[0].subject_id.startswith("IXI012")

    def test_single_modality(self, tmp_path, rng):
        _stage_nifti(tmp_path / "T1", "IXI050-Guys-0711-T1")
        subjects = datasets.ixi(root=tmp_path)
        assert len(subjects) == 1


class TestSlicer:
    def test_unknown_name_raises(self):
        with pytest.raises(ValueError, match="name must be one of"):
            datasets.Slicer("NotASample")

    def test_construction(self, monkeypatch, tmp_path, rng):
        import torchio_tpu.datasets.slicer as mod

        monkeypatch.setattr(mod, "get_cache_dir", lambda: tmp_path)

        def fake_download(url, root, filename=None, **kw):
            img = tio.ScalarImage(rng.random((1, 4, 4, 4)).astype(np.float32))
            root = tmp_path / "slicer"
            root.mkdir(parents=True, exist_ok=True)
            img.save(root / filename)

        monkeypatch.setattr(mod, "download_url", fake_download)
        subject = datasets.Slicer("MRHead")
        assert len(subject.images) == 1


class TestFPG:
    def test_construction_with_staged_files(self, monkeypatch, tmp_path, rng):
        import h5py

        import torchio_tpu.datasets.fpg as mod
        from torchio_tpu.io.matrix import write_matrix

        monkeypatch.setattr(mod, "get_cache_dir", lambda: tmp_path)
        root = tmp_path / "fpg"
        root.mkdir()
        urls = []

        def fake_download(url, rootdir, filename=None, **kw):
            urls.append(url)
            path = root / filename
            if filename.endswith(".nii.gz"):
                tio.ScalarImage(
                    rng.random((1, 4, 4, 4)).astype(np.float32)
                ).save(path)
            elif filename.endswith(".tfm"):
                write_matrix(np.eye(4), path)
            elif filename.endswith(".h5"):
                with h5py.File(path, "w") as f:
                    g = f.create_group("TransformGroup").create_group("1")
                    g["TransformParameters"] = np.concatenate(
                        [np.eye(3).ravel(), np.zeros(3)]
                    )
                    g["TransformFixedParameters"] = np.zeros(3)

        monkeypatch.setattr(mod, "download_url", fake_download)
        subject = datasets.FPG()
        assert set(subject.images) == {"t1", "seg"}
        assert isinstance(subject.seg, tio.LabelMap)
        # registration matrices attach to t1 as metadata
        assert subject.t1.rigid_matrix.shape == (4, 4)
        assert subject.t1.affine_matrix.shape == (4, 4)
        assert any("t1_to_mni.tfm" in u for u in urls)
        # seg carries the GIF parcellation palette and plot() uses it
        assert subject.seg.color_map is datasets.FPG.GIF_COLORS
        assert len(datasets.FPG.GIF_COLORS) == 161
        assert datasets.FPG.GIF_COLORS[5] == (127, 255, 212)
        assert datasets.FPG.GIF_COLORS[208] == (0, 0, 128)
        fig = subject.plot(show=False, output_path=tmp_path / "fpg.png")
        seg_shown = np.asarray(fig.axes[3].images[0].get_array())
        assert seg_shown.ndim == 3 and seg_shown.shape[-1] == 3


class TestPediatricAndSheep:
    def test_pediatric_layout_and_url(self, mni_cache):
        calls, staged = mni_cache
        staged["nihpd_asym_04.5-08.5_nifti"] = (
            "nihpd_asym_04.5-08.5_t1w",
            "nihpd_asym_04.5-08.5_t2w",
            "nihpd_asym_04.5-08.5_pdw",
            "nihpd_asym_04.5-08.5_mask",
        )
        subject = datasets.Pediatric((4.5, 8.5))
        assert set(subject.images) == {"t1", "t2", "pd", "mask"}
        assert isinstance(subject.mask, tio.LabelMap)
        assert calls[0]["url"].endswith("nihpd/obj1/nihpd_asym_04.5-08.5_nifti.zip")

    def test_pediatric_symmetric_name(self, mni_cache):
        calls, staged = mni_cache
        staged["nihpd_sym_07.0-11.0_nifti"] = (
            "nihpd_sym_07.0-11.0_t1w",
            "nihpd_sym_07.0-11.0_t2w",
            "nihpd_sym_07.0-11.0_pdw",
            "nihpd_sym_07.0-11.0_mask",
        )
        subject = datasets.Pediatric((7, 11), symmetric=True)
        assert "sym" in subject.name

    def test_sheep_finds_any_nifti(self, mni_cache):
        calls, staged = mni_cache
        staged["NIFTI_ovine_auxiliary_masks"] = ("ovine_model_01",)
        subject = datasets.Sheep()
        assert set(subject.images) == {"t1"}
        assert calls[0]["url"].endswith("sheep/NIFTI_ovine_auxiliary_masks.zip")


class TestIxiStaged:
    """Offline ixi/ixi_tiny loader tests (the download paths are mocked;
    layout and pairing logic run for real)."""

    def _stage(self, directory, names, rng):
        directory.mkdir(parents=True, exist_ok=True)
        for name in names:
            img = tio.ScalarImage(rng.random((1, 4, 4, 4)).astype(np.float32))
            img.save(directory / f"{name}.nii.gz")

    def test_ixi_from_staged_root(self, tmp_path, rng):
        from torchio_tpu.datasets.ixi import ixi

        self._stage(tmp_path / "T1", ["IXI002-Guys-0828-T1", "IXI012-HH-1211-T1"], rng)
        self._stage(tmp_path / "T2", ["IXI002-Guys-0828-T2"], rng)
        subjects = ixi(tmp_path, modalities=("T1", "T2"))
        # only the subject with BOTH modalities pairs up
        assert len(subjects) == 1
        assert subjects[0].subject_id.startswith("IXI002")

    def test_ixi_missing_without_download(self, tmp_path):
        from torchio_tpu.datasets.ixi import ixi

        with pytest.raises(FileNotFoundError, match="download=True"):
            ixi(tmp_path / "absent")

    def test_ixi_download_mocked(self, tmp_path, monkeypatch, rng):
        import importlib

        mod = importlib.import_module("torchio_tpu.datasets.ixi")

        def fake_download(url, root, filename=None, **kw):
            assert "IXI-T1" in filename
            return tmp_path / filename

        def fake_extract(archive, dest):
            self._stage(Path(dest), ["IXI002-Guys-0828-T1"], rng)

        monkeypatch.setattr(mod, "download_url", fake_download)
        monkeypatch.setattr(mod, "extract_archive", fake_extract)
        subjects = mod.ixi(tmp_path / "dl", download=True)
        assert len(subjects) == 1

    def test_ixi_tiny_staged(self, tmp_path, rng):
        from torchio_tpu.datasets.ixi import ixi_tiny

        self._stage(tmp_path / "image", ["IXI002-Guys-0828"], rng)
        self._stage(tmp_path / "label", ["IXI002-Guys-0828"], rng)
        # one unpaired image is skipped
        self._stage(tmp_path / "image", ["IXI013-HH-1212"], rng)
        subjects = ixi_tiny(tmp_path)
        assert len(subjects) == 1
        assert set(subjects[0].images) == {"image", "label"}

    def test_ixi_tiny_nested_layout(self, tmp_path, monkeypatch, rng):
        """The archive unpacks into a nested folder; the loader finds it."""
        import importlib

        mod = importlib.import_module("torchio_tpu.datasets.ixi")

        def fake_fetch(url, download_root, filename=None, **kw):
            inner = Path(download_root) / "ixi_tiny_unpacked"
            self._stage(inner / "image", ["IXI002-Guys-0828"], rng)
            self._stage(inner / "label", ["IXI002-Guys-0828"], rng)

        monkeypatch.setattr(mod, "download_and_extract_archive", fake_fetch)
        subjects = mod.ixi_tiny(tmp_path / "fresh", download=True)
        assert len(subjects) == 1

    def test_ixi_tiny_missing_without_download(self, tmp_path):
        from torchio_tpu.datasets.ixi import ixi_tiny

        with pytest.raises(FileNotFoundError, match="download=True"):
            ixi_tiny(tmp_path / "absent", download=False)


class TestICBMStaged:
    def test_construction_from_staged_cache(self, mni_cache, tmp_path, rng):
        calls, staged = mni_cache
        name = "mni_icbm152_nlin_sym_09c_nifti"
        p, s = "mni_icbm152", "tal_nlin_sym_09c.nii"
        stems = [
            f"{p}_t1_{s[:-4]}",
            f"{p}_t2_{s[:-4]}",
            f"{p}_pd_{s[:-4]}",
            f"{p}_t1_{s[:-4]}_eye_mask",
            f"{p}_t1_{s[:-4]}_face_mask",
            f"{p}_t1_{s[:-4]}_mask",
        ]
        # _stage_nifti writes .nii.gz; ICBM expects .nii — stage manually
        root = tmp_path / name
        root.mkdir(parents=True, exist_ok=True)
        for stem in stems:
            img = tio.ScalarImage(rng.random((1, 4, 4, 4)).astype(np.float32))
            img.save(root / f"{stem}.nii")
        subject = datasets.ICBM2009CNonlinearSymmetric(load_4d_tissues=False)
        assert "t1" in subject.images and "brain" in subject.images
        assert isinstance(subject.images["brain"], tio.LabelMap)


# --- consolidated from test_coverage_edges2.py (round 5) ---
import gzip
import warnings
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torchio_tpu as tio


class TestDownloadEdges:
    def test_non_https_error_reraises(self, monkeypatch, tmp_path):
        from torchio_tpu.utils import download as dl

        def fail(url, path):
            raise OSError("network down")

        monkeypatch.setattr(dl.urllib.request, "urlretrieve", fail)
        with pytest.raises(OSError, match="network down"):
            dl.download_url("http://example.com/x.bin", tmp_path)

    def test_download_and_extract(self, monkeypatch, tmp_path):
        import tarfile

        from torchio_tpu.utils import download as dl

        inner = tmp_path / "payload.txt"
        inner.write_text("hello")
        archive_src = tmp_path / "src.tar.gz"
        with tarfile.open(archive_src, "w:gz") as tf:
            tf.add(inner, arcname="payload.txt")

        def fake_retrieve(url, path):
            import shutil

            shutil.copy(archive_src, path)

        monkeypatch.setattr(dl.urllib.request, "urlretrieve", fake_retrieve)
        out_root = tmp_path / "out"
        dl.download_and_extract_archive(
            "https://example.com/src.tar.gz", out_root
        )
        assert (out_root / "payload.txt").read_text() == "hello"


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


class TestDatasetBranches:
    def test_fpg_load_all(self, monkeypatch, tmp_path, rng):
        import h5py

        import torchio_tpu.datasets as datasets
        import torchio_tpu.datasets.fpg as mod
        from torchio_tpu.io.matrix import write_matrix

        monkeypatch.setattr(mod, "get_cache_dir", lambda: tmp_path)
        root = tmp_path / "fpg"
        root.mkdir()

        def fake_download(url, rootdir, filename=None, **kw):
            path = root / filename
            if filename.endswith((".nii.gz", ".nrrd")):
                ScalarImage(rng.random((1, 4, 4, 4)).astype(np.float32)).save(
                    path
                )
            elif filename.endswith(".tfm"):
                write_matrix(np.eye(4), path)
            elif filename.endswith(".h5"):
                with h5py.File(path, "w") as f:
                    g = f.create_group("TransformGroup").create_group("1")
                    g["TransformParameters"] = np.concatenate(
                        [np.eye(3).ravel(), np.zeros(3)]
                    )
                    g["TransformFixedParameters"] = np.zeros(3)

        monkeypatch.setattr(mod, "download_url", fake_download)
        subject = datasets.FPG(load_all=True)
        assert {"t1", "seg", "t2", "fmri", "dmri"} <= set(subject.images)

    def test_mni_find_missing(self, tmp_path):
        from torchio_tpu.datasets.mni import Colin27

        with pytest.raises(FileNotFoundError):
            Colin27._find(tmp_path, "t1")


class TestICBMTissues:
    def test_load_4d_tissues_file_present(self, monkeypatch, tmp_path, rng):
        monkeypatch.setattr(
            "torchio_tpu.datasets.mni.get_cache_dir", lambda: tmp_path
        )
        monkeypatch.setattr(
            "torchio_tpu.datasets.mni.download_and_extract_archive",
            lambda *a, **k: None,
        )
        name = "mni_icbm152_nlin_sym_09c_nifti"
        p = "mni_icbm152"
        s = "tal_nlin_sym_09c.nii"
        root = tmp_path / name
        root.mkdir(parents=True)
        stems = [
            f"{p}_t1_{s}", f"{p}_t2_{s}", f"{p}_pd_{s}",
            f"{p}_t1_{s[:-4]}_eye_mask.nii",
            f"{p}_t1_{s[:-4]}_face_mask.nii",
            f"{p}_t1_{s[:-4]}_mask.nii",
            f"{p}_{s[:-4]}_tissues.nii",
        ]
        for stem in stems:
            img = tio.ScalarImage(rng.random((1, 4, 4, 4)).astype(np.float32))
            img.save(root / stem if stem.endswith(".nii") else root / stem)
        subject = datasets.ICBM2009CNonlinearSymmetric(load_4d_tissues=True)
        assert "tissues" in subject.images
        assert isinstance(subject.images["tissues"], tio.LabelMap)

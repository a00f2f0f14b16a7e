"""ITK-SNAP sample subjects.

Parity reference: ``/root/reference/src/torchio/datasets/itk_snap/``.
"""

from __future__ import annotations

import urllib.parse

from ..data.image import LabelMap, ScalarImage
from ..data.subject import Subject
from ..utils.download import download_and_extract_archive, get_cache_dir


class SubjectITKSNAP(Subject):
    """Base for www.itksnap.org sample data."""

    url_base = "https://www.nitrc.org/frs/download.php/"

    def __init__(self, name: str, code: str) -> None:
        self.name = name
        url = urllib.parse.urljoin(self.url_base, f"{code}/{name}.zip")
        self.download_root = get_cache_dir() / name
        if not self.download_root.is_dir():
            download_and_extract_archive(
                url, download_root=self.download_root, filename=f"{name}.zip"
            )
        super().__init__(**self._get_kwargs())

    def _get_kwargs(self) -> dict:
        raise NotImplementedError


class BrainTumor(SubjectITKSNAP):
    """Multi-modal MRI with glioblastoma segmentation."""

    def __init__(self) -> None:
        super().__init__("braintumor", "10793")

    def _get_kwargs(self) -> dict:
        root = self.download_root / self.name
        return {
            "flair": ScalarImage(root / "flair.nii.gz"),
            "t1": ScalarImage(root / "t1.nii.gz"),
            "t1ce": ScalarImage(root / "t1ce.nii.gz"),
            "t2": ScalarImage(root / "t2.nii.gz"),
            "seg": LabelMap(root / "seg.nii.gz"),
        }


class T1T2(SubjectITKSNAP):
    """Paired T1 and T2 acquisitions."""

    def __init__(self) -> None:
        super().__init__("t1t2", "10794")

    def _get_kwargs(self) -> dict:
        root = self.download_root / self.name
        return {
            "t1": ScalarImage(root / "t1.nii.gz"),
            "t2": ScalarImage(root / "t2.nii.gz"),
        }


class AorticValve(SubjectITKSNAP):
    """Time-resolved aortic valve CT with segmentations."""

    def __init__(self) -> None:
        super().__init__("bav", "10795")

    def _get_kwargs(self) -> dict:
        root = self.download_root / self.name
        return {
            "image": ScalarImage(root / "bav01.nii.gz"),
            "seg": LabelMap(root / "bav01_seg.nii.gz"),
        }

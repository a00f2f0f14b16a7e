"""FPG: 3T T1 brain MRI + GIF parcellation + registration matrices.

Parity reference: ``/root/reference/src/torchio/datasets/fpg.py``
(same torchio-data repo URLs; requires network on first use).
"""

from __future__ import annotations

import urllib.parse
from typing import Any

from ..data.image import LabelMap, ScalarImage
from ..data.subject import Subject
from ..io.matrix import read_matrix
from ..utils.download import download_url, get_cache_dir

DATA_REPO = "https://github.com/TorchIO-project/torchio-data/raw/main/data/"


class FPG(Subject):
    """T1-weighted brain MRI with GIF parcellation and MNI transforms.

    Args:
        load_all: also fetch T2, diffusion, and functional images.
    """

    def __init__(self, load_all: bool = False) -> None:
        repo_dir = urllib.parse.urljoin(DATA_REPO, "fernando/")
        filenames = {
            "t1": "t1.nii.gz",
            "seg": "t1_seg_gif.nii.gz",
            "rigid": "t1_to_mni.tfm",
            "affine": "t1_to_mni_affine.h5",
        }
        if load_all:
            filenames.update(t2="t2.nii.gz", fmri="fmri.nrrd", dmri="dmri.nrrd")
        root = get_cache_dir() / "fpg"
        for filename in filenames.values():
            download_url(
                urllib.parse.urljoin(repo_dir, filename), root, filename=filename
            )
        rigid = read_matrix(root / filenames["rigid"])
        affine_matrix = read_matrix(root / filenames["affine"])
        kwargs: dict[str, Any] = {
            "t1": ScalarImage(
                root / filenames["t1"],
                rigid_matrix=rigid,
                affine_matrix=affine_matrix,
            ),
            "seg": LabelMap(
                root / filenames["seg"],
                rigid_matrix=rigid,
                affine_matrix=affine_matrix,
            ),
        }
        if load_all:
            kwargs["t2"] = ScalarImage(root / filenames["t2"])
            kwargs["fmri"] = ScalarImage(root / filenames["fmri"])
            kwargs["dmri"] = ScalarImage(root / filenames["dmri"])
        super().__init__(**kwargs)

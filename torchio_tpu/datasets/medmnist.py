"""3D MedMNIST v2 loaders (Zenodo npz archives).

Parity reference: ``/root/reference/src/torchio/datasets/medmnist.py``.
"""

from __future__ import annotations

import numpy as np

from ..data.image import ScalarImage
from ..data.subject import Subject
from ..utils.download import download_url, get_cache_dir


def _load_medmnist(class_name: str, split: str) -> list[Subject]:
    valid = ("train", "training", "val", "validation", "test", "testing")
    if split not in valid:
        raise ValueError(f"Split must be one of {valid}, got {split!r}")
    split = {"training": "train", "validation": "val", "testing": "test"}.get(
        split, split
    )
    filename = f"{class_name}.npz"
    url = f"https://zenodo.org/record/5208230/files/{filename}?download=1"
    root = get_cache_dir() / "MedMNIST"
    download_url(url, root, filename=filename)
    npz = np.load(root / filename)
    images = npz[f"{split}_images"]
    labels = npz[f"{split}_labels"]
    subjects = []
    for image, label in zip(images, labels):
        subjects.append(
            Subject(
                image=ScalarImage(image[np.newaxis].astype(np.float32)),
                labels=np.asarray(label).copy(),
            )
        )
    return subjects


def organ_mnist_3d(split: str = "train") -> list[Subject]:
    """3D organ classification volumes."""
    return _load_medmnist("organmnist3d", split)


def nodule_mnist_3d(split: str = "train") -> list[Subject]:
    """Lung nodule volumes."""
    return _load_medmnist("nodulemnist3d", split)


def adrenal_mnist_3d(split: str = "train") -> list[Subject]:
    """Adrenal gland shape volumes."""
    return _load_medmnist("adrenalmnist3d", split)


def fracture_mnist_3d(split: str = "train") -> list[Subject]:
    """Rib fracture volumes."""
    return _load_medmnist("fracturemnist3d", split)


def vessel_mnist_3d(split: str = "train") -> list[Subject]:
    """Brain vessel shape volumes."""
    return _load_medmnist("vesselmnist3d", split)


def synapse_mnist_3d(split: str = "train") -> list[Subject]:
    """Electron-microscopy synapse volumes."""
    return _load_medmnist("synapsemnist3d", split)

"""KeepLargestComponent: per-label connected-component filtering.

Parity reference:
``/root/reference/src/torchio/transforms/label/keep_largest.py`` (the
reference delegates to SimpleITK ConnectedComponent+RelabelComponent;
here connected components run on host via ``scipy.ndimage.label``, as
sanctioned by SURVEY.md §7.2 step 5 — CC is inherently sequential and
not on the hot path).
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np
from scipy import ndimage

from ...data.batch import SubjectsBatch
from ...data.image import LabelMap
from ..transform import Transform


def _keep_largest(volume: np.ndarray, labels, background_label: int, fully: bool):
    result = volume.copy()
    if labels is None:
        labels = [int(v) for v in np.unique(volume) if int(v) != background_label]
    structure = np.ones((3, 3, 3)) if fully else None  # None -> 6-connectivity
    for label in labels:
        binary = volume == label
        if not binary.any():
            continue
        components, num = ndimage.label(binary, structure=structure)
        if num <= 1:
            continue
        sizes = np.bincount(components.ravel())
        sizes[0] = 0
        largest = int(np.argmax(sizes))
        remove = binary & (components != largest)
        result[remove] = background_label
    return result


class KeepLargestComponent(Transform):
    """Keep only the largest connected component of each label value."""

    def __init__(
        self,
        labels: Sequence[int] | None = None,
        *,
        background_label: int = 0,
        fully_connected: bool = True,
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        self.labels = list(labels) if labels is not None else None
        self.background_label = background_label
        self.fully_connected = fully_connected

    def apply_transform(
        self, batch: SubjectsBatch, params: dict[str, Any]
    ) -> SubjectsBatch:
        for _name, img_batch in batch.images.items():
            if not issubclass(img_batch.image_class, LabelMap):
                continue
            b, c = img_batch.data.shape[:2]
            if c != 1:
                raise RuntimeError(
                    f"KeepLargestComponent requires single-channel label maps,"
                    f" got {c} channels"
                )
            arr = np.asarray(img_batch.data).copy()
            for i in range(b):
                arr[i, 0] = _keep_largest(
                    arr[i, 0],
                    self.labels,
                    self.background_label,
                    self.fully_connected,
                )
            img_batch.data = arr
        return batch

"""Synthetic zone-plate volume (offline; useful for interpolation tests).

Parity reference: ``/root/reference/src/torchio/datasets/zone_plate.py``
(Jähne, Practical Handbook on Image Processing, eq. 10.63).
"""

from __future__ import annotations

import numpy as np

from ..data.image import ScalarImage
from ..data.subject import Subject


class ZonePlate(Subject):
    """Concentric diffraction-ring phantom of the given cubic size."""

    def __init__(self, size: int = 501) -> None:
        if size < 3:
            raise ValueError("Size must be at least 3.")
        self.size = size
        super().__init__(image=self._generate_image(size))

    @staticmethod
    def _generate_image(size: int) -> ScalarImage:
        if size % 2 == 1:
            fin = (size - 1) // 2
            ini = -fin
        else:
            fin = size // 2
            ini = -fin + 1
        coords = np.arange(ini, fin + 1)
        xx, yy, zz = np.meshgrid(coords, coords, coords)
        r = np.sqrt(xx**2 + yy**2 + zz**2)
        km = 0.8 * np.pi
        rm = ini
        w = rm / 10
        g = np.sin((km * r**2) / (2 * rm)) * (0.5 * np.tanh((rm - r) / w) + 0.5)
        affine = np.eye(4)
        affine[:3, 3] = (ini, ini, ini)
        return ScalarImage(g[np.newaxis].astype(np.float32), affine=affine)

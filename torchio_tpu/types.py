"""Type aliases for torchio_tpu.

Parity reference: ``/root/reference/src/torchio/types.py`` (TypeAliases for
paths, spacing, shapes, affine matrices). Here the canonical array type is a
JAX array for device data and a float64 numpy array for affine metadata
(TPUs have no fast float64 path, so 4x4 geometry stays on host).
"""

from __future__ import annotations

import os
from typing import Callable, Sequence, Union

import jax
import numpy as np

# Path-like inputs accepted by Image and I/O functions.
TypePath = Union[str, os.PathLike]

# Device image data: (C, I, J, K) float array (jax or numpy).
TypeImageData = Union[jax.Array, np.ndarray]

# 4x4 voxel-to-world matrix (float64 numpy on host).
TypeAffineMatrix = np.ndarray

# Spacing in mm along each voxel axis.
TypeSpacing = tuple[float, float, float]

# World coordinates of the first voxel center.
TypeOrigin = tuple[float, float, float]

# 3x3 direction (rotation) matrix.
TypeDirection = np.ndarray

# Anatomical orientation codes, e.g. ('R', 'A', 'S').
TypeOrientationCodes = tuple[str, str, str]

# Spatial shape (I, J, K).
TypeSpatialShape = tuple[int, int, int]

# Full tensor shape (C, I, J, K).
TypeTensorShape = tuple[int, int, int, int]

# (N, 3) world-space points.
TypeWorldPoints = Union[jax.Array, np.ndarray]

# Scalar or per-axis numeric specs used throughout the transforms.
TypeNumber = Union[int, float]
TypeTripletInt = tuple[int, int, int]
TypeTripletFloat = tuple[float, float, float]
TypeSextetInt = tuple[int, int, int, int, int, int]
TypeRangeFloat = Union[float, tuple[float, float]]

TypeDataAffine = tuple[TypeImageData, TypeAffineMatrix]

TypeCallable = Callable

TypeKeys = Union[Sequence[str], None]

# A slice spec along one axis.
SliceIndex = Union[int, slice, type(Ellipsis), None]

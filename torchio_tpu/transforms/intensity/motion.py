"""Motion: k-space segment corruption (Shaw et al. 2019).

Parity reference: ``/root/reference/src/torchio/transforms/intensity/motion.py``
(k-space split along the first spatial axis into ``num_transforms + 1``
segments; each segment's FFT lines are replaced by the FFT of a rigidly
moved copy of the image; inverse FFT real part).

TPU-native notes: rigid moves go through the fused gather resampler in
input-voxel coordinates (rotation about the image center in index space,
translation in voxels); ``jnp.fft`` is XLA-native. The reference
normalizes translations through ``affine_grid``'s (x, y, z) = (K, J, I)
convention which cross-wires axes; here translation is plainly in voxels
per axis — same artifact statistics, cleaner semantics.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from ...data.batch import SubjectsBatch
from ...ops.resample import build_coords, resample
from .._utils import as_jnp, restore_gated
from ..parameter_range import to_range
from ..transform import IntensityTransform


def _axis_rotation(angle: float, axis: int) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    m = np.eye(3)
    a, b = [(1, 2), (0, 2), (0, 1)][axis]
    m[a, a] = m[b, b] = c
    m[a, b] = -s if axis != 1 else s
    m[b, a] = s if axis != 1 else -s
    return m


def _rigid_voxel_matrix(degrees, translation, shape) -> np.ndarray:
    """Output-voxel -> input-voxel map matching the reference EXACTLY.

    The reference builds ``theta = [Rz@Ry@Rx | t]`` and feeds it to
    ``affine_grid(align_corners=True)`` (reference motion.py:416-530),
    which means: (a) the rotation acts in NORMALIZED grid coordinates
    with axis order (x, y, z) = (K, J, I) — anisotropic volumes shear
    rather than rotate rigidly; (b) the translation is normalized by
    ``(I, J, K)/2`` but applied to rows (x, y, z). We reproduce both,
    composed into one voxel-space 4x4 so the shared gather resampler
    can apply it.
    """
    rx, ry, rz = np.deg2rad(np.asarray(degrees, np.float64))
    r = _axis_rotation(rz, 2) @ _axis_rotation(ry, 1) @ _axis_rotation(rx, 0)
    si, sj, sk = (float(s) for s in shape)
    sizes_xyz = np.array([sk, sj, si])  # affine_grid x, y, z extents
    # reference quirk: normalized by (I, J, K)/2 in row order (x, y, z)
    t_norm = np.asarray(translation, np.float64) / (np.array([si, sj, sk]) / 2)
    # voxel -> normalized per xyz axis: n = a*v - 1 (align_corners=True)
    a = 2.0 / np.maximum(sizes_xyz - 1.0, 1.0)
    half = np.maximum(sizes_xyz - 1.0, 1.0) / 2.0
    ones = np.ones(3)
    a_xyz = half[:, None] * r * a[None, :]
    c_xyz = half * (r @ (-ones) + t_norm + ones)
    perm = np.zeros((3, 3))  # (i, j, k) voxel order -> (k, j, i) xyz order
    perm[0, 2] = perm[1, 1] = perm[2, 0] = 1.0
    m = np.eye(4)
    m[:3, :3] = perm.T @ a_xyz @ perm
    m[:3, 3] = perm.T @ c_xyz
    return m


def _move_batch(data, degrees_list, translation_list):
    """Apply per-element rigid moves (resample at the reference's grid)."""
    from ..spatial.spatial import _dispatch_resample, _GridPlan

    shape = data.shape[2:]
    grids, plans = [], []
    for degrees, translation in zip(degrees_list, translation_list):
        t = _rigid_voxel_matrix(degrees, translation, shape)
        grids.append(build_coords(tuple(shape), t))
        plans.append(_GridPlan(t))
    return _dispatch_resample(
        data, jnp.stack(grids), plans, mode="linear", fill=0.0
    )


_IDENTITY = {"degrees": (0.0, 0.0, 0.0), "translation": (0.0, 0.0, 0.0)}


class Motion(IntensityTransform):
    r"""Simulate MRI motion artifacts via k-space segment substitution."""

    def __init__(
        self,
        *,
        degrees: Any = 10.0,
        translation: Any = 10.0,
        num_transforms: int = 2,
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        self.degrees = to_range(degrees)
        self.translation = to_range(translation)
        if not isinstance(num_transforms, int) or num_transforms < 1:
            raise ValueError(
                f"num_transforms must be a positive int, got {num_transforms}"
            )
        self.num_transforms = num_transforms

    @property
    def supports_per_instance_params(self) -> bool:
        return True

    @property
    def supports_per_instance_p(self) -> bool:
        return True

    def _sample_transforms(self) -> list[dict]:
        return [
            {
                "degrees": list(self.degrees.sample()),
                "translation": list(self.translation.sample()),
            }
            for _ in range(self.num_transforms)
        ]

    def make_params(self, batch: SubjectsBatch) -> dict[str, Any]:
        n = self._resolve_n(batch)
        if n is None:
            return {"transforms": self._sample_transforms()}
        keep = self._keep_mask(batch, n)
        transforms = [
            [] if (keep is not None and not keep[i]) else self._sample_transforms()
            for i in range(n)
        ]
        params = {"transforms": transforms}
        self._tag_batched(params, batch, n, keep, ["transforms"])
        return params

    def apply_transform(
        self, batch: SubjectsBatch, params: dict[str, Any]
    ) -> SubjectsBatch:
        transforms = params["transforms"]
        per_instance = self._is_per_instance_params(params)
        for _name, img_batch in self._get_images(batch).items():
            data = as_jnp(img_batch.data)
            b = data.shape[0]
            if per_instance:
                num_transforms = max((len(t) for t in transforms), default=0)
                if num_transforms == 0:
                    continue
                per_element = transforms
                keep = [bool(t) for t in transforms]
            else:
                num_transforms = len(transforms)
                per_element = [transforms] * b
                keep = None
            out = _apply_motion(data, per_element, num_transforms)
            img_batch.data = restore_gated(out, data, keep)
        return batch


def _apply_motion(data, per_element_transforms, num_transforms: int):
    result = data.astype(jnp.float32)
    num_segments = num_transforms + 1
    first_size = result.shape[2]
    segment_size = first_size // num_segments
    if segment_size == 0:
        raise ValueError(
            f"Cannot split {first_size} k-space slices into {num_segments}"
            " motion segments; reduce num_transforms or use a larger image"
            " along the first spatial axis."
        )
    spectrum = jnp.fft.fftn(result, axes=(-3, -2, -1))
    for segment_index in range(1, num_segments):
        degrees_list, translation_list = [], []
        for transforms in per_element_transforms:
            t = transforms[segment_index - 1] if transforms else _IDENTITY
            degrees_list.append(t["degrees"])
            translation_list.append(t["translation"])
        moved = _move_batch(result, degrees_list, translation_list)
        moved_spectrum = jnp.fft.fftn(moved, axes=(-3, -2, -1))
        start = segment_index * segment_size
        end = (
            first_size
            if segment_index == num_segments - 1
            else (segment_index + 1) * segment_size
        )
        spectrum = spectrum.at[:, :, start:end].set(moved_spectrum[:, :, start:end])
    out = jnp.fft.ifftn(spectrum, axes=(-3, -2, -1)).real
    return out.astype(data.dtype)

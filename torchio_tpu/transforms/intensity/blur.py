"""Blur: random separable Gaussian smoothing (sigmas in mm).

Parity reference: ``/root/reference/src/torchio/transforms/intensity/blur.py``
(sigma in mm converted to voxels via per-element spacing; per-axis random
sigma; per-element grouped kernels truncated at each element's own
radius; no-blur rows restored exactly).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from ...data.batch import ImagesBatch, SubjectsBatch
from ...ops.gaussian import gaussian_blur, gaussian_blur_per_element
from .._utils import as_jnp, restore_gated
from ..parameter_range import to_nonneg_range
from ..transform import IntensityTransform


class Blur(IntensityTransform):
    r"""Gaussian blur with per-axis standard deviations sampled in mm."""

    def __init__(self, *, std: Any = 0.0, **kwargs: Any) -> None:
        super().__init__(**kwargs)
        self.std = to_nonneg_range(std)
        self.warn_if_noop(is_noop=self.std.is_constant(0.0), hint="std=(0, 2)")

    @property
    def supports_per_instance_params(self) -> bool:
        return True

    @property
    def supports_per_instance_p(self) -> bool:
        return True

    def make_params(self, batch: SubjectsBatch) -> dict[str, Any]:
        n = self._resolve_n(batch)
        if n is None:
            return {"std": list(self.std.sample())}
        keep = self._keep_mask(batch, n)
        std = self.std.sample(n)
        if keep is not None:
            std[~keep] = 0.0
        params = {"std": self._serialize_param(std)}
        self._tag_batched(params, batch, n, keep, ["std"])
        return params

    def apply_transform(
        self, batch: SubjectsBatch, params: dict[str, Any]
    ) -> SubjectsBatch:
        per_instance = self._is_per_instance_params(params)
        for _name, img_batch in self._get_images(batch).items():
            radii = self._radius_bound(img_batch)
            if per_instance:
                img_batch.data = _blur_per_element(
                    img_batch, params["std"], radii=radii
                )
            else:
                spacing = np.asarray(img_batch.affines[0].spacing, np.float64)
                sigmas_vox = _mm_to_voxels(np.asarray(params["std"]), spacing)
                if np.all(sigmas_vox <= 0):
                    continue
                img_batch.data = gaussian_blur(
                    as_jnp(img_batch.data), sigmas_vox, radii=radii
                )
        return batch

    def fusable(self, batch: SubjectsBatch) -> bool:
        # only the per-instance path fuses: the shared path's host-built
        # band matrix is a different (bit-level) numeric artifact
        return bool(self._get_images(batch)) and self._per_instance_active(
            batch
        )

    def fused_stage(self, batch: SubjectsBatch):
        import jax.numpy as jnp

        from ...ops.gaussian import radius_for_sigma
        from ..fuse import FusedStage, blur_apply

        images = self._get_images(batch)
        if not images:
            return None
        params = self.make_params(batch)
        sig_mm = np.asarray(params["std"], np.float64)
        keep = params.get("_keep")
        args = {}
        drawn = {}
        gated = {}
        skip = {}
        for name, img_batch in images.items():
            radii = self._radius_bound(img_batch)
            spacings = np.asarray(
                [a.spacing for a in img_batch.affines], np.float64
            )
            sig_vox = np.divide(
                sig_mm, spacings, out=np.zeros_like(sig_mm),
                where=spacings > 0,
            )
            per_draw = tuple(
                0
                if sig_vox[:, a].max() <= 0
                else radius_for_sigma(float(sig_vox[:, a].max()))
                for a in range(3)
            )
            drawn[name] = tuple(
                max(int(radii[a]), per_draw[a]) for a in range(3)
            )
            skip[name] = bool(np.all(sig_vox <= 0))
            row_keep = ~np.all(sig_vox <= 0, axis=1)
            gated[name] = bool(not row_keep.all()) and not skip[name]
            args[name] = (
                jnp.asarray(sig_vox, jnp.float32),
                jnp.asarray(row_keep.astype(np.float32)),
            )
        names = tuple(images)
        return FusedStage(
            key=(
                "blur", names,
                tuple(sorted(drawn.items())),
                tuple(sorted(gated.items())),
                tuple(sorted(skip.items())),
            ),
            apply=blur_apply(names, drawn, 3.0, gated, skip),
            args=args,
            params=params,
        )

    def _radius_bound(self, img_batch: ImagesBatch) -> tuple[int, int, int]:
        """Static per-axis kernel radius from the std UPPER bound.

        Derived from the parameter range, not the sampled values, so every
        random draw reuses one compiled convolution (fresh draws would
        otherwise change the kernel length and trigger a recompile —
        measured at seconds per 256^3 compile on the TPU host).
        """
        spacings = np.asarray([a.spacing for a in img_batch.affines], np.float64)
        min_spacing = np.maximum(spacings.min(axis=0), 1e-9)
        highs = np.asarray([hi for _lo, hi in self.std._ranges], np.float64)
        sig_vox = highs / min_spacing
        return tuple(
            0 if s <= 0 else max(int(np.ceil(3.0 * s)), 1) for s in sig_vox
        )


def _mm_to_voxels(sigmas_mm: np.ndarray, spacing: np.ndarray) -> np.ndarray:
    return np.divide(
        sigmas_mm, spacing, out=np.zeros_like(sigmas_mm, np.float64), where=spacing > 0
    )


def _blur_per_element(img_batch: ImagesBatch, sigmas_mm_per_element, radii=None) -> Any:
    data = as_jnp(img_batch.data)
    sigmas_mm = np.asarray(sigmas_mm_per_element, np.float64)
    spacings = np.asarray([a.spacing for a in img_batch.affines], np.float64)
    sigmas_vox = np.divide(
        sigmas_mm, spacings, out=np.zeros_like(sigmas_mm), where=spacings > 0
    )
    if np.all(sigmas_vox <= 0):
        return data
    out = gaussian_blur_per_element(data, sigmas_vox, radii=radii)
    # rows with all-zero sigma must be bit-exact no-ops
    keep = ~np.all(sigmas_vox <= 0, axis=1)
    return restore_gated(out, data, keep)

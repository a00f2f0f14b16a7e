"""Ghosting: periodic k-space line attenuation along a phase axis.

Parity reference:
``/root/reference/src/torchio/transforms/intensity/ghosting.py``
(fftshifted spectrum; every ``size // num_ghosts``-th line scaled by
``1 - intensity``; optional central restore band; per-element masks).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from ... import random as tio_random
from ...data.batch import SubjectsBatch
from .._utils import as_jnp, restore_gated
from ..parameter_range import to_nonneg_range
from ..transform import IntensityTransform


def _line_mask(size: int, num_ghosts: int, intensity: float, restore: float):
    mask = np.ones(size, np.float32)
    step = max(size // num_ghosts, 1)
    mask[::step] = 1.0 - intensity
    if restore > 0:
        mid = size // 2
        half = max(int(size * restore / 2), 1)
        mask[mid - half : mid + half] = 1.0
    return mask


class Ghosting(IntensityTransform):
    r"""MRI ghosting artifact along a random phase-encoding axis."""

    def __init__(
        self,
        *,
        num_ghosts: Any = 4,
        axes: tuple[int, ...] = (0, 1, 2),
        intensity: Any = 0.0,
        restore: float | None = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        self.num_ghosts = to_nonneg_range(num_ghosts)
        self.axes = axes
        self.intensity = to_nonneg_range(intensity)
        self.restore = restore
        self.warn_if_noop(
            is_noop=self.intensity.is_constant(0.0)
            or self.num_ghosts.is_constant(0.0),
            hint="intensity=(0.5, 1)",
        )

    @property
    def supports_per_instance_params(self) -> bool:
        return True

    @property
    def supports_per_instance_p(self) -> bool:
        return True

    def make_params(self, batch: SubjectsBatch) -> dict[str, Any]:
        restore = self.restore if self.restore is not None else 0.0
        rng = tio_random.get_rng()
        n = self._resolve_n(batch)
        if n is None:
            return {
                "num_ghosts": max(1, round(self.num_ghosts.sample_1d())),
                "axis": int(self.axes[rng.integers(len(self.axes))]),
                "intensity": self.intensity.sample_1d(),
                "restore": restore,
            }
        keep = self._keep_mask(batch, n)
        ghosts, axes, intensities = [], [], []
        for i in range(n):
            if keep is not None and not keep[i]:
                ghosts.append(0)
                axes.append(int(self.axes[0]))
                intensities.append(0.0)
                continue
            ghosts.append(max(1, round(self.num_ghosts.sample_1d())))
            axes.append(int(self.axes[rng.integers(len(self.axes))]))
            intensities.append(float(self.intensity.sample_1d()))
        params = {
            "num_ghosts": ghosts,
            "axis": axes,
            "intensity": intensities,
            "restore": restore,
        }
        self._tag_batched(params, batch, n, keep, ["num_ghosts", "axis", "intensity"])
        return params

    def apply_transform(
        self, batch: SubjectsBatch, params: dict[str, Any]
    ) -> SubjectsBatch:
        per_instance = self._is_per_instance_params(params)
        restore = params["restore"]
        for _name, img_batch in self._get_images(batch).items():
            data = as_jnp(img_batch.data)
            spatial = data.shape[2:]
            if per_instance:
                b = data.shape[0]
                # per-axis 1D lines (B, size): only B*(I+J+K) floats cross
                # to device; the dense (B, I, J, K) mask materializes there
                # as an outer product. Lines are host-ifftshifted so the
                # spectrum is masked UNSHIFTED (no device rolls at all).
                lines = [np.ones((b, s), np.float32) for s in spatial]
                active = []
                for i in range(b):
                    ghosts = params["num_ghosts"][i]
                    strength = params["intensity"][i]
                    if not ghosts or strength == 0:
                        active.append(False)
                        continue
                    active.append(True)
                    axis = params["axis"][i]
                    size = spatial[axis]
                    lines[axis][i] = np.fft.ifftshift(
                        _line_mask(size, ghosts, strength, restore)
                    )
                mask = (
                    jnp.asarray(lines[0])[:, None, :, None, None]
                    * jnp.asarray(lines[1])[:, None, None, :, None]
                    * jnp.asarray(lines[2])[:, None, None, None, :]
                )
                out = _apply_mask(data, mask)
                img_batch.data = restore_gated(out, data, active)
            else:
                ghosts = params["num_ghosts"]
                strength = params["intensity"]
                if not ghosts or strength == 0:
                    continue
                axis = params["axis"]
                size = spatial[axis]
                line = np.fft.ifftshift(_line_mask(size, ghosts, strength, restore))
                shape = [1, 1, 1, 1, 1]
                shape[axis + 2] = size
                img_batch.data = _apply_mask(
                    data, jnp.asarray(line.reshape(shape))
                )
        return batch


import jax as _jax


@_jax.jit
def _apply_mask(data, mask):
    """Multiply the UNSHIFTED spectrum by a host-pre-ifftshifted mask.

    Equivalent to fftshift -> mask(shifted coords) -> ifftshift, without
    the four device-side roll passes. jit-compiled: the FFT pair, the
    complex multiply, and the dtype restores fuse into one program
    (measured 299 -> ~75 ms per 128^3 subject call on v5e eager->jit).
    """
    result = data.astype(jnp.float32)
    spectrum = jnp.fft.fftn(result, axes=(-3, -2, -1))
    out = jnp.fft.ifftn(spectrum * mask, axes=(-3, -2, -1)).real
    return out.astype(data.dtype)

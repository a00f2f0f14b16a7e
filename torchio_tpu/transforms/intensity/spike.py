"""Spike (herringbone) artifact: point impulses in k-space.

Parity reference: ``/root/reference/src/torchio/transforms/intensity/spike.py``
(impulse amplitude relative to the spectrum max, at random normalized
positions; per-element active masks).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from ... import random as tio_random
from ...data.batch import SubjectsBatch
from .._utils import as_jnp, restore_gated
from ..parameter_range import to_nonneg_range, to_range
from ..transform import IntensityTransform


class Spike(IntensityTransform):
    r"""Add k-space point impulses (stripes in image space)."""

    def __init__(
        self, *, num_spikes: Any = 1, intensity: Any = 0.0, **kwargs: Any
    ) -> None:
        super().__init__(**kwargs)
        self.num_spikes = to_nonneg_range(num_spikes)
        self.intensity = to_range(intensity)
        self.warn_if_noop(
            is_noop=self.intensity.is_constant(0.0)
            or self.num_spikes.is_constant(0.0),
            hint="intensity=(1, 3)",
        )

    @property
    def supports_per_instance_params(self) -> bool:
        return True

    @property
    def supports_per_instance_p(self) -> bool:
        return True

    def make_params(self, batch: SubjectsBatch) -> dict[str, Any]:
        rng = tio_random.get_rng()
        n = self._resolve_n(batch)
        if n is None:
            num = max(1, round(self.num_spikes.sample_1d()))
            return {
                "positions": rng.random((num, 3)).tolist(),
                "intensity": self.intensity.sample_1d(),
            }
        keep = self._keep_mask(batch, n)
        positions, intensities = [], []
        for i in range(n):
            if keep is not None and not keep[i]:
                positions.append([])
                intensities.append(0.0)
                continue
            num = max(1, round(self.num_spikes.sample_1d()))
            positions.append(rng.random((num, 3)).tolist())
            intensities.append(float(self.intensity.sample_1d()))
        params = {"positions": positions, "intensity": intensities}
        self._tag_batched(params, batch, n, keep, ["positions", "intensity"])
        return params

    def apply_transform(
        self, batch: SubjectsBatch, params: dict[str, Any]
    ) -> SubjectsBatch:
        per_instance = self._is_per_instance_params(params)
        for _name, img_batch in self._get_images(batch).items():
            data = as_jnp(img_batch.data)
            b = data.shape[0]
            if per_instance:
                per_element = list(zip(params["positions"], params["intensity"]))
            else:
                per_element = [(params["positions"], params["intensity"])] * b
            active = [bool(p) and i != 0 for p, i in per_element]
            if not any(active):
                continue
            out = _add_spikes(data, per_element)
            img_batch.data = restore_gated(
                out, data, active if per_instance else None
            )
        return batch


def _add_spikes(data, per_element):
    # Impulses are sparse: scatter them into the UNSHIFTED spectrum at
    # host-ifftshifted indices instead of shipping a dense (B, I, J, K)
    # impulse volume through the host link and rolling on device. All
    # indices are gathered on host into ONE batched scatter so the FFT
    # pair + scatter run as a single jit program.
    import numpy as np

    shape = data.shape[2:]
    b_idx, coords, vals = [], [], []
    for b, (positions, intensity) in enumerate(per_element):
        if not positions or intensity == 0:
            continue
        for pos in positions:
            idx = [int(p * s) % s for p, s in zip(pos, shape)]
            # index in shifted coords -> unshifted: ifftshift mapping
            unshifted = [
                (i + (s - s // 2)) % s for i, s in zip(idx, shape)
            ]
            b_idx.append(b)
            coords.append(unshifted)
            vals.append(intensity)
    return _spike_kernel(
        data,
        jnp.asarray(np.asarray(b_idx, np.int32)),
        jnp.asarray(np.asarray(coords, np.int32).reshape(-1, 3)),
        jnp.asarray(np.asarray(vals, np.float32)),
    )


import jax as _jax


@_jax.jit
def _spike_kernel(data, b_idx, coords, intensities):
    result = data.astype(jnp.float32)
    spectrum = jnp.fft.fftn(result, axes=(-3, -2, -1))
    peak = jnp.max(jnp.abs(spectrum), axis=(-3, -2, -1))  # (B, C)
    vals = intensities[:, None] * peak[b_idx]  # (M, C)
    spectrum = spectrum.at[
        b_idx, :, coords[:, 0], coords[:, 1], coords[:, 2]
    ].add(vals.astype(spectrum.dtype))
    out = jnp.fft.ifftn(spectrum, axes=(-3, -2, -1)).real
    return out.astype(data.dtype)

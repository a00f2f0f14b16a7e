"""PCA over channels (feature-map RGB visualization).

Parity reference: ``/root/reference/src/torchio/transforms/intensity/pca.py``
(``torch.pca_lowrank`` -> SVD here; whiten / normalize / clip options).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ...data.batch import SubjectsBatch
from .._utils import as_jnp
from ..transform import IntensityTransform


class PCA(IntensityTransform):
    r"""Project the channel dimension onto its leading principal components."""

    def __init__(
        self,
        num_components: int = 3,
        *,
        whiten: bool = True,
        normalize: bool = True,
        values_range: tuple[float, float] = (-2.3, 2.3),
        clip: bool = True,
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        if num_components < 1:
            raise ValueError(f"num_components must be >= 1, got {num_components}")
        self.num_components = num_components
        self.whiten = whiten
        self.normalize = normalize
        self.values_range = values_range
        self.clip = clip

    def apply_transform(
        self, batch: SubjectsBatch, params: dict[str, Any]
    ) -> SubjectsBatch:
        for _name, img_batch in self._get_images(batch).items():
            data = as_jnp(img_batch.data)
            img_batch.data = jnp.stack(
                [self._pca_single(data[i]) for i in range(data.shape[0])]
            )
        return batch

    def _pca_single(self, tensor):
        c, si, sj, sk = tensor.shape
        if c < self.num_components:
            raise ValueError(
                f"Image has {c} channels but num_components={self.num_components};"
                " need at least as many channels as components."
            )
        flat = tensor.astype(jnp.float32).reshape(c, -1).T  # (voxels, C)
        centered = flat - flat.mean(axis=0, keepdims=True)
        # full SVD of the (voxels, C) matrix via its CxC gram (C is tiny)
        # HIGHEST: TPU matmuls default to bf16; PCA statistics need f32
        gram = jnp.matmul(
            centered.T, centered, precision=jax.lax.Precision.HIGHEST
        )
        eigvals, eigvecs = jnp.linalg.eigh(gram)
        order = jnp.argsort(eigvals)[::-1][: self.num_components]
        v = eigvecs[:, order]
        s = jnp.sqrt(jnp.clip(eigvals[order], 0.0))
        projected = jnp.matmul(centered, v, precision=jax.lax.Precision.HIGHEST)
        if self.whiten:
            n = flat.shape[0]
            denom = (n - 1) ** 0.5 if n > 1 else 1.0
            std = jnp.clip(s / denom, 1e-8)
            projected = projected / std[None, :]
        if self.normalize and projected.shape[1] > 0:
            first_std = jnp.clip(jnp.std(projected[:, 0]), 1e-8)
            projected = projected / first_std
        lo, hi = self.values_range
        projected = (projected - lo) / (hi - lo)
        if self.clip:
            projected = jnp.clip(projected, 0.0, 1.0)
        return projected.T.reshape(self.num_components, si, sj, sk)

"""Swap: exchange random same-size patch pairs (context-restoration SSL).

Parity reference: ``/root/reference/src/torchio/transforms/intensity/swap.py``
(non-overlapping pair sampling with retry; per-element batched swapping;
LabelMap warning).
"""

from __future__ import annotations

import warnings
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ... import random as tio_random
from ...data.batch import SubjectsBatch
from ...data.image import LabelMap
from .._utils import as_jnp
from ..parameter_range import to_nonneg_range
from ..transform import IntensityTransform


def _overlap(a, b, patch_size) -> bool:
    for ai, bi, p in zip(a, b, patch_size):
        if ai + p <= bi or bi + p <= ai:
            return False
    return True


def _sample_locations(spatial_shape, patch_size, num_iterations: int):
    rng = tio_random.get_rng()
    max_ini = [s - p for s, p in zip(spatial_shape, patch_size)]
    if any(m < 0 for m in max_ini):
        raise ValueError(
            f"Patch size {patch_size} cannot be larger than spatial shape"
            f" {tuple(spatial_shape)}"
        )

    def origin():
        return tuple(int(rng.integers(m + 1)) if m else 0 for m in max_ini)

    locations = []
    for _ in range(num_iterations):
        first = origin()
        second = first
        for _ in range(100):
            second = origin()
            if not _overlap(first, second, patch_size):
                break
        locations.append((list(first), list(second)))
    return locations


@partial(jax.jit, static_argnames=("patch_size",))
def _swap_kernel(data, origins_a, origins_b, patch_size: tuple[int, int, int]):
    """Swap `num_swaps` patch pairs per element.

    origins_[ab]: (B, num_swaps, 3) int32. Swaps run sequentially (they
    may chain) via a fori_loop over static patch-shaped gathers.
    """
    b, c = data.shape[:2]
    pi, pj, pk = patch_size
    b_idx = jnp.arange(b).reshape(-1, 1, 1, 1, 1)
    c_idx = jnp.arange(c).reshape(1, -1, 1, 1, 1)
    oi = jnp.arange(pi).reshape(1, 1, -1, 1, 1)
    oj = jnp.arange(pj).reshape(1, 1, 1, -1, 1)
    ok = jnp.arange(pk).reshape(1, 1, 1, 1, -1)

    def indices(origins):
        i = origins[:, 0].reshape(-1, 1, 1, 1, 1) + oi
        j = origins[:, 1].reshape(-1, 1, 1, 1, 1) + oj
        k = origins[:, 2].reshape(-1, 1, 1, 1, 1) + ok
        return b_idx, c_idx, i, j, k

    def body(step, acc):
        ia = indices(origins_a[:, step])
        ib = indices(origins_b[:, step])
        pa = acc[ia]
        pb = acc[ib]
        acc = acc.at[ia].set(pb)
        return acc.at[ib].set(pa)

    return jax.lax.fori_loop(0, origins_a.shape[1], body, data)


class Swap(IntensityTransform):
    """Exchange random same-size patch pairs within each image."""

    def __init__(
        self,
        *,
        patch_size: int | tuple[int, int, int] = 15,
        num_iterations: Any = 100,
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        if isinstance(patch_size, int):
            patch_size = (patch_size,) * 3
        self.patch_size = tuple(int(p) for p in patch_size)
        self.num_iterations = to_nonneg_range(num_iterations)

    @property
    def supports_per_instance_params(self) -> bool:
        return True

    @property
    def supports_per_instance_p(self) -> bool:
        return True

    def make_params(self, batch: SubjectsBatch) -> dict[str, Any]:
        for _name, img_batch in batch.images.items():
            if issubclass(img_batch.image_class, LabelMap):
                warnings.warn(
                    "Swap is applied to a subject containing LabelMap images."
                    " The spatial rearrangement will make labels inconsistent"
                    " with the swapped image. This transform is intended for"
                    " self-supervised learning.",
                    stacklevel=2,
                )
                break
        any_img = next(iter(batch.images.values()))
        spatial_shape = any_img.data.shape[2:]
        n = self._resolve_n(batch)
        if n is None:
            iterations = max(1, round(self.num_iterations.sample_1d()))
            return {
                # patch_size recorded so params alone replay the transform
                # (self-contained history; the reference needs the instance)
                "patch_size": list(self.patch_size),
                "locations": _sample_locations(
                    spatial_shape, self.patch_size, iterations
                ),
            }
        keep = self._keep_mask(batch, n)
        locations = []
        for i in range(n):
            if keep is not None and not keep[i]:
                locations.append([])
                continue
            iterations = max(1, round(self.num_iterations.sample_1d()))
            locations.append(
                _sample_locations(spatial_shape, self.patch_size, iterations)
            )
        params = {"patch_size": list(self.patch_size), "locations": locations}
        self._tag_batched(params, batch, n, keep, ["locations"])
        return params

    def apply_transform(
        self, batch: SubjectsBatch, params: dict[str, Any]
    ) -> SubjectsBatch:
        per_instance = self._is_per_instance_params(params)
        for _name, img_batch in self._get_images(batch).items():
            data = as_jnp(img_batch.data)
            b = data.shape[0]
            if per_instance:
                per_element = params["locations"]
            else:
                per_element = [params["locations"]] * b
            num_swaps = max((len(locs) for locs in per_element), default=0)
            if num_swaps == 0:
                continue
            origins_a = np.zeros((b, num_swaps, 3), np.int32)
            origins_b = np.zeros((b, num_swaps, 3), np.int32)
            for bi, locs in enumerate(per_element):
                for si, (a, bb) in enumerate(locs):
                    origins_a[bi, si] = a
                    origins_b[bi, si] = bb
                # inactive steps swap a patch with itself (no-op)
                for si in range(len(locs), num_swaps):
                    origins_b[bi, si] = origins_a[bi, si]
            patch_size = tuple(
                params.get("patch_size", getattr(self, "patch_size", None))
            )
            img_batch.data = _swap_kernel(
                data, jnp.asarray(origins_a), jnp.asarray(origins_b), patch_size
            )
        return batch

"""Device-side patch extraction and a device-resident ring buffer.

The BASELINE.json north star: an on-device patch queue that avoids host
round-trips. The reference extracts patches with host tensor slicing
(``/root/reference/src/torchio/data/sampler.py:54-67``); here a single
jit call slices ALL of a subject's patches on device
(:func:`extract_patches`), and :class:`RingPatchBuffer` keeps a
shuffle-on-sample patch pool in HBM with donated in-place updates.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("patch_size",))
def _extract_patches_kernel(volume, corners, patch_size):
    c = volume.shape[0]

    def one(_, corner):
        start = jnp.concatenate([jnp.zeros((1,), jnp.int32), corner])
        return None, jax.lax.dynamic_slice(
            volume, start, (c, *patch_size)
        )

    _, patches = jax.lax.scan(one, None, corners)
    return patches


@partial(jax.jit, static_argnames=("patch_size",))
def _extract_patches_multi_kernel(volumes, corners, patch_size):
    def one(_, corner):
        start = jnp.concatenate([jnp.zeros((1,), jnp.int32), corner])
        outs = tuple(
            jax.lax.dynamic_slice(v, start, (v.shape[0], *patch_size))
            for v in volumes
        )
        return None, outs

    _, patches = jax.lax.scan(one, None, corners)
    return patches


def extract_patches_multi(volumes, corners, patch_size) -> tuple:
    """Slice the same patch grid from several same-spatial-shape volumes
    in ONE compiled program.

    A multi-image subject (e.g. t1 + seg) otherwise pays one dispatch
    per image per loader batch; through a high-latency link the
    dispatch submissions dominate reassembly. Dtypes are preserved
    per volume (scalar f32 and label int volumes share the program).

    Args:
        volumes: sequence of (C_i, I, J, K) device arrays (equal
            spatial shape, any channel counts/dtypes).
        corners: (N, 3) int32 patch corner indices.
        patch_size: static (pi, pj, pk).

    Returns:
        tuple of (N, C_i, *patch_size) arrays, one per input volume.
    """
    volumes = tuple(jnp.asarray(v) for v in volumes)
    corners = jnp.asarray(np.asarray(corners), jnp.int32)
    return _extract_patches_multi_kernel(
        volumes, corners, tuple(int(p) for p in patch_size)
    )


def extract_patches(volume, corners, patch_size) -> jax.Array:
    """Slice ``(N, C, *patch_size)`` patches from a ``(C, I, J, K)`` volume.

    Args:
        volume: (C, I, J, K) device array.
        corners: (N, 3) int32 patch corner indices (already validated to
            fit: ``corner + patch_size <= spatial shape``).
        patch_size: static (pi, pj, pk).

    One compiled program per (volume shape, N, patch_size) — a
    ``lax.scan`` of ``dynamic_slice`` (contiguity-preserving DMAs, not
    the pathological batched gather).
    """
    volume = jnp.asarray(volume)
    corners = jnp.asarray(np.asarray(corners), jnp.int32)
    return _extract_patches_kernel(
        volume, corners, tuple(int(p) for p in patch_size)
    )


@partial(jax.jit, donate_argnums=(0,))
def _ring_push_kernel(buffer, patches, cursor):
    n = patches.shape[0]
    length = buffer.shape[0]

    def body(i, buf):
        row = jax.lax.dynamic_slice_in_dim(patches, i, 1, axis=0)
        return jax.lax.dynamic_update_slice(
            buf,
            row,
            (
                jnp.mod(cursor + i, length),
                *([jnp.int32(0)] * (buffer.ndim - 1)),
            ),
        )

    return jax.lax.fori_loop(0, n, body, buffer)


@partial(jax.jit, static_argnames=("n",))
def _ring_sample_kernel(buffer, seed, n, filled):
    key = jax.random.PRNGKey(seed)
    idx = jax.random.randint(key, (n,), 0, jnp.maximum(filled, 1))
    return jnp.take(buffer, idx, axis=0)


class RingPatchBuffer:
    """Fixed-capacity device-resident patch pool.

    ``push`` overwrites the oldest entries (donated buffer: the update
    is in place in HBM); ``sample`` draws a uniformly random batch with
    replacement from the filled region — the on-device analog of the
    reference Queue's shuffle-and-pop buffer, without the host ever
    touching patch voxels.
    """

    def __init__(self, capacity: int, patch_shape, dtype=jnp.float32):
        self.capacity = int(capacity)
        self._buffer = jnp.zeros((self.capacity, *patch_shape), dtype)
        self._cursor = 0
        self._filled = 0

    @property
    def filled(self) -> int:
        return self._filled

    def push(self, patches) -> None:
        patches = jnp.asarray(patches, self._buffer.dtype)
        if patches.shape[1:] != self._buffer.shape[1:]:
            raise ValueError(
                f"patch shape {patches.shape[1:]} does not match buffer"
                f" {self._buffer.shape[1:]}"
            )
        n = int(patches.shape[0])
        if n > self.capacity:
            patches = patches[-self.capacity :]
            n = self.capacity
        self._buffer = _ring_push_kernel(
            self._buffer, patches, jnp.int32(self._cursor)
        )
        self._cursor = (self._cursor + n) % self.capacity
        self._filled = min(self._filled + n, self.capacity)

    def sample(self, n: int, *, seed: int | None = None) -> jax.Array:
        """(n, *patch_shape) random batch from the filled region."""
        if self._filled == 0:
            raise RuntimeError("RingPatchBuffer is empty")
        if seed is None:
            from .. import random as tio_random

            seed = tio_random.draw_seed()
        return _ring_sample_kernel(
            self._buffer, jnp.int32(seed), int(n), jnp.int32(self._filled)
        )

    def gather(self, indices) -> jax.Array:
        """(n, *patch_shape) rows at ``indices`` (device-side take).

        Used by :meth:`torchio_tpu.data.queue.Queue.device_batches` to
        draw the SAME slots from the per-image buffers of a multi-image
        subject, keeping images of one patch aligned in a batch.
        """
        if self._filled == 0:
            raise RuntimeError("RingPatchBuffer is empty")
        return jnp.take(self._buffer, jnp.asarray(indices, jnp.int32), axis=0)

"""PatchAggregator: reassemble dense-inference patches into a volume.

Parity reference: ``/root/reference/src/torchio/data/aggregator.py``
(overlap modes ``crop`` / ``average`` / ``hann``; multi-output dict
support; ``output_shape`` scaling for downsampled heads).

TPU-native: aggregation buffers are JAX arrays updated with fused
``.at[...].add`` scatter ops, so patches coming straight off the model
never round-trip through the host (the reference calls ``.cpu()`` per
batch). ``get_output()`` is the only host sync point.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .patch import PatchLocation


@partial(jax.jit, donate_argnums=(0, 1))
def _scatter_add_pair_kernel(out, cnt, patches, window, corners, valid):
    """Scatter-add (B, C, p, p, p) patches at dynamic (B, 3) corners:
    weighted-patch and count scatters fused into ONE program.

    One compiled program per (buffer, batch) SHAPE — corner positions
    are traced values, so every grid location reuses the same
    executable (concrete ``.at[slice].add`` updates would recompile per
    distinct location). The donated buffers update in place in HBM.

    ``window`` broadcasts against a (C, p, p, p) patch (the separable
    Hann window, or a scalar 1.0 for ``average``); the weighting
    multiply happens in-kernel too, so an ``add_batch`` call is a
    single dispatch — through a high-latency link (the tunneled
    backend) this is 3x fewer round trips than weighted-multiply +
    two scatter programs.

    ``valid`` is a per-patch f32 multiplier: flushes pad the scan to a
    bucketed length with zero-valid filler rows so the number of
    distinct compiled lengths stays O(log N) rather than one per
    distinct pending total (the filler contributes exactly zero to both
    buffers).
    """

    def body(carry, xs):
        out, cnt = carry
        patch, corner, keep = xs
        start = (jnp.int32(0), corner[0], corner[1], corner[2])
        region = jax.lax.dynamic_slice(out, start, patch.shape)
        out = jax.lax.dynamic_update_slice(
            out, region + patch * (window * keep), start
        )
        regc = jax.lax.dynamic_slice(cnt, start, patch.shape)
        cnt = jax.lax.dynamic_update_slice(
            cnt, regc + jnp.broadcast_to(window * keep, patch.shape), start
        )
        return (out, cnt), None

    (out, cnt), _ = jax.lax.scan(
        body, (out, cnt), (patches, corners, valid)
    )
    return out, cnt


@jax.jit
def _normalize_kernel(out, cnt):
    """sum/weight division as ONE program (op-by-op clip+divide would
    cost two dispatch round trips through a high-latency link)."""
    return out / jnp.clip(cnt, 1e-8)


@partial(jax.jit, donate_argnums=(0,))
def _scatter_set_kernel(buf, patches, corners):
    """Like :func:`_scatter_add_kernel` but overwriting (crop mode)."""

    def body(buf, xs):
        patch, corner = xs
        start = (jnp.int32(0), corner[0], corner[1], corner[2])
        return jax.lax.dynamic_update_slice(buf, patch, start), None

    buf, _ = jax.lax.scan(body, buf, (patches, corners))
    return buf


def _hann_1d(size: int) -> np.ndarray:
    """torch.hann_window(size + 2, periodic=False)[1:-1] equivalent."""
    n = np.arange(1, size + 1, dtype=np.float64)
    return (0.5 * (1 - np.cos(2 * np.pi * n / (size + 1)))).astype(np.float32)


def _build_hann_3d(patch_size) -> np.ndarray:
    window = np.ones((1, 1, 1), np.float32)
    for dim, size in enumerate(patch_size):
        shape = [1, 1, 1]
        shape[dim] = size
        window = window * _hann_1d(size).reshape(shape)
    return window


class PatchAggregator:
    """Scatter-add patches into (C, I, J, K) output volumes.

    Args:
        spatial_shape: input-volume spatial shape the locations refer to.
        overlap_mode: ``"crop"`` (trim overlap/2 at non-boundary faces),
            ``"average"`` (sum + count), or ``"hann"`` (separable 3D
            Hann-window weighting — smoothest seams).
        patch_overlap: overlap used during sampling (for ``crop``).
        output_shape: volume shape when the model output is spatially
            scaled vs the input patches (locations are rescaled).
    """

    def __init__(
        self,
        spatial_shape,
        overlap_mode: str = "crop",
        patch_overlap=0,
        output_shape=None,
        flush_bytes: int = 256 * 1024**2,
    ) -> None:
        if overlap_mode not in ("crop", "average", "hann"):
            raise ValueError(
                f"overlap_mode must be 'crop', 'average', or 'hann',"
                f" got {overlap_mode!r}"
            )
        self.input_spatial_shape = tuple(int(s) for s in spatial_shape)
        self.overlap_mode = overlap_mode
        if isinstance(patch_overlap, (int, np.integer)):
            patch_overlap = (int(patch_overlap),) * 3
        self.patch_overlap = tuple(int(v) for v in patch_overlap)
        if output_shape is not None:
            self.spatial_shape = tuple(int(s) for s in output_shape)
            self._scale = tuple(
                o / i for o, i in zip(self.spatial_shape, self.input_spatial_shape)
            )
        else:
            self.spatial_shape = self.input_spatial_shape
            self._scale = (1.0, 1.0, 1.0)
        self._outputs: dict[str, jax.Array] = {}
        self._counts: dict[str, jax.Array] = {}
        self._hann_cache: dict[tuple[int, int, int], jax.Array] = {}
        # add/average scatters are deferred: batches accumulate here
        # (device arrays — holding them is free) and flush as ONE
        # scatter program per patch shape at get_output (or when the
        # buffered bytes exceed ``flush_bytes``), so an inference pass
        # pays O(1) scatter dispatches instead of one per add_batch
        self._flush_bytes = int(flush_bytes)
        self._pending: dict[str, list[tuple[jax.Array, Any, np.ndarray]]] = {}
        self._pending_bytes: dict[str, int] = {}

    def add_batch(self, batch: Any, locations: list[PatchLocation]) -> None:
        """Accumulate a (B, C, i, j, k) array (or dict of them).

        The whole batch scatters in ONE jitted donated-buffer program
        (compiled once per shape; dynamic corner positions)."""
        tensors = {"__default__": batch} if not isinstance(batch, dict) else batch
        for key, tensor in tensors.items():
            tensor = jnp.asarray(np.asarray(tensor) if not isinstance(tensor, jax.Array) else tensor)
            locs = [
                loc.scaled(self._scale) if self._scale != (1.0, 1.0, 1.0) else loc
                for loc in locations
            ]
            self._ensure_buffer(key, tensor[0])
            tensor = tensor.astype(jnp.float32)
            if self.overlap_mode == "crop":
                for idx, loc in enumerate(locs):
                    self._add_crop(key, tensor[idx], loc)
                continue
            # corners stay host numpy until flush: one (N_total, 3)
            # upload per flush instead of one tiny transfer per call
            corners = np.asarray([loc.index for loc in locs], np.int32)
            if self.overlap_mode == "average":
                window = jnp.float32(1.0)
            else:  # hann
                window = self._get_hann(tuple(tensor.shape[-3:]))
            self._pending.setdefault(key, []).append((tensor, window, corners))
            self._pending_bytes[key] = (
                self._pending_bytes.get(key, 0) + tensor.nbytes
            )
            if self._pending_bytes[key] >= self._flush_bytes:
                self._flush(key)

    def get_output(
        self,
        key: str | None = None,
        *,
        device: bool = False,
        dtype: Any = None,
    ) -> np.ndarray | jax.Array:
        """Aggregated (C, I, J, K) volume.

        By default the volume materializes as host numpy (one transfer —
        the only host sync of the aggregation). With ``device=True`` the
        normalized volume stays in HBM as a ``jax.Array`` so a
        device-side consumer (inverse spatial transform, argmax,
        metrics) never pays the device→host pull; through a
        low-bandwidth link the pull dwarfs the reassembly itself
        (measured 75% of the pass — BASELINE.md round-5 config-5
        decomposition). ``dtype`` casts ON DEVICE before any transfer:
        ``dtype=np.float16`` halves the host-materialization bytes for
        consumers that export reduced precision anyway.
        """
        resolved = key if key is not None else "__default__"
        if resolved not in self._outputs:
            available = [k for k in self._outputs if k != "__default__"]
            raise KeyError(f"No output for key {key!r}. Available: {available}")
        self._flush(resolved)
        output = self._outputs[resolved]
        if self.overlap_mode in ("average", "hann"):
            output = _normalize_kernel(output, self._counts[resolved])
        elif device:
            # crop mode has no normalize step, so ``output`` IS the
            # internal buffer — a later add_batch donates it to
            # _scatter_set_kernel, which would invalidate the array the
            # caller holds; hand out a fresh device copy instead
            # (astype(same_dtype) would alias, so copy unconditionally)
            output = output.copy()
        if dtype is not None:
            output = output.astype(jnp.dtype(dtype))
        if device:
            return output
        return np.asarray(output)

    # --- internals ---

    def _flush(self, key: str) -> None:
        pending = self._pending.pop(key, None)
        self._pending_bytes.pop(key, None)
        if not pending:
            return
        # one scatter program per distinct patch shape (usually one):
        # batches of the same grid concatenate into a single scan
        groups: dict[tuple, list[tuple[jax.Array, Any, np.ndarray]]] = {}
        for tensor, window, corners in pending:
            groups.setdefault(tuple(tensor.shape[1:]), []).append(
                (tensor, window, corners)
            )
        for entries in groups.values():
            if len(entries) == 1:
                tensor, window, corners = entries[0]
            else:
                tensor = jnp.concatenate([e[0] for e in entries])
                window = entries[0][1]
                corners = np.concatenate([e[2] for e in entries])
            # pad the scan to the next power-of-two length with
            # zero-valid filler rows at corner (0,0,0): varying pending
            # totals (partial final batches, different grids) then share
            # O(log N) compiled lengths instead of one executable each
            n = tensor.shape[0]
            padded = 1 << max(n - 1, 0).bit_length()
            valid = np.zeros(padded, np.float32)
            valid[:n] = 1.0
            if padded > n:
                pad_width = [(0, padded - n)] + [(0, 0)] * (tensor.ndim - 1)
                tensor = jnp.pad(tensor, pad_width)
                corners = np.concatenate(
                    [corners, np.zeros((padded - n, 3), np.int32)]
                )
            self._outputs[key], self._counts[key] = _scatter_add_pair_kernel(
                self._outputs[key],
                self._counts[key],
                tensor,
                window,
                jnp.asarray(corners),
                jnp.asarray(valid),
            )

    def _ensure_buffer(self, key: str, patch) -> None:
        if key in self._outputs:
            return
        c = patch.shape[0]
        self._outputs[key] = jnp.zeros((c, *self.spatial_shape), jnp.float32)
        if self.overlap_mode in ("average", "hann"):
            self._counts[key] = jnp.zeros((c, *self.spatial_shape), jnp.float32)

    def _add_crop(self, key: str, patch, location: PatchLocation) -> None:
        # trim = overlap/2 per axis, applied only at faces interior to
        # the volume (patches flush with a volume boundary keep their
        # full extent there so the assembly leaves no gap); vectorized
        # over (3,) axis arrays instead of a per-axis loop
        trim = (
            np.rint(
                np.asarray(self.patch_overlap, np.float64)
                * np.asarray(self._scale, np.float64)
            ).astype(np.int64)
            // 2
        )
        start = np.asarray(location.index_ini, np.int64)
        stop = np.asarray(location.index_fin, np.int64)
        lo_trim = np.where(start > 0, trim, 0)
        hi_trim = np.where(stop < np.asarray(self.spatial_shape), trim, 0)
        keep = tuple(
            slice(int(lo), int(size - hi))
            for lo, size, hi in zip(lo_trim, location.size, hi_trim)
        )
        cropped = patch[(slice(None), *keep)]
        # dynamic start, static cropped shape: one executable per
        # boundary-crop variant (<= 8) instead of one per location
        corner = jnp.asarray((start + lo_trim)[None].astype(np.int32))
        self._outputs[key] = _scatter_set_kernel(
            self._outputs[key], cropped[None], corner
        )

    def _get_hann(self, patch_size: tuple[int, int, int]):
        if patch_size not in self._hann_cache:
            self._hann_cache[patch_size] = jnp.asarray(_build_hann_3d(patch_size))
        return self._hann_cache[patch_size]

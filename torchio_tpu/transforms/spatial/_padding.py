"""Shared spatial padding helpers (jnp.pad-based).

Parity reference:
``/root/reference/src/torchio/transforms/spatial/_padding.py`` (modes
constant/reflect/replicate/circular plus whole-volume statistical fills
mean/median/minimum, one value per batch element).
"""

from __future__ import annotations

import warnings

import jax.numpy as jnp

from .._utils import as_jnp

PADDING_MODES = (
    "constant",
    "reflect",
    "replicate",
    "circular",
    "mean",
    "median",
    "minimum",
)
_STATISTIC_MODES = ("mean", "median", "minimum")
_JNP_MODE = {"constant": "constant", "reflect": "reflect", "replicate": "edge", "circular": "wrap"}


def parse_padding_mode(padding_mode: str) -> str:
    if padding_mode not in PADDING_MODES:
        raise ValueError(
            f"padding_mode must be one of {PADDING_MODES}, got {padding_mode!r}"
        )
    return padding_mode


def _padding_statistic(batch, mode: str):
    """One whole-volume statistic per batch element, shape (B,)."""
    flat = batch.reshape(batch.shape[0], -1)
    if mode == "minimum":
        return jnp.min(flat, axis=1)
    if not jnp.issubdtype(batch.dtype, jnp.floating):
        warnings.warn(
            f'Padding statistic for mode "{mode}" may be truncated:'
            " input image is not floating point.",
            RuntimeWarning,
            stacklevel=4,
        )
    ff = flat.astype(jnp.float32)
    if mode == "mean":
        stat = jnp.mean(ff, axis=1)
    else:
        stat = jnp.quantile(ff, 0.5, axis=1)
    return stat.astype(batch.dtype)


def pad_tensor(data, padding, padding_mode: str, fill: float):
    """Pad a (C, I, J, K) or (B, C, I, J, K) array along spatial axes."""
    if data.ndim not in (4, 5):
        raise ValueError(f"Expected a 4D or 5D image tensor, got {data.ndim}D")
    data = as_jnp(data)
    i0, i1, j0, j1, k0, k1 = padding
    lead = [(0, 0)] * (data.ndim - 3)
    widths = lead + [(i0, i1), (j0, j1), (k0, k1)]
    if padding_mode not in _STATISTIC_MODES:
        kwargs = {"constant_values": fill} if padding_mode == "constant" else {}
        return jnp.pad(data, widths, mode=_JNP_MODE[padding_mode], **kwargs)
    unbatched = data.ndim == 4
    batch = data[None] if unbatched else data
    stat = _padding_statistic(batch, padding_mode)
    widths5 = [(0, 0), (0, 0), (i0, i1), (j0, j1), (k0, k1)]
    padded = jnp.pad(batch, widths5)
    interior = jnp.pad(
        jnp.ones((1, 1) + batch.shape[-3:], bool), widths5, constant_values=False
    )
    out = jnp.where(interior, padded, stat.reshape(-1, 1, 1, 1, 1))
    return out[0] if unbatched else out

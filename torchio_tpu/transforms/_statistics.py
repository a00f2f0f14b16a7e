"""Statistics helpers: exact quantiles without sorting.

Parity reference: ``/root/reference/src/torchio/transforms/_statistics.py``
(the reference needs a kthvalue workaround because ``torch.quantile``
fails above 2^24 elements). Here the quantile itself is reimplemented
TPU-first: ``jnp.quantile`` lowers to a full sort (measured ~50 ms per
256^3-class volume on v5e — the dominant cost of percentile-based
``RescaleIntensity``), while an order statistic only needs COUNTS.

Algorithm: map float32 to its order-preserving uint32 key (the radix
-sort trick: flip all bits of negatives, flip the sign bit of
non-negatives), then binary-search the 32-bit key space — 32 fused
count-passes (`sum(data <= mid)`) inside one ``fori_loop`` find the
exact k-th order statistic, ~28 MB of HBM reads per pass instead of a
sort's O(N log N) shuffles. NaNs map to the maximal key, so masked
(NaN-filled) inputs work by ranking against the non-NaN count.
Linear interpolation between adjacent order statistics then matches
``jnp.quantile``'s default exactly (validated in
``tests/test_utils_misc.py``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _f32_to_ordered_u32(x: jnp.ndarray) -> jnp.ndarray:
    """Monotone bijection float32 -> uint32 (NaN -> near-max keys)."""
    u = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    sign = u >> jnp.uint32(31)
    # negative: flip every bit; non-negative: flip just the sign bit
    mask = jnp.where(sign == 1, jnp.uint32(0xFFFFFFFF), jnp.uint32(0x80000000))
    return u ^ mask


def _ordered_u32_to_f32(o: jnp.ndarray) -> jnp.ndarray:
    sign_was_set = (o >> jnp.uint32(31)) == 0  # originally negative
    mask = jnp.where(
        sign_was_set, jnp.uint32(0xFFFFFFFF), jnp.uint32(0x80000000)
    )
    return jax.lax.bitcast_convert_type(o ^ mask, jnp.float32)


def _order_statistics_u32(keys: jnp.ndarray, ranks: jnp.ndarray) -> jnp.ndarray:
    """Smallest key whose <=-count reaches each (1-indexed) rank.

    keys: (M,) uint32; ranks: (K,) — 32 bisection steps over the key
    space, each one fused broadcast-compare-reduce pass over ``keys``.
    """
    lo = jnp.zeros(ranks.shape, jnp.uint32)  # invariant: count(<=lo-1) < rank
    hi = jnp.full(ranks.shape, jnp.uint32(0xFFFFFFFF))  # count(<=hi) >= rank

    def body(_, lohi):
        lo, hi = lohi
        mid = lo + (hi - lo) // jnp.uint32(2)
        cnt = jnp.sum(
            (keys[None, :] <= mid[:, None]).astype(jnp.int32), axis=1
        )
        reached = cnt >= ranks
        return (
            jnp.where(reached, lo, mid + jnp.uint32(1)),
            jnp.where(reached, mid, hi),
        )

    lo, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
    return hi


@partial(jax.jit, static_argnames=("num_qs",))
def _quantiles_jit(data: jnp.ndarray, qs: jnp.ndarray, num_qs: int):
    keys = _f32_to_ordered_u32(data)
    valid = ~jnp.isnan(data)
    # push NaN keys past every finite/inf key so they never land in a rank
    keys = jnp.where(valid, keys, jnp.uint32(0xFFFFFFFF))
    n = jnp.sum(valid.astype(jnp.int32))
    pos = qs * (n - 1).astype(jnp.float32)  # 0-indexed fractional rank
    k = jnp.clip(jnp.floor(pos), 0, (n - 1).astype(jnp.float32))
    frac = pos - k
    lo_ranks = k.astype(jnp.int32) + 1  # 1-indexed
    hi_ranks = jnp.minimum(lo_ranks + 1, jnp.maximum(n, 1))
    stats = _order_statistics_u32(
        keys, jnp.concatenate([lo_ranks, hi_ranks])
    )
    values = _ordered_u32_to_f32(stats)
    v_lo, v_hi = values[:num_qs], values[num_qs:]
    return v_lo + frac.astype(jnp.float32) * (v_hi - v_lo)


def quantiles_on_device(values, qs) -> jnp.ndarray:
    """Exact linear-interpolation quantiles of a flattened array.

    NaN entries are ignored (``nanquantile`` semantics), so a masked
    volume can be passed as ``where(mask, data, nan)``. Returns a
    device array — pull once for all requested quantiles.
    """
    arr = jnp.asarray(values).reshape(-1).astype(jnp.float32)
    q = jnp.atleast_1d(jnp.asarray(qs, jnp.float32))
    return _quantiles_jit(arr, q, int(q.shape[0]))


def compute_quantile(values, q: float) -> float:
    """Quantile (linear interpolation) of a flattened array; q in [0, 1]."""
    return float(np.asarray(quantiles_on_device(values, [q]))[0])


def compute_quantiles(values, qs) -> np.ndarray:
    """Vector of quantiles of a flattened array (one device program,
    one host transfer for all of them)."""
    return np.asarray(quantiles_on_device(values, qs))

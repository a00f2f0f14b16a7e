"""Statistics helpers.

Parity reference: ``/root/reference/src/torchio/transforms/_statistics.py``
(the reference needs a kthvalue workaround because ``torch.quantile``
fails above 2^24 elements; ``jnp.quantile`` has no such limit on TPU, so
this is a thin wrapper kept for API parity).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def compute_quantile(values, q: float) -> float:
    """Quantile (linear interpolation) of a flattened array; q in [0, 1]."""
    arr = jnp.asarray(values).reshape(-1).astype(jnp.float32)
    return float(jnp.quantile(arr, q))


def compute_quantiles(values, qs) -> np.ndarray:
    """Vector of quantiles of a flattened array."""
    arr = jnp.asarray(values).reshape(-1).astype(jnp.float32)
    return np.asarray(jnp.quantile(arr, jnp.asarray(qs)))

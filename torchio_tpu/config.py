"""Runtime configuration toggles."""

from __future__ import annotations

import os

# None = auto: use the Pallas resample kernel on TPU-like backends
# (XLA's gather lowering there is ~1000x slower than HBM bandwidth).
# Override with torchio_tpu.config.use_pallas_resample = True/False or
# the TORCHIO_TPU_PALLAS env var ("1"/"0").
use_pallas_resample: bool | None = None


def _env_override() -> bool | None:
    value = os.environ.get("TORCHIO_TPU_PALLAS")
    if value is None:
        return None
    return value not in ("0", "false", "False", "")


def pallas_resample_enabled() -> bool:
    env = _env_override()
    if env is not None:
        return env
    if use_pallas_resample is not None:
        return use_pallas_resample
    try:
        import jax

        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform in ("tpu", "axon")

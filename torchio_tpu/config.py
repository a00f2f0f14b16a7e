"""Runtime configuration toggles."""

from __future__ import annotations

import os

# Pallas tiled resample kernel. Measured on v5e (round 1): correct on
# hardware but ~2x slower than the XLA gather at 256^3 — the 128-lane
# DMA alignment forces full-K input boxes, making the triangle-weight
# matmul ~11 TFLOP/volume. Opt in with TORCHIO_TPU_PALLAS=1 or
# torchio_tpu.config.use_pallas_resample = True; None currently means
# DISABLED (revisit when lane-unaligned DMA or in-kernel gather lands).
use_pallas_resample: bool | None = None
_PALLAS_AUTO_DEFAULT = False


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
    return _PALLAS_AUTO_DEFAULT

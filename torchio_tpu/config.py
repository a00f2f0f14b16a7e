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


_warned_pallas = False


def pallas_resample_enabled() -> bool:
    env = _env_override()
    enabled = (
        env
        if env is not None
        else (
            use_pallas_resample
            if use_pallas_resample is not None
            else _PALLAS_AUTO_DEFAULT
        )
    )
    if enabled:
        # benchmark surface, not a production path: warn ONCE so nobody
        # enables it expecting a speedup
        global _warned_pallas
        if not _warned_pallas:
            _warned_pallas = True
            import warnings

            warnings.warn(
                "The Pallas tiled resample is a measured dead end on"
                " current TPUs (~2x slower than the default gather kernel"
                " at 256^3; see BASELINE.md). It is kept as a benchmark"
                " artifact — do not enable it in production.",
                RuntimeWarning,
                stacklevel=3,
            )
    return bool(enabled)


# Half-precision corner-block gather. Gather cost on TPU tracks row
# BYTES past ~16 B (measured: 235 ms vs 276 ms per 256^3 volume on v5e
# for f16 vs f32 8-wide rows). With f16 rows the corner VALUES round to
# half precision before the f32 weighted sum: max relative error
# ~2^-11 ≈ 5e-4 — inside BASELINE.json's 1e-3 accuracy gate but not
# bit-comparable to the exact-f32 default, so it is OPT-IN:
# TORCHIO_TPU_GATHER16=1 or torchio_tpu.config.use_gather16 = True.
use_gather16: bool | None = None


def gather16() -> bool:
    value = os.environ.get("TORCHIO_TPU_GATHER16")
    if value is not None:
        return value not in ("0", "false", "False", "")
    if use_gather16 is not None:
        return use_gather16
    return False


# Bounded-offset windowed resample (Pallas). Exact f32 — identical
# corner weights to the gather kernel, only accumulation order differs
# (~1e-7 at 128^3) — and ~10x faster for elastic maps on TPU (v5e:
# 4x128^3 elastic resample ~20 ms vs ~240 ms). Enabled by default when
# a map qualifies (see ops.window_resample.window_eligible); disable
# with TORCHIO_TPU_WINDOW=0 or torchio_tpu.config.use_window_resample
# = False.
use_window_resample: bool | None = None


def window_resample() -> bool:
    value = os.environ.get("TORCHIO_TPU_WINDOW")
    if value is not None:
        return value not in ("0", "false", "False", "")
    if use_window_resample is not None:
        return use_window_resample
    return True

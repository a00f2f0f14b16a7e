"""Global host-side RNG for parameter sampling.

Design (see SURVEY.md §7.3 item 3): transform parameters are sampled on
host with numpy so they are *concrete* — JSON-serializable for the
history/replay system and hashable for jit caching. Heavy randomness
(noise fields, bias fields) happens on device via ``jax.random`` keyed by
an integer seed drawn here and recorded in the params, matching the
reference's recorded-seed replay contract
(``/root/reference/src/torchio/transforms/intensity/bias_field.py:72-88``).
"""

from __future__ import annotations

import threading

import numpy as np

_lock = threading.Lock()
_generator = np.random.default_rng()


def seed(value: int | None = None) -> None:
    """Seed the global parameter-sampling generator (like ``torch.manual_seed``)."""
    global _generator
    with _lock:
        _generator = np.random.default_rng(value)


def get_rng() -> np.random.Generator:
    """The global host generator used by ``make_params``."""
    return _generator


def uniform(lo: float, hi: float, size=None):
    return _generator.uniform(lo, hi, size)


def random(size=None):
    return _generator.random(size)


def randint(lo: int, hi: int, size=None):
    return _generator.integers(lo, hi, size)


def draw_seed() -> int:
    """Draw a fresh 31-bit seed for device-side ``jax.random`` keys."""
    return int(_generator.integers(0, 2**31 - 1))

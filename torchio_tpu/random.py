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
    """A generator safe to draw from in the calling thread.

    numpy Generators are not thread-safe, and ``Queue`` runs transforms
    (which sample params) in worker threads. Rather than serializing
    every draw through one mutex, each non-main thread gets its own
    child generator spawned (under the lock) from the global one, so
    draws never contend and streams never interleave. ``seed()``
    invalidates all children so reseeding stays deterministic
    single-threaded and fresh in workers.
    """
    if threading.current_thread() is threading.main_thread():
        return _generator
    epoch, gen = getattr(_tls, "gen", (None, None))
    if gen is None or epoch is not _generator:
        with _lock:
            gen = _generator.spawn(1)[0]
        _tls.gen = (_generator, gen)
    return gen


_tls = threading.local()


def uniform(lo: float, hi: float, size=None):
    return get_rng().uniform(lo, hi, size)


def random(size=None):
    return get_rng().random(size)


def randint(lo: int, hi: int, size=None):
    return get_rng().integers(lo, hi, size)


def choice(values, size=None, p=None):
    return get_rng().choice(values, size=size, p=p)


def draw_seed() -> int:
    """Draw a fresh 31-bit seed for device-side ``jax.random`` keys."""
    return int(get_rng().integers(0, 2**31 - 1))

"""Device mesh + sharding helpers for multi-chip preprocessing.

The reference has no collectives at all (SURVEY.md §2.10 — its only
distributed hook is an injected subject sampler). The TPU-native design
shards the (B, C, I, J, K) batch over a 2D mesh:

- ``data``: batch-parallel (the DP analog) — each chip augments its own
  subjects.
- ``space``: spatial sharding of the J axis (the SP/CP analog for
  volumes larger than HBM, SURVEY.md §5.7) — pointwise intensity ops
  are local, stencils use halo exchange (see :mod:`.halo`), and global
  statistics ride XLA's automatic collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(
    devices=None,
    *,
    axis_names: tuple[str, str] = ("data", "space"),
    space: int | None = None,
) -> Mesh:
    """Build a (data, space) mesh over the given (or all) devices.

    ``space`` defaults to 2 when the device count is even, else 1.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    n = devices.size
    if space is None:
        space = 2 if n % 2 == 0 and n > 1 else 1
    if n % space != 0:
        raise ValueError(f"{n} devices not divisible by space={space}")
    grid = devices.reshape(n // space, space)
    return Mesh(grid, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """(B, C, I, J, K): B over 'data', J over 'space'."""
    return NamedSharding(mesh, PartitionSpec(mesh.axis_names[0], None, None, mesh.axis_names[1], None))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def param_sharding(mesh: Mesh) -> NamedSharding:
    """Per-element parameter arrays (B, ...): B over 'data'."""
    return NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))


def shard_batch(data, mesh: Mesh):
    """Place a (B, C, I, J, K) array on the mesh with batch+spatial sharding."""
    return jax.device_put(data, batch_sharding(mesh))

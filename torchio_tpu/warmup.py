"""Pipeline warm-up: populate jit caches before the first real batch.

First-call compilation dominates short jobs on TPU hosts (~20 s per
process measured for an FFT-artifact pipeline through a tunneled
backend). ``warmup`` runs a transform once on a dummy batch of the
shapes you are about to use, so real data hits warm executables. The
global RNG state is snapshotted and restored, so warming up does NOT
change the random parameters your actual pipeline draws.
"""

from __future__ import annotations

import copy
from typing import Any, Sequence

import numpy as np

from . import random as tio_random
from .data.batch import SubjectsBatch
from .data.image import LabelMap, ScalarImage
from .data.subject import Subject


def _force_apply(transform: Any) -> None:
    """Set p=1 recursively so gated transforms actually compile.

    ``OneOf``/``SomeOf`` still pick random branches — call ``warmup``
    several times to cover all branches of a stochastic composition.
    """
    if hasattr(transform, "p"):
        transform.p = 1.0
    for child in getattr(transform, "transforms", ()) or ():
        _force_apply(child)


def warmup(
    transform: Any,
    spatial_shape: Sequence[int],
    *,
    channels: int = 1,
    batch_size: int = 1,
    label_keys: Sequence[str] = (),
    image_key: str = "t1",
    repeats: int = 1,
) -> None:
    """Compile ``transform`` for the given shapes on the current device.

    Args:
        transform: Any transform or Compose.
        spatial_shape: (I, J, K) of the batches you will process.
        channels: Channels of the scalar image.
        batch_size: Batch size to warm (each distinct size compiles
            separately; warm the one you will use).
        label_keys: Names of LabelMap entries to include (label paths
            compile separate executables).
        image_key: Name of the scalar image entry.
        repeats: run the pipeline this many times with fresh random
            params. Transforms whose executable depends on a sampled
            choice (Ghosting/Spike phase AXIS, OneOf branches, Motion
            segment counts) compile one variant per draw; a few repeats
            cover them all.
    """
    state = tio_random.get_rng().bit_generator.state
    try:
        rng = np.random.default_rng(0)
        shape = (channels, *spatial_shape)
        subjects = []
        for _ in range(batch_size):
            images: dict[str, Any] = {
                image_key: ScalarImage(rng.random(shape, np.float32))
            }
            for key in label_keys:
                images[key] = LabelMap(
                    rng.integers(0, 2, (1, *spatial_shape)).astype(np.uint8)
                )
            subjects.append(Subject(**images))
        batch = SubjectsBatch.from_subjects(subjects)
        import jax.numpy as jnp

        for ib in batch.images.values():
            ib.data = jnp.asarray(np.asarray(ib.data))
        runner = copy.deepcopy(transform)
        _force_apply(runner)
        for _ in range(max(1, repeats)):
            result = runner(batch)
            # force execution (tunneled backends can return early)
            for ib in result.images.values():
                float(jnp.sum(jnp.asarray(ib.data)))
    finally:
        tio_random.get_rng().bit_generator.state = state

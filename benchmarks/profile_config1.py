"""Decompose BASELINE config 1's per-batch cost on the real chip.

Config 1 is Flip+Noise+RescaleIntensity on a (B, 1, 181, 217, 181)
batch. Round 3 measured ~71 ms/batch (~56-71 vol/s at B=4) with a
claimed ~25 ms tunnel-sync floor; VERDICT r3 weak #5 asks for the
remaining ~46 ms to be attributed. Stages measured here:

  sync            one float(jnp.sum(resident)) pull — the per-batch floor
  pipeline        the public Compose (3 transforms, 3+ dispatches)
  fused           ONE jitted program computing the same three stages
  pipeline B=16   amortization: same pipeline, 4x the batch

Run: python benchmarks/profile_config1.py  (on the TPU)
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import torchio_tpu as tio
from torchio_tpu.data.batch import SubjectsBatch

SHAPE = (1, 181, 217, 181)
ITERS = 10


def _batch(b: int) -> SubjectsBatch:
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    subjects = [
        tio.Subject(t1=tio.ScalarImage(rng.random(SHAPE, np.float32)))
        for _ in range(b)
    ]
    batch = SubjectsBatch.from_subjects(subjects)
    for ib in batch.images.values():
        ib.data = jnp.asarray(ib.data)
    return batch


def _ms(fn, iters: int = ITERS) -> float:
    fn()  # warm
    fn()
    t0 = time.time()
    for _ in range(iters):
        fn()
    return (time.time() - t0) / iters * 1000


def main() -> None:
    import jax
    import jax.numpy as jnp

    results: dict[str, float] = {}

    batch = _batch(4)
    data0 = batch.images["t1"].data

    # 1. sync floor: one device reduction pulled to host
    sync_ms = _ms(lambda: float(jnp.sum(data0)))
    results["sync_only_ms"] = round(sync_ms, 1)

    # 2. the public pipeline
    def pipeline_for(b: SubjectsBatch):
        tio.seed(0)
        return tio.Compose(
            [
                tio.Flip(axes=(0,), flip_probability=0.5),
                tio.Noise(std=0.1),
                tio.RescaleIntensity(out_min=0.0, out_max=1.0),
            ],
            copy=False,
        )

    pipe = pipeline_for(batch)

    def run_pipe():
        out = pipe(batch)
        return float(jnp.sum(out.images["t1"].data))

    results["pipeline_B4_ms"] = round(_ms(run_pipe), 1)

    # 3. ONE jitted program doing the same three stages
    @jax.jit
    def fused(data, flip_mask, mean, std, key, out_min, out_max):
        flipped = jnp.flip(data, axis=2)
        data = jnp.where(flip_mask.reshape(-1, 1, 1, 1, 1), flipped, data)
        noise = mean + std * jax.random.normal(key, data.shape, jnp.float32)
        data = data + noise
        lo = jnp.min(data, axis=(1, 2, 3, 4), keepdims=True)
        hi = jnp.max(data, axis=(1, 2, 3, 4), keepdims=True)
        return (data - lo) / (hi - lo) * (out_max - out_min) + out_min

    rng = np.random.default_rng(0)

    def run_fused():
        key = jax.random.PRNGKey(rng.integers(2**31))
        mask = jnp.asarray(rng.random(4) < 0.5)
        out = fused(data0, mask, 0.0, 0.1, key, 0.0, 1.0)
        return float(jnp.sum(out))

    results["fused_B4_ms"] = round(_ms(run_fused), 1)

    # 4. amortization at B=16
    batch16 = _batch(16)
    pipe16 = pipeline_for(batch16)

    def run_pipe16():
        out = pipe16(batch16)
        return float(jnp.sum(out.images["t1"].data))

    ms16 = _ms(run_pipe16)
    results["pipeline_B16_ms"] = round(ms16, 1)
    results["pipeline_B16_vols_per_sec"] = round(16 / (ms16 / 1000), 1)
    results["pipeline_B4_vols_per_sec"] = round(
        4 / (results["pipeline_B4_ms"] / 1000), 1
    )
    results["fused_B4_vols_per_sec"] = round(4 / (results["fused_B4_ms"] / 1000), 1)

    print(json.dumps(results))


if __name__ == "__main__":
    main()

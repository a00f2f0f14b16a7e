"""The five BASELINE.json benchmark configs, one JSON line each.

Configs (from /root/repo/BASELINE.json, recorded in BASELINE.md):
  1. Flip + Noise + RescaleIntensity on 181^3 T1 (Colin27-shaped; the
     atlas itself needs a download, so a synthetic volume of the same
     shape/spacing stands in).
  2. Blur + BiasField + Gamma on batched 256^3.
  3. Affine + Resample-to-1mm on 4-channel subjects (trilinear scalars
     + nearest-neighbor labels), anisotropic 1x1x2 mm input.
  4. ElasticDeformation with inversion + label round-trip consistency.
  5. Queue + LabelSampler 64^3 patches + Motion/Ghosting, aggregator
     reassembly -> delegated to benchmarks/patches_bench.py.

Run: python benchmarks/suite.py [config ...]
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

# f16 gather rows: ~18% faster takes, max error ~5e-4 — inside
# BASELINE.json's 1e-3 accuracy gate (tests/test_ops_resample.py
# gather16 bound test). Same setting bench.py uses; exact f32 stays
# the library default.
os.environ.setdefault("TORCHIO_TPU_GATHER16", "1")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import torchio_tpu as tio
from torchio_tpu.data.batch import SubjectsBatch

B = 4
ITERS = 3

#: The REAL reference TorchIO on this machine's 1-core CPU (1 torch
#: thread), measured via tests/_reference_loader.py on the same config
#: definitions (see BASELINE.md "Round-2 re-baselining").
REFERENCE_CPU_VPS = {
    "1": 2.50,
    "2": 0.195,
    "3": 0.096,
    "4": 0.433,
}


def _device_batch(shapes: dict[str, tuple], spacing=(1.0, 1.0, 1.0)) -> SubjectsBatch:
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    affine = np.diag([*spacing, 1.0])
    subjects = []
    for _ in range(B):
        images = {}
        for name, shape in shapes.items():
            if name.startswith("seg"):
                # block-structured labels (anatomy-like regions): uniform
                # random labels put a boundary at every voxel, which makes
                # any sub-voxel round-trip error flip the NN label and
                # reads as false inconsistency
                idx = np.indices(shape[1:])
                data = ((idx // 24).sum(axis=0) % 4).astype(np.int32)[None]
                images[name] = tio.LabelMap(data, affine=affine)
            else:
                images[name] = tio.ScalarImage(
                    rng.random(shape, np.float32), affine=affine
                )
        subjects.append(tio.Subject(**images))
    batch = SubjectsBatch.from_subjects(subjects)
    for ib in batch.images.values():
        ib.data = jnp.asarray(ib.data)
    return batch


def _time(fn) -> float:
    """Volumes/sec over ITERS timed runs after one warmup."""
    import jax.numpy as jnp

    def run():
        out = fn()
        # float(sum) forces completion (axon: block_until_ready lies).
        return float(jnp.sum(next(iter(out.images.values())).data))

    run()
    t0 = time.time()
    for _ in range(ITERS):
        run()
    return B * ITERS / (time.time() - t0)


def _config1_transforms() -> list:
    return [
        tio.Flip(axes=(0,), flip_probability=0.5),
        tio.Noise(std=0.1),
        tio.RescaleIntensity(out_min=0.0, out_max=1.0),
    ]


def config1() -> dict:
    import jax.numpy as jnp

    tio.seed(0)
    # fuse=True: the three elementwise stages run as ONE XLA program
    # (identical results + history to unfused; tests/test_fuse.py)
    pipeline = tio.Compose(_config1_transforms(), copy=False, fuse=True)
    batch = _device_batch({"t1": (1, 181, 217, 181)})
    vps = _time(lambda: pipeline(batch))

    # unfused per-stage dispatch (the round-4 measurement) for the
    # decomposition record
    tio.seed(0)
    unfused = tio.Compose(_config1_transforms(), copy=False)
    vps_unfused = _time(lambda: unfused(batch))

    # pipelined steady state: a training loop consumes outputs on
    # device, so per-batch results are NOT pulled to host — dispatch
    # iteration i+1 while i executes; one sync closes the window.
    tio.seed(0)
    pipeline(batch)  # warm
    n = 3 * ITERS
    t0 = time.time()
    out = None
    for _ in range(n):
        out = pipeline(batch)
    float(jnp.sum(next(iter(out.images.values())).data))
    vps_pipelined = B * n / (time.time() - t0)
    return {
        "metric": "config1 Flip+Noise+Rescale 181x217x181 volumes/sec",
        "value": round(vps, 2),
        "unit": "volumes/sec",
        "vs_reference_cpu": round(vps / REFERENCE_CPU_VPS["1"], 1),
        "unfused_volumes_per_sec": round(vps_unfused, 2),
        "pipelined_volumes_per_sec": round(vps_pipelined, 2),
        "pipelined_vs_reference_cpu": round(
            vps_pipelined / REFERENCE_CPU_VPS["1"], 1
        ),
    }


def config2() -> dict:
    tio.seed(0)
    # NOTE fuse=True works here too (tests/test_fuse.py) but the fused
    # 3-stage 256^3 program's first XLA compile takes minutes on the
    # 1-core tunnel host — per-stage programs amortize better for a
    # short benchmark window, so the suite measures unfused
    pipeline = tio.Compose(
        [
            tio.Blur(std=(0.5, 1.5)),
            tio.BiasField(std=0.5),
            tio.Gamma(log_gamma=(-0.3, 0.3)),
        ],
        copy=False,
    )
    batch = _device_batch({"t1": (1, 256, 256, 256)})
    vps = _time(lambda: pipeline(batch))
    return {
        "metric": "config2 Blur+BiasField+Gamma 256^3 volumes/sec",
        "value": round(vps, 2),
        "unit": "volumes/sec",
        "vs_reference_cpu": round(vps / REFERENCE_CPU_VPS["2"], 1),
    }


def config3() -> dict:
    import copy

    tio.seed(0)
    pipeline = tio.Compose(
        [
            tio.Affine(scales=(0.9, 1.1), degrees=(-10.0, 10.0)),
            tio.Resample(target=1.0),
        ],
        copy=False,
    )
    batch = _device_batch(
        {"ch": (4, 192, 192, 96), "seg": (1, 192, 192, 96)},
        spacing=(1.0, 1.0, 2.0),
    )
    # Resample changes the spatial shape, so each iteration must start
    # from the ORIGINAL batch (a mutated copy=False batch would grow and
    # recompile every iteration); deepcopy shares the immutable device
    # buffers, so this is metadata-only.
    vps = _time(lambda: pipeline(copy.deepcopy(batch)))
    return {
        "metric": "config3 Affine+Resample-to-1mm 4ch+labels volumes/sec",
        "value": round(vps, 2),
        "unit": "volumes/sec",
        "vs_reference_cpu": round(vps / REFERENCE_CPU_VPS["3"], 1),
    }


def config4() -> dict:
    import jax.numpy as jnp

    tio.seed(0)
    elastic = tio.ElasticDeformation(max_displacement=7.5)
    batch = _device_batch({"t1": (1, 128, 128, 128), "seg": (1, 128, 128, 128)})
    orig_seg = np.asarray(batch.images["seg"].data)

    def roundtrip():
        out = elastic(batch)
        return out.apply_inverse_transform()

    restored = roundtrip()
    seg_back = np.asarray(restored.images["seg"].data)
    interior = (slice(None), slice(None), *(slice(12, -12),) * 3)
    consistency = float((seg_back[interior] == orig_seg[interior]).mean())

    def run():
        out = roundtrip()
        return float(jnp.sum(out.images["t1"].data))

    run()  # warmup: compile the reduction outside the timed loop
    t0 = time.time()
    for _ in range(ITERS):
        run()
    vps = B * ITERS / (time.time() - t0)
    return {
        "metric": "config4 Elastic fwd+inverse 128^3 volumes/sec",
        "value": round(vps, 2),
        "unit": "volumes/sec",
        "vs_reference_cpu": round(vps / REFERENCE_CPU_VPS["4"], 1),
        "label_consistency_interior": round(consistency, 4),
    }


def config5() -> dict:
    from benchmarks.patches_bench import (
        bench_aggregator,
        bench_aggregator_pull_decomposition,
        bench_queue,
        bench_queue_device,
        bench_queue_device_pipelined,
    )

    report = {
        "metric": "config5 Queue+LabelSampler 64^3 patches/sec"
        " (device ring-buffer path)",
        "value": round(bench_queue_device(), 2),
        "unit": "patches/sec",
        "pipelined_patches_per_sec": round(bench_queue_device_pipelined(), 2),
        "loader_path_patches_per_sec": round(bench_queue(), 2),
        "aggregator_patches_per_sec": round(bench_aggregator(device_output=True), 2),
        "aggregator_host_materialize_pps": round(bench_aggregator(), 2),
    }
    report.update(bench_aggregator_pull_decomposition())
    return report


CONFIGS = {"1": config1, "2": config2, "3": config3, "4": config4, "5": config5}


def main() -> None:
    names = sys.argv[1:] or sorted(CONFIGS)
    for name in names:
        print(json.dumps(CONFIGS[name]()), flush=True)


if __name__ == "__main__":
    main()

"""Measure the ACTUAL reference TorchIO on CPU for BASELINE config 5.

Config 5 (BASELINE.json): Queue + LabelSampler 64^3 patches with a
Motion/Ghosting augmentation Compose, plus GridSampler ->
PatchAggregator (hann) reassembly. Mirrors benchmarks/patches_bench.py
exactly (same subjects, sampler params, epochs, batch size) so the
patches/sec numbers are directly comparable — the one deliberate
difference is that the reference runs on host torch tensors (its
native mode) while patches_bench.py pins subjects in HBM.

Reference API sites: Queue (/root/reference/src/torchio/data/queue.py:65),
LabelSampler (sampler.py:303), PatchAggregator (aggregator.py:46),
SubjectsLoader (loader.py:56).

Run:  python benchmarks/baseline_reference_config5.py
"""

import json
import sys
import time
from pathlib import Path

import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def make_subjects(tio, n: int, size: int = 128):
    rng = np.random.default_rng(0)
    subjects = []
    for _ in range(n):
        seg = np.zeros((1, size, size, size), np.int32)
        seg[0, size // 4 : -size // 4, size // 4 : -size // 4, size // 4 : -size // 4] = 1
        subjects.append(
            tio.Subject(
                t1=tio.ScalarImage(
                    torch.from_numpy(rng.random((1, size, size, size)).astype(np.float32))
                ),
                seg=tio.LabelMap(torch.from_numpy(seg)),
            )
        )
    return subjects


def bench_queue(tio) -> float:
    torch.manual_seed(0)
    subjects = make_subjects(tio, 4)
    augment = tio.Compose(
        [
            tio.Motion(degrees=5, translation=3, num_transforms=1, p=0.5),
            tio.Ghosting(intensity=(0.3, 0.7), p=0.5),
        ]
    )
    queue = tio.Queue(
        subjects,
        patch_sampler=tio.LabelSampler(subjects[0], patch_size=64, label_name="seg"),
        max_length=64,
        patches_per_volume=8,
        num_workers=2,
        transform=augment,
    )
    # one warm epoch (parity with patches_bench.py's warm epochs; the
    # reference has no compiles to amortize but threads need spin-up)
    for batch in tio.SubjectsLoader(queue, batch_size=8):
        float(batch.images["t1"].data.sum())

    epochs = 3
    t0 = time.time()
    count = 0
    for _ in range(epochs):
        for batch in tio.SubjectsLoader(queue, batch_size=8):
            float(batch.images["t1"].data.sum())
            count += len(batch)
    return count / (time.time() - t0)


def bench_aggregator(tio) -> float:
    subject = make_subjects(tio, 1)[0]
    sampler = tio.GridSampler(subject, patch_size=64, patch_overlap=16)
    loader = tio.SubjectsLoader(sampler, batch_size=4)

    def run_pass() -> float:
        agg = tio.PatchAggregator(subject.spatial_shape, overlap_mode="hann")
        t0 = time.time()
        n = 0
        for batch in loader:
            agg.add_batch(
                batch.images["t1"].data, batch.metadata["patch_location"]
            )
            n += len(batch)
        agg.get_output()
        return n / (time.time() - t0)

    run_pass()  # warm
    return run_pass()


def main() -> None:
    torch.set_num_threads(1)
    from _reference_loader import load_reference

    tio = load_reference()
    if tio is None:
        print("reference not available at /root/reference")
        return
    queue_pps = bench_queue(tio)
    agg_pps = bench_aggregator(tio)
    print(
        json.dumps(
            {
                "reference_queue_patches_per_sec": round(queue_pps, 2),
                "reference_aggregator_patches_per_sec": round(agg_pps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

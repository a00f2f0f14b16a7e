"""Measure the ACTUAL reference TorchIO on CPU for the headline config.

Round 1 used a hand-written torch proxy of the reference hot path
(``baseline_cpu.py``: 0.086 volumes/sec) because the reference's wheel
deps are absent. Round 1 later built ``tests/_reference_loader.py``,
which imports the reference itself with its I/O deps stubbed — so the
baseline can now be the real library, not a proxy. Measured here:
Compose(Spatial + BiasField + Noise) on a 256^3 volume, torch pinned to
one thread (the driver host is a single core):

    reference TorchIO v2.0.0a2: 38.2 s/volume = 0.0262 volumes/sec
    (proxy: 11.6 s/volume — the proxy flattered the reference 3.3x by
    skipping the python transform engine, per-instance param machinery,
    history serialization, and torch dispatch overhead)

Run:  python benchmarks/baseline_reference_cpu.py
"""

import sys
import time
from pathlib import Path

import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

S = 256


def main() -> None:
    torch.set_num_threads(1)
    from _reference_loader import load_reference

    tio = load_reference()
    if tio is None:
        print("reference not available at /root/reference")
        return
    subject = tio.Subject(t1=tio.ScalarImage(torch.rand(1, S, S, S)))
    pipeline = tio.Compose(
        [
            tio.Spatial(
                scales=(0.9, 1.1),
                degrees=(-10.0, 10.0),
                translation=(-5.0, 5.0),
                max_displacement=7.5,
            ),
            tio.BiasField(std=0.5),
            tio.Noise(std=0.1),
        ]
    )
    pipeline(subject)  # warm
    n = 3
    t0 = time.time()
    for _ in range(n):
        pipeline(subject)
    per_volume = (time.time() - t0) / n
    print(
        f"reference TorchIO CPU (1 thread): {per_volume:.2f} s/volume"
        f" = {1 / per_volume:.4f} volumes/sec"
    )


if __name__ == "__main__":
    main()

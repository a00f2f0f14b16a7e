"""Device-vs-CPU numerical consistency check (run on real TPU hardware).

The test suite runs on virtual CPU devices; this script verifies on the
actual accelerator that every kernel family produces CPU-identical
results (the TPU's silent bf16 matmul/conv lowering is the classic way
this breaks — see docs/concepts/performance.md). Prints one PASS/FAIL
line per family.

Run: python benchmarks/validate_device.py
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    import jax

    import torchio_tpu as tio

    cpu = jax.devices("cpu")[0]
    default = jax.devices()[0]
    print(f"default device: {default.platform}; comparing against cpu")

    rng = np.random.default_rng(8)
    vol = rng.random((1, 64, 64, 64)).astype(np.float32)

    cases = [
        ("resample", lambda: tio.Affine(degrees=(7.0, 7.0), translation=(2.0, 2.0))),
        ("elastic", lambda: tio.ElasticDeformation(max_displacement=3.0)),
        ("blur", lambda: tio.Blur(std=(1.0, 1.0))),
        ("ghosting", lambda: tio.Ghosting(num_ghosts=(4, 4), axes=(1,), intensity=(0.7, 0.7))),
        ("motion", lambda: tio.Motion(degrees=(5.0, 5.0), translation=(3.0, 3.0), num_transforms=1)),
        ("bias+noise", lambda: tio.Compose([tio.BiasField(std=0.4), tio.Noise(std=0.05)])),
        ("rescale", lambda: tio.RescaleIntensity(out_min=0.0, out_max=1.0)),
        # late-round-2 kernels:
        ("separable", lambda: tio.Affine(
            scales=(1.2, 1.2, 0.8, 0.8, 1.0, 1.0), degrees=0.0,
            translation=(1.0, 1.0),
        )),
        ("plane", lambda: tio.Affine(
            degrees=(0.0, 0.0, 0.0, 0.0, 11.0, 11.0), translation=(1.0, 1.0),
        )),
        ("quantiles", lambda: tio.RescaleIntensity(
            out_min=0.0, out_max=1.0, percentile_low=0.5, percentile_high=99.5,
        )),
        # round-3 pallas kernels: on TPU this dispatches the
        # sheared-window Mosaic kernel (general affine + elastic); the
        # CPU reference run stays on the gather path, so the comparison
        # validates the kernel against the exact path on hardware.
        # (The "elastic" case above likewise validates the
        # bounded-offset windowed kernel.)
        ("sheared", lambda: tio.Spatial(
            scales=(0.95, 0.95, 1.05, 1.05, 1.0, 1.0),
            degrees=(8.0, 8.0, -6.0, -6.0, 4.0, 4.0),
            translation=(2.0, 2.0), max_displacement=3.0,
        )),
    ]
    tol = 1e-4  # well under the 1e-3 accuracy gate
    failures = 0
    for name, make in cases:
        tio.seed(5)
        got = np.asarray(make()(tio.ScalarImage(vol.copy())).data)
        with jax.default_device(cpu):
            tio.seed(5)
            want = np.asarray(make()(tio.ScalarImage(vol.copy())).data)
        err = float(np.abs(got - want).max())
        status = "PASS" if err < tol else "FAIL"
        failures += status == "FAIL"
        print(f"{status} {name:12s} max|device-cpu| = {err:.2e}")
    if failures:
        raise SystemExit(f"{failures} kernel families diverge on this device")
    print("all kernel families device-consistent")


if __name__ == "__main__":
    main()

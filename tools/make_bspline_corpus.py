"""Freeze the B-spline golden corpus (tests/data/bspline_golden.npz).

One seeded volume + one seeded point set; per-order (0-7) reference
values from the float64 dense-collocation oracle
(tests/_bspline_oracle.py — the official parity artifact for the
orders the reference serves via the uninstallable ``interpol`` wheel).
Rerun only to regenerate after an oracle change; the committed file is
the frozen contract (VERDICT r4 item 7: golden tests must replay frozen
values, not a live-recomputed oracle).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

from _bspline_oracle import oracle_sample  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / "tests" / "data"
S = 12
N_POINTS = 64


def main() -> None:
    rng = np.random.default_rng(20260819)
    volume = rng.normal(size=(S, S, S)).astype(np.float32)
    pts = rng.uniform(1.5, S - 2.5, size=(N_POINTS, 3)).astype(np.float32)
    # keep every coordinate away from half-integers so order-0 rounding
    # conventions (half-up oracle vs half-even kernel) cannot disagree
    frac = pts - np.floor(pts)
    pts = np.where(np.abs(frac - 0.5) < 0.05, pts + 0.1, pts).astype(
        np.float32
    )
    payload = {"volume": volume, "points": pts}
    for order in range(8):
        payload[f"order_{order}"] = oracle_sample(
            volume, pts.astype(np.float64), order
        )
    OUT.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT / "bspline_golden.npz", **payload)
    print(f"wrote {OUT / 'bspline_golden.npz'}")


if __name__ == "__main__":
    main()

"""Float64 dense-collocation B-spline oracle (orders 0-7).

The official parity artifact for interpolation orders 2-7 (VERDICT r4
item 7): the reference serves those orders via ``interpol.grid_pull``
(``/root/reference/src/torchio/transforms/spatial/spatial.py:1746-1761``),
whose wheel is not installable in this environment. This oracle is
independent of the production kernels: the mirror-boundary ("dct2")
prefilter is solved as an explicit dense linear system per axis in
float64, and the tensor-product spline is evaluated directly from the
Cox-de Boor recursion. ``tools/make_bspline_corpus.py`` freezes its
outputs into ``tests/data/bspline_golden.npz``; the per-order error
budgets live in BASELINE.md.
"""

from __future__ import annotations

import numpy as np


def bspline_weight(u, order: int) -> np.ndarray:
    """Cox-de Boor B-spline basis of the given order, float64."""
    u = np.asarray(u, np.float64)
    if order == 0:
        return ((u >= -0.5) & (u < 0.5)).astype(np.float64)
    lower = bspline_weight(u + 0.5, order - 1)
    upper = bspline_weight(u - 0.5, order - 1)
    return (
        (u + (order + 1) / 2) * lower + ((order + 1) / 2 - u) * upper
    ) / order


def reflect_index(m: int, n: int) -> int:
    """Mirror-without-repeat ("dct2"/reflect) index fold."""
    if n == 1:
        return 0
    period = 2 * n - 2
    m = abs(m) % period
    return period - m if m >= n else m


def solve_prefilter_axis(y: np.ndarray, order: int) -> np.ndarray:
    """Exact mirror-boundary prefilter along axis 0 via dense solve."""
    n = y.shape[0]
    r = (order + 1) // 2 + 1
    a = np.zeros((n, n), np.float64)
    for i in range(n):
        for m in range(i - r, i + r + 1):
            w = float(bspline_weight(i - m, order))
            if w != 0.0:
                a[i, reflect_index(m, n)] += w
    flat = y.reshape(n, -1).astype(np.float64)
    return np.linalg.solve(a, flat).reshape(y.shape)


def prefilter(volume: np.ndarray, order: int) -> np.ndarray:
    """Spline coefficients of a 3D volume (sequential axis solves)."""
    c = np.asarray(volume, np.float64)
    for axis in range(3):
        c = np.moveaxis(
            solve_prefilter_axis(np.moveaxis(c, axis, 0), order), 0, axis
        )
    return c


def evaluate(coeffs: np.ndarray, pts: np.ndarray, order: int) -> np.ndarray:
    """Tensor-product spline at (M, 3) points, float64 accumulation."""
    n0, n1, n2 = coeffs.shape
    r = (order + 1) // 2 + 1
    out = np.zeros(len(pts), np.float64)
    for p, (x, y, z) in enumerate(pts):
        acc = 0.0
        for mi in range(int(np.floor(x)) - r, int(np.floor(x)) + r + 1):
            wx = float(bspline_weight(x - mi, order))
            if wx == 0.0:
                continue
            for mj in range(int(np.floor(y)) - r, int(np.floor(y)) + r + 1):
                wy = float(bspline_weight(y - mj, order))
                if wy == 0.0:
                    continue
                for mk in range(int(np.floor(z)) - r, int(np.floor(z)) + r + 1):
                    wz = float(bspline_weight(z - mk, order))
                    if wz == 0.0:
                        continue
                    acc += (
                        wx * wy * wz
                        * coeffs[
                            reflect_index(mi, n0),
                            reflect_index(mj, n1),
                            reflect_index(mk, n2),
                        ]
                    )
        out[p] = acc
    return out


def oracle_sample(volume: np.ndarray, pts: np.ndarray, order: int) -> np.ndarray:
    """Prefilter + evaluate: interpolate ``volume`` at ``pts``.

    Orders 0-1 have no prefilter (the spline interpolates directly);
    evaluating the order-0/1 Cox-de Boor bases reproduces
    nearest-neighbor (round-half-up at the .5 boundary, matching the
    half-open order-0 support) and trilinear interpolation exactly.
    """
    coeffs = (
        np.asarray(volume, np.float64)
        if order <= 1
        else prefilter(volume, order)
    )
    return evaluate(coeffs, pts, order)

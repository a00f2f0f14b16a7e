"""Unified spatial transform: resample + affine + elastic in ONE grid pass.

Parity reference:
``/root/reference/src/torchio/transforms/spatial/spatial.py`` (2.7k LoC).
The key behaviors replicated:

- One sampling grid per call composes target-space resampling, a world
  affine (scales/degrees/translation about ``center``), and a dense
  elastic field upsampled from coarse control points (mm), with the
  ``affine_first`` ordering flag (``spatial.py:1504-1579``).
- Output voxel -> input voxel mapping is ``A_in^-1 @ T^-1 @ A_out``
  computed in float64 on host; only the final float32 matrix reaches the
  device (``spatial.py:1582-1601``, SURVEY.md §7.3 item 4).
- Out-of-bounds fill policies minimum/mean/otsu from border statistics
  (``spatial.py:2034-2168``), separate ``default_pad_label``.
- ``label_interpolation="label"``: partial-volume one-hot resampling with
  argmax and the >50 % out-of-bounds rule (``spatial.py:1275-1389``).
- Antialias sigmas from Cardoso et al. MICCAI 2015 (``spatial.py:1951``).
- Per-instance geometry with bit-exact passthrough of gated-out elements.
- Exact inverse: inverted affine, negated elastic field, flipped
  ``affine_first``, resample back to the recorded original space.

TPU-native notes: the geometry math (4x4 matrices, target-space
resolution, control-point sampling) is host numpy float64; the hot path
is :func:`torchio_tpu.ops.resample.resample` — a jit-compiled fused
gather kernel. Interpolation orders 0-1 and the "label" mode use the
block-gather/Pallas kernels; B-spline orders 2-7 route to
:func:`torchio_tpu.ops.bspline.bspline_resample` (IIR prefilter +
mirror-fold gather, see spatial.py's _sample routing below).
"""

from __future__ import annotations

import warnings
from numbers import Number
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ... import random as tio_random
from ...core.affine import AffineMatrix
from ...data.batch import ImagesBatch, SubjectsBatch
from ...data.image import Image, LabelMap, ScalarImage
from ...ops.gaussian import gaussian_blur
from ...ops.resample import _diagonal_map, build_coords, resample, upsample_field
from .._utils import as_jnp, unique_labels
from ..parameter_range import Choice, _ParameterRange, _is_distribution
from ..transform import SpatialTransform

_INTERPOLATION_TO_ORDER = {
    "nearest": 0,
    "linear": 1,
    "quadratic": 2,
    "cubic": 3,
    "fourth": 4,
    "fifth": 5,
    "sixth": 6,
    "seventh": 7,
}
_ORDER_TO_INTERPOLATION = {v: k for k, v in _INTERPOLATION_TO_ORDER.items()}
LABEL_INTERPOLATION = "label"
_SPLINE_ORDER = 3  # coarse-grid folding heuristic, matches reference


def _parse_interpolation(value) -> str:
    if isinstance(value, (int, np.integer)):
        if int(value) not in _ORDER_TO_INTERPOLATION:
            raise ValueError(f"Interpolation order must be 0-7, got {value}")
        return _ORDER_TO_INTERPOLATION[int(value)]
    name = str(value).lower()
    if name == LABEL_INTERPOLATION:
        return LABEL_INTERPOLATION
    if name in ("bspline",):
        return "cubic"
    if name == "trilinear":
        return "linear"
    if name not in _INTERPOLATION_TO_ORDER:
        raise ValueError(
            f"Unknown interpolation {value!r}; use one of"
            f" {list(_INTERPOLATION_TO_ORDER)} or 'label'"
        )
    return name


def _require_supported_order(interpolation: str) -> str:
    # orders 0-1 use the gather/Pallas kernels; 2-7 route to ops.bspline
    _INTERPOLATION_TO_ORDER[interpolation]  # KeyError guard
    return interpolation


# --------------------------------------------------------------------------
# Host geometry helpers (float64 numpy)
# --------------------------------------------------------------------------


def _euler_rotation(degrees: np.ndarray) -> np.ndarray:
    """XYZ-intrinsic (ZYX-extrinsic) Euler angles (deg) -> 3x3 rotation."""
    rx, ry, rz = np.radians(np.asarray(degrees, np.float64))
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    r_x = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    r_y = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    r_z = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return r_z @ r_y @ r_x


def _image_center_world(shape, affine: AffineMatrix) -> np.ndarray:
    center_index = (np.asarray(shape, np.float64) - 1) / 2
    m = affine.data
    return m[:3, 3] + m[:3, :3] @ center_index


def _forward_affine(
    *,
    scales,
    degrees,
    translation,
    center: str,
    shape,
    affine: AffineMatrix,
) -> np.ndarray:
    """4x4 world-space affine: T = R @ S pivoting about the image center."""
    scaling = np.asarray(scales, np.float64).copy()
    rotation = np.asarray(degrees, np.float64).copy()
    shift = np.asarray(translation, np.float64).copy()
    if shape[-1] == 1:  # 2D slice: suppress out-of-plane components
        scaling[2] = 1.0
        rotation[0] = rotation[1] = 0.0
        shift[2] = 0.0
    rs = _euler_rotation(rotation) @ np.diag(scaling)
    t = np.eye(4, dtype=np.float64)
    t[:3, :3] = rs
    if center == "image":
        c = _image_center_world(shape, affine)
        t[:3, 3] = c - rs @ c
    t[:3, 3] += shift
    return t


def _compute_new_shape_affine(shape, affine: AffineMatrix, spacing):
    """Output (shape, affine) for a target spacing, physical center fixed."""
    old_spacing = np.asarray(affine.spacing, np.float64)
    new_spacing = np.asarray(spacing, np.float64)
    old_shape = np.asarray(shape, np.float64)
    new_shape = np.floor(old_shape * old_spacing / new_spacing)
    new_shape[old_shape == 1] = 1
    rotation = affine.direction
    old_origin = np.asarray(affine.origin, np.float64)
    old_center = old_origin + rotation @ (((old_shape - 1) / 2) * old_spacing)
    new_origin = old_center - rotation @ (((new_shape - 1) / 2) * new_spacing)
    new_affine = np.eye(4, dtype=np.float64)
    new_affine[:3, :3] = rotation * new_spacing
    new_affine[:3, 3] = new_origin
    return (
        (int(new_shape[0]), int(new_shape[1]), int(new_shape[2])),
        AffineMatrix(new_affine),
    )


def _parse_spacing(value) -> tuple[float, float, float]:
    if isinstance(value, (int, float)):
        out = (float(value),) * 3
    else:
        vals = tuple(float(v) for v in value)
        if len(vals) == 1:
            out = vals * 3
        elif len(vals) == 3:
            out = vals
        else:
            raise ValueError(f"Spacing must have 1 or 3 values, got {len(vals)}")
    if any(s <= 0 for s in out):
        raise ValueError(f"Spacing must be positive, got {out}")
    return out  # type: ignore[return-value]


def _is_target_space_tuple(target) -> bool:
    if not isinstance(target, (tuple, list)) or len(target) != 2:
        return False
    shape, affine = target
    return isinstance(shape, (tuple, list, np.ndarray)) and (
        isinstance(affine, AffineMatrix)
        or (isinstance(affine, (np.ndarray, list)) and np.asarray(affine).shape == (4, 4))
    )


def _resolve_target_space(target, batch, first_shape, first_affine):
    """User-facing target spec -> (shape, AffineMatrix) or None."""
    if target is None:
        return None
    if isinstance(target, Image):
        return target.spatial_shape, target.affine.clone()
    if isinstance(target, (str, Path)):
        path = Path(target)
        if path.is_file():
            image = ScalarImage(path)
            return image.spatial_shape, image.affine.clone()
        if isinstance(target, str) and batch is not None and target in batch.images:
            ref = batch.images[target]
            return tuple(ref.data.shape[-3:]), ref.affines[0].clone()
        raise ValueError(
            f'Unknown target "{target}": pass a file path, an image name'
            " in the subject, an Image, or a spacing spec"
        )
    if _is_target_space_tuple(target):
        shape, affine = target
        shape = tuple(int(s) for s in shape)
        return shape, AffineMatrix(affine)
    if isinstance(target, np.ndarray):
        return _compute_new_shape_affine(
            first_shape, first_affine, _parse_spacing(tuple(target.flat))
        )
    if isinstance(target, (int, float)):
        return _compute_new_shape_affine(first_shape, first_affine, float(target))
    if isinstance(target, (tuple, list, Choice)) or _is_distribution(target):
        spec = tuple(target) if isinstance(target, list) else target
        if isinstance(spec, tuple) and len(spec) == 3 and all(
            isinstance(v, (int, float)) for v in spec
        ):
            spacing = _parse_spacing(spec)
        else:
            spacing = _parse_spacing(_ParameterRange(spec).sample())
        return _compute_new_shape_affine(first_shape, first_affine, spacing)
    raise ValueError(f'Target not understood: "{target}"')


def _sample_control_points(grid_shape, max_displacement, locked_borders: int):
    """Random uniform [-max, max] field (n_i, n_j, n_k, 3) with zeroed borders."""
    rng = tio_random.get_rng()
    field = rng.uniform(-1.0, 1.0, size=tuple(grid_shape) + (3,)).astype(np.float32)
    for axis in range(3):
        field[..., axis] *= max_displacement[axis]
    for border in range(locked_borders):
        field[border, :] = 0
        field[-1 - border, :] = 0
        field[:, border] = 0
        field[:, -1 - border] = 0
        field[:, :, border] = 0
        field[:, :, -1 - border] = 0
    return field


def _check_folding(control_points, max_displacement, shape, spacing) -> None:
    num_cp = np.array(control_points.shape[:-1], np.float64)
    bounds = np.array(shape, np.float64) * np.asarray(spacing, np.float64)
    grid_spacing = bounds / (num_cp - _SPLINE_ORDER)
    conflicts = np.asarray(max_displacement, np.float64) > grid_spacing / 2
    if conflicts.any():
        (where,) = np.where(conflicts)
        warnings.warn(
            "The maximum displacement is larger than half the coarse-grid"
            f" spacing for dimensions {where.tolist()}, so folding may occur",
            RuntimeWarning,
            stacklevel=3,
        )


def _field_displacement_extent(control_points) -> tuple[float, float, float]:
    cp = np.asarray(control_points)
    m = np.abs(cp).reshape(-1, 3).max(axis=0)
    return (float(m[0]), float(m[1]), float(m[2]))


def _antialias_sigmas(factors, spacing) -> np.ndarray:
    """Per-axis voxel sigmas (Cardoso et al. MICCAI 2015)."""
    sigmas = np.zeros(3, np.float64)
    for axis in range(3):
        k = factors[axis]
        if k <= 1.0:
            continue
        variance = (k**2 - 1) * (2 * np.sqrt(2 * np.log(2))) ** (-2)
        sigmas[axis] = np.sqrt(variance)  # sigma_mm / spacing == sqrt(var)
    return sigmas


def _otsu_threshold(values: np.ndarray) -> float:
    """Between-class-variance-maximizing threshold over sorted values."""
    v = np.sort(values.astype(np.float64))
    n = v.size
    if n < 2:
        return float(v[0]) if n else 0.0
    csum = np.cumsum(v)
    total = csum[-1]
    counts = np.arange(1, n)
    mean_low = csum[:-1] / counts
    mean_high = (total - csum[:-1]) / (n - counts)
    weight_low = counts / n
    between = weight_low * (1 - weight_low) * (mean_low - mean_high) ** 2
    best = int(np.argmax(between))
    return float((v[best] + v[best + 1]) / 2)


def _border_mean(channel: np.ndarray, *, filter_otsu: bool) -> float:
    borders = np.concatenate(
        [
            channel[0].ravel(),
            channel[-1].ravel(),
            channel[:, 0].ravel(),
            channel[:, -1].ravel(),
            channel[:, :, 0].ravel(),
            channel[:, :, -1].ravel(),
        ]
    ).astype(np.float64)
    if not filter_otsu:
        return float(borders.mean())
    threshold = _otsu_threshold(borders)
    vals = borders[borders < threshold]
    return float(vals.mean()) if vals.size else float(borders.mean())


def _batch_fill_value(img_batch: ImagesBatch, *, default_pad_value, default_pad_label):
    """Fill values for out-of-bounds voxels.

    Statistical fills are computed **per element** per channel — a strict
    improvement over the reference, which reuses the first element's
    statistic batch-wide (``spatial.py:2055``); per-element fills make the
    vectorization-equivalence gate exact for Spatial too.
    """
    if issubclass(img_batch.image_class, LabelMap):
        return float(default_pad_label)
    if isinstance(default_pad_value, Number):
        return float(default_pad_value)
    if not isinstance(default_pad_value, str):
        raise TypeError(
            f"default_pad_value must be a string or number, got {type(default_pad_value)}"
        )
    if default_pad_value == "minimum":
        # stays on device: a (B, C) reduction, no host transfer
        return jnp.min(as_jnp(img_batch.data), axis=(-3, -2, -1))
    if default_pad_value not in ("mean", "otsu"):
        raise ValueError(f'Unknown default_pad_value "{default_pad_value}"')
    # border statistics: pull only the six faces to host (tiny vs volume)
    data = as_jnp(img_batch.data)
    faces = [
        data[:, :, 0, :, :], data[:, :, -1, :, :],
        data[:, :, :, 0, :], data[:, :, :, -1, :],
        data[:, :, :, :, 0], data[:, :, :, :, -1],
    ]
    borders = np.concatenate(
        [np.asarray(f).reshape(f.shape[0], f.shape[1], -1) for f in faces], axis=2
    )
    values = np.zeros(borders.shape[:2], np.float32)
    for b in range(borders.shape[0]):
        for c in range(borders.shape[1]):
            flat = borders[b, c].astype(np.float64)
            if default_pad_value == "mean":
                values[b, c] = flat.mean()
            else:
                threshold = _otsu_threshold(flat)
                vals = flat[flat < threshold]
                values[b, c] = vals.mean() if vals.size else flat.mean()
    return values


# --------------------------------------------------------------------------
# Grid construction (host matrix math -> device coordinate field)
# --------------------------------------------------------------------------


def _mapping_matrix(input_affine, output_affine, affine_matrix) -> np.ndarray:
    """Output voxel -> input voxel 4x4 (``A_in^-1 @ T^-1 @ A_out``, f64)."""
    t_inv = (
        np.eye(4)
        if affine_matrix is None
        else np.linalg.inv(np.asarray(affine_matrix, np.float64))
    )
    return np.linalg.inv(input_affine.data) @ t_inv @ output_affine.data


class _GridPlan:
    """Host-side metadata the Pallas tile planner needs for one grid."""

    __slots__ = ("matrix", "extra_out", "extra_in")

    def __init__(self, matrix, extra_out=None, extra_in=None):
        self.matrix = np.asarray(matrix, np.float64)
        self.extra_out = extra_out
        self.extra_in = extra_in


class _LazyGrid:
    """Deferred sampling grid: 4x4 map + pre-folded control points.

    The hot path never materializes the dense (Io, Jo, Ko, 3) coordinate
    tensor — :func:`torchio_tpu.ops.resample.resample_fused` builds it
    inside the resample program (ramps + elastic upsample fuse with the
    gather). ``materialize()`` produces the dense grid for consumers
    that need one (B-spline orders, the Pallas tiled kernel).

    ``control_points`` is in INPUT-VOXEL units with spacing (and, for
    affine-last ordering, the rotation) already folded in — legal
    because the trilinear upsample commutes with any linear map of the
    displacement components.
    """

    __slots__ = ("matrix", "control_points", "out_shape")

    def __init__(self, matrix, control_points, out_shape):
        self.matrix = np.asarray(matrix, np.float64)
        self.control_points = (
            None if control_points is None
            else np.asarray(control_points, np.float64)
        )
        self.out_shape = tuple(int(s) for s in out_shape)

    def materialize(self):
        coords = build_coords(self.out_shape, self.matrix)
        if self.control_points is not None:
            coords = coords + upsample_field(
                self.control_points.astype(np.float32), self.out_shape
            )
        return coords


def _is_lazy_grid(grid) -> bool:
    return isinstance(grid, _LazyGrid) or (
        isinstance(grid, list) and bool(grid) and isinstance(grid[0], _LazyGrid)
    )


def _materialize_grid(grid):
    if isinstance(grid, _LazyGrid):
        return grid.materialize()
    if _is_lazy_grid(grid):
        return jnp.stack([g.materialize() for g in grid])
    return grid


def _build_grid(
    *,
    input_shape,
    input_affine: AffineMatrix,
    output_shape,
    output_affine: AffineMatrix,
    affine_matrix,
    control_points,
    max_displacement,
    affine_first: bool,
):
    """(:class:`_LazyGrid` sampling-grid spec, host tile plan).

    The grid is DEFERRED: both elastic orderings reduce to
    ``ramps @ mapping + upsample(folded_control_points)`` because the
    trilinear upsample is linear in the control points —
    ``upsample(cp) / spacing == upsample(cp / spacing)`` and
    ``upsample(cp) @ R^T == upsample(cp @ R^T)`` — so spacing and the
    affine-last rotation fold into the tiny coarse field on host (f64)
    and the dense field never exists outside the fused resample program.
    """
    mapping = _mapping_matrix(input_affine, output_affine, affine_matrix)
    out_shape = tuple(output_shape)
    if control_points is None:
        return _LazyGrid(mapping, None, out_shape), _GridPlan(mapping)
    if max_displacement is None:
        max_displacement = _field_displacement_extent(control_points)
    _check_folding(
        np.asarray(control_points),
        max_displacement,
        output_shape,
        np.asarray(output_affine.spacing),
    )
    cp = np.asarray(control_points, np.float64)
    disp_bound = np.asarray(max_displacement, np.float64)
    if affine_first:
        folded = cp / np.asarray(input_affine.spacing, np.float64)
        extra_in = disp_bound / np.asarray(input_affine.spacing, np.float64)
        return (
            _LazyGrid(mapping, folded, out_shape),
            _GridPlan(mapping, extra_in=extra_in),
        )
    folded = (cp / np.asarray(output_affine.spacing, np.float64)) @ mapping[
        :3, :3
    ].T
    extra_out = disp_bound / np.asarray(output_affine.spacing, np.float64)
    return (
        _LazyGrid(mapping, folded, out_shape),
        _GridPlan(mapping, extra_out=extra_out),
    )


def _spatial_shard_axis(sharding):
    """The mesh axis name partitioning J, or None (incl. non-Named shardings)."""
    spec = getattr(sharding, "spec", None)
    if spec is None:
        return None
    padded = tuple(spec) + (None,) * (5 - len(spec))
    return padded[3]


def _dispatch_resample(data, grid, plans, *, mode: str, fill, sharding=None):
    """Route to the right kernel: B-spline orders 2-7, the halo-exchange
    shard_map kernel for spatially-sharded batches, the Pallas tiled
    kernel on TPU backends, or the XLA gather fallback.

    ``plans`` is one :class:`_GridPlan` (shared grid) or a list of them
    (per-sample grids, aligned with the batch). ``sharding`` is the
    batch's enforced mesh placement (``ImagesBatch.sharding``); when it
    partitions the J axis and the map is not axis-aligned, the resample
    runs as a halo-exchange ``shard_map`` program so the full volume is
    never all-gathered onto one chip (SURVEY.md §5.7).
    """
    order = _INTERPOLATION_TO_ORDER.get(mode, 1)
    if order >= 2:
        from ...ops.bspline import bspline_resample

        if 2 <= order <= 7 and _is_lazy_grid(grid) and sharding is None:
            # B-spline orders 2-7 with bounded offsets ride the
            # windowed Pallas kernel (prefilter + (order+1)-tap
            # evaluation in one program) instead of the gather-bound
            # bspline path
            from ...ops.resample import _kernel_fallback_warn
            from ...ops.window_resample import (
                cubic_resample_fused,
                cubic_window_eligible,
            )

            grids = grid if isinstance(grid, list) else [grid] * data.shape[0]
            out_shape = grids[0].out_shape
            if all(g.out_shape == out_shape for g in grids):
                data = as_jnp(data)
                pads = cubic_window_eligible(
                    data.shape,
                    out_shape,
                    [g.matrix for g in grids],
                    [g.control_points for g in grids],
                    data=data,
                    order=order,
                )
                if pads is not None:
                    try:
                        return cubic_resample_fused(
                            data,
                            [g.matrix for g in grids],
                            [g.control_points for g in grids],
                            fill,
                            padi=pads[0],
                            padj=pads[1],
                            order=order,
                        )
                    except Exception as error:
                        _kernel_fallback_warn("cubic_resample_fused", error)

        return bspline_resample(
            as_jnp(data), _materialize_grid(grid), order=order, fill=fill
        )

    if (
        sharding is not None
        and _is_lazy_grid(grid)
        and mode in ("linear", "nearest")
        and _spatial_shard_axis(sharding) is not None
    ):
        grids = grid if isinstance(grid, list) else [grid] * data.shape[0]
        same_space = grids[0].out_shape == tuple(data.shape[-3:])
        # axis-aligned maps already shard cleanly through the separable
        # matmul kernels (small weight matrices, no volume all-gather);
        # everything else routes to the halo program
        axis_aligned = all(
            g.control_points is None and _diagonal_map(g.matrix) is not None
            for g in grids
        )
        if same_space and not axis_aligned:
            from ...parallel.halo import HaloUnsupported, halo_resample_spec

            try:
                return halo_resample_spec(
                    as_jnp(data),
                    [g.matrix for g in grids],
                    [g.control_points for g in grids],
                    sharding=sharding,
                    mode=mode,
                    fill=fill,
                )
            except HaloUnsupported as reason:
                warnings.warn(
                    f"Spatially-sharded resample fell back to the"
                    f" all-gather path: {reason}",
                    RuntimeWarning,
                    stacklevel=2,
                )

    from ...config import pallas_resample_enabled

    if _is_lazy_grid(grid) and mode in ("linear", "nearest") and not (
        pallas_resample_enabled()
    ):
        # Hot path: the grid spec goes straight into the fused resample
        # program (ramp build + elastic upsample + gather in ONE jit; no
        # dense coordinate tensor in HBM).
        from ...ops.resample import resample_fused

        grids = grid if isinstance(grid, list) else [grid] * data.shape[0]
        return resample_fused(
            data,
            [g.matrix for g in grids],
            [g.control_points for g in grids],
            out_shape=grids[0].out_shape,
            mode=mode,
            fill=fill,
        )

    grid = _materialize_grid(grid)
    if (
        plans is not None
        and mode in ("linear", "nearest")
        and pallas_resample_enabled()
    ):
        from ...ops.pallas_resample import pallas_resample

        b = data.shape[0]
        fill_arr = np.asarray(fill, np.float32)
        per_sample_grid = grid.ndim == 5
        try:
            outs = []
            for bi in range(b):
                plan = plans[bi] if isinstance(plans, list) else plans
                grid_b = grid[bi] if per_sample_grid else grid
                if fill_arr.ndim == 2:
                    fill_row = fill_arr[bi]
                else:
                    fill_row = fill_arr
                outs.append(
                    pallas_resample(
                        as_jnp(data[bi]),
                        grid_b,
                        plan.matrix,
                        extra_out=plan.extra_out,
                        extra_in=plan.extra_in,
                        mode=mode,
                        fill=fill_row,
                    )
                )
            return jnp.stack(outs)
        except Exception as error:  # pragma: no cover - backend-specific
            warnings.warn(
                f"Pallas resample failed ({type(error).__name__}: {error});"
                " falling back to the XLA gather kernel",
                RuntimeWarning,
                stacklevel=2,
            )
    return resample(data, grid, mode=mode, fill=fill)


# --------------------------------------------------------------------------
# Parameter (de)serialization
# --------------------------------------------------------------------------


def _serialize_space(space):
    if space is None:
        return None
    shape, affine = space
    return {"shape": [int(s) for s in shape], "affine": AffineMatrix(affine).tolist()}


def _deserialize_space(data):
    if data is None:
        return None
    return tuple(data["shape"]), AffineMatrix(data["affine"])


def _serialize_matrix(matrix):
    return None if matrix is None else np.asarray(matrix, np.float64).tolist()


def _deserialize_matrix(data):
    return None if data is None else np.asarray(data, np.float64)


def _serialize_control_points(cp):
    return None if cp is None else np.asarray(cp, np.float32).tolist()


def _deserialize_control_points(data):
    return None if data is None else np.asarray(data, np.float32)


# --------------------------------------------------------------------------
# The transform
# --------------------------------------------------------------------------


class Spatial(SpatialTransform):
    r"""Resample to a target space, apply a world affine, and apply an
    elastic field — all through a single sampling grid.

    See the reference docstring for the full parameter conventions
    (``spatial.py:158-305``); wrappers :class:`Resample`, :class:`Affine`
    and :class:`ElasticDeformation` expose common subsets.
    """

    def __init__(
        self,
        *,
        target=None,
        scales=1.0,
        degrees=0.0,
        translation=0.0,
        isotropic: bool = False,
        center: str = "image",
        control_points=None,
        num_control_points=7,
        max_displacement=0.0,
        locked_borders: int = 2,
        affine_first: bool = True,
        image_interpolation="linear",
        label_interpolation="nearest",
        one_hot_label_interpolation="linear",
        antialias: bool = False,
        default_pad_value="minimum",
        default_pad_label: float = 0,
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        self.target = target
        if isotropic and isinstance(scales, (tuple, list)) and len(scales) not in (1, 2):
            raise ValueError(
                "isotropic=True requires a scalar or (lo, hi) range for scales"
            )
        self.scales = _ParameterRange(scales)
        for lo, hi in self.scales._ranges:
            if lo < 0 or hi < 0:
                raise ValueError(f"scales must be non-negative, got {scales}")
        self.degrees = _ParameterRange(degrees)
        self.translation = _ParameterRange(translation)
        self.isotropic = isotropic
        if center not in ("image", "origin"):
            raise ValueError(f'center must be "image" or "origin", got {center!r}')
        self.center = center
        self.control_points = (
            np.asarray(control_points, np.float32) if control_points is not None else None
        )
        if self.control_points is not None and (
            self.control_points.ndim != 4 or self.control_points.shape[-1] != 3
        ):
            raise ValueError(
                "control_points must have shape (n_i, n_j, n_k, 3),"
                f" got {self.control_points.shape}"
            )
        ncp = (
            (int(num_control_points),) * 3
            if isinstance(num_control_points, (int, np.integer))
            else tuple(int(n) for n in num_control_points)
        )
        if any(n < 4 for n in ncp):
            raise ValueError(f"num_control_points must be >= 4, got {ncp}")
        self.num_control_points = ncp
        self.max_displacement = _ParameterRange(max_displacement)
        for lo, hi in self.max_displacement._ranges:
            if lo < 0 or hi < 0:
                raise ValueError(
                    f"max_displacement must be non-negative, got {max_displacement}"
                )
        if locked_borders not in (0, 1, 2):
            raise ValueError(f"locked_borders must be 0, 1, or 2, got {locked_borders}")
        if locked_borders == 2 and 4 in ncp:
            raise ValueError(
                "locked_borders=2 with 4 control points along any axis yields"
                " an identity elastic field"
            )
        self.locked_borders = locked_borders
        self.affine_first = affine_first
        parsed = _parse_interpolation(image_interpolation)
        if parsed == LABEL_INTERPOLATION:
            raise ValueError(
                'image_interpolation cannot be "label"; that mode is only'
                " valid for label_interpolation"
            )
        self.image_interpolation = parsed
        self.label_interpolation = _parse_interpolation(label_interpolation)
        one_hot = _parse_interpolation(one_hot_label_interpolation)
        if one_hot == LABEL_INTERPOLATION:
            raise ValueError('one_hot_label_interpolation cannot be "label"')
        self.one_hot_label_interpolation = one_hot
        self.antialias = antialias
        if isinstance(default_pad_value, str) and default_pad_value not in (
            "minimum",
            "mean",
            "otsu",
        ):
            raise ValueError(f'Unknown default_pad_value "{default_pad_value}"')
        self.default_pad_value = default_pad_value
        if not isinstance(default_pad_label, Number):
            raise TypeError(
                f"default_pad_label must be numeric, got {type(default_pad_label)}"
            )
        self.default_pad_label = float(default_pad_label)

    # --- capabilities ---

    @property
    def supports_per_instance_params(self) -> bool:
        return True

    @property
    def supports_per_instance_p(self) -> bool:
        # Shape-changing targets cannot gate per element.
        return self.target is None

    # --- sampling ---

    def _sample_scales(self):
        if self.isotropic:
            s = self.scales.sample_1d()
            return (s, s, s)
        return self.scales.sample()

    def _sample_one(self, shape, affine: AffineMatrix):
        scales = self._sample_scales()
        degrees = self.degrees.sample()
        translation = self.translation.sample()
        has_affine = (
            tuple(scales) != (1.0, 1.0, 1.0)
            or tuple(degrees) != (0.0, 0.0, 0.0)
            or tuple(translation) != (0.0, 0.0, 0.0)
        )
        if self.control_points is not None:
            cp = self.control_points.copy()
            disp = _field_displacement_extent(cp)
        else:
            sampled = self.max_displacement.sample()
            if all(v == 0.0 for v in sampled):
                cp, disp = None, None
            else:
                cp = _sample_control_points(
                    self.num_control_points, sampled, self.locked_borders
                )
                disp = sampled
        forward = None
        if has_affine:
            forward = _forward_affine(
                scales=scales,
                degrees=degrees,
                translation=translation,
                center=self.center,
                shape=shape,
                affine=affine,
            )
        return forward, cp, disp, (has_affine or cp is not None)

    def make_params(self, batch: SubjectsBatch) -> dict[str, Any]:
        images = self._get_images(batch)
        if not images:
            return {"selected_images": []}
        first = next(iter(images.values()))
        first_shape = tuple(first.data.shape[-3:])
        first_affine = first.affines[0]
        params: dict[str, Any] = {
            "selected_images": list(images),
            "original": _serialize_space((first_shape, first_affine)),
            "affine_first": self.affine_first,
            "image_interpolation": self.image_interpolation,
            "label_interpolation": self.label_interpolation,
            "one_hot_label_interpolation": self.one_hot_label_interpolation,
            "antialias": self.antialias,
            "default_pad_value": self.default_pad_value,
            "default_pad_label": self.default_pad_label,
        }
        n = self._resolve_n(batch)
        if n is None:
            forward, cp, disp, has_geometry = self._sample_one(first_shape, first_affine)
            if has_geometry:
                _check_shared_space(images, first_shape, first_affine)
            target_space = _resolve_target_space(
                self.target, batch, first_shape, first_affine
            )
            params["target"] = _serialize_space(target_space)
            params["affine_matrix"] = _serialize_matrix(forward)
            params["control_points"] = _serialize_control_points(cp)
            params["max_displacement"] = list(disp) if disp else None
            return params
        keep = self._keep_mask(batch, n)
        affines, cps, disps = [], [], []
        any_geometry = False
        for index in range(n):
            if keep is not None and not keep[index]:
                affines.append(None)
                cps.append(None)
                disps.append(None)
                continue
            forward, cp, disp, has_geometry = self._sample_one(first_shape, first_affine)
            any_geometry = any_geometry or has_geometry
            affines.append(_serialize_matrix(forward))
            cps.append(_serialize_control_points(cp))
            disps.append(list(disp) if disp else None)
        if any_geometry:
            _check_shared_space(images, first_shape, first_affine)
        target_space = _resolve_target_space(
            self.target, batch, first_shape, first_affine
        )
        params["target"] = _serialize_space(target_space)
        params["affine_matrix"] = affines
        params["control_points"] = cps
        params["max_displacement"] = disps
        self._tag_batched(
            params, batch, n, keep,
            ["affine_matrix", "control_points", "max_displacement"],
        )
        return params

    # --- application ---

    def apply_transform(
        self, batch: SubjectsBatch, params: dict[str, Any]
    ) -> SubjectsBatch:
        selected = params.get("selected_images", [])
        if not selected:
            return batch
        target_space = _deserialize_space(params["target"])
        per_sample = None
        if "affine_matrix" in (params.get("_batched_keys") or []):
            per_sample = _PerSampleGeometry(
                affines=[_deserialize_matrix(m) for m in params["affine_matrix"]],
                control_points=[
                    _deserialize_control_points(c) for c in params["control_points"]
                ],
                max_displacements=[
                    tuple(d) if d else None for d in params["max_displacement"]
                ],
            )
            affine_matrix = control_points = max_displacement = None
        else:
            affine_matrix = _deserialize_matrix(params["affine_matrix"])
            control_points = _deserialize_control_points(params["control_points"])
            md = params["max_displacement"]
            max_displacement = tuple(md) if md else None
        if (
            target_space is None
            and affine_matrix is None
            and control_points is None
            and per_sample is None
        ):
            return batch
        _run_spatial_pipeline(
            batch=batch,
            image_names=selected,
            target_space=target_space,
            affine_matrix=affine_matrix,
            control_points=control_points,
            max_displacement=max_displacement,
            affine_first=params["affine_first"],
            image_interpolation=params["image_interpolation"],
            label_interpolation=params["label_interpolation"],
            one_hot_label_interpolation=params.get(
                "one_hot_label_interpolation", "linear"
            ),
            antialias=params.get("antialias", False),
            default_pad_value=params["default_pad_value"],
            default_pad_label=float(params["default_pad_label"]),
            per_sample=per_sample,
        )
        return batch

    @property
    def invertible(self) -> bool:
        return True

    def inverse(self, params: dict[str, Any]) -> "_SpatialInverse":
        original_space = _deserialize_space(params["original"])
        if original_space is None:
            raise RuntimeError("Spatial inverse needs the original output space")
        common: dict[str, Any] = {
            "target": original_space,
            "affine_first": not params["affine_first"],
            "image_interpolation": params["image_interpolation"],
            "label_interpolation": params["label_interpolation"],
            "one_hot_label_interpolation": params.get(
                "one_hot_label_interpolation", "linear"
            ),
            "default_pad_value": params["default_pad_value"],
            "default_pad_label": float(params["default_pad_label"]),
            "copy": False,
            "include": params["selected_images"],
        }
        if "affine_matrix" in (params.get("_batched_keys") or []):
            per_sample = _PerSampleGeometry(
                affines=[
                    None if m is None else np.linalg.inv(np.asarray(m, np.float64))
                    for m in params["affine_matrix"]
                ],
                control_points=[
                    None if c is None else -np.asarray(c, np.float32)
                    for c in params["control_points"]
                ],
                max_displacements=[
                    tuple(d) if d else None for d in params["max_displacement"]
                ],
            )
            return _SpatialInverse(
                affine_matrix=None, control_points=None, per_sample=per_sample, **common
            )
        affine_matrix = _deserialize_matrix(params["affine_matrix"])
        inverse_affine = (
            None if affine_matrix is None else np.linalg.inv(affine_matrix)
        )
        cp = _deserialize_control_points(params["control_points"])
        return _SpatialInverse(
            affine_matrix=inverse_affine,
            control_points=None if cp is None else -cp,
            **common,
        )


class _PerSampleGeometry:
    """Per-element affines / control points / displacements."""

    def __init__(self, *, affines, control_points, max_displacements):
        self.affines = affines
        self.control_points = control_points
        self.max_displacements = max_displacements

    def __len__(self) -> int:
        return len(self.affines)

    def passthrough_indices(self) -> list[int]:
        return [
            i
            for i in range(len(self.affines))
            if self.affines[i] is None and self.control_points[i] is None
        ]


def _check_shared_space(images, reference_shape, reference_affine) -> None:
    for name, img_batch in images.items():
        shape = tuple(img_batch.data.shape[-3:])
        if shape != tuple(reference_shape):
            raise RuntimeError(
                f'Image "{name}" has spatial shape {shape}, expected'
                f" {tuple(reference_shape)}: spatial transforms need a shared space"
            )
        if not np.allclose(img_batch.affines[0].data, reference_affine.data, atol=1e-5):
            raise RuntimeError(
                f'Image "{name}" has a different affine from the reference'
                " image; spatial transforms need a shared space"
            )


def _run_spatial_pipeline(
    *,
    batch: SubjectsBatch,
    image_names,
    target_space,
    affine_matrix,
    control_points,
    max_displacement,
    affine_first: bool,
    image_interpolation: str,
    label_interpolation: str,
    one_hot_label_interpolation: str = "linear",
    antialias: bool,
    default_pad_value,
    default_pad_label: float,
    per_sample: "_PerSampleGeometry | None" = None,
) -> None:
    if not image_names:
        return
    first = batch.images[image_names[0]]
    input_shape = tuple(first.data.shape[-3:])
    input_affine = first.affines[0]
    output_shape = target_space[0] if target_space is not None else input_shape
    output_affine = target_space[1] if target_space is not None else input_affine

    if per_sample is None:
        grid, plans = _build_grid(
            input_shape=input_shape,
            input_affine=input_affine,
            output_shape=output_shape,
            output_affine=output_affine,
            affine_matrix=affine_matrix,
            control_points=control_points,
            max_displacement=max_displacement,
            affine_first=affine_first,
        )
    else:
        grids = []
        plans = []
        for i in range(len(per_sample)):
            g, p = _build_grid(
                input_shape=input_shape,
                input_affine=first.affines[i],
                output_shape=output_shape,
                output_affine=(
                    output_affine if target_space is not None else first.affines[i]
                ),
                affine_matrix=per_sample.affines[i],
                control_points=per_sample.control_points[i],
                max_displacement=per_sample.max_displacements[i],
                affine_first=affine_first,
            )
            grids.append(g)
            plans.append(p)
        grid = grids  # list of _LazyGrid, one per element

    passthrough = (
        per_sample.passthrough_indices()
        if per_sample is not None and target_space is None
        else []
    )

    for name in image_names:
        img_batch = batch.images[name]
        original_data = img_batch.data
        original_affines = list(img_batch.affines)
        is_label = issubclass(img_batch.image_class, LabelMap)
        interpolation = label_interpolation if is_label else image_interpolation
        if is_label and interpolation == LABEL_INTERPOLATION:
            img_batch.data = _resample_label_partial_volume(
                img_batch.data,
                grid,
                plans=plans,
                input_affine=input_affine,
                output_affine=output_affine,
                antialias=antialias,
                one_hot_label_interpolation=_require_supported_order(
                    one_hot_label_interpolation
                ),
                default_pad_label=default_pad_label,
                sharding=img_batch.sharding,
            )
        else:
            _require_supported_order(interpolation)
            fill = _batch_fill_value(
                img_batch,
                default_pad_value=default_pad_value,
                default_pad_label=default_pad_label,
            )
            data = as_jnp(img_batch.data)
            if antialias and not is_label:
                data = _antialias(data, input_affine, output_affine)
            sampled = _dispatch_resample(
                data, grid, plans, mode=interpolation, fill=fill,
                sharding=img_batch.sharding,
            )
            # the reference restores the input dtype after sampling
            # (integer labels stay integer; reference spatial.py:1731)
            img_batch.data = sampled.astype(data.dtype)
        # Output affines: per-sample affines collapse to the shared output
        # space; passthrough rows are restored bit-exactly.
        new_affines = [AffineMatrix(output_affine) for _ in img_batch.affines]
        if passthrough:
            data = img_batch.data
            orig = as_jnp(original_data).astype(data.dtype)
            mask = np.zeros(data.shape[0], bool)
            mask[passthrough] = True
            img_batch.data = jnp.where(
                jnp.asarray(mask).reshape(-1, 1, 1, 1, 1), orig, data
            )
            for i in passthrough:
                new_affines[i] = original_affines[i]
        img_batch.affines = new_affines


def _resolved_antialias_sigmas(
    input_affine: AffineMatrix, output_affine: AffineMatrix
) -> np.ndarray:
    """Per-axis antialias sigmas for an input->output space change (the
    single source of truth for both the blur and its no-op predicate)."""
    in_sp = np.asarray(input_affine.spacing, np.float64)
    out_sp = np.asarray(output_affine.spacing, np.float64)
    return _antialias_sigmas(out_sp / in_sp, in_sp)


def _antialias(data, input_affine: AffineMatrix, output_affine: AffineMatrix):
    sigmas = _resolved_antialias_sigmas(input_affine, output_affine)
    if np.all(sigmas == 0):
        return data
    return gaussian_blur(data, sigmas)


def _resample_label_partial_volume(
    data,
    grid,
    *,
    plans=None,
    input_affine: AffineMatrix,
    output_affine: AffineMatrix,
    antialias: bool,
    one_hot_label_interpolation: str,
    default_pad_label: float,
    sharding=None,
):
    """Partial-volume label resampling (one-hot + argmax), reference
    ``spatial.py:1275-1389``."""
    data_j = as_jnp(data)
    smoothing = antialias and not np.all(
        _resolved_antialias_sigmas(input_affine, output_affine) == 0
    )
    if (
        data_j.shape[1] == 1
        and not smoothing
        and one_hot_label_interpolation == "linear"
        and _is_lazy_grid(grid)
        and sharding is None
    ):
        # corner-based kernel: argmax over summed corner weights — no
        # blocking `unique` pull, no L-channel one-hot gather (see
        # ops.resample._resample_element_label); exact match to the
        # one-hot path when no antialias smoothing applies
        from ...ops.resample import resample_label_fused

        grids = grid if isinstance(grid, list) else [grid] * data_j.shape[0]
        return resample_label_fused(
            data_j,
            [g.matrix for g in grids],
            [g.control_points for g in grids],
            out_shape=grids[0].out_shape,
            pad_label=default_pad_label,
        ).astype(data_j.dtype)
    if data_j.shape[1] > 1:
        smoothed = data_j.astype(jnp.float32)
        if antialias:
            smoothed = _antialias(smoothed, input_affine, output_affine)
        sampled = _dispatch_resample(
            smoothed, grid, plans, mode=one_hot_label_interpolation, fill=0.0,
            sharding=sharding,
        )
        if jnp.issubdtype(data_j.dtype, jnp.floating):
            return sampled.astype(data_j.dtype)
        return sampled
    labels = np.asarray(unique_labels(data_j))
    one_hot = (
        data_j[:, 0:1] == jnp.asarray(labels, data_j.dtype).reshape(1, -1, 1, 1, 1)
    ).astype(jnp.float32)
    if antialias:
        one_hot = _antialias(one_hot, input_affine, output_affine)
    sampled = _dispatch_resample(
        one_hot, grid, plans, mode=one_hot_label_interpolation, fill=0.0,
        sharding=sharding,
    )
    winners = jnp.argmax(sampled, axis=1)
    resampled = jnp.asarray(labels)[winners]
    in_bounds = jnp.sum(sampled, axis=1) > 0.5
    resampled = jnp.where(in_bounds, resampled, default_pad_label)
    return resampled[:, None].astype(data_j.dtype)


class _SpatialInverse(SpatialTransform):
    """Concrete inverse of Spatial: exact affine inverse, negated elastic
    field, flipped ordering, resample to the recorded original space."""

    def __init__(
        self,
        *,
        target,
        affine_matrix,
        control_points,
        affine_first: bool,
        image_interpolation: str,
        label_interpolation: str,
        one_hot_label_interpolation: str = "linear",
        default_pad_value,
        default_pad_label: float,
        per_sample: _PerSampleGeometry | None = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        self.target = target
        self.affine_matrix = (
            None if affine_matrix is None else np.asarray(affine_matrix, np.float64)
        )
        self.control_points = (
            None if control_points is None else np.asarray(control_points, np.float32)
        )
        self.per_sample = per_sample
        self.affine_first = affine_first
        self.image_interpolation = _parse_interpolation(image_interpolation)
        self.label_interpolation = _parse_interpolation(label_interpolation)
        self.one_hot_label_interpolation = _parse_interpolation(
            one_hot_label_interpolation
        )
        self.default_pad_value = default_pad_value
        self.default_pad_label = float(default_pad_label)

    def apply_transform(
        self, batch: SubjectsBatch, params: dict[str, Any]
    ) -> SubjectsBatch:
        max_displacement = None
        if self.per_sample is None and self.control_points is not None:
            max_displacement = _field_displacement_extent(self.control_points)
        _run_spatial_pipeline(
            batch=batch,
            image_names=list(self._get_images(batch)),
            target_space=self.target,
            affine_matrix=self.affine_matrix,
            control_points=self.control_points,
            max_displacement=max_displacement,
            affine_first=self.affine_first,
            image_interpolation=self.image_interpolation,
            label_interpolation=self.label_interpolation,
            one_hot_label_interpolation=self.one_hot_label_interpolation,
            antialias=False,
            default_pad_value=self.default_pad_value,
            default_pad_label=self.default_pad_label,
            per_sample=self.per_sample,
        )
        return batch


# --------------------------------------------------------------------------
# Wrappers
# --------------------------------------------------------------------------


class Resample(Spatial):
    r"""Resample images to a different space (default: 1 mm isotropic).

    Parity reference: ``spatial.py:759-803``.
    """

    def __init__(
        self,
        *,
        target=1.0,
        image_interpolation="linear",
        label_interpolation="nearest",
        one_hot_label_interpolation="linear",
        antialias: bool = False,
        **kwargs: Any,
    ) -> None:
        super().__init__(
            target=target,
            image_interpolation=image_interpolation,
            label_interpolation=label_interpolation,
            one_hot_label_interpolation=one_hot_label_interpolation,
            antialias=antialias,
            **kwargs,
        )


class Affine(Spatial):
    r"""Random affine: scales / degrees / translation about a pivot.

    Parity reference: ``spatial.py:806-869``.
    """

    def __init__(
        self,
        *,
        scales=1.0,
        degrees=0.0,
        translation=0.0,
        isotropic: bool = False,
        center: str = "image",
        default_pad_value="minimum",
        default_pad_label: float = 0,
        image_interpolation="linear",
        label_interpolation="nearest",
        one_hot_label_interpolation="linear",
        **kwargs: Any,
    ) -> None:
        super().__init__(
            scales=scales,
            degrees=degrees,
            translation=translation,
            isotropic=isotropic,
            center=center,
            default_pad_value=default_pad_value,
            default_pad_label=default_pad_label,
            image_interpolation=image_interpolation,
            label_interpolation=label_interpolation,
            one_hot_label_interpolation=one_hot_label_interpolation,
            **kwargs,
        )


class ElasticDeformation(Spatial):
    r"""Random dense elastic deformation from a coarse control grid.

    Parity reference: ``spatial.py:872-922``.
    """

    def __init__(
        self,
        *,
        control_points=None,
        num_control_points=7,
        max_displacement=7.5,
        locked_borders: int = 2,
        image_interpolation="linear",
        label_interpolation="nearest",
        one_hot_label_interpolation="linear",
        **kwargs: Any,
    ) -> None:
        super().__init__(
            control_points=control_points,
            num_control_points=num_control_points,
            max_displacement=max_displacement,
            locked_borders=locked_borders,
            image_interpolation=image_interpolation,
            label_interpolation=label_interpolation,
            one_hot_label_interpolation=one_hot_label_interpolation,
            **kwargs,
        )

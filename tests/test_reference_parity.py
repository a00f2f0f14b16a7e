"""Golden parity: full Spatial transform vs a torch oracle that
replicates the REFERENCE's math exactly (meshgrid -> A_in^-1 T^-1 A_out
-> elastic upsample -> [-1,1] grid -> F.grid_sample, per
``/root/reference/src/torchio/transforms/spatial/spatial.py``).

This is the BASELINE.md accuracy gate: <= 1e-3 intensity error.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import torchio_tpu as tio
from torchio_tpu.core.affine import AffineMatrix
from torchio_tpu.transforms.spatial.spatial import (
    _compute_new_shape_affine,
    _forward_affine,
)


def torch_spatial_oracle(
    data_cijk: np.ndarray,
    input_affine: np.ndarray,
    output_shape,
    output_affine: np.ndarray,
    forward_matrix: np.ndarray | None,
    control_points: np.ndarray | None,
    input_spacing,
    mode: str = "bilinear",
) -> np.ndarray:
    t_inv = np.eye(4) if forward_matrix is None else np.linalg.inv(forward_matrix)
    mapping = np.linalg.inv(input_affine) @ t_inv @ output_affine
    m = torch.as_tensor(mapping, dtype=torch.float32)
    rng = [torch.arange(s, dtype=torch.float32) for s in output_shape]
    gi, gj, gk = torch.meshgrid(*rng, indexing="ij")
    coords = torch.stack([gi, gj, gk], -1)
    hom = torch.cat([coords, torch.ones(*coords.shape[:-1], 1)], -1)
    coords = (hom @ m.T)[..., :3]
    if control_points is not None:
        field = F.interpolate(
            torch.as_tensor(control_points).permute(3, 0, 1, 2)[None],
            size=list(output_shape), mode="trilinear", align_corners=True,
        )[0].permute(1, 2, 3, 0)
        coords = coords + field / torch.as_tensor(input_spacing, dtype=torch.float32)
    in_shape = data_cijk.shape[1:]
    sizes = torch.tensor([max(s - 1, 1) for s in in_shape], dtype=torch.float32)
    grid = 2.0 * coords / sizes - 1.0
    grid = grid.permute(2, 1, 0, 3)[None]
    inp = torch.as_tensor(data_cijk[None]).permute(0, 1, 4, 3, 2).float()
    out = F.grid_sample(
        inp, grid, mode=mode, padding_mode="zeros", align_corners=True
    )
    return out.permute(0, 1, 4, 3, 2)[0].numpy()


@pytest.fixture
def data(rng):
    return rng.normal(size=(1, 24, 28, 32)).astype(np.float32)


def test_affine_parity(data):
    affine = np.diag([1.0, 1.0, 1.0, 1.0])
    shape = data.shape[1:]
    fwd = _forward_affine(
        scales=(0.95, 1.05, 1.0), degrees=(7.0, -4.0, 11.0),
        translation=(2.0, -1.0, 0.5), center="image", shape=shape,
        affine=AffineMatrix(affine),
    )
    sub = tio.Subject(t1=tio.ScalarImage(data, affine=affine))
    out = tio.Spatial(
        scales=(0.95, 1.05, 1.0),
        degrees=(7.0, 7.0, -4.0, -4.0, 11.0, 11.0),
        translation=(2.0, 2.0, -1.0, -1.0, 0.5, 0.5),
        default_pad_value=0.0,
    )
    # force the deterministic scales triple (not a range)
    out.scales = tio.transforms.parameter_range._ParameterRange((0.95, 1.05, 1.0))
    result = out(sub)
    oracle = torch_spatial_oracle(
        data, affine, shape, affine, fwd, None, (1.0, 1.0, 1.0)
    )
    np.testing.assert_allclose(
        np.asarray(result.t1.data), oracle, rtol=1e-3, atol=1e-3
    )


def test_elastic_parity(data):
    affine = np.eye(4)
    shape = data.shape[1:]
    rng = np.random.default_rng(7)
    cp = rng.uniform(-3.0, 3.0, size=(5, 5, 5, 3)).astype(np.float32)
    cp[0] = cp[-1] = 0
    cp[:, 0] = cp[:, -1] = 0
    cp[:, :, 0] = cp[:, :, -1] = 0
    sub = tio.Subject(t1=tio.ScalarImage(data, affine=affine))
    result = tio.Spatial(control_points=cp, default_pad_value=0.0)(sub)
    oracle = torch_spatial_oracle(data, affine, shape, affine, None, cp, (1.0, 1.0, 1.0))
    np.testing.assert_allclose(
        np.asarray(result.t1.data), oracle, rtol=1e-3, atol=1e-3
    )


def test_resample_parity(data):
    affine = np.diag([2.0, 2.0, 2.0, 1.0])
    shape = data.shape[1:]
    out_shape, out_affine = _compute_new_shape_affine(
        shape, AffineMatrix(affine), (1.0, 1.0, 1.0)
    )
    sub = tio.Subject(t1=tio.ScalarImage(data, affine=affine))
    result = tio.Resample(target=1.0, default_pad_value=0.0)(sub)
    oracle = torch_spatial_oracle(
        data, affine, out_shape, out_affine.data, None, None, (2.0, 2.0, 2.0)
    )
    np.testing.assert_allclose(
        np.asarray(result.t1.data), oracle, rtol=1e-3, atol=1e-3
    )


def test_nearest_label_parity(rng):
    seg = rng.integers(0, 4, size=(1, 20, 20, 20)).astype(np.float32)
    affine = np.eye(4)
    fwd = _forward_affine(
        scales=(1.0, 1.0, 1.0), degrees=(0.0, 0.0, 13.0),
        translation=(0.3, 0.0, 0.0), center="image", shape=(20, 20, 20),
        affine=AffineMatrix(affine),
    )
    sub = tio.Subject(seg=tio.LabelMap(seg.astype(np.int32), affine=affine))
    result = tio.Spatial(
        degrees=(0.0, 0.0, 0.0, 0.0, 13.0, 13.0),
        translation=(0.3, 0.3, 0.0, 0.0, 0.0, 0.0),
        default_pad_label=0,
    )(sub)
    oracle = torch_spatial_oracle(
        seg, affine, (20, 20, 20), affine, fwd, None, (1.0, 1.0, 1.0),
        mode="nearest",
    )
    got = np.asarray(result.seg.data).astype(np.float32)
    # nearest: allow rare tie-break differences at exact half-voxel points
    mismatches = (got != oracle).mean()
    assert mismatches < 0.002

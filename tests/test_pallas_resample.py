"""Pallas tiled resample vs the XLA gather kernel (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from torchio_tpu.core.affine import AffineMatrix
from torchio_tpu.ops.pallas_resample import pallas_resample, plan_tiles
from torchio_tpu.ops.resample import build_coords, resample
from torchio_tpu.transforms.spatial.spatial import (
    _forward_affine,
    _mapping_matrix,
)

TILE = (8, 8, 128)


def make_case(rng, shape=(40, 48, 128), degrees=(5, 3, 7), scales=(0.95, 1.05, 1.02),
              translation=(1.0, -2.0, 0.5)):
    vol = rng.normal(size=(1, *shape)).astype(np.float32)
    aff = AffineMatrix()
    fwd = _forward_affine(
        scales=scales, degrees=degrees, translation=translation,
        center="image", shape=shape, affine=aff,
    )
    matrix = _mapping_matrix(aff, aff, fwd)
    coords = np.asarray(build_coords(shape, matrix))
    return vol, matrix, coords


def test_plan_covers_coords(rng):
    vol, matrix, coords = make_case(rng)
    bases, box, grid = plan_tiles(matrix, coords.shape[:3], vol.shape[1:], tile=TILE)
    ti, tj, tk = TILE
    bases = bases.reshape(*grid, 3)
    for gi in range(grid[0]):
        for gj in range(grid[1]):
            for gk in range(grid[2]):
                tile_coords = coords[
                    gi * ti : (gi + 1) * ti,
                    gj * tj : (gj + 1) * tj,
                    gk * tk : (gk + 1) * tk,
                ]
                base = bases[gi, gj, gk]
                for a in range(3):
                    in_bounds = (
                        (tile_coords[..., a] >= 0)
                        & (tile_coords[..., a] <= vol.shape[1 + a] - 1)
                    )
                    vals = tile_coords[..., a][in_bounds]
                    if vals.size == 0:
                        continue
                    assert np.floor(vals.min()) >= base[a]
                    assert np.ceil(vals.max()) + 1 <= base[a] + box[a]


@pytest.mark.parametrize("mode", ["linear", "nearest"])
def test_matches_xla_kernel(rng, mode):
    vol, matrix, coords = make_case(rng)
    expected = np.asarray(resample(vol[None], coords, mode=mode, fill=0.0))[0]
    got = np.asarray(
        pallas_resample(
            jnp.asarray(vol), jnp.asarray(coords), matrix, mode=mode,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_matches_with_fill(rng):
    vol, matrix, coords = make_case(rng, translation=(30.0, 0.0, 0.0))
    expected = np.asarray(resample(vol[None], coords, mode="linear", fill=7.0))[0]
    got = np.asarray(
        pallas_resample(
            jnp.asarray(vol), jnp.asarray(coords), matrix, mode="linear",
            fill=7.0, interpret=True,
        )
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_identity(rng):
    vol = rng.normal(size=(2, 16, 16, 128)).astype(np.float32)
    coords = np.asarray(build_coords((16, 16, 128), np.eye(4)))
    got = np.asarray(
        pallas_resample(jnp.asarray(vol), jnp.asarray(coords), np.eye(4), interpret=True)
    )
    np.testing.assert_allclose(got, vol, rtol=1e-4, atol=1e-5)


def test_nondivisible_output_padding(rng):
    vol, matrix, _ = make_case(rng, shape=(20, 20, 130))
    coords = np.asarray(build_coords((20, 20, 130), matrix))
    expected = np.asarray(resample(vol[None], coords, mode="linear", fill=0.0))[0]
    got = np.asarray(
        pallas_resample(jnp.asarray(vol), jnp.asarray(coords), matrix, interpret=True)
    )
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_elastic_bounds(rng):
    vol, matrix, coords = make_case(rng)
    disp = rng.uniform(-2.0, 2.0, size=coords.shape).astype(np.float32)
    coords_e = coords + disp
    expected = np.asarray(resample(vol[None], coords_e, mode="linear", fill=0.0))[0]
    got = np.asarray(
        pallas_resample(
            jnp.asarray(vol), jnp.asarray(coords_e), matrix,
            extra_in=np.full(3, 2.0), interpret=True,
        )
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_chunked_launch_matches_single(rng, monkeypatch):
    """Grids above _MAX_TILES_PER_LAUNCH split into padded chunk
    launches; forcing a tiny cap must not change any output voxel."""
    import torchio_tpu.ops.pallas_resample as pr

    vol, matrix, coords = make_case(rng)
    expected = np.asarray(
        pallas_resample(
            jnp.asarray(vol), jnp.asarray(coords), matrix, interpret=True
        )
    )
    monkeypatch.setattr(pr, "_MAX_TILES_PER_LAUNCH", 3)
    got = np.asarray(
        pallas_resample(
            jnp.asarray(vol), jnp.asarray(coords), matrix, interpret=True
        )
    )
    np.testing.assert_array_equal(got, expected)


def test_chunked_launch_with_padded_tail(rng, monkeypatch):
    # force multi-launch chunking with a ragged tail so the pad-to-
    # bucket branch runs (pallas_resample tail-chunk padding)
    import torchio_tpu.ops.pallas_resample as mod

    monkeypatch.setattr(mod, "_MAX_TILES_PER_LAUNCH", 4)
    vol, matrix, coords = make_case(rng)
    expected = np.asarray(resample(vol[None], coords, mode="linear", fill=0.0))[0]
    got = np.asarray(
        pallas_resample(
            jnp.asarray(vol), jnp.asarray(coords), matrix, interpret=True
        )
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_bf16_matmul_dtype_and_auto_interpret(rng):
    # matmul_dtype=bf16 exercises the DEFAULT-precision MXU branch;
    # interpret=None auto-detects the CPU platform
    vol, matrix, coords = make_case(rng, shape=(16, 16, 128))
    expected = np.asarray(resample(vol[None], coords, mode="linear", fill=0.0))[0]
    got = np.asarray(
        pallas_resample(
            jnp.asarray(vol), jnp.asarray(coords), matrix,
            matmul_dtype=jnp.bfloat16, interpret=None,
        )
    )
    np.testing.assert_allclose(got, expected, rtol=3e-2, atol=3e-2)

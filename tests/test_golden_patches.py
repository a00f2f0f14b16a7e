"""Golden parity for the patch pipeline (deterministic parts).

GridSampler's location grid and PatchAggregator's crop/average/hann
blending are fully deterministic, so reference and torchio_tpu must
agree exactly given the same subject and patch geometry.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

import torchio_tpu as tio

sys.path.insert(0, str(Path(__file__).resolve().parent))
from _reference_loader import load_reference  # noqa: E402

ref = load_reference()
pytestmark = pytest.mark.skipif(
    ref is None, reason="reference TorchIO source not available"
)

SHAPE = (1, 20, 24, 28)


@pytest.fixture(scope="module")
def volume():
    return np.random.default_rng(21).random(SHAPE, np.float32)


def _locations(sampler):
    locs = []
    for loc in sampler.locations:
        index = getattr(loc, "index", None)
        if index is None:  # raw array form
            arr = np.asarray(loc).reshape(-1)
            locs.append(tuple(int(v) for v in arr))
        else:
            locs.append(
                tuple(int(v) for v in np.asarray(index))
                + tuple(int(v) for v in np.asarray(loc.size))
            )
    return sorted(locs)


@pytest.mark.parametrize("overlap", [0, 4], ids=["no-overlap", "overlap4"])
def test_grid_sampler_locations_golden(overlap, volume):
    import torch

    s_ref = ref.Subject(t1=ref.ScalarImage(torch.as_tensor(volume.copy())))
    s_mine = tio.Subject(t1=tio.ScalarImage(volume.copy()))
    g_ref = ref.GridSampler(s_ref, patch_size=12, patch_overlap=overlap)
    g_mine = tio.GridSampler(s_mine, patch_size=12, patch_overlap=overlap)
    assert len(g_ref) == len(g_mine)
    assert _locations(g_ref) == _locations(g_mine)
    # first patch contents agree
    p_ref = g_ref[0].t1.data.numpy()
    p_mine = np.asarray(g_mine[0].images["t1"].data)
    np.testing.assert_array_equal(p_mine, p_ref)


@pytest.mark.parametrize("mode", ["crop", "average"])
def test_aggregator_identity_roundtrip_golden(mode, volume):
    """Identity 'model': reassembled output equals reference reassembly."""
    import torch

    overlap = 4
    s_ref = ref.Subject(t1=ref.ScalarImage(torch.as_tensor(volume.copy())))
    s_mine = tio.Subject(t1=tio.ScalarImage(volume.copy()))
    g_ref = ref.GridSampler(s_ref, patch_size=12, patch_overlap=overlap)
    g_mine = tio.GridSampler(s_mine, patch_size=12, patch_overlap=overlap)

    a_ref = ref.PatchAggregator(
        s_ref.spatial_shape, overlap_mode=mode, patch_overlap=overlap
    )
    a_mine = tio.PatchAggregator(
        s_mine.spatial_shape, overlap_mode=mode, patch_overlap=overlap
    )
    for i in range(len(g_ref)):
        patch_ref = g_ref[i]
        patch_mine = g_mine[i]
        loc_ref = patch_ref.metadata["patch_location"]
        loc_mine = patch_mine.metadata["patch_location"]
        a_ref.add_batch(
            patch_ref.t1.data.unsqueeze(0), [loc_ref]
        )
        a_mine.add_batch(
            np.asarray(patch_mine.images["t1"].data)[None], [loc_mine]
        )
    out_ref = a_ref.get_output()
    out_ref = out_ref.numpy() if hasattr(out_ref, "numpy") else np.asarray(out_ref)
    out_mine = np.asarray(a_mine.get_output())
    np.testing.assert_allclose(out_mine, out_ref, atol=1e-5, rtol=0)
    # identity model + full tiling must reconstruct the input
    np.testing.assert_allclose(out_mine, volume, atol=1e-5, rtol=0)


def test_aggregator_hann_reconstructs_exactly(volume):
    """DELIBERATE deviation from the reference: correct Hann normalization.

    The reference's ``get_output`` clamps blend counts with
    ``counts.clamp(min=1)`` (reference aggregator.py:119-121), but Hann
    window weights sum to LESS than 1 wherever a voxel is covered by a
    single patch, so its hann mode attenuates intensities (identity
    round-trip error up to ~0.99 measured). torchio_tpu divides by the
    true accumulated window sum and reconstructs exactly.
    """
    overlap = 4
    s = tio.Subject(t1=tio.ScalarImage(volume.copy()))
    g = tio.GridSampler(s, patch_size=12, patch_overlap=overlap)
    a = tio.PatchAggregator(
        s.spatial_shape, overlap_mode="hann", patch_overlap=overlap
    )
    for i in range(len(g)):
        p = g[i]
        a.add_batch(
            np.asarray(p.images["t1"].data)[None],
            [p.metadata["patch_location"]],
        )
    np.testing.assert_allclose(
        np.asarray(a.get_output()), volume, atol=1e-5, rtol=0
    )


def test_subject_slicing_golden(volume):
    """Whole-subject spatial slicing: data + shifted affine match."""
    import torch

    affine = np.diag([1.0, 2.0, 1.5, 1.0])
    affine[:3, 3] = (3.0, -1.0, 7.0)
    s_ref = ref.Subject(
        t1=ref.ScalarImage(torch.as_tensor(volume.copy()), affine=affine)
    )
    s_mine = tio.Subject(t1=tio.ScalarImage(volume.copy(), affine=affine))
    sub_ref = s_ref[4:16, 2:20, 5:25]  # spatial-only indices
    sub_mine = s_mine[4:16, 2:20, 5:25]
    np.testing.assert_array_equal(
        np.asarray(sub_mine.images["t1"].data), sub_ref.t1.data.numpy()
    )
    np.testing.assert_allclose(
        np.asarray(sub_mine.images["t1"].affine.data),
        np.asarray(sub_ref.t1.affine.data),
        atol=1e-9,
    )


def test_image_region_read_golden(volume):
    """Region indexing keeps axes and shifts the affine origin."""
    import torch

    affine = np.diag([2.0, 1.0, 1.0, 1.0])
    img_ref = ref.ScalarImage(torch.as_tensor(volume.copy()), affine=affine)
    img_mine = tio.ScalarImage(volume.copy(), affine=affine)
    r_ref = img_ref[:, 10, 3:9, ::2]
    r_mine = img_mine[:, 10, 3:9, ::2]
    np.testing.assert_array_equal(
        np.asarray(r_mine.data), r_ref.data.numpy()
    )
    np.testing.assert_allclose(
        np.asarray(r_mine.affine.data), np.asarray(r_ref.affine.data), atol=1e-9
    )


def test_points_conversions_golden():
    import torch

    pts = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], np.float32)
    aff = np.diag([2.0, -1.0, 1.5, 1.0])
    aff[:3, 3] = (10.0, 20.0, -5.0)
    p_ref = ref.Points(torch.as_tensor(pts), axes="IJK", affine=aff)
    p_mine = tio.Points(pts, axes="IJK", affine=aff)
    np.testing.assert_allclose(
        np.asarray(p_mine.to_world()), p_ref.to_world().numpy(), atol=1e-5
    )
    for target in ("RAS", "LPS", "LPI", "KJI", "JIK"):
        np.testing.assert_allclose(
            np.asarray(p_mine.to_axes(target).data),
            p_ref.to_axes(target).data.numpy(),
            atol=1e-5,
            err_msg=target,
        )


def test_bboxes_conversions_golden():
    import torch

    boxes = np.array([[1.0, 2.0, 3.0, 5.0, 7.0, 9.0]], np.float32)
    aff = np.diag([2.0, -1.0, 1.5, 1.0])
    aff[:3, 3] = (10.0, 20.0, -5.0)
    b_ref = ref.BoundingBoxes(
        torch.as_tensor(boxes), format=ref.BoundingBoxFormat.IJKIJK, affine=aff
    )
    b_mine = tio.BoundingBoxes(
        boxes, format=tio.BoundingBoxFormat.IJKIJK, affine=aff
    )
    for fmt_args in (("IJK", "center_size"), ("RAS", "corners"), ("KJI", "corners")):
        f_ref = ref.BoundingBoxFormat(*fmt_args)
        f_mine = tio.BoundingBoxFormat(*fmt_args)
        np.testing.assert_allclose(
            np.asarray(b_mine.to_format(f_mine).data),
            b_ref.to_format(f_ref).data.numpy(),
            atol=1e-4,
            err_msg=str(fmt_args),
        )


def test_all_points_aggregation_golden():
    """Subject + image-level annotation merge uses the same key scheme."""
    import torch

    vol = np.random.default_rng(33).random((1, 6, 6, 6)).astype(np.float32)
    pts = np.array([[1.0, 2.0, 3.0]], np.float32)
    s_ref = ref.Subject(
        t1=ref.ScalarImage(torch.as_tensor(vol.copy())),
        lm=ref.Points(torch.as_tensor(pts)),
    )
    s_ref.t1.points["img_pts"] = ref.Points(torch.as_tensor(pts + 1))
    s_mine = tio.Subject(t1=tio.ScalarImage(vol.copy()), lm=tio.Points(pts))
    s_mine.images["t1"].points["img_pts"] = tio.Points(pts + 1)
    assert sorted(s_ref.all_points(), key=str) == sorted(
        s_mine.all_points(), key=str
    )
    np.testing.assert_allclose(
        np.asarray(s_mine.all_points()[("t1", "img_pts")].data),
        s_ref.all_points()[("t1", "img_pts")].data.numpy(),
    )

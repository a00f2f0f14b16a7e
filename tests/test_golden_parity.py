"""Golden parity: run the REFERENCE TorchIO on in-memory tensors and
compare against torchio_tpu with identical (degenerate-range) params.

The reference's transform math is pure torch, so with its I/O wheel deps
stubbed (tests/_reference_loader.py) every tensor-level transform runs
here. Degenerate ranges like ``(c, c)`` make both libraries sample the
same constants, turning each comparison into a true golden test
(SURVEY.md section 7.4's golden-output corpus, generated live).

Accuracy gate: BASELINE.json demands <= 1e-3 intensity error for the
resampling transforms; elementwise transforms are held to 1e-5.
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

SHAPE = (1, 12, 14, 16)  # non-cubic to catch axis mix-ups


@pytest.fixture(scope="module")
def volume():
    return np.random.default_rng(7).random(SHAPE, np.float32)


@pytest.fixture(scope="module")
def labels():
    return np.random.default_rng(8).integers(0, 5, SHAPE).astype(np.int32)


def _run_pair(make, data, atol):
    import torch

    t_ref = make(ref)
    t_mine = make(tio)
    out_ref = t_ref(torch.as_tensor(data.copy())).numpy()
    out_mine = np.asarray(t_mine(data.copy()))
    np.testing.assert_allclose(out_mine, out_ref, atol=atol, rtol=0)


ELEMENTWISE = [
    ("gamma", lambda m: m.Gamma(log_gamma=(0.3, 0.3)), 1e-5),
    ("clamp", lambda m: m.Clamp(out_min=0.2, out_max=0.8), 1e-6),
    ("rescale", lambda m: m.RescaleIntensity(out_min=-1.0, out_max=2.0), 1e-5),
    ("znorm", lambda m: m.ZNormalization(), 1e-3),
    ("flip", lambda m: m.Flip(axes=(0, 2), flip_probability=1.0), 0),
    ("pad-constant", lambda m: m.Pad(padding=(1, 2, 3, 4, 5, 6), fill=0.5), 0),
    ("pad-reflect", lambda m: m.Pad(padding=2, padding_mode="reflect"), 0),
    ("pad-replicate", lambda m: m.Pad(padding=3, padding_mode="replicate"), 0),
    ("pad-mean", lambda m: m.Pad(padding=1, padding_mode="mean"), 1e-5),
    ("pad-minimum", lambda m: m.Pad(padding=1, padding_mode="minimum"), 1e-6),
    ("crop", lambda m: m.Crop(cropping=(1, 2, 3, 4, 5, 6)), 0),
    ("crop-or-pad", lambda m: m.CropOrPad((10, 18, 16)), 0),
    (
        "ghosting",
        lambda m: m.Ghosting(
            num_ghosts=(4, 4), axes=(1,), intensity=(0.55, 0.55)
        ),
        1e-4,
    ),
    (
        "ghosting-restore",
        lambda m: m.Ghosting(
            num_ghosts=(3, 3), axes=(2,), intensity=(0.8, 0.8), restore=0.1
        ),
        1e-4,
    ),
    (
        "spike-deterministic",
        lambda m: m.Spike(num_spikes=0, intensity=(0.0, 0.0), p=1.0),
        1e-6,
    ),
    ("blur", lambda m: m.Blur(std=(1.2, 1.2)), 1e-3),
    (
        "motion",
        lambda m: m.Motion(
            degrees=(5.0, 5.0), translation=(3.0, 3.0), num_transforms=2
        ),
        1e-3,
    ),
    (
        "anisotropy",
        lambda m: m.Anisotropy(axes=(1,), downsampling=(2.0, 2.0)),
        1e-3,
    ),
]


@pytest.mark.parametrize(
    "make,atol", [p[1:] for p in ELEMENTWISE], ids=[p[0] for p in ELEMENTWISE]
)
def test_intensity_golden(make, atol, volume):
    _run_pair(make, volume, atol)


SPATIAL = [
    (
        "affine",
        lambda m: m.Affine(
            scales=(1.1, 1.1),
            degrees=(8.0, 8.0),
            translation=(2.0, 2.0),
            center="image",
        ),
        1e-3,
    ),
    (
        "affine-origin",
        lambda m: m.Affine(degrees=(-7.0, -7.0), center="origin"),
        1e-3,
    ),
    ("resample-2mm", lambda m: m.Resample(target=2.0), 1e-3),
    (
        "elastic",
        lambda m: m.Spatial(
            control_points=_CONTROL_POINTS, max_displacement=(2.0, 2.0)
        ),
        1e-3,
    ),
    (
        "spatial-fused",
        lambda m: m.Spatial(
            scales=(0.95, 0.95),
            degrees=(5.0, 5.0),
            control_points=_CONTROL_POINTS,
            max_displacement=(2.0, 2.0),
        ),
        1e-3,
    ),
]

_CONTROL_POINTS = (
    np.random.default_rng(9).uniform(-2.0, 2.0, (5, 5, 5, 3)).astype(np.float32)
)


@pytest.mark.parametrize(
    "make,atol", [p[1:] for p in SPATIAL], ids=[p[0] for p in SPATIAL]
)
def test_spatial_golden(make, atol, volume):
    _run_pair(make, volume, atol)


LABEL = [
    ("one-hot", lambda m: m.OneHot(num_classes=5), 0),
    ("remap", lambda m: m.RemapLabels({1: 3, 2: 1, 3: 2}), 0),
    ("remove", lambda m: m.RemoveLabels([2, 4]), 0),
    ("sequential", lambda m: m.SequentialLabels(), 0),
]


@pytest.mark.parametrize(
    "make,atol", [p[1:] for p in LABEL], ids=[p[0] for p in LABEL]
)
def test_label_golden(make, atol, labels):
    import torch

    t_ref = make(ref)
    t_mine = make(tio)
    img_ref = ref.LabelMap(torch.as_tensor(labels.copy()))
    img_mine = tio.LabelMap(labels.copy())
    out_ref = t_ref(img_ref).data.numpy()
    out_mine = np.asarray(t_mine(img_mine).data)
    np.testing.assert_allclose(
        out_mine.astype(np.float64), out_ref.astype(np.float64), atol=atol, rtol=0
    )


# --- deeper golden coverage -------------------------------------------------


def test_masked_percentile_rescale_golden(volume, labels):
    """Percentile stats within a LabelMap mask (device nanquantile path)."""
    import torch

    def subj(m, to_torch):
        conv = (lambda a: torch.as_tensor(a.copy())) if to_torch else (
            lambda a: a.copy()
        )
        return m.Subject(
            t1=m.ScalarImage(conv(volume)),
            seg=m.LabelMap(conv((labels > 2).astype(np.int32))),
        )

    make = lambda m: m.RescaleIntensity(  # noqa: E731
        out_min=0.0,
        out_max=1.0,
        percentile_low=(5.0, 5.0),
        percentile_high=(95.0, 95.0),
        masking_method="seg",
    )
    out_ref = make(ref)(subj(ref, True)).t1.data.numpy()
    out_mine = np.asarray(make(tio)(subj(tio, False)).images["t1"].data)
    np.testing.assert_allclose(out_mine, out_ref, atol=2e-3, rtol=0)


def test_histogram_standardization_golden(volume):
    import torch

    landmarks = np.linspace(0.0, 100.0, 13).astype(np.float64)
    landmarks[1:-1] += np.random.default_rng(3).uniform(-2, 2, 11)
    out_ref = (
        ref.HistogramStandardization(torch.as_tensor(landmarks))(
            torch.as_tensor(volume.copy())
        ).numpy()
    )
    out_mine = np.asarray(
        tio.HistogramStandardization(landmarks)(volume.copy())
    )
    np.testing.assert_allclose(out_mine, out_ref, atol=1e-2, rtol=0)


def test_resize_golden(volume):
    _run_pair(lambda m: m.Resize(target_shape=(8, 10, 12)), volume, 1e-4)


def test_transpose_golden(volume):
    _run_pair(lambda m: m.Transpose(), volume, 0)


def test_ensure_shape_multiple_golden(volume):
    _run_pair(lambda m: m.EnsureShapeMultiple(8), volume, 0)


def test_contour_golden(labels):
    import torch

    out_ref = ref.Contour()(ref.LabelMap(torch.as_tensor(labels.copy()))).data
    out_mine = tio.Contour()(tio.LabelMap(labels.copy())).data
    np.testing.assert_array_equal(
        np.asarray(out_mine, np.float64), out_ref.numpy().astype(np.float64)
    )


@pytest.mark.parametrize(
    "make",
    [
        lambda m: m.Affine(degrees=(9.0, 9.0), translation=(1.5, 1.5)),
        lambda m: m.RescaleIntensity(out_min=0.0, out_max=1.0),
        lambda m: m.Gamma(log_gamma=(0.4, 0.4)),
        lambda m: m.Flip(axes=(1,), flip_probability=1.0),
    ],
    ids=["affine", "rescale", "gamma", "flip"],
)
def test_inverse_golden(make, volume):
    """Forward + history inverse agree between the libraries."""
    import torch

    s_ref = ref.Subject(t1=ref.ScalarImage(torch.as_tensor(volume.copy())))
    s_mine = tio.Subject(t1=tio.ScalarImage(volume.copy()))
    fwd_ref = make(ref)(s_ref)
    fwd_mine = make(tio)(s_mine)
    inv_ref = fwd_ref.apply_inverse_transform()
    inv_mine = fwd_mine.apply_inverse_transform()
    np.testing.assert_allclose(
        np.asarray(inv_mine.images["t1"].data),
        inv_ref.t1.data.numpy(),
        atol=2e-3,
        rtol=0,
    )


def test_per_element_batch_golden(volume):
    """Batched apply with degenerate ranges: every element matches ref."""
    import torch

    b = 3
    stack = np.stack([volume] * b)
    batch_ref = ref.SubjectsBatch.from_subjects(
        [ref.Subject(t1=ref.ScalarImage(torch.as_tensor(volume.copy())))] * b
    )
    batch_mine = tio.SubjectsBatch.from_subjects(
        [tio.Subject(t1=tio.ScalarImage(volume.copy()))] * b
    )
    t_ref = ref.Gamma(log_gamma=(0.25, 0.25))
    t_mine = tio.Gamma(log_gamma=(0.25, 0.25))
    out_ref = t_ref(batch_ref).images["t1"].data.numpy()
    out_mine = np.asarray(t_mine(batch_mine).images["t1"].data)
    assert out_ref.shape == out_mine.shape == (b, *stack.shape[1:])
    np.testing.assert_allclose(out_mine, out_ref, atol=1e-5, rtol=0)


def test_labels_to_image_golden(labels):
    """stds=0 makes the SynthSeg generative block deterministic."""
    import torch

    means = [0.1, 0.4, 0.6, 0.8, 1.0]
    stds = [0.0] * 5
    make = lambda m: m.LabelsToImage(  # noqa: E731
        "seg", image_key="synth", mean=means, std=stds
    )
    s_ref = ref.Subject(seg=ref.LabelMap(torch.as_tensor(labels.copy())))
    s_mine = tio.Subject(seg=tio.LabelMap(labels.copy()))
    out_ref = make(ref)(s_ref)["synth"].data.numpy()
    out_mine = np.asarray(make(tio)(s_mine).images["synth"].data)
    np.testing.assert_allclose(out_mine, out_ref, atol=1e-5, rtol=0)


def test_copy_affine_golden(volume):
    import torch

    affine = np.diag([2.0, 1.5, 1.0, 1.0])
    affine[:3, 3] = (4.0, -3.0, 2.5)

    s_ref = ref.Subject(
        t1=ref.ScalarImage(torch.as_tensor(volume.copy()), affine=affine),
        t2=ref.ScalarImage(torch.as_tensor(volume.copy())),
    )
    s_mine = tio.Subject(
        t1=tio.ScalarImage(volume.copy(), affine=affine),
        t2=tio.ScalarImage(volume.copy()),
    )
    out_ref = ref.CopyAffine(target="t1")(s_ref)
    out_mine = tio.CopyAffine(target="t1")(s_mine)
    np.testing.assert_allclose(
        np.asarray(out_mine.images["t2"].affine.data),
        np.asarray(out_ref.t2.affine.data),
        atol=1e-9,
    )


def test_reorient_golden(volume):
    import torch

    affine = np.diag([-1.0, 1.0, -1.0, 1.0])  # LAS-ish: flips on I and K
    affine[:3, 3] = (10.0, 0.0, 5.0)
    s_ref = ref.Subject(
        t1=ref.ScalarImage(torch.as_tensor(volume.copy()), affine=affine)
    )
    s_mine = tio.Subject(t1=tio.ScalarImage(volume.copy(), affine=affine))
    out_ref = ref.Reorient(orientation="RAS")(s_ref)
    out_mine = tio.Reorient(orientation="RAS")(s_mine)
    np.testing.assert_array_equal(
        np.asarray(out_mine.images["t1"].data), out_ref.t1.data.numpy()
    )
    np.testing.assert_allclose(
        np.asarray(out_mine.images["t1"].affine.data),
        np.asarray(out_ref.t1.affine.data),
        atol=1e-9,
    )


# --- spatial feature matrix golden tests ------------------------------------


@pytest.mark.parametrize(
    "pad_value", [0.0, "minimum", "mean", "otsu"], ids=str
)
def test_fill_policy_golden(pad_value, volume):
    make = lambda m: m.Affine(  # noqa: E731
        degrees=(12.0, 12.0),
        translation=(4.0, 4.0),
        default_pad_value=pad_value,
    )
    _run_pair(make, volume, 2e-3)


def test_nearest_interpolation_golden(volume):
    make = lambda m: m.Affine(  # noqa: E731
        degrees=(9.0, 9.0), image_interpolation="nearest"
    )
    _run_pair(make, volume, 1e-6)


def test_antialias_downsample_golden(volume):
    make = lambda m: m.Resample(target=2.0, antialias=True)  # noqa: E731
    _run_pair(make, volume, 1e-3)


@pytest.mark.parametrize("mode", ["nearest", "label"])
def test_label_interpolation_golden(mode, volume, labels):
    import torch

    make = lambda m: m.Affine(  # noqa: E731
        degrees=(10.0, 10.0), label_interpolation=mode
    )
    s_ref = ref.Subject(
        t1=ref.ScalarImage(torch.as_tensor(volume.copy())),
        seg=ref.LabelMap(torch.as_tensor(labels.copy())),
    )
    s_mine = tio.Subject(
        t1=tio.ScalarImage(volume.copy()), seg=tio.LabelMap(labels.copy())
    )
    out_ref = make(ref)(s_ref)
    out_mine = make(tio)(s_mine)
    seg_ref = out_ref.seg.data.numpy()
    seg_mine = np.asarray(out_mine.images["seg"].data)
    # label maps: voxels at region boundaries may legitimately differ when
    # interpolated weights tie within float error; demand >= 99.5% agreement
    agreement = (seg_ref == seg_mine).mean()
    assert agreement > 0.995, agreement
    np.testing.assert_allclose(
        np.asarray(out_mine.images["t1"].data),
        out_ref.t1.data.numpy(),
        atol=1e-3,
        rtol=0,
    )


def test_anisotropic_spacing_golden(volume):
    """mm-space params on a 1x1x2 mm volume: catches mm<->voxel mixups."""
    import torch

    affine = np.diag([1.0, 1.0, 2.0, 1.0])
    make = lambda m: m.Affine(  # noqa: E731
        degrees=(8.0, 8.0), translation=(3.0, 3.0)
    )
    s_ref = ref.Subject(
        t1=ref.ScalarImage(torch.as_tensor(volume.copy()), affine=affine)
    )
    s_mine = tio.Subject(t1=tio.ScalarImage(volume.copy(), affine=affine))
    out_ref = make(ref)(s_ref).t1.data.numpy()
    out_mine = np.asarray(make(tio)(s_mine).images["t1"].data)
    np.testing.assert_allclose(out_mine, out_ref, atol=1e-3, rtol=0)


def test_per_axis_degrees_golden(volume):
    make = lambda m: m.Affine(  # noqa: E731
        degrees=(4.0, 4.0, -6.0, -6.0, 11.0, 11.0)
    )
    _run_pair(make, volume, 1e-3)


def test_crop_or_pad_units_golden(volume):
    import torch

    aff = np.diag([2.0, 2.0, 2.0, 1.0])
    for kwargs in (
        {"units": "mm"},
        {"units": "cm"},
    ):
        target = 16 if kwargs["units"] == "mm" else 1.6
        s_ref = ref.Subject(
            t1=ref.ScalarImage(torch.as_tensor(volume.copy()), affine=aff)
        )
        s_mine = tio.Subject(t1=tio.ScalarImage(volume.copy(), affine=aff))
        o_ref = ref.CropOrPad(target, **kwargs)(s_ref)
        o_mine = tio.CropOrPad(target, **kwargs)(s_mine)
        np.testing.assert_array_equal(
            np.asarray(o_mine.images["t1"].data), o_ref.t1.data.numpy()
        )
        np.testing.assert_allclose(
            np.asarray(o_mine.images["t1"].affine.data),
            np.asarray(o_ref.t1.affine.data),
            atol=1e-9,
        )


def test_crop_or_pad_only_crop_golden(volume):
    import torch

    s_ref = ref.Subject(t1=ref.ScalarImage(torch.as_tensor(volume.copy())))
    s_mine = tio.Subject(t1=tio.ScalarImage(volume.copy()))
    o_ref = ref.CropOrPad((8, 20, 12), only_crop=True)(s_ref)
    o_mine = tio.CropOrPad((8, 20, 12), only_crop=True)(s_mine)
    np.testing.assert_array_equal(
        np.asarray(o_mine.images["t1"].data), o_ref.t1.data.numpy()
    )


def test_include_exclude_scoping_golden(volume):
    import torch

    t_ref = ref.Flip(axes=(0,), flip_probability=1.0, include=["a"])
    t_mine = tio.Flip(axes=(0,), flip_probability=1.0, include=["a"])
    s_ref = ref.Subject(
        a=ref.ScalarImage(torch.as_tensor(volume.copy())),
        b=ref.ScalarImage(torch.as_tensor(volume.copy())),
    )
    s_mine = tio.Subject(
        a=tio.ScalarImage(volume.copy()), b=tio.ScalarImage(volume.copy())
    )
    o_ref, o_mine = t_ref(s_ref), t_mine(s_mine)
    np.testing.assert_array_equal(
        np.asarray(o_mine.images["a"].data), o_ref.a.data.numpy()
    )
    np.testing.assert_array_equal(np.asarray(o_mine.images["b"].data), volume)
    np.testing.assert_array_equal(o_ref.b.data.numpy(), volume)


def test_compose_pipeline_golden(volume):
    """Deterministic 4-stage pipeline end-to-end + history + inverse."""
    import torch

    def pipeline(m):
        return m.Compose(
            [
                m.Flip(axes=(1,), flip_probability=1.0),
                m.Affine(degrees=(6.0, 6.0), translation=(1.0, 1.0)),
                m.Gamma(log_gamma=(0.2, 0.2)),
                m.Clamp(out_min=0.05, out_max=0.95),
            ]
        )

    s_ref = ref.Subject(t1=ref.ScalarImage(torch.as_tensor(volume.copy())))
    s_mine = tio.Subject(t1=tio.ScalarImage(volume.copy()))
    out_ref = pipeline(ref)(s_ref)
    out_mine = pipeline(tio)(s_mine)
    np.testing.assert_allclose(
        np.asarray(out_mine.images["t1"].data),
        out_ref.t1.data.numpy(),
        atol=1e-3,
        rtol=0,
    )
    names_ref = [t.name for t in out_ref.applied_transforms]
    names_mine = [t.name for t in out_mine.applied_transforms]
    assert names_ref == names_mine == ["Flip", "Affine", "Gamma", "Clamp"]
    inv_ref = out_ref.apply_inverse_transform()
    inv_mine = out_mine.apply_inverse_transform()
    np.testing.assert_allclose(
        np.asarray(inv_mine.images["t1"].data),
        inv_ref.t1.data.numpy(),
        atol=2e-3,
        rtol=0,
    )


def test_batched_spatial_golden(volume):
    """Per-instance batched Affine with degenerate ranges matches ref."""
    import torch

    b = 3
    batch_ref = ref.SubjectsBatch.from_subjects(
        [ref.Subject(t1=ref.ScalarImage(torch.as_tensor(volume.copy())))] * b
    )
    batch_mine = tio.SubjectsBatch.from_subjects(
        [tio.Subject(t1=tio.ScalarImage(volume.copy()))] * b
    )
    make = lambda m: m.Affine(  # noqa: E731
        scales=(1.05, 1.05), degrees=(7.0, 7.0)
    )
    out_ref = make(ref)(batch_ref).images["t1"].data.numpy()
    out_mine = np.asarray(make(tio)(batch_mine).images["t1"].data)
    assert out_ref.shape == out_mine.shape
    np.testing.assert_allclose(out_mine, out_ref, atol=1e-3, rtol=0)


def test_2d_image_golden():
    """(C, I, J, 1) volumes (2D images): size-1 axes never go OOB in
    grid_sample's align_corners unnormalization — kernel must match."""
    import torch

    vol2d = np.random.default_rng(15).random((1, 24, 24, 1), np.float32)
    make = lambda m: m.Affine(  # noqa: E731
        degrees=(0.0, 0.0, 0.0, 0.0, 11.0, 11.0),  # in-plane rotation
        translation=(1.0, 1.0),
    )
    _run_pair(make, vol2d, 1e-3)


def test_histogram_landmarks_training_golden(volume):
    """Nyul-Udupa training phase: averaged landmarks match the reference."""
    import torch

    rng = np.random.default_rng(31)
    arrays = [
        (rng.random(SHAPE) * (i + 1)).astype(np.float32) for i in range(3)
    ]
    from torchio.transforms.intensity.histogram_standardization import (
        compute_histogram_landmarks as ref_landmarks,
    )

    lm_ref = ref_landmarks(
        [ref.ScalarImage(torch.as_tensor(a.copy())) for a in arrays]
    )
    lm_mine = tio.compute_histogram_landmarks(
        [tio.ScalarImage(a.copy()) for a in arrays]
    )
    np.testing.assert_allclose(
        np.asarray(lm_mine, np.float64),
        np.asarray(lm_ref, np.float64),
        atol=0.5,  # percentile interpolation conventions differ slightly
        rtol=0.01,
    )


@pytest.mark.parametrize(
    "target_id",
    ["tuple-spacing", "shape-affine", "ndarray-spacing", "image-object"],
)
def test_resample_target_forms_golden(target_id, volume):
    import torch

    targets = {
        "tuple-spacing": lambda m, tm: (2.0, 1.0, 1.5),
        "ndarray-spacing": lambda m, tm: np.asarray([2.0, 2.0, 2.0]),
        "shape-affine": lambda m, tm: ((8, 8, 8), np.diag([2.0, 2.0, 2.0, 1.0])),
        "image-object": lambda m, tm: m.ScalarImage(
            tm(np.zeros((1, 6, 7, 8), np.float32)),
            affine=np.diag([2.0, 2.0, 2.0, 1.0]),
        ),
    }
    build = targets[target_id]
    out_ref = ref.Resample(target=build(ref, lambda a: torch.as_tensor(a)))(
        ref.ScalarImage(torch.as_tensor(volume.copy()))
    )
    out_mine = tio.Resample(target=build(tio, lambda a: a))(
        tio.ScalarImage(volume.copy())
    )
    rd, md = out_ref.data.numpy(), np.asarray(out_mine.data)
    assert rd.shape == md.shape
    np.testing.assert_allclose(md, rd, atol=1e-3, rtol=0)


def test_antialias_skips_label_maps_golden(volume):
    """Antialiased downsample must blur scalars but never labels."""
    import torch

    # block-structured labels: uniform-random labels put a boundary at
    # every voxel and NN rounding ties flip under float noise
    idx = np.indices(SHAPE[1:])
    block_labels = ((idx // 4).sum(axis=0) % 3).astype(np.int32)[None]
    make = lambda m: m.Resample(target=2.0, antialias=True)  # noqa: E731
    s_ref = ref.Subject(
        t1=ref.ScalarImage(torch.as_tensor(volume.copy())),
        seg=ref.LabelMap(torch.as_tensor(block_labels.copy())),
    )
    s_mine = tio.Subject(
        t1=tio.ScalarImage(volume.copy()), seg=tio.LabelMap(block_labels.copy())
    )
    out_ref, out_mine = make(ref)(s_ref), make(tio)(s_mine)
    seg_ref = out_ref.seg.data.numpy()
    seg_mine = np.asarray(out_mine.images["seg"].data)
    # integer dtype preserved and label values stay from the input set
    assert seg_mine.dtype == seg_ref.dtype == np.int32
    assert set(np.unique(seg_mine)) <= set(np.unique(block_labels))
    assert set(np.unique(seg_ref)) <= set(np.unique(block_labels))
    assert (seg_ref == seg_mine).mean() > 0.97
    np.testing.assert_allclose(
        np.asarray(out_mine.images["t1"].data),
        out_ref.t1.data.numpy(),
        atol=1e-3,
        rtol=0,
    )


def test_inverse_respects_exclude_golden(volume):
    """Inverting a scoped transform must leave excluded images untouched."""
    import torch

    make = lambda m: m.Flip(axes=(0,), flip_probability=1.0, include=["a"])  # noqa: E731
    s_ref = ref.Subject(
        a=ref.ScalarImage(torch.as_tensor(volume.copy())),
        b=ref.ScalarImage(torch.as_tensor(volume.copy())),
    )
    s_mine = tio.Subject(
        a=tio.ScalarImage(volume.copy()), b=tio.ScalarImage(volume.copy())
    )
    inv_ref = make(ref)(s_ref).apply_inverse_transform()
    inv_mine = make(tio)(s_mine).apply_inverse_transform()
    for key in ("a", "b"):
        np.testing.assert_array_equal(
            np.asarray(inv_mine.images[key].data), volume
        )
        np.testing.assert_array_equal(getattr(inv_ref, key).data.numpy(), volume)


@pytest.mark.parametrize(
    "kwargs",
    [
        {"target_shape": (10, 5, 9)},     # mixed crop+pad, odd differences
        {"target_shape": (None, 4, None)},  # None leaves axes unchanged
        {"target_shape": 13, "units": "mm"},
        {"target_shape": (9, 9, 9)},
    ],
    ids=["mixed-odd", "none-axes", "mm-units", "odd-centering"],
)
def test_crop_or_pad_centering_golden(kwargs):
    import torch

    vol = np.arange(7 * 8 * 9, dtype=np.float32).reshape(1, 7, 8, 9)
    out_ref = ref.CropOrPad(**kwargs)(ref.ScalarImage(torch.as_tensor(vol.copy())))
    out_mine = tio.CropOrPad(**kwargs)(tio.ScalarImage(vol.copy()))
    np.testing.assert_array_equal(
        np.asarray(out_mine.data), out_ref.data.numpy()
    )
    np.testing.assert_allclose(
        np.asarray(out_mine.affine.data), np.asarray(out_ref.affine.data), atol=1e-9
    )


def test_flip_anatomical_labels_golden(volume):
    import torch

    las = np.diag([-1.0, 1.0, 1.0, 1.0])
    for axes, affine in ((("L",), las), (("A",), None), (("S",), None)):
        kw = {} if affine is None else {"affine": affine}
        make = lambda m, t: m.Flip(axes=axes, flip_probability=1.0)(  # noqa: E731
            m.ScalarImage(t, **kw)
        )
        out_ref = make(ref, torch.as_tensor(volume.copy()))
        out_mine = make(tio, volume.copy())
        np.testing.assert_array_equal(
            np.asarray(out_mine.data), out_ref.data.numpy(), err_msg=str(axes)
        )


def test_masked_znorm_golden(volume):
    """Masked z-normalization with a callable mask; sample std (ddof=1)."""
    import torch

    def mask_fn(t):
        return (t > 0.5) if hasattr(t, "bool") else np.asarray(t) > 0.5

    out_ref = ref.ZNormalization(masking_method=mask_fn)(
        ref.ScalarImage(torch.as_tensor(volume.copy()))
    )
    out_mine = tio.ZNormalization(masking_method=mask_fn)(
        tio.ScalarImage(volume.copy())
    )
    np.testing.assert_allclose(
        np.asarray(out_mine.data), out_ref.data.numpy(), atol=1e-4, rtol=0
    )


# ── Goldens for the specialized resample dispatch paths ──────────────
# (separable diagonal and single-plane kernels must match the reference
# grid_sample exactly like the general gather path does)


def test_scales_only_affine_golden(volume):
    # diagonal map -> _resample_element_separable
    make = lambda m: m.Affine(  # noqa: E731
        scales=(1.2, 1.2, 0.85, 0.85, 1.0, 1.0), degrees=0.0,
        translation=(1.5, 1.5),
    )
    _run_pair(make, volume, 1e-3)


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_single_plane_rotation_golden(volume, axis):
    # rotation about exactly one axis -> _resample_element_plane
    degrees = [0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    degrees[2 * axis] = degrees[2 * axis + 1] = 12.0
    make = lambda m: m.Affine(  # noqa: E731
        degrees=tuple(degrees), translation=(1.0, 1.0)
    )
    _run_pair(make, volume, 1e-3)


def test_resample_to_spacing_golden(volume):
    import torch

    aff = np.diag([1.0, 1.0, 2.0, 1.0])
    s_ref = ref.Subject(
        t1=ref.ScalarImage(torch.as_tensor(volume.copy()), affine=aff)
    )
    s_mine = tio.Subject(t1=tio.ScalarImage(volume.copy(), affine=aff))
    o_ref = ref.Resample(target=1.0)(s_ref)
    o_mine = tio.Resample(target=1.0)(s_mine)
    np.testing.assert_allclose(
        np.asarray(o_mine.images["t1"].data),
        o_ref.t1.data.numpy(),
        atol=1e-3,
        rtol=0,
    )


def test_fused_compose_golden(volume):
    """Compose(fuse=True) vs the REFERENCE's Compose with degenerate
    (constant) parameter ranges: the fused single-program execution must
    land on the reference's numbers directly, not merely match our own
    unfused path (tests/test_fuse.py covers that leg)."""
    import torch

    def stages(m):
        return [
            m.Flip(axes=(0,), flip_probability=1.0),
            m.Gamma(log_gamma=(0.25, 0.25)),
            m.Clamp(out_min=0.1, out_max=0.9),
            m.RescaleIntensity(out_min=-1.0, out_max=1.0),
        ]

    s_ref = ref.Subject(t1=ref.ScalarImage(torch.as_tensor(volume.copy())))
    out_ref = ref.Compose(stages(ref))(s_ref)
    s_mine = tio.Subject(t1=tio.ScalarImage(volume.copy()))
    out_mine = tio.Compose(stages(tio), fuse=True)(s_mine)
    np.testing.assert_allclose(
        np.asarray(out_mine.images["t1"].data),
        out_ref.t1.data.numpy(),
        atol=1e-5,
        rtol=0,
    )
    assert [t.name for t in out_mine.applied_transforms] == [
        t.name for t in out_ref.applied_transforms
    ]
    # history replay: the fused pipeline's inverse matches the reference
    inv_ref = out_ref.apply_inverse_transform(ignore_intensity=False)
    inv_mine = out_mine.apply_inverse_transform()
    np.testing.assert_allclose(
        np.asarray(inv_mine.images["t1"].data),
        inv_ref.t1.data.numpy(),
        atol=1e-4,
        rtol=0,
    )


def test_fused_bias_field_seed_replay_golden(volume):
    """The fused BiasField's recorded seed regenerates the exact field:
    dividing the fused output by the replayed field restores the input
    bit-tight (the reference's seeded-inverse contract,
    bias_field.py:67-146)."""
    tio.seed(123)
    s = tio.Subject(t1=tio.ScalarImage(volume.copy()))
    out = tio.Compose([tio.BiasField(std=(0.4, 0.4))], fuse=True)(s)
    restored = out.apply_inverse_transform()
    np.testing.assert_allclose(
        np.asarray(restored.t1.data), volume, atol=1e-5, rtol=0
    )

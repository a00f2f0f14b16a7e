"""End-to-end system tests: the full user workflow across components.

Covers the reference's three headline workflows (SURVEY.md §3) in one
place: patch-based training (Queue), dense patch inference with
reassembly (GridSampler + PatchAggregator), and test-time augmentation
with history inversion.
"""

from __future__ import annotations

import numpy as np
import pytest

import torchio_tpu as tio


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    """Three subjects on disk with anatomy-like blobs."""
    root = tmp_path_factory.mktemp("cohort")
    rng = np.random.default_rng(42)
    subjects = []
    for i in range(3):
        shape = (1, 48, 48, 48)
        t1 = rng.random(shape, np.float32) * 0.2
        seg = np.zeros(shape, np.uint8)
        center = 24 + rng.integers(-6, 6, 3)
        ii, jj, kk = np.indices(shape[1:])
        blob = (
            (ii - center[0]) ** 2 + (jj - center[1]) ** 2 + (kk - center[2]) ** 2
        ) < 100
        seg[0][blob] = 1
        t1[0][blob] += 0.7
        tio.ScalarImage(t1).save(root / f"t1_{i}.nii.gz")
        tio.LabelMap(seg).save(root / f"seg_{i}.nii.gz")
        subjects.append(
            tio.Subject(
                t1=tio.ScalarImage(root / f"t1_{i}.nii.gz"),
                seg=tio.LabelMap(root / f"seg_{i}.nii.gz"),
            )
        )
    return subjects


def test_patch_training_epoch(cohort):
    tio.seed(7)
    augment = tio.Compose(
        [
            tio.Flip(axes=(0,), flip_probability=0.5),
            tio.Noise(std=0.02),
            tio.RescaleIntensity(out_min=0.0, out_max=1.0),
        ]
    )
    queue = tio.Queue(
        cohort,
        patch_sampler=tio.LabelSampler(patch_size=16, label_name="seg"),
        max_length=24,
        patches_per_volume=4,
        num_workers=2,
        transform=augment,
    )
    seen = 0
    for batch in tio.SubjectsLoader(queue, batch_size=6):
        data = np.asarray(batch.images["t1"].data)
        seg = np.asarray(batch.images["seg"].data)
        assert data.shape[2:] == (16, 16, 16)
        assert data.min() >= 0.0 and data.max() <= 1.0
        # LabelSampler centers patches on foreground
        assert seg.sum() > 0
        seen += batch.batch_size
    assert seen == 3 * 4


def test_dense_inference_reconstructs(cohort):
    subject = cohort[0]
    sampler = tio.GridSampler(subject, patch_size=24, patch_overlap=8)
    agg = tio.PatchAggregator(
        subject.spatial_shape, overlap_mode="hann", patch_overlap=8
    )
    for batch in tio.SubjectsLoader(sampler, batch_size=4):
        logits = np.asarray(batch.images["t1"].data)  # identity "model"
        agg.add_batch(logits, batch.metadata["patch_location"])
    out = np.asarray(agg.get_output())
    np.testing.assert_allclose(
        out, np.asarray(subject.images["t1"].data), atol=1e-5
    )


def test_tta_inverse_restores_native_space(cohort):
    tio.seed(11)
    subject = cohort[1]
    original = np.asarray(subject.images["t1"].data)
    augment = tio.Compose(
        [
            tio.Flip(axes=(1,), flip_probability=1.0),
            tio.Affine(degrees=(6.0, 6.0), translation=(2.0, 2.0)),
            tio.Gamma(log_gamma=(0.2, 0.2)),
        ]
    )
    augmented = augment(subject)
    # "predict" = identity, then map back to native space via history
    restored = augmented.apply_inverse_transform()
    got = np.asarray(restored.images["t1"].data)
    assert got.shape == original.shape
    # interior agrees (borders lose data to the affine fill)
    sl = (slice(None), *(slice(10, -10),) * 3)
    err = np.abs(got[sl] - original[sl])
    # forward + inverse = two trilinear interpolations, which smooth the
    # white-noise background (inherent, identical in the reference);
    # the smooth blob region must come back much tighter than the noise
    assert float(np.median(err)) < 0.06
    assert float(err.mean()) < 0.08
    # anatomy (bright blob) round-trips closely in aggregate
    blob = original[sl] > 0.5
    assert blob.any()
    assert abs(float(got[sl][blob].mean() - original[sl][blob].mean())) < 0.05


def test_batched_device_pipeline(cohort):
    """Batch the cohort, run a device pipeline, unbatch with history."""
    import jax.numpy as jnp

    tio.seed(3)
    batch = tio.SubjectsBatch.from_subjects(list(cohort))
    for ib in batch.images.values():
        ib.data = jnp.asarray(np.asarray(ib.data))
    pipeline = tio.Compose(
        [
            tio.Spatial(degrees=(-8.0, 8.0), max_displacement=2.0),
            tio.BiasField(std=0.3),
            tio.Noise(std=0.05),
        ],
        copy=False,
    )
    out = pipeline(batch)
    subjects = out.unbatch()
    assert len(subjects) == 3
    for s in subjects:
        names = [t.name for t in s.applied_transforms]
        assert names == ["Spatial", "BiasField", "Noise"]
        # per-element params are sliced scalars/lists, JSON-serializable
        import json

        json.dumps([t.params for t in s.applied_transforms])

"""Fused elementwise chains (Compose(fuse=True)) vs unfused execution.

The fused path must reproduce the unfused results and history exactly:
it draws from the same host RNG stream and mirrors each transform's
arithmetic op-for-op (tolerances below only allow for XLA fusion
reassociation across the former program boundaries).
"""

from __future__ import annotations

import numpy as np
import pytest

import torchio_tpu as tio
from torchio_tpu.data.batch import SubjectsBatch
from torchio_tpu.transforms import fuse as fuse_mod


def make_batch(b=3, shape=(1, 9, 10, 11), seed=0, with_labels=False):
    rng = np.random.default_rng(seed)
    subjects = []
    for _ in range(b):
        images = {"t1": tio.ScalarImage(rng.normal(size=shape).astype(np.float32))}
        if with_labels:
            images["seg"] = tio.LabelMap(
                rng.integers(0, 4, shape).astype(np.int32)
            )
        subjects.append(tio.Subject(**images))
    return SubjectsBatch.from_subjects(subjects)


def run_pair(transforms_fn, *, batch_kwargs=None, seed=7):
    """Apply the same pipeline fused and unfused from the same RNG."""
    kwargs = batch_kwargs or {}
    tio.seed(seed)
    unfused = tio.Compose(transforms_fn(), copy=False)(make_batch(**kwargs))
    tio.seed(seed)
    fused = tio.Compose(transforms_fn(), copy=False, fuse=True)(
        make_batch(**kwargs)
    )
    return unfused, fused


def assert_batches_match(unfused, fused, rtol=1e-6, atol=1e-6):
    assert set(unfused.images) == set(fused.images)
    for name in unfused.images:
        np.testing.assert_allclose(
            np.asarray(fused.images[name].data),
            np.asarray(unfused.images[name].data),
            rtol=rtol,
            atol=atol,
            err_msg=name,
        )
    assert len(unfused.applied_transforms) == len(fused.applied_transforms)
    for a, b in zip(unfused.applied_transforms, fused.applied_transforms):
        assert a.name == b.name


class TestFusedEquivalence:
    def test_config1_chain(self):
        unfused, fused = run_pair(
            lambda: [
                tio.Flip(axes=(0, 1), flip_probability=0.5),
                tio.Noise(std=0.1),
                tio.RescaleIntensity(out_min=0.0, out_max=1.0),
            ]
        )
        assert_batches_match(unfused, fused)
        names = [t.name for t in fused.applied_transforms]
        assert names == ["Flip", "Noise", "Normalize"]

    def test_history_params_match(self):
        unfused, fused = run_pair(
            lambda: [
                tio.Flip(axes=(0,), flip_probability=0.5),
                tio.Noise(std=0.2),
                tio.RescaleIntensity(out_min=-1.0, out_max=1.0),
            ]
        )
        for a, b in zip(unfused.applied_transforms, fused.applied_transforms):
            pa, pb = a.params, b.params  # resolves deferred stats
            assert set(pa) == set(pb)
            for key in pa:
                if key == "in_ranges":
                    for nm in pa[key]:
                        np.testing.assert_allclose(
                            pa[key][nm], pb[key][nm], rtol=1e-6
                        )
                else:
                    assert pa[key] == pb[key], key

    def test_gated_rows_bit_exact(self):
        # per-instance p-gating: gated-out rows must match unfused
        # bit-for-bit (noise identity via keep mask)
        unfused, fused = run_pair(
            lambda: [tio.Noise(std=0.5, p=0.5)],
            batch_kwargs={"b": 6},
            seed=3,
        )
        a = np.asarray(unfused.images["t1"].data)
        b = np.asarray(fused.images["t1"].data)
        np.testing.assert_array_equal(a, b)

    def test_gamma_scalar_and_per_element(self):
        unfused, fused = run_pair(
            lambda: [tio.Gamma(log_gamma=(-0.3, 0.3))]
        )
        assert_batches_match(unfused, fused)
        unfused, fused = run_pair(
            lambda: [tio.Gamma(log_gamma=0.2)], batch_kwargs={"b": 1}
        )
        assert_batches_match(unfused, fused)

    def test_clamp_and_explicit_rescale(self):
        unfused, fused = run_pair(
            lambda: [
                tio.Clamp(out_min=-0.5, out_max=0.5),
                tio.RescaleIntensity(
                    out_min=0.0, out_max=1.0, in_min=-0.5, in_max=0.5
                ),
            ]
        )
        assert_batches_match(unfused, fused)

    def test_rician_noise(self):
        unfused, fused = run_pair(
            lambda: [tio.Noise(std=0.1, rician=True)]
        )
        assert_batches_match(unfused, fused)

    def test_labels_flip_but_skip_intensity(self):
        unfused, fused = run_pair(
            lambda: [
                tio.Flip(axes=(2,), flip_probability=1.0),
                tio.Noise(std=0.1),
            ],
            batch_kwargs={"with_labels": True},
        )
        assert_batches_match(unfused, fused)
        np.testing.assert_array_equal(
            np.asarray(fused.images["seg"].data),
            np.asarray(unfused.images["seg"].data),
        )

    def test_nonfusable_breaks_run(self):
        # Motion's k-space segmentation has host geometry -> the chain
        # splits around it and both halves still match unfused
        unfused, fused = run_pair(
            lambda: [
                tio.Noise(std=0.1),
                tio.Motion(degrees=2, translation=1, num_transforms=1),
                tio.RescaleIntensity(out_min=0.0, out_max=1.0),
            ],
            batch_kwargs={"shape": (1, 8, 8, 8)},
        )
        assert_batches_match(unfused, fused, rtol=1e-5, atol=1e-5)
        names = [t.name for t in fused.applied_transforms]
        assert names == ["Noise", "Motion", "Normalize"]

    def test_batchwide_p_gating_skips(self):
        tio.seed(1)
        batch = make_batch()
        out = tio.Compose(
            [tio.Noise(std=0.1, p=0.0, per_instance=False)],
            copy=False,
            fuse=True,
        )(batch)
        assert out.applied_transforms == []

    def test_inverse_through_fused_history(self):
        tio.seed(5)
        batch = make_batch()
        original = np.asarray(batch.images["t1"].data).copy()
        pipeline = tio.Compose(
            [
                tio.Flip(axes=(0,), flip_probability=1.0),
                tio.RescaleIntensity(out_min=0.0, out_max=1.0),
            ],
            copy=False,
            fuse=True,
        )
        out = pipeline(batch)
        restored = out.apply_inverse_transform()
        np.testing.assert_allclose(
            np.asarray(restored.images["t1"].data), original,
            rtol=1e-4, atol=1e-5,
        )

    def test_chain_executable_reused_across_draws(self):
        tio.seed(0)
        pipeline = tio.Compose(
            [
                tio.Flip(axes=(0,), flip_probability=0.5),
                tio.Noise(std=0.1),
                tio.RescaleIntensity(out_min=0.0, out_max=1.0),
            ],
            copy=False,
            fuse=True,
        )
        pipeline(make_batch())
        n_entries = len(fuse_mod._CHAIN_CACHE)
        for _ in range(5):
            pipeline(make_batch())
        assert len(fuse_mod._CHAIN_CACHE) == n_entries

    def test_masked_normalize_not_fused(self):
        rng = np.random.default_rng(0)
        batch = make_batch(with_labels=True)
        t = tio.RescaleIntensity(out_min=0.0, out_max=1.0, masking_method="seg")
        assert not t.fusable(batch)

    def test_zero_range_warns_on_history_access(self):
        tio.seed(0)
        subjects = [
            tio.Subject(t1=tio.ScalarImage(np.zeros((1, 4, 4, 4), np.float32)))
            for _ in range(2)
        ]
        batch = SubjectsBatch.from_subjects(subjects)
        out = tio.Compose(
            [tio.RescaleIntensity(out_min=0.0, out_max=1.0)],
            copy=False,
            fuse=True,
        )(batch)
        with pytest.warns(RuntimeWarning, match="input range is zero"):
            out.applied_transforms[-1].params
        np.testing.assert_array_equal(
            np.asarray(out.images["t1"].data), 0.0
        )


class TestFusedBiasField:
    def test_bias_field_per_element(self):
        unfused, fused = run_pair(
            lambda: [tio.BiasField(std=(0.1, 0.5)), tio.Noise(std=0.05)]
        )
        assert_batches_match(unfused, fused)
        names = [t.name for t in fused.applied_transforms]
        assert names == ["BiasField", "Noise"]

    def test_bias_field_gated(self):
        unfused, fused = run_pair(
            lambda: [tio.BiasField(std=0.4, p=0.5)],
            batch_kwargs={"b": 6},
            seed=11,
        )
        np.testing.assert_array_equal(
            np.asarray(unfused.images["t1"].data),
            np.asarray(fused.images["t1"].data),
        )

    def test_bias_field_shared(self):
        unfused, fused = run_pair(
            lambda: [tio.BiasField(std=0.3, per_instance=False)],
            batch_kwargs={"b": 2},
        )
        assert_batches_match(unfused, fused)

    def test_bias_field_inverse_through_history(self):
        tio.seed(4)
        batch = make_batch()
        original = np.asarray(batch.images["t1"].data).copy()
        out = tio.Compose(
            [tio.BiasField(std=(0.2, 0.4))], copy=False, fuse=True
        )(batch)
        restored = out.apply_inverse_transform()
        np.testing.assert_allclose(
            np.asarray(restored.images["t1"].data), original,
            rtol=1e-4, atol=1e-5,
        )


class TestFusedStageEdges:
    def test_flip_static_path_single_subject(self):
        # B=1: per-instance is inactive, the static-dims branch applies
        tio.seed(2)
        sub = tio.Subject(
            t1=tio.ScalarImage(
                np.random.default_rng(0).normal(size=(1, 6, 6, 6)).astype(np.float32)
            )
        )
        tio.seed(2)
        a = tio.Compose([tio.Flip(axes=(0, 2))], copy=True)(sub)
        tio.seed(2)
        b = tio.Compose([tio.Flip(axes=(0, 2))], copy=True, fuse=True)(sub)
        np.testing.assert_array_equal(
            np.asarray(a.t1.data), np.asarray(b.t1.data)
        )

    def test_flip_static_empty_axes_identity(self):
        tio.seed(0)
        sub = tio.Subject(
            t1=tio.ScalarImage(np.ones((1, 4, 4, 4), np.float32))
        )
        out = tio.Compose(
            [tio.Flip(axes=(0,), flip_probability=0.0)], fuse=True
        )(sub)
        np.testing.assert_array_equal(np.asarray(out.t1.data), 1.0)
        assert out.applied_transforms[-1].params["axes"] == ()

    def test_fused_stage_none_without_images(self):
        seg_only = SubjectsBatch.from_subjects(
            [
                tio.Subject(
                    seg=tio.LabelMap(np.zeros((1, 4, 4, 4), np.int32))
                )
                for _ in range(2)
            ]
        )
        for t in (
            tio.Noise(std=0.1),
            tio.Gamma(log_gamma=0.1),
            tio.Clamp(out_min=0.0),
            tio.RescaleIntensity(out_min=0.0, out_max=1.0),
            tio.BiasField(std=0.2),
            tio.ZNormalization(),
            tio.Mask(masking_method="seg"),
            tio.Blur(std=0.5),
        ):
            assert not t.fusable(seg_only)
            assert t.fused_stage(seg_only) is None

    def test_base_transform_not_fusable(self):
        batch = make_batch()
        t = tio.Motion(degrees=2, translation=1, num_transforms=1)
        assert t.fusable(batch) is False
        assert t.fused_stage(batch) is None
        # Blur fuses only per-instance: the shared path stays unfused
        assert tio.Blur(std=0.5, per_instance=False).fusable(batch) is False

    def test_nnunet_percentiles_fused(self):
        # deterministic non-(0,100) percentiles ride the fused
        # quantiles_on_device path
        unfused, fused = run_pair(
            lambda: [
                tio.RescaleIntensity(
                    out_min=0.0,
                    out_max=1.0,
                    percentile_low=0.5,
                    percentile_high=99.5,
                )
            ]
        )
        assert_batches_match(unfused, fused, rtol=1e-5, atol=1e-5)

    def test_randomized_percentiles_not_fused(self):
        batch = make_batch()
        t = tio.RescaleIntensity(
            out_min=0.0, out_max=1.0,
            percentile_low=(0.0, 1.0), percentile_high=99.5,
        )
        assert not t.fusable(batch)

    def test_bias_all_identity_rows(self):
        # std=0 everywhere: the fused stage is a bit-exact identity
        tio.seed(0)
        batch = make_batch()
        before = np.asarray(batch.images["t1"].data).copy()
        out = tio.Compose([tio.BiasField(std=0.0)], copy=False, fuse=True)(
            batch
        )
        np.testing.assert_array_equal(
            np.asarray(out.images["t1"].data), before
        )


class TestRunFusedInternals:
    def test_empty_stage_list_is_identity(self):
        batch = make_batch()
        out = fuse_mod.run_fused(batch, [])
        assert out is batch

    def test_include_exclude_recorded_in_history(self):
        tio.seed(0)
        batch = make_batch(with_labels=True)
        out = tio.Compose(
            [
                tio.Noise(std=0.1, include=["t1"]),
                tio.Gamma(log_gamma=(0.1, 0.2), exclude=["seg"]),
            ],
            copy=False,
            fuse=True,
        )(batch)
        noise_trace, gamma_trace = out.applied_transforms
        assert noise_trace.include == ["t1"]
        assert gamma_trace.exclude == ["seg"]

    def test_history_attr_created_when_missing(self, monkeypatch):
        tio.seed(0)
        batch = make_batch()
        if hasattr(batch, "applied_transforms"):
            del batch.applied_transforms
        out = tio.Compose([tio.Noise(std=0.1)], copy=False, fuse=True)(batch)
        assert [t.name for t in out.applied_transforms] == ["Noise"]

    def test_flip_fused_stage_none_on_imageless(self):
        imageless = SubjectsBatch.from_subjects(
            [tio.Subject(sid=1), tio.Subject(sid=2)]
        )
        flip = tio.Flip(axes=(0,))
        assert not flip.fusable(imageless)
        assert flip.fused_stage(imageless) is None


class TestFusedBlur:
    def test_blur_per_instance_matches_unfused(self):
        unfused, fused = run_pair(
            lambda: [tio.Blur(std=(0.3, 0.9)), tio.Gamma(log_gamma=(0.05, 0.1))],
            batch_kwargs={"shape": (1, 10, 10, 10)},
        )
        assert_batches_match(unfused, fused)
        names = [t.name for t in fused.applied_transforms]
        assert names == ["Blur", "Gamma"]

    def test_blur_gated_rows_bit_exact(self):
        unfused, fused = run_pair(
            lambda: [tio.Blur(std=0.8, p=0.5)],
            batch_kwargs={"b": 6, "shape": (1, 8, 8, 8)},
            seed=13,
        )
        np.testing.assert_array_equal(
            np.asarray(unfused.images["t1"].data),
            np.asarray(fused.images["t1"].data),
        )

    def test_config2_chain_fuses_fully(self):
        unfused, fused = run_pair(
            lambda: [
                tio.Blur(std=(0.5, 1.5)),
                tio.BiasField(std=0.3),
                tio.Gamma(log_gamma=(-0.1, 0.1)),
            ],
            batch_kwargs={"b": 2, "shape": (1, 10, 10, 10)},
        )
        assert_batches_match(unfused, fused, rtol=2e-6, atol=2e-6)

    def test_blur_shared_path_not_fused(self):
        batch = make_batch(b=2)
        t = tio.Blur(std=0.5, per_instance=False)
        assert not t.fusable(batch)


class TestFusedStandardizeAndMask:
    def test_standardize_matches_unfused(self):
        unfused, fused = run_pair(
            lambda: [tio.Noise(std=0.2), tio.ZNormalization()]
        )
        assert_batches_match(unfused, fused, rtol=1e-5, atol=1e-6)
        pa = unfused.applied_transforms[-1].params["stats"]["t1"]
        pb = fused.applied_transforms[-1].params["stats"]["t1"]
        np.testing.assert_allclose(pa, pb, rtol=1e-5)

    def test_standardize_masked_by_label_key(self):
        unfused, fused = run_pair(
            lambda: [tio.ZNormalization(masking_method="seg")],
            batch_kwargs={"with_labels": True},
        )
        assert_batches_match(unfused, fused, rtol=1e-5, atol=1e-6)

    def test_standardize_zero_std_raises_from_fused_call(self):
        tio.seed(0)
        subjects = [
            tio.Subject(t1=tio.ScalarImage(np.ones((1, 4, 4, 4), np.float32)))
            for _ in range(2)
        ]
        batch = SubjectsBatch.from_subjects(subjects)
        with pytest.raises(RuntimeError, match="standard deviation"):
            tio.Compose([tio.ZNormalization()], copy=False, fuse=True)(batch)

    def test_mask_by_label_key(self):
        unfused, fused = run_pair(
            lambda: [
                tio.Mask(masking_method="seg", outside_value=-1.0),
                tio.Gamma(log_gamma=(0.1, 0.1)),
            ],
            batch_kwargs={"with_labels": True},
        )
        assert_batches_match(unfused, fused)

    def test_mask_label_subset(self):
        unfused, fused = run_pair(
            lambda: [tio.Mask(masking_method="seg", labels=[1, 3])],
            batch_kwargs={"with_labels": True},
        )
        assert_batches_match(unfused, fused)
        np.testing.assert_array_equal(
            np.asarray(fused.images["seg"].data),
            np.asarray(unfused.images["seg"].data),
        )

    def test_mask_callable_not_fused(self):
        batch = make_batch()
        t = tio.Mask(masking_method=lambda a: a > 0)
        assert not t.fusable(batch)

    def test_standardize_callable_not_fused(self):
        batch = make_batch()
        t = tio.ZNormalization(masking_method=lambda a: a > 0)
        assert not t.fusable(batch)


class TestFusedBlurSkip:
    def test_all_zero_sigma_image_skipped_in_chain(self):
        # a Blur whose drawn sigma is zero for every element skips its
        # image inside the fused program (bit-exact passthrough)
        tio.seed(0)
        batch = make_batch()
        before = np.asarray(batch.images["t1"].data).copy()
        out = tio.Compose(
            [tio.Blur(std=0.0), tio.Clamp(out_min=-10.0, out_max=10.0)],
            copy=False,
            fuse=True,
        )(batch)
        np.testing.assert_array_equal(
            np.asarray(out.images["t1"].data), np.clip(before, -10, 10)
        )

"""Sharding correctness on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import torchio_tpu as tio
from torchio_tpu.parallel.halo import halo_blur
from torchio_tpu.parallel.mesh import batch_sharding, make_mesh, shard_batch
from torchio_tpu.parallel.step import (
    augment_step,
    make_augment_step,
    sample_step_params,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 virtual CPU devices"
    return make_mesh(jax.devices())


def test_mesh_shape(mesh):
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "space")


def test_sharded_step_matches_single_device(mesh):
    tio.seed(0)
    b = 8
    spatial = (8, 16, 16)
    data = np.random.default_rng(0).random((b, 1, *spatial), np.float32)
    rotations, shifts = sample_step_params(b, degrees=10.0, translation=1.0)

    # single-device reference
    ref = np.asarray(
        augment_step(
            jnp.asarray(data), jnp.asarray(rotations), jnp.asarray(shifts),
            jnp.int32(7), bias_std=0.3, noise_std=0.05,
        )
    )

    sharded = shard_batch(jnp.asarray(data), mesh)
    step = make_augment_step(mesh)
    out = step(sharded, jnp.asarray(rotations), jnp.asarray(shifts), jnp.int32(7))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)
    # output really is sharded over the mesh
    assert out.sharding.is_equivalent_to(batch_sharding(mesh), ndim=out.ndim)


def test_halo_blur_matches_local(mesh):
    from torchio_tpu.ops.gaussian import gaussian_kernel_1d, radius_for_sigma

    b = 4
    data = np.random.default_rng(1).random((b, 1, 8, 16, 16)).astype(np.float32)
    sharded = shard_batch(jnp.asarray(data), mesh)
    out = np.asarray(halo_blur(sharded, sigma=1.5, mesh=mesh))
    # reference: 1D correlate along J with edge padding
    radius = radius_for_sigma(1.5)
    k = gaussian_kernel_1d(1.5, radius)
    padded = np.pad(data, [(0, 0), (0, 0), (0, 0), (radius, radius), (0, 0)], mode="edge")
    expected = np.zeros_like(data)
    for tap in range(2 * radius + 1):
        expected += k[tap] * padded[:, :, :, tap : tap + data.shape[3], :]
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_graft_entry_single():
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "graft_entry", Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == args[0].shape
    assert bool(jnp.isfinite(out).all())


def test_graft_entry_multichip():
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "graft_entry", Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_halo_resample_affine_matches_unsharded():
    import jax
    import jax.numpy as jnp

    from torchio_tpu.ops.resample import build_coords, resample
    from torchio_tpu.parallel import make_mesh
    from torchio_tpu.parallel.halo import halo_resample_affine
    from torchio_tpu.parallel.mesh import batch_sharding

    mesh = make_mesh(jax.devices(), space=2)
    b, c, si, sj, sk = 4, 1, 16, 32, 16
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((b, c, si, sj, sk), np.float32))

    theta = np.deg2rad(7.0)
    m = np.eye(4)
    m[0, 0] = m[1, 1] = np.cos(theta)
    m[0, 1], m[1, 0] = -np.sin(theta), np.sin(theta)
    m[:3, 3] = (1.5, -2.0, 0.5)

    expected = resample(x, build_coords((si, sj, sk), m), mode="linear", fill=0.0)

    xs = jax.device_put(x, batch_sharding(mesh))
    got = halo_resample_affine(xs, m, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5)


def test_halo_resample_rejects_oversized_halo():
    import jax
    import jax.numpy as jnp

    from torchio_tpu.parallel import make_mesh
    from torchio_tpu.parallel.halo import halo_resample_affine

    mesh = make_mesh(jax.devices(), space=2)
    x = jnp.zeros((4, 1, 8, 16, 8), jnp.float32)
    m = np.eye(4)
    m[1, 3] = 50.0  # J displacement far beyond the local shard width
    with pytest.raises(ValueError, match="[Hh]alo"):
        halo_resample_affine(x, m, mesh)


class TestShardedPublicAPI:
    """The PUBLIC transform pipeline on a mesh (VERDICT round-1 item 3):
    ``batch.shard_(mesh)`` then ``tio.Compose([...])(batch)`` must equal
    the single-device result, with outputs still on the mesh."""

    def _make_batch(self, b=8, shape=(10, 12, 14)):
        rng = np.random.default_rng(3)
        subjects = [
            tio.Subject(
                t1=tio.ScalarImage(rng.random((1, *shape)).astype(np.float32))
            )
            for _ in range(b)
        ]
        from torchio_tpu.data.batch import SubjectsBatch

        batch = SubjectsBatch.from_subjects(subjects)
        for ib in batch.images.values():
            ib.data = jnp.asarray(ib.data)
        return batch

    def _pipeline(self):
        return tio.Compose(
            [
                tio.Affine(degrees=(-10.0, 10.0), scales=(0.95, 1.05)),
                tio.BiasField(std=0.4),
                tio.Noise(std=0.05),
                tio.RescaleIntensity(out_min=0.0, out_max=1.0),
            ]
        )

    def test_sharded_compose_matches_single_device(self, mesh):
        tio.seed(42)
        ref = self._pipeline()(self._make_batch())
        ref_data = np.asarray(ref.images["t1"].data)

        tio.seed(42)
        batch = self._make_batch().shard_(mesh)
        out = self._pipeline()(batch)
        out_data = out.images["t1"].data
        assert out.images["t1"].sharding is not None
        # the result stayed on the mesh (batch axis over 'data')
        assert len(out_data.sharding.device_set) == 8
        np.testing.assert_allclose(np.asarray(out_data), ref_data, rtol=1e-5, atol=1e-5)

    def test_sharded_compose_spatial_axis(self, mesh):
        # J-axis sharding (the SP analog): stencil/gather collectives are
        # inserted by XLA; results must still match exactly.
        tio.seed(7)
        ref = self._pipeline()(self._make_batch(b=4, shape=(8, 16, 12)))
        ref_data = np.asarray(ref.images["t1"].data)

        tio.seed(7)
        batch = self._make_batch(b=4, shape=(8, 16, 12)).shard_(mesh, spatial=True)
        out = self._pipeline()(batch)
        np.testing.assert_allclose(
            np.asarray(out.images["t1"].data), ref_data, rtol=1e-5, atol=1e-5
        )

    def test_sharding_survives_deepcopy_and_copying_transform(self, mesh):
        import copy

        tio.seed(0)
        batch = self._make_batch().shard_(mesh)
        dup = copy.deepcopy(batch)
        assert dup.images["t1"].sharding is not None
        out = tio.Noise(std=0.1)(dup)  # copy=True path
        assert out.images["t1"].sharding is not None
        assert len(out.images["t1"].data.sharding.device_set) == 8

    def test_unshard(self, mesh):
        batch = self._make_batch().shard_(mesh)
        batch.unshard_()
        assert batch.images["t1"].sharding is None


class TestDistributedSubjectSampler:
    def test_disjoint_full_coverage(self):
        from torchio_tpu.parallel import DistributedSubjectSampler

        world = 4
        shards = [
            list(
                DistributedSubjectSampler(
                    10, rank=r, world_size=world, shuffle=False
                )
            )
            for r in range(world)
        ]
        # every rank sees ceil(10/4)=3; tail wraps; union covers all
        assert all(len(s) == 3 for s in shards)
        seen = set().union(*map(set, shards))
        assert seen == set(range(10))

    def test_drop_last(self):
        from torchio_tpu.parallel import DistributedSubjectSampler

        shards = [
            list(
                DistributedSubjectSampler(
                    10, rank=r, world_size=4, shuffle=False, drop_last=True
                )
            )
            for r in range(4)
        ]
        assert all(len(s) == 2 for s in shards)
        assert len(set().union(*map(set, shards))) == 8

    def test_epoch_shuffling_consistent_across_ranks(self):
        from torchio_tpu.parallel import DistributedSubjectSampler

        def shard(rank, epoch):
            s = DistributedSubjectSampler(12, rank=rank, world_size=3, seed=5)
            s.set_epoch(epoch)
            return list(s)

        # disjoint within one epoch
        e0 = [shard(r, 0) for r in range(3)]
        assert len(set().union(*map(set, e0))) == 12
        # different permutation across epochs, same across reruns
        assert shard(0, 0) == shard(0, 0)
        assert shard(0, 0) != shard(0, 1)

    def test_queue_integration(self, rng):
        from torchio_tpu.parallel import DistributedSubjectSampler

        subjects = []
        for i in range(6):
            s = tio.Subject(
                t1=tio.ScalarImage(rng.random((1, 6, 6, 6)).astype(np.float32))
            )
            s["sid"] = i
            subjects.append(s)
        seen = []
        for r in range(2):
            sampler = DistributedSubjectSampler(
                6, rank=r, world_size=2, shuffle=False
            )
            queue = tio.Queue(
                subjects,
                patch_sampler=tio.UniformSampler(patch_size=4),
                patches_per_volume=1,
                shuffle_subjects=False,
                subject_sampler=sampler,
            )
            seen.append({p.sid for p in queue})
        assert seen[0] | seen[1] == set(range(6))
        assert seen[0].isdisjoint(seen[1])


class TestShardedSeparableResample:
    """The separable (axis-aligned) resample path under sharding: the
    per-axis interpolation matmuls shard over the mesh like any matmul,
    so a sharded tio.Resample must match the single-device result."""

    def _make_batch(self, b=8):
        rng = np.random.default_rng(9)
        from torchio_tpu.core.affine import AffineMatrix

        subjects = [
            tio.Subject(
                t1=tio.ScalarImage(
                    rng.random((1, 10, 12, 6)).astype(np.float32),
                    affine=AffineMatrix.from_spacing((1.0, 1.0, 2.0)),
                )
            )
            for _ in range(b)
        ]
        from torchio_tpu.data.batch import SubjectsBatch

        batch = SubjectsBatch.from_subjects(subjects)
        for ib in batch.images.values():
            ib.data = jnp.asarray(ib.data)
        return batch

    def test_sharded_resample_matches_single_device(self, mesh):
        tio.seed(1)
        ref = tio.Resample(target=1.0)(self._make_batch())
        ref_data = np.asarray(ref.images["t1"].data)

        tio.seed(1)
        batch = self._make_batch().shard_(mesh)
        out = tio.Resample(target=1.0)(batch)
        assert np.asarray(out.images["t1"].data).shape == ref_data.shape
        np.testing.assert_allclose(
            np.asarray(out.images["t1"].data), ref_data, rtol=1e-5, atol=1e-6
        )


class TestHaloDispatch:
    """VERDICT r2 item 1: a spatially-sharded batch routes the public
    Spatial through the halo-exchange shard_map kernel — no full-volume
    all-gather — and matches the unsharded result exactly."""

    def _make_batch(self, b=4, shape=(8, 32, 12)):
        rng = np.random.default_rng(11)
        from torchio_tpu.data.batch import SubjectsBatch

        subjects = [
            tio.Subject(
                t1=tio.ScalarImage(rng.random((1, *shape)).astype(np.float32))
            )
            for _ in range(b)
        ]
        batch = SubjectsBatch.from_subjects(subjects)
        for ib in batch.images.values():
            ib.data = jnp.asarray(ib.data)
        return batch

    def test_public_spatial_uses_halo_kernel(self, mesh, monkeypatch):
        import torchio_tpu.parallel.halo as halo_mod

        calls = []
        real = halo_mod.halo_resample_spec

        def spy(*args, **kwargs):
            calls.append(kwargs.get("mode"))
            return real(*args, **kwargs)

        monkeypatch.setattr(halo_mod, "halo_resample_spec", spy)

        tio.seed(3)
        ref = tio.Spatial(
            degrees=(-10.0, 10.0), max_displacement=2.0, num_control_points=5
        )(self._make_batch())
        ref_data = np.asarray(ref.images["t1"].data)
        assert not calls  # unsharded path untouched

        tio.seed(3)
        batch = self._make_batch().shard_(mesh, spatial=True)
        out = tio.Spatial(
            degrees=(-10.0, 10.0), max_displacement=2.0, num_control_points=5
        )(batch)
        assert calls, "sharded Spatial did not route to the halo kernel"
        np.testing.assert_allclose(
            np.asarray(out.images["t1"].data), ref_data, rtol=1e-5, atol=1e-5
        )
        # output is still mesh-sharded
        assert len(out.images["t1"].data.sharding.device_set) == 8

    def test_halo_program_hlo_has_no_all_gather(self, mesh):
        """The >HBM guarantee: the compiled halo program moves only
        halo slabs (collective-permute), never the full volume."""
        from jax.sharding import NamedSharding, PartitionSpec

        from torchio_tpu.parallel.halo import _halo_resample_program

        b, c, si, sj, sk = 4, 1, 8, 32, 8
        jl = sj // mesh.shape["space"]
        bl = b // mesh.shape["data"]
        program = _halo_resample_program(
            mesh, "data", "space", (bl, c, si, jl, sk), 3, True, "linear", False
        )
        vol_sh = NamedSharding(
            mesh, PartitionSpec("data", None, None, "space", None)
        )
        elem_sh = NamedSharding(mesh, PartitionSpec("data"))
        x = jax.device_put(jnp.zeros((b, c, si, sj, sk), jnp.float32), vol_sh)
        ms = jax.device_put(
            jnp.tile(jnp.eye(4, dtype=jnp.float32), (b, 1, 1)), elem_sh
        )
        cps = jax.device_put(jnp.zeros((b, 2, 2, 2, 3), jnp.float32), elem_sh)
        fills = jax.device_put(jnp.zeros((b, c), jnp.float32), elem_sh)
        hlo = program.lower(x, ms, cps, fills).compile().as_text()
        assert "collective-permute" in hlo  # the halo exchange rides ICI
        assert "all-gather" not in hlo

    def test_label_map_partial_volume_sharded(self, mesh):
        """Partial-volume label resampling routes through the same
        dispatch; sharded result matches unsharded."""
        rng = np.random.default_rng(12)
        from torchio_tpu.data.batch import SubjectsBatch

        def make():
            subs = [
                tio.Subject(
                    seg=tio.LabelMap(
                        rng.integers(0, 4, (1, 8, 32, 8)).astype(np.int32)
                    )
                )
                for _ in range(4)
            ]
            batch = SubjectsBatch.from_subjects(subs)
            for ib in batch.images.values():
                ib.data = jnp.asarray(ib.data)
            return batch

        rng = np.random.default_rng(12)
        tio.seed(9)
        ref = tio.Affine(degrees=(-8.0, 8.0), label_interpolation="label")(make())
        rng = np.random.default_rng(12)
        tio.seed(9)
        out = tio.Affine(degrees=(-8.0, 8.0), label_interpolation="label")(
            make().shard_(mesh, spatial=True)
        )
        np.testing.assert_array_equal(
            np.asarray(out.images["seg"].data), np.asarray(ref.images["seg"].data)
        )

    def test_fallback_when_halo_too_wide(self, mesh):
        """A translation larger than the shard width falls back to the
        all-gather path with a warning — never a wrong answer."""
        tio.seed(5)
        big = dict(degrees=(25.0, 25.0), translation=(20.0, 20.0))
        ref = tio.Spatial(**big)(self._make_batch())
        tio.seed(5)
        with pytest.warns(RuntimeWarning, match="fell back"):
            out = tio.Spatial(**big)(
                self._make_batch().shard_(mesh, spatial=True)
            )
        np.testing.assert_allclose(
            np.asarray(out.images["t1"].data),
            np.asarray(ref.images["t1"].data),
            rtol=1e-5,
            atol=1e-5,
        )


def test_dryrun_private_api_pin():
    """__graft_entry__.dryrun_multichip probes jax._src.xla_bridge._backends
    to decide whether forcing the virtual CPU platform can still work
    in-process. That attribute is private; if a JAX upgrade removes or
    retypes it, this test fails LOUDLY so the driver gate cannot silently
    regress into the slow subprocess fallback (VERDICT r2 item 10)."""
    from jax._src import xla_bridge

    assert hasattr(xla_bridge, "_backends"), (
        "jax._src.xla_bridge._backends disappeared: update the probe in"
        " __graft_entry__.dryrun_multichip (and tests/conftest.py notes)"
    )
    assert isinstance(xla_bridge._backends, dict)


def test_bench_mesh_smoke(monkeypatch, capsys):
    """bench.py --mesh runs the sharded public Compose over every visible
    device and reports aggregate + per-chip throughput (VERDICT r2
    item 7: the multi-chip bench mode exists before hardware does)."""
    import importlib.util
    import json as _json
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "bench", Path(__file__).parent.parent / "bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    monkeypatch.setattr(bench, "S", 12)
    monkeypatch.setattr(bench, "B", 2)
    monkeypatch.setattr(bench, "WARMUP", 1)
    monkeypatch.setattr(bench, "ITERS", 1)
    bench.main_mesh()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    report = _json.loads(line)
    assert report["n_devices"] == 8
    assert report["value"] > 0
    assert report["per_chip_volumes_per_sec"] > 0
    assert "scaling_efficiency" in report


def test_sharded_blur_hlo_has_no_all_gather(mesh):
    """Blur/antialias on a J-sharded batch: the sharded J axis falls
    back from the MXU band matmul (which GSPMD would satisfy by
    all-gathering the volume) to the tap-slice form, which partitions
    with collective-permute halos. Pinned on the compiled program so a
    lowering regression can't silently reintroduce the >HBM-defeating
    gather (SURVEY §5.7)."""
    from jax.sharding import NamedSharding, PartitionSpec

    from torchio_tpu.ops.gaussian import (
        _blur_shared_kernel,
        gaussian_blur,
        gaussian_kernel_1d,
        sharded_spatial_axes,
    )

    sh = NamedSharding(mesh, PartitionSpec("data", None, None, "space", None))
    x = jax.device_put(jnp.ones((4, 1, 8, 32, 8), jnp.float32), sh)
    # the eager dispatcher must route the sharded J axis to tap mode
    assert sharded_spatial_axes(x) == (False, True, False)
    out = gaussian_blur(x, (1.5, 1.5, 1.5))
    assert out.shape == x.shape
    # and the compiled per-axis program for that routing has no
    # all-gather — only the halo collective-permute
    from torchio_tpu.ops.gaussian import _band_matrix

    taps = jnp.asarray(gaussian_kernel_1d(1.5, 5))
    kernel = gaussian_kernel_1d(1.5, 5)
    wi = jnp.asarray(_band_matrix(kernel, 8))
    wk = jnp.asarray(_band_matrix(kernel, 8))
    # the EXACT mixed-mode program gaussian_blur dispatches for this
    # input: mm on the unsharded I/K axes, tap on the sharded J axis
    hlo = (
        _blur_shared_kernel.lower(x, wi, taps, wk, ("mm", "tap", "mm"))
        .compile()
        .as_text()
    )
    assert "collective-permute" in hlo
    assert "all-gather" not in hlo


class TestShardedPatchInference:
    """VERDICT r4 item 3: GridSampler -> model -> PatchAggregator over a
    spatially sharded batch, one shard_map program, halo-only traffic."""

    def _volume(self, b=2, shape=(10, 48, 12), seed=21):
        rng = np.random.default_rng(seed)
        return jnp.asarray(rng.random((b, 1, *shape), np.float32))

    def _single_chip(self, vol, patch_size, overlap, mode, model=None):
        from torchio_tpu.data.aggregator import PatchAggregator
        from torchio_tpu.data.patch import PatchLocation
        from torchio_tpu.parallel.patches import grid_corners

        b = vol.shape[0]
        corners = grid_corners(vol.shape[2:], patch_size, (overlap,) * 3)
        outs = []
        for e in range(b):
            agg = PatchAggregator(vol.shape[2:], overlap_mode=mode)
            for c0 in corners:
                sl = tuple(
                    slice(int(c0[d]), int(c0[d]) + patch_size[d])
                    for d in range(3)
                )
                patch = np.asarray(vol[e])[(slice(None), *sl)]
                if model is not None:
                    patch = model(patch)
                agg.add_batch(
                    patch[None],
                    [PatchLocation(index=tuple(int(v) for v in c0),
                                   size=patch_size)],
                )
            outs.append(agg.get_output())
        return np.stack(outs)

    @pytest.mark.parametrize("mode", ["hann", "average"])
    def test_matches_single_chip(self, mesh, mode):
        from torchio_tpu.parallel.patches import sharded_grid_inference
        from torchio_tpu.parallel.mesh import batch_sharding

        vol = self._volume()
        from jax.sharding import NamedSharding, PartitionSpec

        sharded = jax.device_put(
            vol,
            NamedSharding(mesh, PartitionSpec(None, None, None, "space", None)),
        )
        out = sharded_grid_inference(
            sharded,
            mesh=mesh,
            patch_size=(6, 8, 6),
            patch_overlap=4,
            overlap_mode=mode,
        )
        expected = self._single_chip(vol, (6, 8, 6), 4, mode)
        np.testing.assert_allclose(
            np.asarray(out), expected, rtol=1e-4, atol=1e-5
        )
        assert len(out.sharding.device_set) == len(jax.devices())

    def test_model_applied_per_patch(self, mesh):
        from jax.sharding import NamedSharding, PartitionSpec

        from torchio_tpu.parallel.patches import sharded_grid_inference

        vol = self._volume(b=1)
        sharded = jax.device_put(
            vol,
            NamedSharding(mesh, PartitionSpec(None, None, None, "space", None)),
        )
        out = sharded_grid_inference(
            sharded,
            mesh=mesh,
            model_fn=lambda x: 2.0 * x + 1.0,
            patch_size=(6, 8, 6),
            patch_overlap=2,
            overlap_mode="average",
        )
        expected = self._single_chip(
            vol, (6, 8, 6), 2, "average", model=lambda p: 2.0 * p + 1.0
        )
        np.testing.assert_allclose(
            np.asarray(out), expected, rtol=1e-4, atol=1e-5
        )

    def test_hlo_has_no_all_gather(self, mesh):
        from jax.sharding import NamedSharding, PartitionSpec

        from torchio_tpu.parallel.patches import (
            _partition_corners,
            _sharded_inference_program,
            grid_corners,
        )

        b, c, si, sj, sk = 1, 1, 8, 48, 8
        jl = sj // mesh.shape["space"]
        p = (6, 8, 6)
        corners = grid_corners((si, sj, sk), p, (4, 4, 4))
        per_shard, valid = _partition_corners(
            corners, mesh.shape["space"], jl
        )
        program = _sharded_inference_program(
            mesh, "space", (b, c, si, jl, sk), p, per_shard.shape[1],
            "hann", 0, model_ref=None,
        )
        vol = jax.device_put(
            jnp.zeros((b, c, si, sj, sk), jnp.float32),
            NamedSharding(mesh, PartitionSpec(None, None, None, "space", None)),
        )
        sh_c = jax.device_put(
            jnp.asarray(per_shard),
            NamedSharding(mesh, PartitionSpec("space", None, None)),
        )
        sh_v = jax.device_put(
            jnp.asarray(valid),
            NamedSharding(mesh, PartitionSpec("space", None)),
        )
        hlo = program.lower(vol, sh_c, sh_v).compile().as_text()
        assert "collective-permute" in hlo
        assert "all-gather" not in hlo

    def test_patch_wider_than_shard_rejected(self, mesh):
        from torchio_tpu.parallel.halo import HaloUnsupported
        from torchio_tpu.parallel.patches import sharded_grid_inference

        vol = self._volume(shape=(8, 16, 8))
        with pytest.raises(HaloUnsupported, match="exceeds shard width"):
            sharded_grid_inference(
                vol, mesh=mesh, patch_size=(4, 12, 4), overlap_mode="hann"
            )

    def test_crop_mode_rejected(self, mesh):
        from torchio_tpu.parallel.halo import HaloUnsupported
        from torchio_tpu.parallel.patches import sharded_grid_inference

        with pytest.raises(HaloUnsupported, match="hann"):
            sharded_grid_inference(
                self._volume(), mesh=mesh, patch_size=4, overlap_mode="crop"
            )


class TestLargeVolumePipeline:
    """VERDICT r4 item 3 (>HBM demo): lazy file -> J-sharded mesh ->
    halo Spatial+Blur -> file, no full-volume array anywhere."""

    def test_file_to_file_matches_unsharded(self, tmp_path):
        from torchio_tpu.io.nifti import read_nifti, write_nifti
        from torchio_tpu.ops.gaussian import gaussian_kernel_1d, radius_for_sigma
        from torchio_tpu.ops.resample import build_coords, resample
        from torchio_tpu.parallel.large import process_large_volume
        from torchio_tpu.parallel.mesh import make_mesh

        rng = np.random.default_rng(3)
        shape = (12, 64, 10)
        vol = rng.random((1, *shape), np.float32)
        src = tmp_path / "big.nii"
        dst = tmp_path / "out.nii"
        write_nifti(src, vol)

        mesh = make_mesh(jax.devices(), space=8)
        theta = np.deg2rad(4.0)
        matrix = np.eye(4)
        matrix[0, 0] = matrix[1, 1] = np.cos(theta)
        matrix[0, 1], matrix[1, 0] = -np.sin(theta), np.sin(theta)
        sigma = 1.2
        out = process_large_volume(
            src, dst, mesh=mesh, matrix=matrix, sigma=sigma
        )
        # the result is J-sharded: every device holds a 1/8 slab only
        assert len(out.sharding.device_set) == 8
        assert {s.data.shape for s in out.addressable_shards} == {
            (1, 1, 12, 8, 10)
        }

        # unsharded reference: same resample, then the same J-axis blur
        ref = resample(
            jnp.asarray(vol)[None], build_coords(shape, matrix),
            mode="linear", fill=0.0,
        )
        r = radius_for_sigma(sigma, 3.0)
        k = gaussian_kernel_1d(sigma, r)
        padded = np.pad(
            np.asarray(ref), ((0, 0), (0, 0), (0, 0), (r, r), (0, 0)),
            mode="edge",
        )
        expected = sum(
            k[t] * padded[:, :, :, t : t + shape[1], :]
            for t in range(2 * r + 1)
        )
        got, affine = read_nifti(dst)
        np.testing.assert_allclose(got, expected[0], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(affine, np.eye(4))

    def test_lazy_read_is_regional(self, tmp_path, monkeypatch):
        # every device's slab comes from its own region read: the
        # backend must never be asked for the full J extent
        from torchio_tpu.io.nifti import write_nifti
        from torchio_tpu.parallel.large import shard_volume_from_file
        from torchio_tpu.parallel.mesh import make_mesh

        vol = np.random.default_rng(0).random((1, 8, 64, 8), np.float32)
        src = tmp_path / "v.nii"
        write_nifti(src, vol)
        img = tio.ScalarImage(src)
        seen = []
        orig = type(img).__getitem__

        def spy(self, index):
            seen.append(index)
            return orig(self, index)

        monkeypatch.setattr(type(img), "__getitem__", spy)
        mesh = make_mesh(jax.devices(), space=8)
        arr = shard_volume_from_file(img, mesh)
        jax.block_until_ready(arr)
        assert len(seen) == 8
        widths = sorted(
            (idx[2].stop or 64) - (idx[2].start or 0) for idx in seen
        )
        assert widths == [8] * 8
        np.testing.assert_allclose(np.asarray(arr)[0], vol, rtol=1e-6)


# --- consolidated from test_coverage_edges.py (round 5) ---
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torchio_tpu as tio
from torchio_tpu.data.batch import SubjectsBatch

def _batch_edge(rng, names=("t1",), shape=(6, 6, 6), value=None):
    kwargs = {}
    for name in names:
        if value is None:
            data = rng.random((1, *shape)).astype(np.float32)
        else:
            data = np.full((1, *shape), value, np.float32)
        cls = tio.LabelMap if name.startswith("seg") else tio.ScalarImage
        kwargs[name] = cls(jnp.asarray(data))
    return SubjectsBatch.from_subjects([tio.Subject(**kwargs)])


class TestHaloFallbacks:
    def _mesh(self):
        from torchio_tpu.parallel.mesh import make_mesh

        return make_mesh(jax.devices())

    def test_unsupported_sharding_kinds(self):
        from jax.sharding import NamedSharding, PartitionSpec

        from torchio_tpu.parallel.halo import (
            HaloUnsupported,
            halo_resample_spec,
        )

        mesh = self._mesh()
        x = jnp.zeros((4, 1, 4, 16, 4), jnp.float32)
        mats = [np.eye(4)] * 4
        cps = [None] * 4
        with pytest.raises(HaloUnsupported, match="NamedSharding"):
            halo_resample_spec(x, mats, cps, sharding="cpu")
        batch_only = NamedSharding(mesh, PartitionSpec("data"))
        with pytest.raises(HaloUnsupported, match="not spatially sharded"):
            halo_resample_spec(x, mats, cps, sharding=batch_only)
        weird = NamedSharding(
            mesh, PartitionSpec(None, "data", None, "space", None)
        )
        with pytest.raises(HaloUnsupported, match="unsupported partition"):
            halo_resample_spec(x, mats, cps, sharding=weird)

    def test_divisibility_and_matrix_count(self):
        from jax.sharding import NamedSharding, PartitionSpec

        from torchio_tpu.parallel.halo import (
            HaloUnsupported,
            halo_resample_spec,
        )

        mesh = self._mesh()
        spatial = NamedSharding(
            mesh, PartitionSpec("data", None, None, "space", None)
        )
        bad_j = jnp.zeros((4, 1, 4, 15, 4), jnp.float32)
        with pytest.raises(HaloUnsupported, match="J=15"):
            halo_resample_spec(bad_j, [np.eye(4)] * 4, [None] * 4, sharding=spatial)
        bad_b = jnp.zeros((3, 1, 4, 16, 4), jnp.float32)
        with pytest.raises(HaloUnsupported, match="B=3"):
            halo_resample_spec(bad_b, [np.eye(4)] * 3, [None] * 3, sharding=spatial)
        x = jnp.zeros((4, 1, 4, 16, 4), jnp.float32)
        with pytest.raises(HaloUnsupported, match="4x4 matrices"):
            halo_resample_spec(x, [np.eye(4)] * 2, [None] * 2, sharding=spatial)

    def test_differing_control_point_shapes(self):
        from jax.sharding import NamedSharding, PartitionSpec

        from torchio_tpu.parallel.halo import (
            HaloUnsupported,
            halo_resample_spec,
        )

        mesh = self._mesh()
        spatial = NamedSharding(
            mesh, PartitionSpec("data", None, None, "space", None)
        )
        x = jnp.zeros((4, 1, 4, 16, 4), jnp.float32)
        cps = [
            np.zeros((2, 2, 2, 3), np.float32),
            np.zeros((3, 3, 3, 3), np.float32),
            None,
            None,
        ]
        with pytest.raises(HaloUnsupported, match="control-point fields differ"):
            halo_resample_spec(x, [np.eye(4)] * 4, cps, sharding=spatial)

    def test_host_scalar_fill(self):
        """Non-zero host fill broadcasts to (B, C) rows."""
        from jax.sharding import NamedSharding, PartitionSpec

        from torchio_tpu.ops.resample import resample_fused
        from torchio_tpu.parallel.halo import halo_resample_spec

        mesh = self._mesh()
        spatial = NamedSharding(
            mesh, PartitionSpec("data", None, None, "space", None)
        )
        rng = np.random.default_rng(0)
        x = rng.random((4, 1, 4, 16, 4)).astype(np.float32)
        m = np.eye(4)
        m[1, 3] = 2.5
        ref = np.asarray(
            resample_fused(
                jnp.asarray(x), [m] * 4, [None] * 4, fill=7.5, use_f16=False
            )
        )
        xs = jax.device_put(jnp.asarray(x), spatial)
        got = np.asarray(
            halo_resample_spec(xs, [m] * 4, [None] * 4, sharding=spatial, fill=7.5)
        )
        np.testing.assert_allclose(got, ref, atol=1e-5)


# --- consolidated from test_coverage_edges2.py (round 5) ---
import gzip
import warnings
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torchio_tpu as tio


class TestHaloEdges:
    def test_indivisible_j_raises(self, rng):
        from jax.sharding import Mesh

        from torchio_tpu.parallel.halo import halo_resample_affine

        devs = np.array(jax.devices()[:2]).reshape(1, 2)
        mesh = Mesh(devs, ("data", "space"))
        data = jnp.zeros((2, 1, 8, 9, 8), jnp.float32)  # J=9 % 2 != 0
        with pytest.raises(ValueError, match="not divisible"):
            halo_resample_affine(data, np.eye(4), mesh)


# --- consolidated from test_coverage_edges7.py (round 5) ---
import numpy as np
import pytest
import jax.numpy as jnp
import torchio_tpu as tio
from torchio_tpu.data.batch import SubjectsBatch

def _batch_edge7(rng, n=2, shape=(1, 6, 6, 6), label=False):
    subjects = []
    for _ in range(n):
        if label:
            img = tio.LabelMap(rng.integers(0, 3, shape).astype(np.int32))
        else:
            img = tio.ScalarImage(rng.random(shape).astype(np.float32))
        subjects.append(tio.Subject(img=img))
    return SubjectsBatch.from_subjects(subjects)


class TestHaloSlabUpsample:
    def test_singleton_axes_match_global_upsample(self, rng):
        from torchio_tpu.ops.resample import upsample_field
        from torchio_tpu.parallel.halo import _upsample_field_slab

        cp = rng.uniform(-2.0, 2.0, (3, 3, 3, 3)).astype(np.float32)
        for out_shape in [(1, 4, 1), (4, 1, 4)]:
            io_, jo, ko = out_shape
            full = np.asarray(upsample_field(jnp.asarray(cp), out_shape))
            slab = np.asarray(
                _upsample_field_slab(cp, out_shape, 0, jo)
            )
            np.testing.assert_allclose(slab, full, atol=1e-5)

class TestShardAxisProbe:
    def test_named_sharding_space_axis(self):
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        from torchio_tpu.transforms.spatial.spatial import _spatial_shard_axis

        devices = np.array(jax.devices()[:2]).reshape(2)
        mesh = Mesh(devices, ("space",))
        sharding = NamedSharding(
            mesh, PartitionSpec(None, None, None, "space", None)
        )
        assert _spatial_shard_axis(sharding) == "space"
        assert _spatial_shard_axis(object()) is None


class TestLargeVolumeGuards:
    def test_indivisible_j_raises(self, tmp_path):
        from torchio_tpu.io.nifti import write_nifti
        from torchio_tpu.parallel.large import shard_volume_from_file
        from torchio_tpu.parallel.mesh import make_mesh

        vol = np.zeros((1, 4, 10, 4), np.float32)  # J=10, 8 shards
        src = tmp_path / "v.nii"
        write_nifti(src, vol)
        mesh = make_mesh(jax.devices(), space=8)
        with pytest.raises(ValueError, match="not divisible"):
            shard_volume_from_file(tio.ScalarImage(src), mesh)

    def test_write_default_affine_and_multichannel(self, tmp_path):
        from jax.sharding import NamedSharding, PartitionSpec

        from torchio_tpu.io.nifti import read_nifti
        from torchio_tpu.parallel.large import write_volume_sharded
        from torchio_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(jax.devices(), space=8)
        data = np.random.default_rng(0).random((1, 2, 4, 16, 4)).astype(
            np.float32
        )
        sharded = jax.device_put(
            jnp.asarray(data),
            NamedSharding(mesh, PartitionSpec(None, None, None, "space", None)),
        )
        out = tmp_path / "mc.nii"
        write_volume_sharded(out, sharded)  # affine defaults to identity
        got, affine = read_nifti(out)
        np.testing.assert_allclose(got, data[0], rtol=1e-6)
        np.testing.assert_allclose(affine, np.eye(4))


class TestShardedPatchGuards:
    def test_int_patch_size_and_indivisible_j(self, mesh):
        from torchio_tpu.parallel.halo import HaloUnsupported
        from torchio_tpu.parallel.patches import sharded_grid_inference

        vol = jnp.zeros((1, 1, 8, 48, 8), jnp.float32)
        out = sharded_grid_inference(
            vol, mesh=mesh, patch_size=4, patch_overlap=2,
            overlap_mode="average",
        )
        assert out.shape == vol.shape

        with pytest.raises(HaloUnsupported, match="not divisible"):
            sharded_grid_inference(
                jnp.zeros((1, 1, 8, 47, 8), jnp.float32),
                mesh=mesh,
                patch_size=4,
                overlap_mode="average",
            )

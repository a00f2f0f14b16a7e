"""Patch pipeline: samplers, queue, aggregator, loaders."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchio_tpu as tio


@pytest.fixture
def subject(rng):
    data = rng.normal(size=(1, 16, 18, 20)).astype(np.float32)
    seg = np.zeros((1, 16, 18, 20), np.int32)
    seg[0, 6:10, 6:10, 6:10] = 1
    return tio.Subject(t1=tio.ScalarImage(data), seg=tio.LabelMap(seg))


class TestGridSampler:
    def test_covers_volume(self, subject):
        sampler = tio.GridSampler(subject, patch_size=8, patch_overlap=0)
        seen = np.zeros(subject.spatial_shape, bool)
        for patch in sampler:
            loc = patch.patch_location
            si, sj, sk = loc.to_slices()
            seen[si, sj, sk] = True
        assert seen.all()

    def test_patch_contents(self, subject):
        sampler = tio.GridSampler(subject, patch_size=8)
        patch = sampler[0]
        np.testing.assert_array_equal(
            np.asarray(patch.t1.data),
            np.asarray(subject.t1.data)[:, :8, :8, :8],
        )
        assert patch.t1.shape == (1, 8, 8, 8)

    def test_overlap_steps(self, subject):
        s0 = tio.GridSampler(subject, patch_size=8, patch_overlap=0)
        s4 = tio.GridSampler(subject, patch_size=8, patch_overlap=4)
        assert len(s4) > len(s0)

    def test_padding(self, subject):
        sampler = tio.GridSampler(
            subject, patch_size=8, patch_overlap=4, padding_mode="constant"
        )
        padded_shape = sampler.subject.spatial_shape
        assert padded_shape == (20, 22, 24)


class TestRandomSamplers:
    def test_uniform_in_bounds(self, subject):
        sampler = tio.UniformSampler(subject, patch_size=8, num_patches=10)
        patches = list(sampler)
        assert len(patches) == 10
        for p in patches:
            assert p.t1.shape == (1, 8, 8, 8)
            idx = p.patch_location.index
            for d in range(3):
                assert 0 <= idx[d] <= subject.spatial_shape[d] - 8

    def test_label_sampler_centers_on_labels(self, subject):
        sampler = tio.LabelSampler(
            subject, patch_size=8, label_name="seg", num_patches=20
        )
        for p in sampler:
            # patch must contain labeled voxels (center was on a label)
            assert np.asarray(p.seg.data).sum() > 0

    def test_weighted_sampler(self, subject, rng):
        prob = np.zeros((1, 16, 18, 20), np.float32)
        prob[0, 8, 9, 10] = 1.0
        subject["prob"] = tio.ScalarImage(prob)
        sampler = tio.WeightedSampler(
            subject, patch_size=4, probability_map="prob", num_patches=5
        )
        for p in sampler:
            # the only nonzero-probability center is (8, 9, 10)
            assert p.patch_location.index == (6, 7, 8)

    def test_weighted_all_zero_raises(self, subject):
        subject["prob"] = tio.ScalarImage(np.zeros((1, 16, 18, 20), np.float32))
        sampler = tio.WeightedSampler(
            subject, patch_size=4, probability_map="prob", num_patches=1
        )
        with pytest.raises(RuntimeError):
            next(iter(sampler))


class TestQueue:
    def _subjects(self, rng, n=4):
        return [
            tio.Subject(t1=tio.ScalarImage(rng.normal(size=(1, 12, 12, 12)).astype(np.float32)))
            for _ in range(n)
        ]

    def test_sync_counts(self, rng):
        subjects = self._subjects(rng)
        queue = tio.Queue(
            subjects,
            patch_sampler=tio.UniformSampler(patch_size=4),
            max_length=16,
            patches_per_volume=5,
            num_workers=0,
        )
        patches = list(queue)
        assert len(patches) == 20
        assert queue.patches_per_epoch == 20

    def test_threaded_counts(self, rng):
        subjects = self._subjects(rng)
        queue = tio.Queue(
            subjects,
            patch_sampler=tio.UniformSampler(patch_size=4),
            max_length=8,
            patches_per_volume=5,
            num_workers=2,
        )
        assert len(list(queue)) == 20

    def test_transform_applied(self, rng):
        subjects = self._subjects(rng, 2)
        queue = tio.Queue(
            subjects,
            patch_sampler=tio.UniformSampler(patch_size=4),
            patches_per_volume=2,
            transform=tio.Lambda(lambda t: t * 0),
            shuffle_subjects=False,
        )
        for patch in queue:
            assert (np.asarray(patch.t1.data) == 0).all()

    def test_distributed_sharding(self, rng):
        """Two ranks with disjoint index shards see disjoint subjects
        (the reference's simulated-distributed strategy)."""
        subjects = self._subjects(rng, 4)
        for i, s in enumerate(subjects):
            s["sid"] = i
        shard_a, shard_b = [0, 1], [2, 3]
        seen = []
        for shard in (shard_a, shard_b):
            queue = tio.Queue(
                subjects,
                patch_sampler=tio.UniformSampler(patch_size=4),
                patches_per_volume=1,
                shuffle_subjects=False,
                subject_sampler=shard,
            )
            seen.append({p.sid for p in queue})
        assert seen[0] == {0, 1}
        assert seen[1] == {2, 3}

    def test_sampler_and_shuffle_conflict(self, rng):
        with pytest.raises(ValueError):
            tio.Queue(
                self._subjects(rng, 2),
                patch_sampler=tio.UniformSampler(patch_size=4),
                subject_sampler=[0],
                shuffle_subjects=True,
            )

    def test_memory_estimate(self, rng):
        queue = tio.Queue(
            self._subjects(rng, 2),
            patch_sampler=tio.UniformSampler(patch_size=4),
            max_length=10,
        )
        assert queue.max_memory == 4 * 1 * 64 * 10
        assert "KiB" in queue.max_memory_pretty


class TestAggregator:
    def test_average_roundtrip(self, subject):
        sampler = tio.GridSampler(subject, patch_size=8, patch_overlap=4)
        loader = tio.SubjectsLoader(sampler, batch_size=3)
        agg = tio.PatchAggregator(subject.spatial_shape, overlap_mode="average")
        for batch in loader:
            locations = batch.metadata["patch_location"]
            agg.add_batch(batch.images["t1"].data, locations)
        out = agg.get_output()
        np.testing.assert_allclose(out, np.asarray(subject.t1.data), rtol=1e-4, atol=1e-5)

    def test_hann_roundtrip(self, subject):
        sampler = tio.GridSampler(subject, patch_size=8, patch_overlap=4)
        agg = tio.PatchAggregator(subject.spatial_shape, overlap_mode="hann")
        for patch in sampler:
            agg.add_batch(
                np.asarray(patch.t1.data)[None], [patch.patch_location]
            )
        out = agg.get_output()
        np.testing.assert_allclose(out, np.asarray(subject.t1.data), rtol=1e-3, atol=1e-4)

    def test_crop_roundtrip(self, subject):
        overlap = 4
        sampler = tio.GridSampler(subject, patch_size=8, patch_overlap=overlap)
        agg = tio.PatchAggregator(
            subject.spatial_shape, overlap_mode="crop", patch_overlap=overlap
        )
        for patch in sampler:
            agg.add_batch(np.asarray(patch.t1.data)[None], [patch.patch_location])
        out = agg.get_output()
        np.testing.assert_allclose(out, np.asarray(subject.t1.data), rtol=1e-5)

    def test_get_output_device(self, subject):
        import jax

        sampler = tio.GridSampler(subject, patch_size=8, patch_overlap=4)
        agg = tio.PatchAggregator(subject.spatial_shape, overlap_mode="hann")
        for patch in sampler:
            agg.add_batch(
                np.asarray(patch.t1.data)[None], [patch.patch_location]
            )
        dev = agg.get_output(device=True)
        assert isinstance(dev, jax.Array)
        np.testing.assert_allclose(
            np.asarray(dev), agg.get_output(), rtol=0, atol=0
        )

    def test_crop_device_output_survives_donation(self, subject):
        # crop mode has no normalize copy, so get_output(device=True)
        # must hand back a fresh buffer: a later add_batch donates the
        # internal one, which would otherwise delete the caller's array
        sampler = tio.GridSampler(subject, patch_size=8)
        agg = tio.PatchAggregator(subject.spatial_shape, overlap_mode="crop")
        batches = [
            (np.asarray(p.t1.data)[None], [p.patch_location]) for p in sampler
        ]
        for data, locs in batches:
            agg.add_batch(data, locs)
        dev = agg.get_output(device=True)
        for data, locs in batches:
            agg.add_batch(data, locs)
        np.testing.assert_allclose(
            np.asarray(dev), np.asarray(subject.t1.data), rtol=1e-5
        )

    def test_uneven_flush_lengths_bucket(self, subject):
        # distinct pending totals (odd splits, partial final batches)
        # pad to bucketed scan lengths; results stay exact
        sampler = tio.GridSampler(subject, patch_size=8, patch_overlap=4)
        patches = list(sampler)
        agg = tio.PatchAggregator(subject.spatial_shape, overlap_mode="hann")
        start = 0
        for count in (1, 3, 5, len(patches)):
            chunk = patches[start : start + count]
            if not chunk:
                break
            agg.add_batch(
                np.stack([np.asarray(p.t1.data) for p in chunk]),
                [p.patch_location for p in chunk],
            )
            start += len(chunk)
        out = agg.get_output()
        np.testing.assert_allclose(
            out, np.asarray(subject.t1.data), rtol=1e-3, atol=1e-4
        )

    def test_multi_output_dict(self, subject):
        sampler = tio.GridSampler(subject, patch_size=8)
        agg = tio.PatchAggregator(subject.spatial_shape, overlap_mode="average")
        for patch in sampler:
            data = np.asarray(patch.t1.data)[None]
            agg.add_batch({"pred": data, "aux": data * 2}, [patch.patch_location])
        np.testing.assert_allclose(
            agg.get_output("aux"), 2 * agg.get_output("pred"), rtol=1e-5
        )

    def test_output_shape_scaling(self, subject):
        sampler = tio.GridSampler(subject, patch_size=8)
        half_shape = tuple(s // 2 for s in subject.spatial_shape)
        agg = tio.PatchAggregator(
            subject.spatial_shape, overlap_mode="average", output_shape=half_shape
        )
        for patch in sampler:
            downsampled = np.asarray(patch.t1.data)[:, ::2, ::2, ::2][None]
            agg.add_batch(downsampled, [patch.patch_location])
        out = agg.get_output()
        assert out.shape == (1, *half_shape)

    def test_missing_key(self, subject):
        agg = tio.PatchAggregator(subject.spatial_shape)
        with pytest.raises(KeyError):
            agg.get_output()


class TestLoader:
    def test_subjects_loader_batches(self, rng):
        subjects = [
            tio.Subject(t1=tio.ScalarImage(rng.normal(size=(1, 4, 4, 4)).astype(np.float32)))
            for _ in range(5)
        ]
        loader = tio.SubjectsLoader(subjects, batch_size=2)
        batches = list(loader)
        assert len(batches) == 3
        assert batches[0].batch_size == 2
        assert batches[-1].batch_size == 1
        assert len(loader) == 3

    def test_drop_last(self, rng):
        subjects = [
            tio.Subject(t1=tio.ScalarImage(rng.normal(size=(1, 4, 4, 4)).astype(np.float32)))
            for _ in range(5)
        ]
        loader = tio.SubjectsLoader(subjects, batch_size=2, drop_last=True)
        assert len(list(loader)) == 2

    def test_worker_readahead_is_bounded(self, rng):
        # With a slow consumer, the thread pool must not race ahead and
        # materialize the whole dataset: at most num_workers + 2 items
        # may be loaded but not yet consumed.
        num_workers = 2
        loaded = []
        consumed = [0]
        max_outstanding = [0]

        class Tracking:
            def __len__(self):
                return 32

            def __getitem__(self, i):
                loaded.append(i)
                outstanding = len(loaded) - consumed[0]
                max_outstanding[0] = max(max_outstanding[0], outstanding)
                return tio.Subject(
                    t1=tio.ScalarImage(np.zeros((1, 2, 2, 2), np.float32))
                )

        loader = tio.SubjectsLoader(
            Tracking(), batch_size=1, num_workers=num_workers
        )
        for _ in loader:
            consumed[0] += 1
        assert consumed[0] == 32
        # window(num_workers + 2) items may be in flight ahead of the
        # consumer, plus num_workers threads may each have begun one more.
        assert max_outstanding[0] <= num_workers + 2 + num_workers

    def test_queue_to_loader_end_to_end(self, rng):
        subjects = [
            tio.Subject(t1=tio.ScalarImage(rng.normal(size=(1, 12, 12, 12)).astype(np.float32)))
            for _ in range(3)
        ]
        queue = tio.Queue(
            subjects,
            patch_sampler=tio.UniformSampler(patch_size=6),
            patches_per_volume=4,
            transform=tio.Noise(std=0.1),
        )
        loader = tio.SubjectsLoader(queue, batch_size=4)
        total = 0
        for batch in loader:
            assert batch.images["t1"].data.shape[1:] == (1, 6, 6, 6)
            total += batch.batch_size
        assert total == 12


class TestDevicePatches:
    """On-device batched patch extraction + ring buffer
    (the BASELINE.json on-device patch queue north star)."""

    def test_extract_patches_matches_host_slicing(self, rng):
        import jax.numpy as jnp

        from torchio_tpu.ops.patches import extract_patches

        vol = rng.normal(size=(2, 16, 18, 20)).astype(np.float32)
        corners = np.asarray(
            [[0, 0, 0], [8, 10, 12], [3, 5, 7]], np.int32
        )
        got = np.asarray(extract_patches(jnp.asarray(vol), corners, (8, 8, 8)))
        assert got.shape == (3, 2, 8, 8, 8)
        for n, (i, j, k) in enumerate(corners):
            np.testing.assert_array_equal(
                got[n], vol[:, i : i + 8, j : j + 8, k : k + 8]
            )

    def test_ring_buffer_push_sample(self, rng):
        import torchio_tpu as tio_pkg  # noqa: F401

        from torchio_tpu.ops.patches import RingPatchBuffer

        buf = RingPatchBuffer(capacity=8, patch_shape=(1, 2, 2, 2))
        batch1 = rng.normal(size=(5, 1, 2, 2, 2)).astype(np.float32)
        buf.push(batch1)
        assert buf.filled == 5
        out = np.asarray(buf.sample(16, seed=0))
        assert out.shape == (16, 1, 2, 2, 2)
        # every sample must be one of the pushed patches
        flat_pushed = batch1.reshape(5, -1)
        for row in out.reshape(16, -1):
            assert any(np.allclose(row, p) for p in flat_pushed)
        # wrap-around overwrites the oldest entries
        batch2 = rng.normal(size=(6, 1, 2, 2, 2)).astype(np.float32)
        buf.push(batch2)
        assert buf.filled == 8

    def test_queue_device_path_matches_host_path(self, rng):
        import jax.numpy as jnp

        data = rng.normal(size=(1, 12, 12, 12)).astype(np.float32)
        seg = np.zeros((1, 12, 12, 12), np.int32)
        seg[0, 3:9, 3:9, 3:9] = 1

        def run(device: bool):
            tio.seed(5)
            conv = (lambda a: jnp.asarray(a)) if device else (lambda a: a)
            subject = tio.Subject(
                t1=tio.ScalarImage(conv(data.copy())),
                seg=tio.LabelMap(conv(seg.copy())),
            )
            queue = tio.Queue(
                [subject],
                patch_sampler=tio.LabelSampler(patch_size=6, label_name="seg"),
                patches_per_volume=4,
                shuffle_subjects=False,
                shuffle_patches=False,
            )
            return list(queue)

        host = run(False)
        dev = run(True)
        assert len(host) == len(dev) == 4
        for h, d in zip(host, dev):
            np.testing.assert_allclose(
                np.asarray(d.t1.data), np.asarray(h.t1.data)
            )
            assert isinstance(d.seg, tio.LabelMap)
            np.testing.assert_allclose(
                d.t1.affine.data, h.t1.affine.data
            )
            assert (
                d.metadata["patch_location"].index
                == h.metadata["patch_location"].index
            )


class TestTorchDataLoaderInterop:
    """collate_subjects works as torch DataLoader collate_fn (the
    migration path promised in docs/get-started/migration.md)."""

    def test_collate_in_torch_loader(self, rng):
        torch = pytest.importorskip("torch")
        from torch.utils.data import DataLoader

        import torchio_tpu as tio

        subjects = [
            tio.Subject(
                t1=tio.ScalarImage(rng.random((1, 8, 8, 8)).astype(np.float32))
            )
            for _ in range(6)
        ]
        loader = DataLoader(
            subjects, batch_size=3, collate_fn=tio.collate_subjects
        )
        batches = list(loader)
        assert len(batches) == 2
        assert all(isinstance(b, tio.SubjectsBatch) for b in batches)
        assert batches[0].t1.data.shape == (3, 1, 8, 8, 8)

    def test_queue_through_torch_loader(self, rng):
        torch = pytest.importorskip("torch")
        from torch.utils.data import DataLoader

        import torchio_tpu as tio

        subjects = [
            tio.Subject(
                t1=tio.ScalarImage(rng.random((1, 16, 16, 16)).astype(np.float32)),
                seg=tio.LabelMap(
                    (rng.random((1, 16, 16, 16)) > 0.5).astype(np.uint8)
                ),
            )
            for _ in range(2)
        ]
        queue = tio.Queue(
            subjects,
            tio.UniformSampler(patch_size=8),
            max_length=8,
            patches_per_volume=2,
            shuffle_subjects=False,
        )
        loader = DataLoader(queue, batch_size=2, collate_fn=tio.collate_subjects)
        batch = next(iter(loader))
        assert batch.t1.data.shape == (2, 1, 8, 8, 8)

    def test_grid_sampler_through_torch_loader(self, rng):
        torch = pytest.importorskip("torch")
        from torch.utils.data import DataLoader

        import torchio_tpu as tio

        subject = tio.Subject(
            t1=tio.ScalarImage(rng.random((1, 16, 16, 16)).astype(np.float32))
        )
        sampler = tio.GridSampler(subject, patch_size=8)
        loader = DataLoader(sampler, batch_size=4, collate_fn=tio.collate_subjects)
        batches = list(loader)
        assert sum(b.batch_size for b in batches) == len(sampler)
        assert batches[0].t1.data.shape == (4, 1, 8, 8, 8)


class TestExtractPatchesEdges:
    def test_corner_at_volume_edge(self, rng):
        import jax.numpy as jnp

        from torchio_tpu.ops.patches import extract_patches

        vol = jnp.asarray(rng.random((1, 8, 8, 8)).astype(np.float32))
        corners = jnp.asarray([[4, 4, 4], [0, 0, 0]], jnp.int32)
        out = extract_patches(vol, corners, (4, 4, 4))
        assert out.shape == (2, 1, 4, 4, 4)
        np.testing.assert_array_equal(
            np.asarray(out[0]), np.asarray(vol[:, 4:8, 4:8, 4:8])
        )

    def test_single_corner(self, rng):
        import jax.numpy as jnp

        from torchio_tpu.ops.patches import extract_patches

        vol = jnp.asarray(rng.random((2, 6, 6, 6)).astype(np.float32))
        out = extract_patches(vol, jnp.asarray([[1, 2, 3]], jnp.int32), (2, 2, 2))
        np.testing.assert_array_equal(
            np.asarray(out[0]), np.asarray(vol[:, 1:3, 2:4, 3:5])
        )


class TestRingBufferEdges:
    def test_sample_before_fill_uses_filled_region(self, rng):
        import jax.numpy as jnp

        from torchio_tpu.ops.patches import RingPatchBuffer

        buf = RingPatchBuffer(capacity=8, patch_shape=(1, 2, 2, 2))
        patches = jnp.asarray(
            np.arange(2 * 1 * 2 * 2 * 2, dtype=np.float32).reshape(2, 1, 2, 2, 2)
        )
        buf.push(patches)
        assert buf.filled == 2
        sampled = buf.sample(4, seed=0)
        assert sampled.shape == (4, 1, 2, 2, 2)
        # every sampled patch equals one of the two pushed patches
        flat = np.asarray(sampled).reshape(4, -1)
        pool = np.asarray(patches).reshape(2, -1)
        for row in flat:
            assert any(np.array_equal(row, p) for p in pool)

    def test_wraparound_overwrites_oldest(self, rng):
        import jax.numpy as jnp

        from torchio_tpu.ops.patches import RingPatchBuffer

        buf = RingPatchBuffer(capacity=3, patch_shape=(1, 1, 1, 1))
        for v in range(5):
            buf.push(jnp.full((1, 1, 1, 1, 1), float(v)))
        assert buf.filled == 3
        values = {float(np.asarray(buf._buffer[i]).ravel()[0]) for i in range(3)}
        assert values == {2.0, 3.0, 4.0}


class TestDeviceBatches:
    """Queue.device_batches: the ring-buffered on-device patch pipeline
    (VERDICT r2 item 2 — the BASELINE north star as the default device
    path, not a side demo)."""

    def _subjects(self, n=4, shape=(12, 12, 12), with_label=True):
        import torchio_tpu as tio

        rng = np.random.default_rng(21)
        subjects = []
        for i in range(n):
            base = rng.random((1, *shape)).astype(np.float32)
            kwargs = {"t1": tio.ScalarImage(jnp.asarray(base))}
            if with_label:
                seg = (base > 0.5).astype(np.int32)
                kwargs["seg"] = tio.LabelMap(jnp.asarray(seg))
            s = tio.Subject(**kwargs)
            s["sid"] = i
            subjects.append(s)
        return subjects

    def _queue(self, subjects, **kwargs):
        import torchio_tpu as tio

        defaults = dict(
            patch_sampler=tio.UniformSampler(patch_size=6),
            max_length=16,
            patches_per_volume=4,
            shuffle_subjects=False,
        )
        defaults.update(kwargs)
        return tio.Queue(subjects, **defaults)

    def test_yields_device_batches_with_aligned_images(self):
        queue = self._queue(self._subjects())
        batches = list(queue.device_batches(batch_size=4))
        # 4 subjects x 4 patches / batch 4 = 4 batches
        assert len(batches) == 4
        for batch in batches:
            t1 = batch.images["t1"]
            seg = batch.images["seg"]
            assert isinstance(t1.data, jax.Array)
            assert t1.data.shape == (4, 1, 6, 6, 6)
            assert seg.data.shape == (4, 1, 6, 6, 6)
            # alignment: seg was built as (t1 > 0.5), and both images of
            # one patch come from the SAME ring slot
            np.testing.assert_array_equal(
                np.asarray(seg.data),
                (np.asarray(t1.data) > 0.5).astype(np.int32),
            )
            # metadata rides along
            assert len(batch.metadata["patch_location"]) == 4
            assert all(m in range(4) for m in batch.metadata["sid"])

    def test_patch_affines_shifted_by_corner(self):
        queue = self._queue(self._subjects(n=1, with_label=False))
        (batch,) = list(queue.device_batches(batch_size=4))
        for aff, loc in zip(
            batch.images["t1"].affines, batch.metadata["patch_location"]
        ):
            np.testing.assert_allclose(
                np.asarray(aff.data)[:3, 3], np.asarray(loc.index, np.float64)
            )

    def test_no_patch_voxels_leave_device(self):
        """A full epoch under a strict device->host transfer guard: only
        the samplers' explicitly-allowed tiny index/total pulls may
        cross; patch voxels never do."""
        import torchio_tpu as tio

        subjects = self._subjects(n=2)
        queue = self._queue(
            subjects,
            patch_sampler=tio.LabelSampler(patch_size=6, label_name="seg"),
        )
        with jax.transfer_guard_device_to_host("disallow"):
            batches = list(queue.device_batches(batch_size=4))
        assert len(batches) == 2
        for batch in batches:
            assert isinstance(batch.images["t1"].data, jax.Array)

    def test_ring_buffer_is_the_store(self, monkeypatch):
        """The pool really is the donated HBM ring buffer."""
        from torchio_tpu.ops import patches as patches_mod

        pushes = []
        real_push = patches_mod.RingPatchBuffer.push

        def spy(self, value):
            pushes.append(int(value.shape[0]))
            return real_push(self, value)

        monkeypatch.setattr(patches_mod.RingPatchBuffer, "push", spy)
        queue = self._queue(self._subjects(n=2, with_label=False))
        list(queue.device_batches(batch_size=4))
        assert pushes == [4, 4]  # one push per subject, all patches at once

    def test_threaded_prefetch(self):
        queue = self._queue(self._subjects(n=4), num_workers=2)
        batches = list(queue.device_batches(batch_size=4))
        assert len(batches) == 4

    def test_host_subjects_staged_without_mutation(self):
        """Host-resident (numpy) subjects ride the double-buffered
        device_put stage: batches come out device-resident and correct,
        and the user's subjects keep their original numpy data."""
        import torchio_tpu as tio

        rng = np.random.default_rng(5)
        arrays = [rng.random((1, 12, 12, 12)).astype(np.float32) for _ in range(3)]
        subjects = [tio.Subject(t1=tio.ScalarImage(a)) for a in arrays]
        queue = self._queue(subjects, patches_per_volume=2)
        batches = list(queue.device_batches(batch_size=2))
        assert batches
        for batch in batches:
            assert isinstance(batch.images["t1"].data, jax.Array)
            # every patch is a true sub-block of one source volume
            for patch, loc in zip(
                np.asarray(batch.images["t1"].data),
                batch.metadata["patch_location"],
            ):
                i, j, k = (int(v) for v in loc.index)
                found = any(
                    np.array_equal(
                        patch[0], a[0, i : i + 6, j : j + 6, k : k + 6]
                    )
                    for a in arrays
                )
                assert found
        for subject, arr in zip(subjects, arrays):
            assert isinstance(subject.t1.data, np.ndarray)
            np.testing.assert_array_equal(subject.t1.data, arr)

    def test_device_staged_is_one_ahead(self):
        """The staging generator pulls subject i+1 (starting its
        transfers) before subject i is handed to the consumer."""
        from torchio_tpu.data.queue import Queue

        events = []

        def producer():
            for i in range(3):
                events.append(f"prep{i}")
                yield self._subjects(n=1, with_label=False)[0]

        for i, (subject, staged) in enumerate(
            Queue._device_staged(producer())
        ):
            events.append(f"use{i}")
            assert staged == {}  # already device-resident
        assert events == ["prep0", "prep1", "use0", "prep2", "use1", "use2"]

    def test_multiple_epochs_and_small_totals(self):
        queue = self._queue(
            self._subjects(n=1, with_label=False), patches_per_volume=2
        )
        batches = list(queue.device_batches(batch_size=4, epochs=2))
        # 2 patches/epoch < batch 4 -> one batch per epoch (with replacement)
        assert len(batches) == 2

    def test_batch_size_validation(self):
        queue = self._queue(self._subjects(n=1))
        with pytest.raises(ValueError, match="batch_size"):
            next(queue.device_batches(batch_size=0))


class TestDeviceBatchesReviewRegressions:
    def test_over_capacity_subject_keeps_rings_aligned(self):
        """patches_per_volume > max_length: voxel and metadata rings
        must truncate identically (review finding: silent misalignment)."""
        rng = np.random.default_rng(31)
        base = rng.random((1, 10, 10, 10)).astype(np.float32)
        seg = (base > 0.5).astype(np.int32)
        subject = tio.Subject(
            t1=tio.ScalarImage(jnp.asarray(base)),
            seg=tio.LabelMap(jnp.asarray(seg)),
        )
        queue = tio.Queue(
            [subject],
            patch_sampler=tio.UniformSampler(patch_size=4),
            max_length=3,
            patches_per_volume=8,
            shuffle_subjects=False,
        )
        for batch in queue.device_batches(batch_size=3):
            t1 = np.asarray(batch.images["t1"].data)
            sg = np.asarray(batch.images["seg"].data)
            # cross-image alignment proves voxels and slots line up
            np.testing.assert_array_equal(sg, (t1 > 0.5).astype(np.int32))
            # and each patch's affine matches its patch_location corner
            for aff, loc in zip(
                batch.images["t1"].affines, batch.metadata["patch_location"]
            ):
                np.testing.assert_allclose(
                    np.asarray(aff.data)[:3, 3],
                    np.asarray(loc.index, np.float64),
                )

    def test_heterogeneous_subjects_rejected(self):
        rng = np.random.default_rng(32)
        s1 = tio.Subject(
            t1=tio.ScalarImage(
                jnp.asarray(rng.random((1, 8, 8, 8)).astype(np.float32))
            )
        )
        s2 = tio.Subject(
            t1=tio.ScalarImage(
                jnp.asarray(rng.random((1, 8, 8, 8)).astype(np.float32))
            ),
            t2=tio.ScalarImage(
                jnp.asarray(rng.random((1, 8, 8, 8)).astype(np.float32))
            ),
        )
        queue = tio.Queue(
            [s1, s2],
            patch_sampler=tio.UniformSampler(patch_size=4),
            shuffle_subjects=False,
        )
        with pytest.raises(ValueError, match="same image names"):
            list(queue.device_batches(batch_size=2))


class TestBatchedFetch:
    """GridSampler.get_batch + the loader's batched-fetch fast path."""

    @pytest.fixture
    def device_subject(self, rng):
        data = jnp.asarray(rng.normal(size=(1, 16, 18, 20)).astype(np.float32))
        seg = np.zeros((1, 16, 18, 20), np.int32)
        seg[0, 6:10, 6:10, 6:10] = 1
        return tio.Subject(
            t1=tio.ScalarImage(data), seg=tio.LabelMap(jnp.asarray(seg))
        )

    def test_get_batch_matches_per_item_extraction(self, device_subject):
        from torchio_tpu.data.loader import collate_subjects

        sampler = tio.GridSampler(device_subject, patch_size=8, patch_overlap=2)
        idx = [0, 3, len(sampler) - 1]
        fast = sampler.get_batch(idx)
        slow = collate_subjects([sampler[i] for i in idx])
        for name in ("t1", "seg"):
            np.testing.assert_array_equal(
                np.asarray(fast.images[name].data),
                np.asarray(slow.images[name].data),
            )
            for a_f, a_s in zip(
                fast.images[name].affines, slow.images[name].affines
            ):
                np.testing.assert_allclose(
                    np.asarray(a_f.data), np.asarray(a_s.data)
                )
        assert fast.metadata["patch_location"] == slow.metadata["patch_location"]

    def test_get_batch_host_subject_falls_back(self, subject):
        sampler = tio.GridSampler(subject, patch_size=8)
        batch = sampler.get_batch([0, 1])
        assert batch.batch_size == 2
        np.testing.assert_array_equal(
            np.asarray(batch.images["t1"].data[0]),
            np.asarray(sampler[0].images["t1"].data),
        )

    def test_loader_uses_batched_fetch(self, device_subject, monkeypatch):
        sampler = tio.GridSampler(device_subject, patch_size=8, patch_overlap=2)
        calls = []
        orig = sampler.get_batch

        def spy(indices):
            calls.append(list(indices))
            return orig(indices)

        monkeypatch.setattr(sampler, "get_batch", spy)
        loader = tio.SubjectsLoader(sampler, batch_size=4)
        total = sum(b.batch_size for b in loader)
        assert total == len(sampler)
        assert calls and all(len(c) <= 4 for c in calls)

    def test_loader_fast_path_respects_drop_last_and_shuffle(
        self, device_subject
    ):
        sampler = tio.GridSampler(device_subject, patch_size=8, patch_overlap=2)
        n = len(sampler)
        loader = tio.SubjectsLoader(
            sampler, batch_size=4, drop_last=True, shuffle=True
        )
        total = sum(b.batch_size for b in loader)
        assert total == (n // 4) * 4

    def test_grid_to_aggregator_roundtrip_through_fast_path(
        self, device_subject
    ):
        sampler = tio.GridSampler(device_subject, patch_size=8, patch_overlap=4)
        loader = tio.SubjectsLoader(sampler, batch_size=4)
        agg = tio.PatchAggregator(
            device_subject.spatial_shape, overlap_mode="hann"
        )
        for batch in loader:
            agg.add_batch(
                batch.images["t1"].data, batch.metadata["patch_location"]
            )
        out = agg.get_output()
        np.testing.assert_allclose(
            out, np.asarray(device_subject.t1.data), atol=1e-5
        )


class TestDeviceBatchesPrepBatch:
    """prep_batch > 1: subject preparation stacks same-shape device
    subjects into one transform dispatch (ring-path dispatch cut)."""

    def _queue(self, transform, n=4):
        import jax.numpy as jnp

        subjects = []
        for s in range(n):
            seg = np.zeros((1, 16, 16, 16), np.int32)
            seg[0, 4:12, 4:12, 4:12] = 1
            subjects.append(
                tio.Subject(
                    t1=tio.ScalarImage(
                        jnp.full((1, 16, 16, 16), float(s), jnp.float32)
                    ),
                    seg=tio.LabelMap(jnp.asarray(seg)),
                )
            )
        return tio.Queue(
            subjects,
            patch_sampler=tio.LabelSampler(patch_size=8, label_name="seg"),
            max_length=16,
            patches_per_volume=4,
            transform=transform,
        )

    def test_grouped_prep_routes_subject_data(self):
        tio.seed(0)
        queue = self._queue(tio.Flip(axes=(0,), flip_probability=1.0))
        seen = 0
        for batch in queue.device_batches(batch_size=4, prep_batch=4):
            data = np.asarray(batch.images["t1"].data)
            assert data.shape == (4, 1, 8, 8, 8)
            # each subject's volume is constant s; flipping preserves
            # that, so every patch must be constant at an integer id
            for element in data:
                values = np.unique(element)
                assert len(values) == 1 and float(values[0]) in (0, 1, 2, 3)
            seen += 4
        assert seen == 16

    def test_per_element_gating_required(self):
        tio.seed(0)
        queue = self._queue(
            tio.RescaleIntensity(out_min=0.0, out_max=1.0, p=0.5)
        )
        with pytest.raises(ValueError, match="per-element p-gating"):
            next(iter(queue.device_batches(batch_size=4, prep_batch=4)))

    def test_prep_batch_with_per_instance_noise(self):
        tio.seed(0)
        queue = self._queue(tio.Noise(std=0.1, p=0.5))
        batches = list(queue.device_batches(batch_size=4, prep_batch=2))
        assert len(batches) == 4
        for batch in batches:
            assert np.isfinite(np.asarray(batch.images["t1"].data)).all()


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


class TestRingBufferEdgesEdge:
    def test_push_shape_mismatch(self):
        from torchio_tpu.ops.patches import RingPatchBuffer

        buf = RingPatchBuffer(4, (1, 2, 2, 2))
        with pytest.raises(ValueError, match="does not match buffer"):
            buf.push(jnp.zeros((1, 1, 3, 3, 3)))

    def test_push_overflow_keeps_latest(self):
        from torchio_tpu.ops.patches import RingPatchBuffer

        buf = RingPatchBuffer(2, (1,))
        buf.push(jnp.arange(5, dtype=jnp.float32).reshape(5, 1))
        assert buf.filled == 2
        stored = set(np.asarray(buf._buffer).ravel().tolist())
        assert stored <= {3.0, 4.0}

    def test_empty_buffer_raises(self):
        from torchio_tpu.ops.patches import RingPatchBuffer

        buf = RingPatchBuffer(2, (1,))
        with pytest.raises(RuntimeError, match="empty"):
            buf.sample(1)
        with pytest.raises(RuntimeError, match="empty"):
            buf.gather(jnp.zeros((1,), jnp.int32))

    def test_sample_default_seed(self):
        from torchio_tpu.ops.patches import RingPatchBuffer

        buf = RingPatchBuffer(2, (1,))
        buf.push(jnp.ones((2, 1)))
        out = buf.sample(3)
        assert out.shape == (3, 1)

class TestQueueEdges:
    def test_device_batches_empty_subjects(self):
        queue = tio.Queue(
            [], patch_sampler=tio.UniformSampler(patch_size=4),
            shuffle_subjects=False,
        )
        assert list(queue.device_batches(batch_size=2)) == []

    def test_sampler_without_corner_support_falls_back(self, rng):
        """A sampler that cannot produce corner locations routes through
        the per-patch iterator path."""

        class OldStyleSampler(tio.UniformSampler):
            def _sample_corners(self, subject, num_patches):
                raise NotImplementedError

        subject = tio.Subject(
            t1=tio.ScalarImage(
                jnp.asarray(rng.random((1, 6, 6, 6)).astype(np.float32))
            )
        )
        queue = tio.Queue(
            [subject],
            patch_sampler=OldStyleSampler(patch_size=4),
            patches_per_volume=2,
            shuffle_subjects=False,
        )
        patches = list(queue)
        assert len(patches) == 2

    def test_subject_sampler_length(self, rng):
        subject = tio.Subject(
            t1=tio.ScalarImage(rng.random((1, 6, 6, 6)).astype(np.float32))
        )
        queue = tio.Queue(
            [subject, subject],
            patch_sampler=tio.UniformSampler(patch_size=4),
            shuffle_subjects=False,
            subject_sampler=[0],
        )
        assert queue.num_subjects == 1
        assert queue.patches_per_epoch == queue.patches_per_volume

    def test_max_memory_pretty_tib(self, rng):
        subject = tio.Subject(
            t1=tio.ScalarImage(rng.random((1, 6, 6, 6)).astype(np.float32))
        )
        queue = tio.Queue(
            [subject],
            patch_sampler=tio.UniformSampler(patch_size=512),
            max_length=100000,
            shuffle_subjects=False,
        )
        assert "TiB" in queue.max_memory_pretty

class TestSamplerEdges:
    def test_required_argument_errors(self):
        with pytest.raises(TypeError, match="patch_size is required"):
            tio.UniformSampler(patch_size=None)
        with pytest.raises(TypeError, match="patch_size is required"):
            tio.WeightedSampler(patch_size=None, probability_map="p")
        with pytest.raises(TypeError, match="probability_map is required"):
            tio.WeightedSampler(patch_size=4, probability_map=None)
        with pytest.raises(TypeError, match="label_name is required"):
            tio.LabelSampler(patch_size=4, label_name=None)

    def test_iterating_without_subject_raises(self):
        with pytest.raises(RuntimeError, match="needs a subject"):
            iter(tio.UniformSampler(patch_size=4))
        with pytest.raises(RuntimeError, match="needs a subject"):
            iter(tio.WeightedSampler(patch_size=4, probability_map="p"))

    def test_base_sampler_abstract(self, rng):
        from torchio_tpu.data.sampler import PatchSampler

        subject = tio.Subject(
            t1=tio.ScalarImage(rng.random((1, 6, 6, 6)).astype(np.float32))
        )
        with pytest.raises(NotImplementedError, match="__call__"):
            PatchSampler(patch_size=4)(subject, 1)
        with pytest.raises(NotImplementedError, match="corner sampling"):
            PatchSampler(patch_size=4).sample_locations(subject, 1)

    def test_label_probabilities_device_and_host(self, rng):
        seg = np.zeros((1, 8, 8, 8), np.int32)
        seg[0, 2:6, 2:6, 2:6] = 1
        seg[0, 3:5, 3:5, 3:5] = 2
        probs = {0: 0.0, 1: 1.0, 2: 3.0}
        # host path
        host_subject = tio.Subject(seg=tio.LabelMap(seg))
        sampler = tio.LabelSampler(
            patch_size=4, label_name="seg", label_probabilities=probs
        )
        locs = sampler.sample_locations(host_subject, 4)
        assert len(locs) == 4
        # device path
        dev_subject = tio.Subject(seg=tio.LabelMap(jnp.asarray(seg)))
        locs2 = sampler.sample_locations(dev_subject, 4)
        assert len(locs2) == 4


# --- consolidated from test_coverage_edges4.py (round 5) ---
import copy
import sys
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torchio_tpu as tio
from torchio_tpu.core.affine import AffineMatrix
from torchio_tpu.data import LabelMap, ScalarImage, Subject


class TestLoaderQueueEdges:
    def _subjects(self, n=2):
        return [
            Subject(t1=ScalarImage(np.random.rand(1, 8, 8, 8).astype(np.float32)))
            for _ in range(n)
        ]

    def test_collate_fn_rejected(self):
        with pytest.raises(ValueError, match="collate_fn"):
            tio.SubjectsLoader(self._subjects(), collate_fn=lambda x: x)

    def test_shuffle_requires_map_style(self):
        queue = tio.Queue(
            self._subjects(),
            patch_sampler=tio.UniformSampler(patch_size=4),
            max_length=4,
            patches_per_volume=2,
            num_workers=0,
        )
        with pytest.raises(ValueError, match="map-style"):
            next(iter(tio.SubjectsLoader(queue, shuffle=True)))
        loader = tio.SubjectsLoader(queue)
        with pytest.raises(TypeError, match="no length"):
            len(loader)

    def test_prefetched_backpressure(self):
        queue = tio.Queue(
            self._subjects(6),
            patch_sampler=tio.UniformSampler(patch_size=4),
            max_length=8,
            patches_per_volume=2,
            num_workers=1,
            shuffle_subjects=False,
            shuffle_patches=False,
        )
        patches = list(queue)
        assert len(patches) == 12

    def test_max_memory_pretty_tib(self):
        queue = tio.Queue(
            self._subjects(1),
            patch_sampler=tio.UniformSampler(patch_size=64),
            max_length=2 * 1024**3,
            patches_per_volume=1,
            num_workers=0,
        )
        assert queue.max_memory_pretty.endswith("TiB")

    def test_device_batches_empty_locations(self):
        class EmptySampler(tio.UniformSampler):
            def sample_locations(self, subject, num_patches):
                return []

        queue = tio.Queue(
            self._subjects(2),
            patch_sampler=EmptySampler(patch_size=4),
            max_length=4,
            patches_per_volume=2,
            num_workers=0,
        )
        assert list(queue.device_batches(batch_size=2)) == []

    def test_device_batches_sampler_not_implemented(self):
        class LegacySampler(tio.UniformSampler):
            def sample_locations(self, subject, num_patches):
                raise NotImplementedError

        queue = tio.Queue(
            self._subjects(2),
            patch_sampler=LegacySampler(patch_size=4),
            max_length=4,
            patches_per_volume=2,
            num_workers=0,
        )
        # host-iteration-only samplers get a clear error, not a bare
        # NotImplementedError from deep inside the staging loop
        with pytest.raises(ValueError, match="corner locations"):
            list(queue.device_batches(batch_size=2))

    def test_device_batches_interleaved_with_workers(self):
        queue = tio.Queue(
            self._subjects(6),
            patch_sampler=tio.UniformSampler(patch_size=4),
            max_length=8,
            patches_per_volume=2,
            num_workers=1,
            shuffle_subjects=False,
        )
        batches = list(queue.device_batches(batch_size=2))
        assert sum(b.batch_size for b in batches) == 12

class TestSamplerEdgesEdge4:
    def test_get_batch_broadcasts_subject_metadata(self):
        subject = Subject(
            t1=ScalarImage(jnp.ones((1, 8, 8, 8), jnp.float32)), age=42
        )
        sampler = tio.GridSampler(subject, patch_size=4)
        batch = sampler.get_batch([0, 1, 2])
        assert batch.metadata["age"] == [42, 42, 42]

    def test_weighted_sampler_device_probability_map(self):
        prob = np.zeros((1, 8, 8, 8), np.float32)
        prob[0, 4, 4, 4] = 1.0
        subject = Subject(
            t1=ScalarImage(jnp.ones((1, 8, 8, 8), jnp.float32)),
            prob=ScalarImage(jnp.asarray(prob)),
        )
        sampler = tio.WeightedSampler(patch_size=4, probability_map="prob")
        locations = sampler.sample_locations(subject, 3)
        assert len(locations) == 3
        for loc in locations:
            # the only nonzero-probability center is (4,4,4): corner (2,2,2)
            assert tuple(loc.index) == (2, 2, 2)


class TestAggregatorDtypeExport:
    def test_device_cast_before_pull(self, subject):
        sampler = tio.GridSampler(subject, patch_size=8)
        agg = tio.PatchAggregator(subject.spatial_shape, overlap_mode="average")
        for patch in sampler:
            agg.add_batch(
                np.asarray(patch.t1.data)[None], [patch.patch_location]
            )
        out = agg.get_output(dtype=np.float16)
        assert out.dtype == np.float16
        np.testing.assert_allclose(
            out.astype(np.float32), np.asarray(subject.t1.data),
            rtol=2e-3, atol=2e-3,
        )

    def test_crop_device_same_dtype_copy_is_donation_safe(self, subject):
        sampler = tio.GridSampler(subject, patch_size=8)
        agg = tio.PatchAggregator(subject.spatial_shape, overlap_mode="crop")
        batches = [
            (np.asarray(p.t1.data)[None], [p.patch_location]) for p in sampler
        ]
        for data, locs in batches:
            agg.add_batch(data, locs)
        dev = agg.get_output(device=True, dtype=np.float32)
        for data, locs in batches:
            agg.add_batch(data, locs)
        np.testing.assert_allclose(
            np.asarray(dev), np.asarray(subject.t1.data), rtol=1e-5
        )


class TestQueueCoverageEdges:
    def _subjects(self, n=2, shape=(1, 12, 12, 12), seed=0):
        import jax.numpy as jnp

        rng = np.random.default_rng(seed)
        out = []
        for _ in range(n):
            seg = np.zeros(shape, np.int32)
            seg[0, 4:8, 4:8, 4:8] = 1
            out.append(
                tio.Subject(
                    t1=tio.ScalarImage(
                        jnp.asarray(rng.random(shape).astype(np.float32))
                    ),
                    seg=tio.LabelMap(jnp.asarray(seg)),
                )
            )
        return out

    def test_prep_batch_remainder_group_of_one(self):
        tio.seed(0)
        queue = tio.Queue(
            self._subjects(3),
            patch_sampler=tio.LabelSampler(patch_size=4, label_name="seg"),
            max_length=8,
            patches_per_volume=2,
            transform=tio.Noise(std=0.05),
        )
        batches = list(queue.device_batches(batch_size=2, prep_batch=2))
        assert sum(b.batch_size for b in batches) == 6

    def test_prep_batch_shape_mismatch_falls_back(self):
        import jax.numpy as jnp

        tio.seed(0)
        subjects = self._subjects(1) + [
            tio.Subject(
                t1=tio.ScalarImage(
                    jnp.zeros((1, 10, 10, 10), jnp.float32)
                ),
                seg=tio.LabelMap(
                    jnp.ones((1, 10, 10, 10), jnp.int32)
                ),
            )
        ]
        queue = tio.Queue(
            subjects,
            patch_sampler=tio.LabelSampler(patch_size=4, label_name="seg"),
            max_length=8,
            patches_per_volume=2,
            shuffle_subjects=False,
            transform=tio.Noise(std=0.05),
        )
        batches = list(queue.device_batches(batch_size=2, prep_batch=2))
        assert sum(b.batch_size for b in batches) == 4

    def test_short_subject_iterator_drains_remaining_batches(
        self, monkeypatch
    ):
        # a subject iterator that under-delivers (e.g. filtered or
        # failed loads) must not starve the epoch: the trailing drain
        # still yields the remaining batches from the filled ring
        tio.seed(0)
        subjects = self._subjects(2)
        queue = tio.Queue(
            subjects,
            patch_sampler=tio.LabelSampler(patch_size=4, label_name="seg"),
            max_length=8,
            patches_per_volume=4,
            shuffle_subjects=False,
        )
        monkeypatch.setattr(
            queue, "_make_subject_iter", lambda: iter(subjects[:1])
        )
        batches = list(queue.device_batches(batch_size=4))
        assert sum(b.batch_size for b in batches) == 8

    def test_prefetched_empty_subject_list(self):
        tio.seed(0)
        queue = tio.Queue(
            self._subjects(2),
            patch_sampler=tio.LabelSampler(patch_size=4, label_name="seg"),
            num_workers=1,
            shuffle_subjects=False,
            subject_sampler=[],
        )
        assert list(queue.device_batches(batch_size=2)) == []

    def test_empty_locations_push_skipped(self):
        # a sampler that produces zero locations for a subject: the
        # push is a no-op and later subjects still fill the ring
        tio.seed(0)
        subjects = self._subjects(2)

        class SparseSampler(tio.LabelSampler):
            def sample_locations(self, subject, num_patches):
                if float(np.asarray(subject.t1.data).sum()) == 0.0:
                    return []
                return super().sample_locations(subject, num_patches)

        import jax.numpy as jnp

        subjects[0].t1.data = jnp.zeros((1, 12, 12, 12), jnp.float32)
        queue = tio.Queue(
            subjects,
            patch_sampler=SparseSampler(patch_size=4, label_name="seg"),
            max_length=8,
            patches_per_volume=2,
            shuffle_subjects=False,
        )
        batches = list(queue.device_batches(batch_size=2))
        assert sum(b.batch_size for b in batches) >= 2


class TestAggregatorAutoFlush:
    def test_flush_bytes_triggers_mid_stream(self, subject):
        agg = tio.PatchAggregator(
            subject.spatial_shape, overlap_mode="average", flush_bytes=1
        )
        sampler = tio.GridSampler(subject, patch_size=8)
        for patch in sampler:
            agg.add_batch(
                np.asarray(patch.t1.data)[None], [patch.patch_location]
            )
            assert not agg._pending  # every add flushed immediately
        np.testing.assert_allclose(
            agg.get_output(), np.asarray(subject.t1.data), rtol=1e-4,
            atol=1e-5,
        )


class TestQueueIterEmptyLocations:
    def test_device_sampler_with_no_locations_falls_back(self):
        import jax.numpy as jnp

        class EmptySampler(tio.UniformSampler):
            def sample_locations(self, subject, num_patches):
                return []

            def __call__(self, subject, num_patches=None):
                return iter(())

        tio.seed(0)
        subjects = [
            tio.Subject(
                t1=tio.ScalarImage(jnp.zeros((1, 8, 8, 8), jnp.float32))
            )
        ]
        queue = tio.Queue(
            subjects,
            patch_sampler=EmptySampler(patch_size=4),
            patches_per_volume=2,
            shuffle_subjects=False,
        )
        assert list(queue) == []

"""Queue: background-loaded patch buffer for stochastic patch training.

Parity reference: ``/root/reference/src/torchio/data/queue.py``
(per-epoch subject iterator with optional injected ``subject_sampler``
for distributed sharding; ThreadPoolExecutor load+transform overlap;
buffer flush-and-shuffle at ``max_length``; ``patches_per_volume`` cap;
memory estimator).
"""

from __future__ import annotations

import random as _pyrandom
from collections import deque
from concurrent.futures import Future, ThreadPoolExecutor
from itertools import islice
from typing import Any, Iterator, Sequence

from .sampler import PatchSampler
from .subject import Subject

try:  # torch interop: DataLoader dispatches iterable- vs map-style on
    # isinstance(dataset, torch.utils.data.IterableDataset); inheriting
    # it (a no-op mixin) lets Queue drop into torch pipelines like the
    # reference's Queue (queue.py:23, an IterableDataset subclass).
    from torch.utils.data import IterableDataset as _TorchIterableBase
except ImportError:  # pragma: no cover - torch absent
    _TorchIterableBase = object  # type: ignore[assignment,misc]


class Queue(_TorchIterableBase):  # type: ignore[valid-type,misc]
    """Iterable buffer of patches drawn from a rotating set of subjects.

    Args:
        subjects: subjects to sample patches from.
        patch_sampler: e.g. :class:`UniformSampler` / :class:`LabelSampler`.
        max_length: max patches held in the buffer (diversity vs RAM).
        patches_per_volume: patches extracted per subject per epoch.
        num_workers: background loading threads (0 = synchronous).
        shuffle_subjects / shuffle_patches: epoch-level shuffling.
        transform: applied to each subject after load, before sampling.
        subject_sampler: iterable of subject indices (e.g. a
            per-process shard for data-parallel training). Requires
            ``shuffle_subjects=False``.
    """

    def __init__(
        self,
        subjects: Sequence[Subject],
        patch_sampler: PatchSampler,
        max_length: int = 300,
        patches_per_volume: int = 10,
        num_workers: int = 0,
        shuffle_subjects: bool = True,
        shuffle_patches: bool = True,
        transform: Any | None = None,
        subject_sampler: Any | None = None,
    ) -> None:
        if subject_sampler is not None and shuffle_subjects:
            raise ValueError(
                "shuffle_subjects must be False when subject_sampler is"
                " provided (the sampler controls the order)"
            )
        self.subjects = subjects
        self.patch_sampler = patch_sampler
        self.max_length = max_length
        self.patches_per_volume = patches_per_volume
        self.num_workers = num_workers
        self.shuffle_subjects = shuffle_subjects
        self.shuffle_patches = shuffle_patches
        self.transform = transform
        self.subject_sampler = subject_sampler

    def __iter__(self) -> Iterator[Subject]:
        buffer: list[Subject] = []
        subject_iter = self._make_subject_iter()
        if self.num_workers > 0:
            yield from self._iter_threaded(subject_iter, buffer)
        else:
            yield from self._iter_sync(subject_iter, buffer)

    def _iter_sync(self, subject_iter, buffer) -> Iterator[Subject]:
        for raw in subject_iter:
            buffer.extend(self._sample_patches(self._prepare(raw)))
            if len(buffer) >= self.max_length:
                yield from self._flush(buffer)
        yield from self._flush(buffer)

    def _iter_threaded(self, subject_iter, buffer) -> Iterator[Subject]:
        # First subject runs SYNCHRONOUSLY so jit compilation of the
        # transform happens once, uncontended, in this thread — workers
        # submitted afterwards hit warm executables. (Measured on the
        # tunneled TPU backend: N workers tracing the same transforms
        # concurrently serialize on compilation for ~20 s per process.)
        first = next(subject_iter, None)
        if first is not None:
            buffer.extend(self._sample_patches(self._prepare(first)))
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            futures: deque[Future] = deque()
            for raw in subject_iter:
                futures.append(pool.submit(self._prepare, raw))
                while futures and futures[0].done():
                    buffer.extend(self._sample_patches(futures.popleft().result()))
                if len(buffer) >= self.max_length:
                    yield from self._flush(buffer)
            for future in futures:
                buffer.extend(self._sample_patches(future.result()))
        yield from self._flush(buffer)

    def _flush(self, buffer: list[Subject]) -> Iterator[Subject]:
        if self.shuffle_patches:
            _pyrandom.shuffle(buffer)
        while buffer:
            yield buffer.pop()

    def _prepare(self, subject: Subject) -> Subject:
        subject.load()
        if self.transform is not None:
            subject = self.transform(subject)
        return subject

    def _sample_patches(self, subject: Subject) -> list[Subject]:
        fast = self._sample_patches_on_device(subject)
        if fast is not None:
            return fast
        return list(islice(iter(self.patch_sampler(subject)), self.patches_per_volume))

    def _sample_patches_on_device(self, subject: Subject) -> list[Subject] | None:
        """All of a subject's patches in ONE jit call per image.

        Engages when every image is device-resident and the sampler can
        produce corner locations (the BASELINE "on-device patch queue"
        north star — the reference slices host tensors one patch at a
        time, ``/root/reference/src/torchio/data/sampler.py:54-67``).
        """
        import jax

        images = subject.images
        if not images or not all(
            isinstance(img.data, jax.Array) for img in images.values()
        ):
            return None
        try:
            locations = self.patch_sampler.sample_locations(
                subject, self.patches_per_volume
            )
        except NotImplementedError:
            return None
        if not locations:
            return None

        import numpy as np

        from ..ops.patches import extract_patches

        corners = np.asarray([loc.index for loc in locations], np.int32)
        patch_size = tuple(int(p) for p in locations[0].size)
        per_image = {
            name: extract_patches(img.data, corners, patch_size)
            for name, img in images.items()
        }
        patches = []
        for i, loc in enumerate(locations):
            kwargs: dict[str, Any] = {}
            for name, img in images.items():
                aff = np.array(img.affine.data)
                corner = np.asarray(loc.index, np.float64)
                aff[:3, 3] = aff[:3, :3] @ corner + aff[:3, 3]
                kwargs[name] = img.new_like(
                    data=per_image[name][i], affine=aff
                )
            kwargs.update(subject.metadata)
            kwargs["patch_location"] = loc
            patches.append(Subject(**kwargs))
        return patches

    def _batched_prepared(self, group_size: int) -> Iterator[Subject]:
        """Load subjects and run the transform on GROUPS stacked into
        one batch: ``group_size`` subjects cost ONE pipeline dispatch
        sequence instead of one each (through a high-latency link the
        per-program dispatches dominate subject prep). Requires every
        transform in the pipeline to gate per element (``p == 1`` or
        per-instance p support) so grouping cannot couple subjects'
        p-coins; shape-mismatched groups fall back to per-subject
        preparation."""
        from .batch import SubjectsBatch

        if self.transform is not None:
            children = getattr(self.transform, "transforms", [self.transform])
            for t in children:
                if t.p < 1.0 and not t.supports_per_instance_p:
                    raise ValueError(
                        f"prep_batch > 1 needs per-element p-gating, but"
                        f" {type(t).__name__}(p={t.p}) gates batch-wide —"
                        " use prep_batch=1 for this pipeline"
                    )

        def prepared(group: list[Subject]) -> list[Subject]:
            if not group or self.transform is None:
                return group
            if len(group) == 1:
                return [self.transform(group[0])]
            try:
                batch = SubjectsBatch.from_subjects(group)
            except (RuntimeError, ValueError, KeyError):
                return [self.transform(s) for s in group]
            return self.transform(batch).unbatch()

        group: list[Subject] = []
        for subject in self._make_subject_iter():
            subject.load()
            group.append(subject)
            if len(group) >= group_size:
                yield from prepared(group)
                group = []
        yield from prepared(group)

    def device_batches(
        self, batch_size: int, *, epochs: int = 1, prep_batch: int = 1
    ) -> Iterator[Any]:
        """Device-resident training batches through an HBM ring buffer.

        The production path of the BASELINE north star (reference Queue
        buffers host Subjects and shuffles them in Python,
        ``/root/reference/src/torchio/data/queue.py:145-155``): here
        every patch voxel stays on device end-to-end — one jit call
        slices ALL of a subject's patches
        (:func:`torchio_tpu.ops.patches.extract_patches`), a donated HBM
        ring pool (:class:`torchio_tpu.ops.patches.RingPatchBuffer`,
        capacity ``max_length``) holds and shuffles them in place, and
        each batch is gathered device-side at host-drawn indices (the
        only host work is the tiny index draw and affine bookkeeping).

        Yields :class:`~torchio_tpu.data.batch.SubjectsBatch` objects
        whose image data are ``(batch_size, C, *patch_size)`` device
        arrays; per-patch affines and ``patch_location`` metadata ride
        along. Per epoch, ``patches_per_epoch // batch_size`` batches
        are yielded (at least one), paced as subjects stream in so the
        pool keeps refreshing.

        ``prep_batch > 1`` prepares that many subjects per transform
        dispatch by stacking them into one batch (the pipeline must
        gate per element: ``p == 1`` or per-instance p support) — the
        dominant ring-path cost through a high-latency link is the
        per-subject transform dispatch sequence, and this divides it.
        """
        import jax.numpy as jnp
        import numpy as np

        from .. import random as tio_random
        from ..core.affine import AffineMatrix
        from ..ops.patches import RingPatchBuffer, extract_patches
        from .batch import ImagesBatch, SubjectsBatch

        if batch_size < 1:
            raise ValueError(f"batch_size must be >= 1, got {batch_size}")
        patch_size = tuple(int(p) for p in self.patch_sampler.patch_size)
        capacity = max(self.max_length, batch_size)
        buffers: dict[str, RingPatchBuffer] = {}
        image_classes: dict[str, type] = {}
        meta_ring: list[Any] = [None] * capacity
        cursor = 0
        filled = 0

        n_subjects = self.num_subjects
        total_batches = max(1, self.patches_per_epoch // batch_size)

        def push_subject(subject: Subject, staged: dict[str, Any]) -> int:
            nonlocal cursor, filled
            try:
                locations = self.patch_sampler.sample_locations(
                    subject, self.patches_per_volume
                )
            except NotImplementedError:
                raise ValueError(
                    "device_batches needs a sampler that can produce"
                    " corner locations (sample_locations); "
                    f"{type(self.patch_sampler).__name__} only supports"
                    " host iteration — use the SubjectsLoader path"
                ) from None
            if not locations:
                return 0
            # keep voxel ring and metadata ring in lockstep: the buffer
            # would truncate an over-capacity push to the LAST rows, so
            # truncate the locations identically before pushing either
            locations = locations[-capacity:]
            if buffers and set(subject.images) != set(buffers):
                raise ValueError(
                    "device_batches needs every subject to carry the same"
                    f" image names; first subject had {sorted(buffers)},"
                    f" got {sorted(subject.images)}"
                )
            corners = np.asarray([loc.index for loc in locations], np.int32)
            for name, img in subject.images.items():
                data = staged.get(name)
                if data is None:
                    data = jnp.asarray(img.data)
                if name not in buffers:
                    buffers[name] = RingPatchBuffer(
                        capacity, (data.shape[0], *patch_size), data.dtype
                    )
                    image_classes[name] = type(img)
                buffers[name].push(extract_patches(data, corners, patch_size))
            for loc in locations:
                affines = {}
                for name, img in subject.images.items():
                    aff = np.array(img.affine.data)
                    corner = np.asarray(loc.index, np.float64)
                    aff[:3, 3] = aff[:3, :3] @ corner + aff[:3, 3]
                    affines[name] = aff
                meta_ring[cursor] = (affines, loc, dict(subject.metadata))
                cursor = (cursor + 1) % capacity
                filled = min(filled + 1, capacity)
            return len(locations)

        def draw_batch() -> Any:
            rng = tio_random.get_rng()
            idx = rng.integers(0, filled, size=batch_size)
            idx_dev = jnp.asarray(idx, jnp.int32)
            images = {}
            for name, buffer in buffers.items():
                data = buffer.gather(idx_dev)
                affines = [
                    AffineMatrix(meta_ring[i][0][name]) for i in idx
                ]
                images[name] = ImagesBatch(
                    data, affines, image_class=image_classes[name]
                )
            metadata: dict[str, list[Any]] = {
                "patch_location": [meta_ring[i][1] for i in idx]
            }
            for key in meta_ring[idx[0]][2]:
                metadata[key] = [meta_ring[i][2].get(key) for i in idx]
            return SubjectsBatch(images, metadata=metadata)

        for _epoch in range(epochs):
            yielded = 0
            seen = 0
            if prep_batch > 1:
                prepared: Iterator[Subject] = self._batched_prepared(
                    prep_batch
                )
            elif self.num_workers > 0:
                prepared = self._prefetched_subjects()
            else:
                prepared = (
                    self._prepare(s) for s in self._make_subject_iter()
                )
            for subject, staged in self._device_staged(prepared):
                push_subject(subject, staged)
                seen += 1
                target = total_batches * seen // n_subjects
                while yielded < target and filled:
                    yield draw_batch()
                    yielded += 1
            while yielded < total_batches and filled:
                yield draw_batch()
                yielded += 1

    @staticmethod
    def _device_staged(
        prepared: Iterator[Subject],
    ) -> Iterator[tuple[Subject, dict[str, Any]]]:
        """Double-buffered host->device uploads: one-subject lookahead
        that starts the NEXT subject's (async) ``device_put`` transfers
        before the CURRENT subject's patch extraction is consumed, so
        upload and extraction compute overlap. Subjects are not mutated
        — staged device arrays ride alongside in a dict (empty for
        images already on device)."""
        import jax
        import numpy as np

        def stage(subject: Subject) -> tuple[Subject, dict[str, Any]]:
            staged: dict[str, Any] = {}
            for name, img in subject.images.items():
                data = img.data
                if not isinstance(data, jax.Array):
                    staged[name] = jax.device_put(np.asarray(data))
            return subject, staged

        current = next(prepared, None)
        if current is None:
            return
        current_pair = stage(current)
        for upcoming in prepared:
            upcoming_pair = stage(upcoming)  # transfers start now...
            yield current_pair  # ...and overlap this extraction
            current_pair = upcoming_pair
        yield current_pair

    def _prefetched_subjects(self) -> Iterator[Subject]:
        """Subjects loaded+transformed by the worker pool, first one
        synchronous (compile warm-up — see :meth:`_iter_threaded`)."""
        subject_iter = self._make_subject_iter()
        first = next(subject_iter, None)
        if first is None:
            return
        yield self._prepare(first)
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            futures: deque[Future] = deque()
            for raw in subject_iter:
                futures.append(pool.submit(self._prepare, raw))
                while len(futures) > self.num_workers + 2:
                    yield futures.popleft().result()
                while futures and futures[0].done():
                    yield futures.popleft().result()
            while futures:
                yield futures.popleft().result()

    def _make_subject_iter(self) -> Iterator[Subject]:
        if self.subject_sampler is not None:
            return (self.subjects[i] for i in self.subject_sampler)
        subjects = list(self.subjects)
        if self.shuffle_subjects:
            _pyrandom.shuffle(subjects)
        return iter(subjects)

    @property
    def num_subjects(self) -> int:
        if self.subject_sampler is not None:
            return len(self.subject_sampler)  # type: ignore[arg-type]
        return len(self.subjects)

    @property
    def patches_per_epoch(self) -> int:
        return self.num_subjects * self.patches_per_volume

    @property
    def max_memory(self) -> int:
        """Estimated peak buffer RAM in bytes (float32 voxels)."""
        sample = self.subjects[0]
        channels = sum(img.num_channels for img in sample.images.values())
        voxels = 1
        for s in self.patch_sampler.patch_size:
            voxels *= s
        return 4 * channels * voxels * self.max_length

    @property
    def max_memory_pretty(self) -> str:
        size = float(self.max_memory)
        for unit in ("B", "KiB", "MiB", "GiB"):
            if size < 1024:
                return f"{size:.1f} {unit}"
            size /= 1024
        return f"{size:.1f} TiB"

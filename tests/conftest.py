"""Test configuration: force a virtual 8-device CPU mesh before JAX loads.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on 8 virtual CPU devices (the driver separately dry-runs the
multi-chip path). This mirrors the reference's simulated-distributed test
strategy (``/root/reference/tests/test_queue.py``).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compilation cache: XLA CPU compiles of tiny per-shape programs
# dominate test runtime; cache them across runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import copy  # noqa: E402

import jax  # noqa: E402

# The sandbox exports JAX_PLATFORMS=axon (tunneled TPU); the env var is
# overridden by the plugin, so force CPU through the config API before any
# backend initializes. Without this every tiny test op round-trips the
# TPU tunnel.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True)
def _seed_tio():
    import torchio_tpu

    torchio_tpu.seed(1234)


@pytest.fixture
def make_batch():
    """Build a SubjectsBatch of random subjects (t1 scalar + seg label)."""

    def _make(batch_size=4, shape=(1, 6, 7, 8), with_label=False, seed=0):
        from torchio_tpu.data import LabelMap, ScalarImage, Subject
        from torchio_tpu.data.batch import SubjectsBatch

        rng = np.random.default_rng(seed)
        subjects = []
        for _ in range(batch_size):
            kwargs = {
                "t1": ScalarImage(rng.normal(size=shape).astype(np.float32))
            }
            if with_label:
                kwargs["seg"] = LabelMap(
                    rng.integers(0, 3, size=shape).astype(np.int32)
                )
            subjects.append(Subject(**kwargs))
        return SubjectsBatch.from_subjects(subjects)

    return _make


@pytest.fixture
def assert_vectorized():
    """Vectorization equivalence gate, ported from the reference test
    strategy (SURVEY.md §4.2): applying a transform per-instance to a
    batch must equal re-applying each element's recorded, sliced params
    to that element alone; gated-out elements must be bit-for-bit
    unchanged.
    """

    def _assert(transform, batch, *, rtol=1e-5, atol=1e-6):
        from torchio_tpu.data.batch import SubjectsBatch, _slice_params

        original = copy.deepcopy(batch)
        result = transform(batch)
        params = result.applied_transforms[-1].params
        assert "_batched_keys" in params, "per-instance path was not active"
        batched_keys = params["_batched_keys"]
        keep = params.get("_keep")
        result_images = transform._get_images(result)
        image_names = list(result_images)
        original_subjects = original.unbatch()
        for index in range(original.batch_size):
            single = SubjectsBatch.from_subjects([original_subjects[index]])
            single_input = {
                name: np.asarray(image.data).copy()
                for name, image in transform._get_images(single).items()
            }
            element_params = _slice_params(params, index, batched_keys)
            single = transform.apply_transform(single, element_params)
            single_images = transform._get_images(single)
            gated_out = keep is not None and not keep[index]
            for name in image_names:
                row = np.asarray(result_images[name].data[index : index + 1])
                np.testing.assert_allclose(
                    row, np.asarray(single_images[name].data), rtol=rtol, atol=atol
                )
                if gated_out:
                    np.testing.assert_array_equal(row, single_input[name])

    return _assert

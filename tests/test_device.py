"""Device placement (JAX) — the reference's test_device.py analog.

Runs on whatever backend the test session has (CPU in CI); TPU-specific
assertions are skip-guarded like the reference's HAS_CUDA/HAS_MPS gates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchio_tpu as tio

HAS_TPU = any(d.platform in ("tpu", "axon") for d in jax.devices())


def test_image_to_device(rng):
    img = tio.ScalarImage(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
    assert img.device is None  # host numpy
    img.to(jax.devices()[0])
    assert img.device == jax.devices()[0]
    assert isinstance(img.data, jax.Array)
    img.to("cpu")
    assert img.device is None


def test_subject_to_device(rng):
    sub = tio.Subject(
        t1=tio.ScalarImage(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
    )
    sub.to(jax.devices()[0])
    assert sub.device == jax.devices()[0]


def test_batch_to_device(make_batch):
    batch = make_batch(2)
    batch.to(jax.devices()[0])
    assert batch.device == jax.devices()[0]
    # transform keeps data on device
    out = tio.Noise(std=0.1, copy=False)(batch)
    assert isinstance(out.images["t1"].data, jax.Array)


def test_to_transform_in_pipeline(rng):
    sub = tio.Subject(
        t1=tio.ScalarImage(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
    )
    pipeline = tio.Compose([tio.To(jax.devices()[0]), tio.Noise(std=0.1)])
    out = pipeline(sub)
    assert isinstance(out.t1.data, jax.Array)


def test_transform_roundtrip_close_on_device(rng):
    """Device round-trip numerical check (reference's MPS closeness test)."""
    data = rng.normal(size=(1, 8, 8, 8)).astype(np.float32)
    sub = tio.Subject(t1=tio.ScalarImage(data))
    sub.to(jax.devices()[0])
    tio.seed(0)
    out = tio.Flip(axes=(0,))(sub)
    back = tio.Flip(axes=(0,))(out)
    np.testing.assert_allclose(np.asarray(back.t1.data), data, rtol=1e-6)


@pytest.mark.skipif(not HAS_TPU, reason="no TPU in test session")
def test_tpu_execution(rng):  # pragma: no cover - needs hardware
    sub = tio.Subject(
        t1=tio.ScalarImage(rng.normal(size=(1, 8, 8, 8)).astype(np.float32))
    )
    sub.to("tpu")
    out = tio.Noise(std=0.1)(sub)
    assert jnp.isfinite(jnp.asarray(out.t1.data)).all()

"""No-op warning discipline + input-polymorphism gaps.

Mirrors the reference's ``tests/test_identity_warning.py`` (deliberate
no-op transforms warn; SURVEY.md section 4.9) plus its
``test_tensordict.py`` dict-input matrix and the MONAI adapter
dependency gate.
"""

from __future__ import annotations

import warnings

import numpy as np
import pytest

import torchio_tpu as tio


NOOP_CONSTRUCTIONS = [
    lambda: tio.Blur(std=0.0),
    lambda: tio.Gamma(log_gamma=0.0),
    lambda: tio.Ghosting(num_ghosts=4, intensity=0.0),
    lambda: tio.Spike(num_spikes=1, intensity=0.0),
    lambda: tio.Clamp(),
    lambda: tio.Anisotropy(downsampling=1.0),
]


@pytest.mark.parametrize("ctor", NOOP_CONSTRUCTIONS)
def test_noop_defaults_warn(ctor):
    with pytest.warns(RuntimeWarning, match="no-op"):
        ctor()


@pytest.mark.parametrize(
    "ctor",
    [
        lambda: tio.Blur(std=(0.5, 1.0)),
        lambda: tio.Gamma(log_gamma=(-0.3, 0.3)),
        lambda: tio.Ghosting(num_ghosts=4, intensity=(0.5, 1.0)),
        lambda: tio.Spike(num_spikes=1, intensity=(0.2, 0.6)),
        lambda: tio.Clamp(out_min=0.0),
        lambda: tio.Anisotropy(downsampling=(1.5, 3.0)),
    ],
)
def test_effective_arguments_do_not_warn(ctor):
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        ctor()


# --- dict (MONAI-style) input polymorphism ---------------------------------


def test_dict_input_roundtrip():
    data = {
        "image": np.random.default_rng(0).random((1, 6, 6, 6), np.float32),
        "other": np.ones((1, 6, 6, 6), np.float32),
    }
    out = tio.Flip(axes=(0,))(data)
    assert isinstance(out, dict)
    assert set(out.keys()) == {"image", "other"}
    np.testing.assert_allclose(np.asarray(out["image"]), data["image"][:, ::-1])


def test_dict_input_preserves_array_type():
    import jax.numpy as jnp

    data = {"image": jnp.ones((1, 4, 4, 4), jnp.float32)}
    out = tio.Noise(std=0.1)(data)
    assert isinstance(out["image"], jnp.ndarray)
    assert out["image"].shape == (1, 4, 4, 4)


# --- optional-dependency gates ---------------------------------------------


def test_monai_adapter_gated_without_monai():
    try:
        import monai  # noqa: F401

        pytest.skip("monai installed; gate not reachable")
    except ImportError:
        pass
    adapter = tio.MonaiAdapter(lambda d: d)  # construction stays cheap
    data = {"image": np.ones((1, 4, 4, 4), np.float32)}
    with pytest.raises(ImportError, match="[Mm][Oo][Nn][Aa][Ii]"):
        adapter(data)


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


class TestNoOpGates:
    def test_bias_field_zero_std_shared_is_identity(self, rng):
        x = rng.random((1, 5, 5, 5)).astype(np.float32)
        out = tio.BiasField(std=0.0, per_instance=False, p=1.0)(
            tio.ScalarImage(x)
        )
        np.testing.assert_array_equal(np.asarray(out.data), x)

    def test_rescale_constant_input_skipped(self, rng):
        x = np.full((1, 5, 5, 5), 3.0, np.float32)
        out = tio.RescaleIntensity(out_min=0.0, out_max=1.0)(tio.ScalarImage(x))
        np.testing.assert_array_equal(np.asarray(out.data), x)

    def test_swap_all_elements_gated_out(self, rng):
        batch = _batch_edge7(rng)
        t = tio.Swap(patch_size=2, p=1.0)
        before = np.asarray(batch.images["img"].data).copy()
        params = {
            "patch_size": [2, 2, 2],
            "locations": [[], []],
            "_batched_keys": ["locations"],
        }
        out = t.apply_transform(batch, params)
        np.testing.assert_array_equal(
            np.asarray(out.images["img"].data), before
        )

    def test_motion_all_elements_gated_out(self, rng):
        batch = _batch_edge7(rng)
        t = tio.Motion(p=1.0)
        before = np.asarray(batch.images["img"].data).copy()
        params = {"transforms": [[], []], "_batched_keys": ["transforms"]}
        out = t.apply_transform(batch, params)
        np.testing.assert_array_equal(
            np.asarray(out.images["img"].data), before
        )

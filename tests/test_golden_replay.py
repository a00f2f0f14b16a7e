"""Cross-library param replay: reference-recorded params drive torchio_tpu.

The JSON-serializable params contract (reference transform.py:29-44,
354-359) is what makes history replay and inversion possible. These
tests prove the contract holds ACROSS implementations: run the reference
transform, take the params it recorded in its history, replay them
through the torchio_tpu transform of the same name, and require matching
output. This covers stochastic transforms (Swap patch positions, Spike
impulse positions, Motion rigid segments) whose RNG streams could never
be matched directly.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

import torchio_tpu as tio
from torchio_tpu.data.batch import SubjectsBatch
from torchio_tpu.transforms.transform import _TRANSFORM_REGISTRY

sys.path.insert(0, str(Path(__file__).resolve().parent))
from _reference_loader import load_reference  # noqa: E402

ref = load_reference()
pytestmark = pytest.mark.skipif(
    ref is None, reason="reference TorchIO source not available"
)

SHAPE = (1, 12, 14, 16)


@pytest.fixture(scope="module")
def volume():
    return np.random.default_rng(11).random(SHAPE, np.float32)


def _replay_params(
    name: str, params: dict, data: np.ndarray, attrs: dict | None = None
) -> np.ndarray:
    """Apply a torchio_tpu transform from recorded params only.

    ``attrs`` supplies instance attributes for params recorded by the
    REFERENCE, whose histories are not fully self-contained (e.g. Swap
    omits patch_size); torchio_tpu histories need no attrs.
    """
    cls = _TRANSFORM_REGISTRY[name]
    shell = object.__new__(cls)  # params-only application, like inversion
    shell.include = None
    shell.exclude = None
    for key, value in (attrs or {}).items():
        setattr(shell, key, value)
    batch = SubjectsBatch.from_subjects(
        [tio.Subject(t1=tio.ScalarImage(data.copy()))]
    )
    out = shell.apply_transform(batch, params)
    return np.asarray(out.images["t1"].data[0])


REPLAY_CASES = [
    (
        "swap",
        lambda m: m.Swap(patch_size=4, num_iterations=6),
        0.0,
        {"patch_size": (4, 4, 4)},
    ),
    (
        "spike",
        lambda m: m.Spike(num_spikes=3, intensity=(0.8, 1.4)),
        1e-4,
    ),
    (
        "ghosting",
        lambda m: m.Ghosting(num_ghosts=(2, 6), intensity=(0.4, 0.9)),
        1e-4,
    ),
    (
        "motion",
        lambda m: m.Motion(degrees=8.0, translation=4.0, num_transforms=2),
        1e-3,
    ),
    (
        "gamma",
        lambda m: m.Gamma(log_gamma=(-0.4, 0.4)),
        1e-5,
    ),
]


@pytest.mark.parametrize(
    "make,atol,attrs",
    [(c[1], c[2], c[3] if len(c) > 3 else None) for c in REPLAY_CASES],
    ids=[c[0] for c in REPLAY_CASES],
)
def test_reference_params_replay(make, atol, attrs, volume):
    import torch

    ref.seed(3) if hasattr(ref, "seed") else None
    subject = ref.Subject(t1=ref.ScalarImage(torch.as_tensor(volume.copy())))
    t_ref = make(ref)
    out_ref_subject = t_ref(subject)
    out_ref = out_ref_subject.t1.data.numpy()
    trace = out_ref_subject.applied_transforms[-1]
    name = getattr(trace, "name", None) or trace[0]
    params = getattr(trace, "params", None) or trace[1]
    assert name in _TRANSFORM_REGISTRY, f"{name} missing from registry"
    out_mine = _replay_params(name, params, volume, attrs)
    np.testing.assert_allclose(out_mine, out_ref, atol=atol, rtol=0)


def test_reference_params_are_json_like():
    """Reference history params round-trip through JSON serialization."""
    import json

    import torch

    subject = ref.Subject(
        t1=ref.ScalarImage(torch.rand(1, 8, 8, 8))
    )
    out = ref.Motion(degrees=5.0, translation=2.0, num_transforms=1)(subject)
    params = out.applied_transforms[-1].params
    json.dumps(params)  # must not raise — shared replay contract

"""Per-instance vectorization equivalence gate.

Port of the reference's most important harness (SURVEY.md §4.2):
batch-vectorized per-instance transforms must equal per-element
application of the recorded sliced params; gated-out elements must be
bit-exact no-ops.
"""

import numpy as np
import pytest

import torchio_tpu as tio


def transforms_under_test():
    return [
        tio.Flip(axes=(0, 1, 2), flip_probability=0.5),
        tio.Gamma(log_gamma=(-0.4, 0.4)),
    ]


@pytest.mark.parametrize("p", [1.0, 0.5])
@pytest.mark.parametrize(
    "transform_factory",
    [
        lambda: tio.Flip(axes=(0, 1, 2), flip_probability=0.5),
        lambda: tio.Gamma(log_gamma=(-0.4, 0.4)),
    ],
    ids=["Flip", "Gamma"],
)
def test_vectorized_equivalence(transform_factory, p, make_batch, assert_vectorized):
    tio.seed(99)
    transform = transform_factory()
    transform.p = p
    batch = make_batch(8)
    assert_vectorized(transform, batch)


def test_per_instance_flag_off_shares_params(make_batch):
    tio.seed(3)
    batch = make_batch(4)
    out = tio.Gamma(log_gamma=(-0.5, 0.5), per_instance=False)(batch)
    params = out.applied_transforms[-1].params
    assert "_batched_keys" not in params
    assert isinstance(params["log_gamma"], float)


def test_single_subject_unaffected_by_per_instance(rng):
    sub = tio.Subject(t1=tio.ScalarImage(rng.normal(size=(1, 4, 4, 4)).astype(np.float32)))
    out = tio.Gamma(log_gamma=(-0.5, 0.5))(sub)
    params = out.applied_transforms[-1].params
    assert isinstance(params["log_gamma"], float)

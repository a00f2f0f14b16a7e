"""Parameter-range DSL behavior matrix.

Mirrors the behaviors asserted by the reference's
``tests/test_parameter_range.py`` (parsing of scalar / 2-tuple / 3-tuple
/ 6-tuple / Choice / distribution / mixed specs, deterministic flags,
batched per-instance sampling, reprs, and error paths) against our
host-numpy implementation (``torchio_tpu/transforms/parameter_range.py``;
reference ``/root/reference/src/torchio/transforms/parameter_range.py``).
"""

from __future__ import annotations

import numpy as np
import pytest

import torchio_tpu as tio
from torchio_tpu.transforms.parameter_range import (
    _ParameterRange,
    to_nonneg_range,
)


class TestParsing:
    def test_scalar_is_deterministic(self):
        pr = _ParameterRange(0.5)
        assert pr.is_deterministic
        assert pr.sample() == (0.5, 0.5, 0.5)

    def test_two_tuple_is_range(self):
        pr = _ParameterRange((0.8, 1.2))
        assert not pr.is_deterministic
        for _ in range(50):
            values = pr.sample()
            assert len(values) == 3
            assert all(0.8 <= v <= 1.2 for v in values)

    def test_three_tuple_is_fixed(self):
        pr = _ParameterRange((1.0, 2.0, 3.0))
        assert pr.is_deterministic
        assert pr.sample() == (1.0, 2.0, 3.0)

    def test_six_tuple_is_per_axis_ranges(self):
        pr = _ParameterRange((0.0, 1.0, 10.0, 20.0, 100.0, 200.0))
        assert not pr.is_deterministic
        for _ in range(50):
            v0, v1, v2 = pr.sample()
            assert 0.0 <= v0 <= 1.0
            assert 10.0 <= v1 <= 20.0
            assert 100.0 <= v2 <= 200.0

    def test_zero_scalar_is_deterministic(self):
        pr = _ParameterRange(0.0)
        assert pr.is_deterministic
        assert pr.sample() == (0.0, 0.0, 0.0)
        assert pr.is_constant(0.0)
        assert not pr.is_constant(1.0)

    def test_single_element_tuple(self):
        pr = _ParameterRange((5.0,))
        assert pr._ranges == ((5.0, 5.0), (5.0, 5.0), (5.0, 5.0))

    def test_invalid_tuple_length(self):
        with pytest.raises(ValueError, match="1, 2, 3, or 6"):
            _ParameterRange((1.0, 2.0, 3.0, 4.0))

    def test_invalid_type_raises(self):
        with pytest.raises(TypeError, match="Expected number"):
            _ParameterRange("bad")

    def test_invalid_axis_spec_raises(self):
        with pytest.raises(TypeError, match="Per-axis spec"):
            _ParameterRange(("a", "b", "c"))

    def test_mixed_specs_wrong_count_raises(self):
        with pytest.raises(ValueError, match="Mixed per-axis"):
            _ParameterRange((tio.Choice([1.0]), tio.Choice([2.0])))

    def test_mixed_three_tuple(self):
        # scalar + Choice + range per axis, as documented at
        # reference spatial.py:281-289.
        pr = _ParameterRange((0.0, tio.Choice([-90.0, 0.0, 90.0]), (-10.0, 10.0)))
        assert not pr.is_deterministic
        for _ in range(20):
            v0, v1, v2 = pr.sample()
            assert v0 == 0.0
            assert v1 in (-90.0, 0.0, 90.0)
            assert -10.0 <= v2 <= 10.0


class TestSampling:
    def test_reproducible_with_seed(self):
        pr = _ParameterRange((0.0, 100.0))
        tio.seed(42)
        a = pr.sample()
        tio.seed(42)
        b = pr.sample()
        assert a == b

    def test_different_seeds_differ(self):
        pr = _ParameterRange((0.0, 100.0))
        tio.seed(1)
        a = pr.sample()
        tio.seed(2)
        b = pr.sample()
        assert a != b

    def test_sample_1d_returns_float(self):
        pr = _ParameterRange((0.0, 10.0))
        for _ in range(50):
            v = pr.sample_1d()
            assert isinstance(v, float)
            assert 0.0 <= v <= 10.0

    def test_sample_1d_deterministic(self):
        assert _ParameterRange(3.14).sample_1d() == 3.14


class TestBatchedSampling:
    def test_sample_none_returns_tuple(self):
        value = _ParameterRange((0.0, 10.0)).sample()
        assert isinstance(value, tuple)
        assert len(value) == 3

    def test_sample_1d_batched_shape(self):
        values = _ParameterRange((0.0, 10.0)).sample_1d(n=5)
        assert isinstance(values, np.ndarray)
        assert values.shape == (5,)
        assert ((values >= 0.0) & (values <= 10.0)).all()

    def test_sample_batched_shape(self):
        values = _ParameterRange((0.0, 10.0)).sample(n=4)
        assert values.shape == (4, 3)

    def test_batched_uniform_values_differ(self):
        values = _ParameterRange((0.0, 100.0)).sample_1d(n=8)
        assert len(np.unique(values)) > 1

    def test_batched_deterministic_is_constant(self):
        values = _ParameterRange(2.5).sample_1d(n=6)
        np.testing.assert_allclose(values, np.full(6, 2.5))

    def test_batched_deterministic_per_axis(self):
        values = _ParameterRange((1.0, 2.0, 3.0)).sample(n=4)
        np.testing.assert_allclose(values, np.tile([1.0, 2.0, 3.0], (4, 1)))

    def test_batched_six_tuple_per_axis_ranges(self):
        values = _ParameterRange((0.0, 1.0, 10.0, 20.0, 100.0, 200.0)).sample(n=16)
        assert values.shape == (16, 3)
        assert ((values[:, 0] >= 0.0) & (values[:, 0] <= 1.0)).all()
        assert ((values[:, 1] >= 10.0) & (values[:, 1] <= 20.0)).all()
        assert ((values[:, 2] >= 100.0) & (values[:, 2] <= 200.0)).all()

    def test_batched_choice(self):
        values = _ParameterRange(tio.Choice([-10.0, 0.0, 10.0])).sample_1d(n=32)
        assert values.shape == (32,)
        assert np.isin(values, [-10.0, 0.0, 10.0]).all()

    def test_batched_torch_distribution(self):
        torch = pytest.importorskip("torch")
        pr = _ParameterRange(torch.distributions.Uniform(5.0, 10.0))
        values = pr.sample_1d(n=10)
        assert values.shape == (10,)
        assert ((values >= 5.0) & (values <= 10.0)).all()

    def test_batched_reproducible_with_seed(self):
        pr = _ParameterRange((0.0, 100.0))
        tio.seed(42)
        a = pr.sample_1d(n=7)
        tio.seed(42)
        b = pr.sample_1d(n=7)
        np.testing.assert_array_equal(a, b)

    def test_batched_n_one_returns_length_one_array(self):
        values = _ParameterRange((0.0, 10.0)).sample_1d(n=1)
        assert isinstance(values, np.ndarray)
        assert values.shape == (1,)


class TestRepr:
    def test_scalar_repr(self):
        assert repr(_ParameterRange(0.5)) == "0.5"

    def test_range_repr(self):
        assert repr(_ParameterRange((1.0, 2.0))) == "(1.0, 2.0)"

    def test_three_tuple_repr(self):
        assert repr(_ParameterRange((1.0, 2.0, 3.0))) == "(1.0, 2.0, 3.0)"


class TestDistribution:
    def test_torch_distribution_not_deterministic(self):
        torch = pytest.importorskip("torch")
        pr = _ParameterRange(torch.distributions.Normal(0.0, 1.0))
        assert not pr.is_deterministic

    def test_torch_distribution_sample_3d(self):
        torch = pytest.importorskip("torch")
        pr = _ParameterRange(torch.distributions.Normal(0.0, 1.0))
        v0, v1, v2 = pr.sample()
        assert all(isinstance(v, float) for v in (v0, v1, v2))

    def test_scipy_style_rvs(self):
        # Any object with .rvs() works (scipy frozen distributions).
        class FakeDist:
            def rvs(self, size=1):
                return np.full(size, 7.0)

        pr = _ParameterRange(FakeDist())
        assert not pr.is_deterministic
        assert pr.sample_1d() == 7.0
        np.testing.assert_allclose(pr.sample_1d(n=4), np.full(4, 7.0))

    def test_distribution_repr(self):
        torch = pytest.importorskip("torch")
        pr = _ParameterRange(torch.distributions.Normal(0.0, 1.0))
        assert "Normal" in repr(pr)


class TestChoiceEdgeCases:
    def test_empty_choice_raises(self):
        with pytest.raises(ValueError, match="at least one"):
            tio.Choice([])

    def test_mismatched_probabilities_raises(self):
        with pytest.raises(ValueError, match="probabilities"):
            tio.Choice([1, 2, 3], probabilities=[0.5, 0.5])

    def test_probabilities_are_normalized(self):
        c = tio.Choice([1.0, 2.0], probabilities=[2.0, 6.0])
        np.testing.assert_allclose(c.probabilities, [0.25, 0.75])

    def test_repr_uniform(self):
        r = repr(tio.Choice([1.0, 2.0, 3.0]))
        assert "Choice(" in r
        assert "p=" not in r

    def test_repr_custom_probs(self):
        assert "p=" in repr(tio.Choice([1.0, 2.0], probabilities=[0.3, 0.7]))

    def test_ranges_for_choice_axis(self):
        pr = _ParameterRange(tio.Choice([1.0, 2.0]))
        assert pr._ranges[0] == (0.0, 0.0)


class TestNonNegRange:
    def test_negative_scalar_raises(self):
        with pytest.raises(ValueError, match="non-negative"):
            to_nonneg_range(-1.0)

    def test_negative_range_raises(self):
        with pytest.raises(ValueError, match="non-negative"):
            to_nonneg_range((-2.0, 3.0))

    def test_valid_range_passes(self):
        pr = to_nonneg_range((0.0, 3.0))
        assert pr._ranges[0] == (0.0, 3.0)


# --- consolidated from test_coverage_edges3.py (round 5) ---
import warnings
import numpy as np
import pytest
import torchio_tpu as tio
from torchio_tpu.data import LabelMap, ScalarImage, Subject
from torchio_tpu.data.batch import SubjectsBatch

def _subject_edge3(rng, shape=(1, 6, 7, 8), with_label=False):
    kwargs = {"t1": ScalarImage(rng.normal(size=shape).astype(np.float32))}
    if with_label:
        kwargs["seg"] = LabelMap(
            rng.integers(0, 3, size=shape).astype(np.int32)
        )
    return Subject(**kwargs)


class TestParameterRangeEdges:
    def test_choice_values_property(self):
        from torchio_tpu.transforms.parameter_range import Choice

        c = Choice((1, 2, 3))
        np.testing.assert_array_equal(c.values, [1, 2, 3])

    def test_nonconstant_choice_not_deterministic(self):
        from torchio_tpu.transforms.parameter_range import (
            Choice,
            _ParameterRange,
        )

        pr = _ParameterRange(Choice((1, 2)))
        assert pr.is_constant(1.0) is False

    def test_distribution_spec_unchecked(self):
        pytest.importorskip("torch")
        import torch

        from torchio_tpu.transforms.parameter_range import (
            _ParameterRange,
            to_nonneg_range,
        )

        dist = torch.distributions.Uniform(0.0, 1.0)
        pr = to_nonneg_range(dist)
        assert isinstance(pr, _ParameterRange)

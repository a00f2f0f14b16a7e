"""Golden parameter-convention parity.

The value/range/distribution DSL (reference parameter_range.py) decides
what ``degrees=10`` MEANS (symmetric range? constant?). RNG streams
can't match across torch and numpy, so instead both libraries sample
each spec many times and the empirical [min, max] bounds must agree.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

import torchio_tpu as tio

sys.path.insert(0, str(Path(__file__).resolve().parent))
from _reference_loader import load_reference  # noqa: E402

ref = load_reference()
pytestmark = pytest.mark.skipif(
    ref is None, reason="reference TorchIO source not available"
)

N = 400


def _bounds_ref(t, attr):
    vals = np.stack(
        [np.asarray(getattr(t, attr).sample(), np.float64) for _ in range(N)]
    )
    return float(vals.min()), float(vals.max())


def _bounds_mine(t, attr):
    vals = np.stack([np.asarray(getattr(t, attr).sample()) for _ in range(N)])
    return float(vals.min()), float(vals.max())


CASES = [
    # (ctor kwargs for both, attribute, expected convention note)
    ("Affine", {"degrees": 10.0}, "degrees"),          # scalar -> (-10, 10)
    ("Affine", {"degrees": (5.0, 15.0)}, "degrees"),
    ("Affine", {"scales": 0.2}, "scales"),             # scalar -> (0.8, 1.2)?
    ("Affine", {"scales": (0.9, 1.1)}, "scales"),
    ("Affine", {"translation": 4.0}, "translation"),
    ("Blur", {"std": (0.5, 1.5)}, "std"),
    ("Blur", {"std": 2.0}, "std"),                     # nonneg scalar -> (0, 2)?
    ("Gamma", {"log_gamma": 0.3}, "log_gamma"),
    ("Noise", {"std": 0.25}, "std"),
    ("Motion", {"degrees": 7.0}, "degrees"),
    ("Motion", {"translation": 3.0}, "translation"),
]


@pytest.mark.parametrize(
    "name,kwargs,attr",
    CASES,
    ids=[f"{c[0]}-{c[2]}-{c[1][c[2]]}" for c in CASES],
)
def test_sampling_bounds_match(name, kwargs, attr):
    tio.seed(0)
    t_ref = getattr(ref, name)(**kwargs)
    t_mine = getattr(tio, name)(**kwargs)
    lo_r, hi_r = _bounds_ref(t_ref, attr)
    lo_m, hi_m = _bounds_mine(t_mine, attr)
    width = max(hi_r - lo_r, 1e-6)
    # empirical extremes of 400 uniform draws land within ~2% of the ends
    assert abs(lo_m - lo_r) < 0.08 * width + 1e-6, (lo_m, lo_r, hi_m, hi_r)
    assert abs(hi_m - hi_r) < 0.08 * width + 1e-6, (lo_m, lo_r, hi_m, hi_r)


def test_choice_support_matches():
    tio.seed(1)
    values = [1.0, 2.0, 5.0]
    c_ref = ref.Choice(values)
    c_mine = tio.Choice(values)
    seen_ref = {float(c_ref.sample()) for _ in range(100)}
    seen_mine = {float(np.asarray(c_mine.sample())) for _ in range(100)}
    assert seen_ref == seen_mine == set(values)


def test_isotropic_scales_equal_axes():
    tio.seed(2)
    t = tio.Affine(scales=(0.8, 1.2), isotropic=True)
    # isotropic sampling is resolved at make_params; the recorded affine
    # matrix must scale all three axes identically
    subject = tio.Subject(
        t1=tio.ScalarImage(np.zeros((1, 4, 4, 4), np.float32))
    )
    from torchio_tpu.data.batch import SubjectsBatch

    batch = SubjectsBatch.from_subjects([subject])
    params = t.make_params(batch)
    mat = np.asarray(params["affine_matrix"])
    norms = np.linalg.norm(mat[:3, :3], axis=0)
    assert np.allclose(norms, norms[0], atol=1e-5)


def test_constructor_surface_superset():
    """Every reference transform ctor arg exists on the torchio_tpu class.

    ``To`` is exempt: the reference forwards ``*to_args/**to_kwargs`` to
    ``Tensor.to``; torchio_tpu names them (device, dtype) and accepts the
    positional convention (a lone dtype-like argument is the dtype).
    """
    import inspect

    exempt = {"To"}
    data_model = [
        "Image", "ScalarImage", "LabelMap", "Subject", "Points",
        "BoundingBoxes", "SubjectsBatch", "ImagesBatch", "SubjectsLoader",
        "ImagesLoader", "Queue", "GridSampler", "UniformSampler",
        "WeightedSampler", "LabelSampler", "PatchAggregator",
        "PatchLocation", "Compose", "OneOf", "SomeOf",
    ]
    gaps = []
    transform_names = [
        d for d in dir(ref)
        if isinstance(getattr(ref, d), type)
        and (
            hasattr(getattr(ref, d), "apply_transform")
            or hasattr(getattr(ref, d), "make_params")
        )
    ]
    for name in sorted(set(transform_names) | set(data_model)):
        rcls = getattr(ref, name)
        if name in exempt:
            continue
        mcls = getattr(tio, name, None)
        assert mcls is not None, f"{name} missing from torchio_tpu"
        try:
            rsig = set(inspect.signature(rcls.__init__).parameters)
            msig = set(inspect.signature(mcls.__init__).parameters)
        except (ValueError, TypeError):
            continue
        gap = (rsig - msig) - {"self", "args", "kwargs"}
        if gap:
            gaps.append((name, sorted(gap)))
    assert not gaps, gaps


def test_to_accepts_positional_dtype():
    import jax.numpy as jnp

    data = np.ones((1, 4, 4, 4), np.float32)
    out = tio.To(jnp.bfloat16)(data)
    assert np.asarray(out).dtype == jnp.bfloat16


def test_top_level_api_superset():
    """Every public top-level reference name exists in torchio_tpu.

    'version' is exempt: it is the reference's leaked
    ``from importlib.metadata import version`` helper, not API.
    """
    ref_pub = {n for n in dir(ref) if not n.startswith("_")} - {"version"}
    mine_pub = {n for n in dir(tio) if not n.startswith("_")}
    assert not (ref_pub - mine_pub), sorted(ref_pub - mine_pub)


ERROR_CASES = [
    (
        "5d-tensor",
        lambda m, torch_mode: m.ScalarImage(
            _as(np.random.rand(1, 1, 4, 4, 4).astype(np.float32), torch_mode)
        ),
        ValueError,
    ),
    (
        "3x3-affine",
        lambda m, torch_mode: m.ScalarImage(
            _as(np.random.rand(1, 4, 4, 4).astype(np.float32), torch_mode),
            affine=np.eye(3),
        ),
        ValueError,
    ),
    (
        "negative-scales",
        lambda m, torch_mode: m.Affine(scales=(-1.0, 1.0)),
        ValueError,
    ),
    (
        "bad-interpolation",
        lambda m, torch_mode: m.Affine(image_interpolation="cubic?"),
        ValueError,
    ),
    (
        "bad-pad-mode",
        lambda m, torch_mode: m.Pad(padding=1, padding_mode="nope"),
        ValueError,
    ),
    (
        "inconsistent-shapes",
        lambda m, torch_mode: m.Subject(
            a=m.ScalarImage(_as(np.random.rand(1, 4, 4, 4).astype(np.float32), torch_mode)),
            b=m.ScalarImage(_as(np.random.rand(1, 5, 5, 5).astype(np.float32), torch_mode)),
        ).spatial_shape,
        RuntimeError,
    ),
]


def _as(arr, torch_mode):
    if torch_mode:
        import torch

        return torch.as_tensor(arr)
    return arr


@pytest.mark.parametrize(
    "build,exc", [c[1:] for c in ERROR_CASES], ids=[c[0] for c in ERROR_CASES]
)
def test_error_paths_match_reference(build, exc):
    with pytest.raises(exc):
        build(ref, True)
    with pytest.raises(exc):
        build(tio, False)

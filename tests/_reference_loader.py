"""Import the reference TorchIO (at /root/reference/src) with stubbed I/O deps.

The reference's heavy wheel dependencies (nibabel, SimpleITK, fsspec,
niizarr, loguru, ...) are not installed in this environment, but its
transform MATH is pure torch. Stubbing just enough of the I/O layer lets
golden-parity tests run reference transforms on in-memory tensors and
compare against torchio_tpu outputs (SURVEY.md section 7.4: golden-output
corpus).

Only for tests. Never import this from library code.
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

REFERENCE_SRC = Path("/root/reference/src")


def _unavailable(*_a, **_k):
    raise RuntimeError("stubbed reference I/O dependency used at runtime")


def _stub(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    mod.__path__ = []  # behave as a package for submodule imports
    sys.modules[name] = mod
    return mod


def load_reference(debug: bool = False):
    """Return the reference ``torchio`` module, or None if unavailable."""
    if "torchio" in sys.modules:
        return sys.modules["torchio"]
    if not REFERENCE_SRC.exists():
        return None

    class _FakeClass:
        pass

    class _OpenFile:
        pass

    names = [
        "nibabel",
        "nibabel.orientations",
        "nibabel.spatialimages",
        "nibabel.filebasedimages",
        "nibabel.affines",
        "nibabel.nifti1",
        "nibabel.arrayproxy",
        "fsspec",
        "fsspec.core",
        "niizarr",
        "humanize",
        "platformdirs",
        "tyro",
        "loguru",
        "SimpleITK",
    ]
    created = {}
    for name in names:
        if name not in sys.modules:
            created[name] = _stub(name)

    ns = sys.modules
    if "nibabel" in created:
        nib = ns["nibabel"]
        nib.orientations = ns["nibabel.orientations"]
        nib.spatialimages = ns["nibabel.spatialimages"]
        ns["nibabel.spatialimages"].SpatialImage = _FakeClass
        ns["nibabel.filebasedimages"].FileBasedImage = _FakeClass

        class _Nifti1Image:
            pass

        class _Nifti2Image:
            pass

        nib.Nifti1Image = _Nifti1Image
        nib.Nifti2Image = _Nifti2Image
        nib.load = _unavailable
        nib.save = _unavailable

        import numpy as _numpy

        def _aff2axcodes(affine):
            # minimal RAS-code derivation, enough for AffineMatrix reprs
            codes = []
            labels = (("L", "R"), ("P", "A"), ("I", "S"))
            m = _numpy.asarray(affine)[:3, :3]
            for col in range(3):
                row = int(_numpy.argmax(_numpy.abs(m[:, col])))
                codes.append(labels[row][1 if m[row, col] > 0 else 0])
            return tuple(codes)

        ns["nibabel.orientations"].aff2axcodes = _aff2axcodes

        # the reference's runtime orientation math runs on torchio_tpu's
        # own nibabel-free implementations (core/orientation.py), which
        # doubles as an oracle check of those functions
        from torchio_tpu.core import orientation as _ori

        for fn in (
            "io_orientation",
            "axcodes2ornt",
            "ornt_transform",
            "apply_orientation",
            "inv_ornt_aff",
        ):
            setattr(ns["nibabel.orientations"], fn, getattr(_ori, fn))
    if "SimpleITK" in created:
        sitk = ns["SimpleITK"]
        sitk.Image = _FakeClass
        for attr in (
            "GetArrayFromImage", "GetImageFromArray", "ImageFileReader",
            "ReadImage", "WriteImage",
        ):
            setattr(sitk, attr, _unavailable)
        for bits in (8, 16, 32, 64):
            for prefix in ("sitkFloat", "sitkInt", "sitkUInt",
                           "sitkVectorFloat", "sitkVectorInt", "sitkVectorUInt"):
                setattr(sitk, f"{prefix}{bits}", object())
    if "fsspec" in created:
        ns["fsspec"].core = ns["fsspec.core"]
        ns["fsspec.core"].OpenFile = _OpenFile
    if "loguru" in created:
        noop = lambda *a, **k: None  # noqa: E731
        ns["loguru"].logger = types.SimpleNamespace(
            disable=noop, enable=noop, remove=noop, add=noop,
            debug=noop, info=noop, warning=noop, error=noop,
        )
    if "humanize" in created:
        ns["humanize"].naturalsize = lambda x: str(x)
    if "platformdirs" in created:
        ns["platformdirs"].user_cache_dir = lambda *a, **k: "/tmp/tio_ref_cache"

    sys.path.insert(0, str(REFERENCE_SRC))
    # torchio/__init__ looks its version up in installed-package metadata,
    # which doesn't exist for a source tree on sys.path
    import importlib.metadata as _ilm

    orig_version = _ilm.version
    _ilm.version = lambda name: (
        "0.0.0-reference" if name == "torchio" else orig_version(name)
    )
    try:
        import torchio  # noqa: F401

        # drop the stubs from sys.modules so optional-dependency gating in
        # torchio_tpu (and any other import of these names) is unaffected;
        # the reference keeps working through its held module references
        for name in created:
            sys.modules.pop(name, None)
        return sys.modules["torchio"]
    except Exception:
        # clean partial state so other tests are unaffected
        for name in list(sys.modules):
            if name == "torchio" or name.startswith("torchio."):
                del sys.modules[name]
        for name in created:
            sys.modules.pop(name, None)
        sys.path.remove(str(REFERENCE_SRC))
        if debug:
            raise
        return None
    finally:
        _ilm.version = orig_version

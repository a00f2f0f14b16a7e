"""History -> inverse pipeline reconstruction.

Parity reference: ``/root/reference/src/torchio/transforms/inverse.py``.
"""

from __future__ import annotations

import warnings
from typing import Any

from .compose import Compose
from .transform import _TRANSFORM_REGISTRY, AppliedTransform, IntensityTransform, Transform


def get_inverse_transform(
    history: list[AppliedTransform],
    *,
    warn: bool = True,
    ignore_intensity: bool = False,
) -> Compose:
    """Compose of inverses, walking the history in reverse.

    Non-invertible transforms are skipped (with a warning). Inverse
    instances are built from recorded params alone via
    ``cls.inverse(params)`` without running ``__init__``.
    """
    steps: list[Transform] = []
    for trace in reversed(history):
        cls = _TRANSFORM_REGISTRY.get(trace.name)
        if cls is None:
            if warn:
                warnings.warn(
                    f"Unknown transform {trace.name!r} in history, skipping",
                    stacklevel=2,
                )
            continue
        if ignore_intensity and issubclass(cls, IntensityTransform):
            continue
        instance = object.__new__(cls)
        if not instance.invertible:
            if warn:
                warnings.warn(
                    f"{trace.name} is not invertible, skipping", stacklevel=2
                )
            continue
        inv = instance.inverse(trace.params)
        inv.include = trace.include
        inv.exclude = trace.exclude
        steps.append(inv)
    return Compose(steps)


def apply_inverse_transform(
    data: Any,
    *,
    warn: bool = True,
    ignore_intensity: bool = False,
) -> Any:
    """Undo all recorded transforms on any history-carrying object."""
    if not hasattr(data, "applied_transforms"):
        return data
    if getattr(data, "_per_element_history", None) is not None:
        return data.apply_inverse_transform(
            warn=warn, ignore_intensity=ignore_intensity
        )
    inverse = get_inverse_transform(
        data.applied_transforms, warn=warn, ignore_intensity=ignore_intensity
    )
    result = inverse(data)
    if hasattr(result, "applied_transforms"):
        result.applied_transforms = []
    return result

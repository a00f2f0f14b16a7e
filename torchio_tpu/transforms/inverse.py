"""History -> inverse pipeline reconstruction.

Parity reference: ``/root/reference/src/torchio/transforms/inverse.py``.
Behavior contract: walk the recorded history backwards; rebuild each
invertible transform from its serialized params via the class registry
(``object.__new__`` so ``__init__`` never reruns); skip unknown or
non-invertible entries with a warning; optionally drop all intensity
transforms; propagate each record's include/exclude scoping.
"""

from __future__ import annotations

import warnings
from typing import Any, Iterable

from .compose import Compose
from .transform import _TRANSFORM_REGISTRY, AppliedTransform, IntensityTransform, Transform


def _invert_one(trace: AppliedTransform, *, warn: bool, skip_intensity: bool):
    """Build the inverse of a single history record, or None to skip."""
    cls = _TRANSFORM_REGISTRY.get(trace.name)
    if cls is None:
        if warn:
            warnings.warn(
                f"Unknown transform {trace.name!r} in history, skipping",
                stacklevel=3,
            )
        return None
    if skip_intensity and issubclass(cls, IntensityTransform):
        return None
    shell = object.__new__(cls)  # params-only reconstruction, no __init__
    if not shell.invertible:
        if warn:
            warnings.warn(f"{trace.name} is not invertible, skipping", stacklevel=3)
        return None
    inverse = shell.inverse(trace.params)
    inverse.include = trace.include
    inverse.exclude = trace.exclude
    return inverse


def get_inverse_transform(
    history: Iterable[AppliedTransform],
    *,
    warn: bool = True,
    ignore_intensity: bool = False,
) -> Compose:
    """A Compose undoing ``history`` (most recent transform first)."""
    steps: list[Transform] = []
    for trace in reversed(list(history)):
        inverse = _invert_one(trace, warn=warn, skip_intensity=ignore_intensity)
        if inverse is not None:
            steps.append(inverse)
    # copy=True (default) so inverting never mutates the caller's data,
    # consistent with every forward transform.
    return Compose(steps)


def apply_inverse_transform(
    data: Any,
    *,
    warn: bool = True,
    ignore_intensity: bool = False,
) -> Any:
    """Undo all recorded transforms on any history-carrying object.

    Batches holding per-element histories (from a per-instance
    OneOf/SomeOf) delegate to their own element-wise inversion.
    """
    history = getattr(data, "applied_transforms", None)
    if history is None:
        return data
    if getattr(data, "_per_element_history", None) is not None:
        return data.apply_inverse_transform(
            warn=warn, ignore_intensity=ignore_intensity
        )
    pipeline = get_inverse_transform(
        history, warn=warn, ignore_intensity=ignore_intensity
    )
    result = pipeline(data)
    if hasattr(result, "applied_transforms"):
        result.applied_transforms = []
    return result

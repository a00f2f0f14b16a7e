"""To: device/dtype placement as a pipeline step.

Parity reference: ``/root/reference/src/torchio/transforms/to.py``.
For JAX, devices are e.g. ``"tpu"``, ``"cpu"``, or a ``jax.Device``.
"""

from __future__ import annotations

from typing import Any

from ..data.batch import SubjectsBatch
from .transform import Transform


class To(Transform):
    """Move batch data to a device and/or cast dtype."""

    def __init__(self, device: Any = None, dtype: Any = None, **kwargs: Any) -> None:
        kwargs.setdefault("copy", False)
        super().__init__(**kwargs)
        self.device = device
        self.dtype = dtype

    def apply_transform(
        self, batch: SubjectsBatch, params: dict[str, Any]
    ) -> SubjectsBatch:
        return batch.to(self.device, self.dtype)

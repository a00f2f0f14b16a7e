"""To: device/dtype placement as a pipeline step.

Parity reference: ``/root/reference/src/torchio/transforms/to.py``.
For JAX, devices are e.g. ``"tpu"``, ``"cpu"``, or a ``jax.Device``.
"""

from __future__ import annotations

from typing import Any

from ..data.batch import SubjectsBatch
from .transform import Transform


def _looks_like_dtype(value: Any) -> bool:
    import numpy as np

    if value is None or isinstance(value, str) and not hasattr(np, value):
        return False
    try:
        np.dtype(value)
        return True
    except TypeError:
        return False


class To(Transform):
    """Move batch data to a device and/or cast dtype.

    Accepts the reference's positional convention (``To("cpu")``,
    ``To(jnp.float32)``, ``To(device, dtype)``): a lone dtype-like
    positional argument is treated as the dtype.
    """

    def __init__(self, device: Any = None, dtype: Any = None, **kwargs: Any) -> None:
        kwargs.setdefault("copy", False)
        super().__init__(**kwargs)
        if dtype is None and _looks_like_dtype(device):
            device, dtype = None, device
        self.device = device
        self.dtype = dtype

    def apply_transform(
        self, batch: SubjectsBatch, params: dict[str, Any]
    ) -> SubjectsBatch:
        return batch.to(self.device, self.dtype)

"""Normalize / RescaleIntensity: clip + linear map to an output range.

Parity reference:
``/root/reference/src/torchio/transforms/intensity/normalize.py``
(explicit or percentile-derived input range, per-image stats from the
first batch element, randomizable output range, masking via LabelMap key
or callable, invertible via ``_RescaleInverse``).
"""

from __future__ import annotations

import warnings
from typing import Any, Callable

import jax.numpy as jnp
import numpy as np

from ...data.batch import ImagesBatch, SubjectsBatch
from ...data.image import LabelMap
from .._statistics import quantiles_on_device
from .._utils import as_jnp, broadcast_param
from ..parameter_range import to_range
from ..transform import DeferredParam, IntensityTransform


class Normalize(IntensityTransform):
    r"""Clip to an input range and linearly rescale to an output range.

    :math:`v_{out} = (v - m_{min}) / (m_{max} - m_{min})
    \cdot (n_{max} - n_{min}) + n_{min}`

    Args:
        out_min / out_max: output bounds (randomizable).
        in_min / in_max: explicit input bounds; if ``None``, derived from
            percentiles of the (masked) data per image.
        percentile_low / percentile_high: percentiles for auto input
            range; nnU-Net convention is ``(0.5, 99.5)``.
        masking_method: ``None`` (all voxels), a LabelMap key, or a
            callable ``tensor -> bool mask``.
    """

    def __init__(
        self,
        *,
        out_min: Any = -1.0,
        out_max: Any = 1.0,
        in_min: Any = None,
        in_max: Any = None,
        percentile_low: Any = 0.0,
        percentile_high: Any = 100.0,
        masking_method: str | Callable | None = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        self.out_min = to_range(out_min)
        self.out_max = to_range(out_max)
        self.in_min = to_range(in_min) if in_min is not None else None
        self.in_max = to_range(in_max) if in_max is not None else None
        self.percentile_low = to_range(percentile_low)
        self.percentile_high = to_range(percentile_high)
        self.masking_method = masking_method

    @property
    def supports_per_instance_params(self) -> bool:
        return True

    def make_params(self, batch: SubjectsBatch) -> dict[str, Any]:
        n = self._resolve_n(batch)
        out_min = self.out_min.sample_1d(n)
        out_max = self.out_max.sample_1d(n)
        params: dict[str, Any] = {
            "out_min": self._serialize_param(out_min),
            "out_max": self._serialize_param(out_max),
        }
        if self.in_min is not None and self.in_max is not None:
            params["in_min"] = self.in_min.sample_1d()
            params["in_max"] = self.in_max.sample_1d()
        else:
            pct_low = self.percentile_low.sample_1d()
            pct_high = self.percentile_high.sample_1d()
            in_ranges: dict[str, tuple[float, float]] = {}
            for name, img_batch in self._get_images(batch).items():
                mask = self._get_mask(img_batch, batch)
                in_ranges[name] = _percentile_range(
                    img_batch.data[0], mask, pct_low, pct_high, name
                )
            params["in_ranges"] = in_ranges
        if n is not None:
            self._tag_batched(params, batch, n, None, ["out_min", "out_max"])
        return params

    def fusable(self, batch: SubjectsBatch) -> bool:
        if self.masking_method is not None or not self._get_images(batch):
            return False
        explicit = self.in_min is not None and self.in_max is not None
        if explicit:
            return True
        # percentile shortcut selection (0,100 -> min/max) must be a
        # static program property, so randomized percentiles stay on
        # the unfused path
        return (
            self.percentile_low.is_deterministic
            and self.percentile_high.is_deterministic
        )

    def fused_stage(self, batch: SubjectsBatch):
        from ..fuse import FusedStage, install_range_params, normalize_apply

        names = tuple(self._get_images(batch))
        if not names:
            return None
        # identical RNG order to make_params
        n = self._resolve_n(batch)
        out_min = self.out_min.sample_1d(n)
        out_max = self.out_max.sample_1d(n)
        params: dict[str, Any] = {
            "out_min": self._serialize_param(out_min),
            "out_max": self._serialize_param(out_max),
        }
        omin = jnp.asarray(np.asarray(out_min, np.float32))
        omax = jnp.asarray(np.asarray(out_max, np.float32))
        explicit = self.in_min is not None and self.in_max is not None
        if explicit:
            in_min = self.in_min.sample_1d()
            in_max = self.in_max.sample_1d()
            params["in_min"] = in_min
            params["in_max"] = in_max
            args = (
                jnp.float32(in_min), jnp.float32(in_max), omin, omax,
            )
            finish = None
        else:
            pct_low = self.percentile_low.sample_1d()
            pct_high = self.percentile_high.sample_1d()
            use_minmax = pct_low == 0.0 and pct_high == 100.0
            args = (
                omin, omax,
                jnp.asarray(
                    [pct_low / 100.0, pct_high / 100.0], jnp.float32
                ),
            )
            finish = install_range_params
        if n is not None:
            self._tag_batched(params, batch, n, None, ["out_min", "out_max"])
        return FusedStage(
            key=(
                "normalize", names, explicit,
                None if explicit else use_minmax,
            ),
            apply=normalize_apply(
                names, explicit, False if explicit else use_minmax
            ),
            args=args,
            params=params,
            finish=finish,
        )

    def apply_transform(
        self, batch: SubjectsBatch, params: dict[str, Any]
    ) -> SubjectsBatch:
        for name, img_batch in self._get_images(batch).items():
            deferred = None
            if "in_min" in params:
                in_min, in_max = params["in_min"], params["in_max"]
            else:
                in_ranges = params.get("in_ranges", {})
                if name not in in_ranges:
                    continue
                bounds = in_ranges[name]
                if isinstance(bounds, DeferredParam):
                    if jnp.issubdtype(
                        jnp.asarray(img_batch.data).dtype, jnp.floating
                    ):
                        # stats are still on device (no host pull yet):
                        # consume the 0-d arrays inside the traced
                        # compute; the zero-range guard becomes a
                        # where-select and its warning fires at
                        # resolution (post-dispatch)
                        deferred = bounds.device
                        in_min, in_max = deferred[0], deferred[1]
                    else:
                        # integer images: the eager path's zero-range
                        # no-op must preserve the original dtype, which
                        # the traced where-select cannot — resolve now
                        # (the finalizer already warns on a zero range,
                        # so suppress the eager branch's duplicate)
                        in_ranges[name] = bounds.resolve()
                        in_min, in_max = in_ranges[name]
                        if in_max - in_min == 0:
                            continue
                else:
                    in_min, in_max = bounds
            data = as_jnp(img_batch.data).astype(jnp.float32)
            out_min = broadcast_param(params["out_min"], data)
            out_max = broadcast_param(params["out_max"], data)
            out_range = out_max - out_min
            if deferred is not None:
                in_range = in_max - in_min
                safe = jnp.where(in_range == 0, 1.0, in_range)
                clipped = jnp.clip(data, in_min, in_max)
                scaled = (clipped - in_min) / safe * out_range + out_min
                img_batch.data = jnp.where(in_range == 0, data, scaled)
                continue
            in_range = in_max - in_min
            if in_range == 0:
                warnings.warn(
                    f'Cannot rescale "{name}": input range is zero.',
                    RuntimeWarning,
                    stacklevel=2,
                )
                continue
            data = jnp.clip(data, in_min, in_max)
            img_batch.data = (data - in_min) / in_range * out_range + out_min
        return batch

    @property
    def invertible(self) -> bool:
        return True

    def inverse(self, params: dict[str, Any]) -> "_RescaleInverse":
        return _RescaleInverse(
            out_min=params["out_min"],
            out_max=params["out_max"],
            in_min=params.get("in_min"),
            in_max=params.get("in_max"),
            in_ranges=params.get("in_ranges"),
            copy=False,
        )

    def _get_mask(self, img_batch: ImagesBatch, batch: SubjectsBatch):
        return resolve_mask(self.masking_method, img_batch, batch)


def resolve_mask(masking_method, img_batch: ImagesBatch, batch: SubjectsBatch):
    """Resolve a masking spec to a boolean array over the first sample."""
    if masking_method is None:
        return None
    if callable(masking_method) and not isinstance(masking_method, str):
        return np.asarray(masking_method(np.asarray(img_batch.data[0]))).astype(bool)
    if isinstance(masking_method, str):
        if masking_method not in batch.images:
            raise KeyError(
                f'Masking method "{masking_method}" not found in batch'
                f" images. Available: {list(batch.images)}"
            )
        mask_batch = batch.images[masking_method]
        if not issubclass(mask_batch.image_class, LabelMap):
            raise TypeError(
                f'Masking method "{masking_method}" must refer to a LabelMap.'
            )
        # stay on device: pulling a 256^3 mask to host costs seconds
        # through a slow host<->device link; only scalars ever come back
        return as_jnp(mask_batch.data[0]) != 0
    raise TypeError(
        f"masking_method must be None, str, or callable, got {type(masking_method)}"
    )


def _percentile_range(tensor, mask, pct_low, pct_high, name) -> DeferredParam:
    """Deferred (low, high) intensity percentiles, computed ON DEVICE.

    The naive route (``np.asarray`` then numpy percentile) round-trips
    the whole volume through the host. Here the pair stays on device and
    is recorded as a :class:`DeferredParam`: the compute consumes the
    0-d arrays directly, and the ONE scalar transfer happens after the
    output dispatch (``Transform.forward``) — zero blocking round trips
    on the hot path. pct (0, 100) short-circuits to min/max (no sort).
    """
    data = as_jnp(tensor).astype(jnp.float32).reshape(-1)
    pair = None
    if mask is not None:
        m = jnp.broadcast_to(as_jnp(mask).reshape(np.shape(mask)), np.shape(tensor))
        m = m.reshape(-1)
        # deliberate blocking pull (masked configs only): the empty-mask
        # fallback changes which program runs, so it cannot be deferred
        if not bool(jnp.any(m)):
            warnings.warn(
                f'Cannot compute percentiles for "{name}": mask is empty.'
                " Using full range.",
                RuntimeWarning,
                stacklevel=3,
            )
        elif pct_low == 0.0 and pct_high == 100.0:
            big = jnp.float32(jnp.inf)
            pair = jnp.stack(
                [
                    jnp.min(jnp.where(m, data, big)),
                    jnp.max(jnp.where(m, data, -big)),
                ]
            )
        else:
            masked = jnp.where(m, data, jnp.nan)
            pair = quantiles_on_device(
                masked, [pct_low / 100.0, pct_high / 100.0]
            )
    if pair is None:
        if pct_low == 0.0 and pct_high == 100.0:
            pair = jnp.stack([jnp.min(data), jnp.max(data)])
        else:
            # one program for BOTH percentiles (count-based order
            # statistics — no sort; see transforms/_statistics.py)
            pair = quantiles_on_device(data, [pct_low / 100.0, pct_high / 100.0])

    def finalize(host: np.ndarray) -> tuple[float, float]:
        low, high = float(host[0]), float(host[1])
        if high - low == 0:
            warnings.warn(
                f'Cannot rescale "{name}": input range is zero.',
                RuntimeWarning,
                stacklevel=2,
            )
        return (low, high)

    return DeferredParam(pair, finalize)


class _RescaleInverse(IntensityTransform):
    """Inverse of Normalize for history replay."""

    def __init__(
        self,
        *,
        out_min,
        out_max,
        in_min,
        in_max,
        in_ranges,
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        self._out_min = out_min
        self._out_max = out_max
        self._in_min = in_min
        self._in_max = in_max
        self._in_ranges = in_ranges

    def apply_transform(
        self, batch: SubjectsBatch, params: dict[str, Any]
    ) -> SubjectsBatch:
        for name, img_batch in self._get_images(batch).items():
            if self._in_min is not None and self._in_max is not None:
                in_min, in_max = self._in_min, self._in_max
            elif self._in_ranges is not None and name in self._in_ranges:
                in_min, in_max = self._in_ranges[name]
            else:
                continue
            in_range = in_max - in_min
            if in_range == 0:
                continue
            data = as_jnp(img_batch.data).astype(jnp.float32)
            out_min = broadcast_param(self._out_min, data)
            out_max = broadcast_param(self._out_max, data)
            out_range = out_max - out_min
            if isinstance(out_range, float):
                if out_range == 0:
                    continue
                img_batch.data = (data - out_min) / out_range * in_range + in_min
            else:
                zero = out_range == 0
                safe = jnp.where(zero, jnp.ones_like(out_range), out_range)
                restored = (data - out_min) / safe * in_range + in_min
                img_batch.data = jnp.where(zero, data, restored)
        return batch

    def make_params(self, batch: SubjectsBatch) -> dict[str, Any]:
        return {}


RescaleIntensity = Normalize

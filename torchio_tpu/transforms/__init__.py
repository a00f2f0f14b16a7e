"""Transform engine + zoo.

Engine pieces (base class, randomization DSL, composition, inversion)
live at this level; the zoo is grouped by effect family:

- ``spatial/``   geometry: the unified Spatial resampler and friends
- ``intensity/`` MRI-physics simulation + normalization
- ``label/``     label-map manipulation

Every public transform is re-exported here; ``__all__`` is derived from
the grouped tables below so a name can never be exported without being
imported (and vice versa).
"""

from .transform import AppliedTransform  # noqa: F401
from .transform import IntensityTransform  # noqa: F401
from .transform import SpatialTransform  # noqa: F401
from .transform import Transform  # noqa: F401
from .parameter_range import _ParameterRange  # noqa: F401
from .parameter_range import to_nonneg_range  # noqa: F401
from .parameter_range import to_range  # noqa: F401
from .parameter_range import Choice
from .compose import Compose, OneOf, SomeOf
from .inverse import apply_inverse_transform, get_inverse_transform

# --- geometry ---------------------------------------------------------
from .spatial.spatial import Affine, ElasticDeformation, Resample, Spatial
from .spatial.flip import Flip
from .spatial.pad import Pad
from .spatial.crop import Crop
from .spatial.crop_or_pad import CropOrPad, EnsureShapeMultiple
from .spatial.reorient import Reorient
from .spatial.resize import Resize
from .spatial.anisotropy import Anisotropy
from .spatial.transpose import CopyAffine, Transpose
from .spatial.to_reference_space import ToReferenceSpace

# --- intensity --------------------------------------------------------
from .intensity.noise import Noise
from .intensity.blur import Blur
from .intensity.bias_field import BiasField
from .intensity.gamma import Gamma
from .intensity.clamp import Clamp
from .intensity.motion import Motion
from .intensity.ghosting import Ghosting
from .intensity.spike import Spike
from .intensity.normalize import Normalize, RescaleIntensity
from .intensity.standardize import Standardize, ZNormalization
from .intensity.histogram_standardization import (
    HistogramStandardization,
    compute_histogram_landmarks,
)
from .intensity.labels_to_image import LabelsToImage
from .intensity.swap import Swap
from .intensity.mask import Mask
from .intensity.pca import PCA

# --- labels -----------------------------------------------------------
from .label.one_hot import OneHot
from .label.remap_labels import RemapLabels, RemoveLabels
from .label.sequential_labels import SequentialLabels
from .label.contour import Contour
from .label.keep_largest import KeepLargestComponent

# --- glue -------------------------------------------------------------
from .lambda_transform import Lambda
from .to import To
from .monai_adapter import CornucopiaAdapter, MonaiAdapter

_ENGINE = (
    Transform, AppliedTransform, SpatialTransform, IntensityTransform,
    Choice, Compose, OneOf, SomeOf,
    apply_inverse_transform, get_inverse_transform,
)
_GEOMETRY = (
    Spatial, Affine, ElasticDeformation, Resample,
    Flip, Pad, Crop, CropOrPad, EnsureShapeMultiple,
    Reorient, Resize, Anisotropy, Transpose, CopyAffine, ToReferenceSpace,
)
_INTENSITY = (
    Noise, Blur, BiasField, Gamma, Clamp,
    Motion, Ghosting, Spike,
    Normalize, RescaleIntensity, Standardize, ZNormalization,
    HistogramStandardization, compute_histogram_landmarks,
    LabelsToImage, Swap, Mask, PCA,
)
_LABEL = (
    OneHot, RemapLabels, RemoveLabels, SequentialLabels,
    Contour, KeepLargestComponent,
)
_GLUE = (Lambda, To, MonaiAdapter, CornucopiaAdapter)

__all__ = sorted(
    obj.__name__ for group in (_ENGINE, _GEOMETRY, _INTENSITY, _LABEL, _GLUE)
    for obj in group
)

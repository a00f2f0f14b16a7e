from .compose import Compose, OneOf, SomeOf
from .intensity.clamp import Clamp
from .intensity.gamma import Gamma
from .intensity.noise import Noise
from .intensity.normalize import Normalize, RescaleIntensity
from .intensity.standardize import Standardize, ZNormalization
from .inverse import apply_inverse_transform, get_inverse_transform
from .lambda_transform import Lambda
from .parameter_range import Choice, _ParameterRange, to_nonneg_range, to_range
from .spatial.crop import Crop
from .spatial.flip import Flip
from .spatial.pad import Pad
from .spatial.spatial import Affine, ElasticDeformation, Resample, Spatial
from .to import To
from .transform import (
    AppliedTransform,
    IntensityTransform,
    SpatialTransform,
    Transform,
)

__all__ = [
    "Affine",
    "AppliedTransform",
    "ElasticDeformation",
    "Resample",
    "Spatial",
    "Choice",
    "Clamp",
    "Compose",
    "Crop",
    "Flip",
    "Gamma",
    "IntensityTransform",
    "Lambda",
    "Noise",
    "Normalize",
    "OneOf",
    "Pad",
    "RescaleIntensity",
    "SomeOf",
    "SpatialTransform",
    "Standardize",
    "To",
    "Transform",
    "ZNormalization",
    "apply_inverse_transform",
    "get_inverse_transform",
]

"""torchio_tpu: TPU-native 3D medical image preprocessing and augmentation.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of TorchIO v2
(reference: TorchIO-project/torchio). Volumes are (C, I, J, K) arrays with
RAS+ affine metadata; batches are (B, C, I, J, K) arrays; transforms are
pure jnp functions jit-fused per Compose pipeline.
"""

__version__ = "0.1.0"

from . import random  # noqa: A004  (module named like stdlib on purpose, like torch)
from .core.affine import AffineMatrix
from .data.batch import ImagesBatch, StudiesBatch, SubjectsBatch
from .data.bboxes import BoundingBoxes, BoundingBoxFormat, Representation
from .data.image import Image, LabelMap, ScalarImage
from .data.patch import PatchLocation
from .data.points import Points
from .data.subject import Study, Subject
from .io import read_header, read_nifti, write_nifti
from .transforms import (
    Affine,
    AppliedTransform,
    ElasticDeformation,
    Resample,
    Spatial,
    Choice,
    Clamp,
    Compose,
    Crop,
    Flip,
    Gamma,
    IntensityTransform,
    Lambda,
    Noise,
    Normalize,
    OneOf,
    Pad,
    RescaleIntensity,
    SomeOf,
    SpatialTransform,
    Standardize,
    To,
    Transform,
    ZNormalization,
    apply_inverse_transform,
    get_inverse_transform,
)

seed = random.seed

__all__ = [
    "Affine",
    "AffineMatrix",
    "AppliedTransform",
    "ElasticDeformation",
    "Resample",
    "Spatial",
    "BoundingBoxFormat",
    "BoundingBoxes",
    "Choice",
    "Clamp",
    "Compose",
    "Crop",
    "Flip",
    "Gamma",
    "Image",
    "ImagesBatch",
    "IntensityTransform",
    "LabelMap",
    "Lambda",
    "Noise",
    "Normalize",
    "OneOf",
    "Pad",
    "PatchLocation",
    "Points",
    "Representation",
    "RescaleIntensity",
    "ScalarImage",
    "SomeOf",
    "SpatialTransform",
    "Standardize",
    "StudiesBatch",
    "Study",
    "Subject",
    "SubjectsBatch",
    "To",
    "Transform",
    "ZNormalization",
    "apply_inverse_transform",
    "get_inverse_transform",
    "random",
    "read_header",
    "read_nifti",
    "seed",
    "write_nifti",
]

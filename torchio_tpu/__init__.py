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
    PCA,
    Affine,
    Anisotropy,
    AppliedTransform,
    BiasField,
    Blur,
    Choice,
    Clamp,
    Compose,
    Contour,
    Crop,
    ElasticDeformation,
    Flip,
    Gamma,
    Ghosting,
    HistogramStandardization,
    IntensityTransform,
    KeepLargestComponent,
    LabelsToImage,
    Lambda,
    Mask,
    Motion,
    Noise,
    Normalize,
    OneHot,
    OneOf,
    Pad,
    RemapLabels,
    RemoveLabels,
    Resample,
    RescaleIntensity,
    SequentialLabels,
    SomeOf,
    Spatial,
    SpatialTransform,
    Spike,
    Standardize,
    Swap,
    To,
    Transform,
    ZNormalization,
    apply_inverse_transform,
    compute_histogram_landmarks,
    get_inverse_transform,
)

seed = random.seed

__all__ = [
    "PCA",
    "Affine",
    "AffineMatrix",
    "Anisotropy",
    "AppliedTransform",
    "BiasField",
    "Blur",
    "BoundingBoxFormat",
    "BoundingBoxes",
    "Choice",
    "Clamp",
    "Compose",
    "Contour",
    "Crop",
    "ElasticDeformation",
    "Flip",
    "Gamma",
    "Ghosting",
    "HistogramStandardization",
    "Image",
    "ImagesBatch",
    "IntensityTransform",
    "KeepLargestComponent",
    "LabelMap",
    "LabelsToImage",
    "Lambda",
    "Mask",
    "Motion",
    "Noise",
    "Normalize",
    "OneHot",
    "OneOf",
    "Pad",
    "PatchLocation",
    "Points",
    "RemapLabels",
    "RemoveLabels",
    "Representation",
    "Resample",
    "RescaleIntensity",
    "ScalarImage",
    "SequentialLabels",
    "SomeOf",
    "Spatial",
    "SpatialTransform",
    "Spike",
    "Standardize",
    "StudiesBatch",
    "Study",
    "Subject",
    "SubjectsBatch",
    "Swap",
    "To",
    "Transform",
    "ZNormalization",
    "apply_inverse_transform",
    "compute_histogram_landmarks",
    "get_inverse_transform",
    "random",
    "read_header",
    "read_nifti",
    "seed",
    "write_nifti",
]

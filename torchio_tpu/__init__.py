"""torchio_tpu: TPU-native 3D medical image preprocessing and augmentation.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of TorchIO v2
(reference: TorchIO-project/torchio). Volumes are (C, I, J, K) arrays with
RAS+ affine metadata; batches are (B, C, I, J, K) arrays; transforms are
pure jnp functions jit-fused per Compose pipeline.
"""

__version__ = "0.1.0"

import os as _os

def _setup_compilation_cache() -> None:
    """XLA compiles of 256^3-scale kernels take minutes on slow hosts;
    the persistent compilation cache amortizes them across processes.
    JAX_COMPILATION_CACHE_DIR in the environment takes precedence."""
    if "JAX_COMPILATION_CACHE_DIR" in _os.environ:
        return
    try:
        import jax as _jax

        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.path.expanduser("~/.cache/torchio_tpu_jax"),
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_setup_compilation_cache()

from . import datasets, profiling, random  # noqa: A004  (random named like stdlib on purpose, like torch)
from . import external, types
from .data import loader
from .types import (
    TypeAffineMatrix,
    TypeDirection,
    TypeImageData,
    TypeOrientationCodes,
    TypeOrigin,
    TypePath,
    TypeSpacing,
    TypeSpatialShape,
    TypeTensorShape,
    TypeWorldPoints,
)
from .utils import download
from .core.affine import AffineMatrix
from .data.aggregator import PatchAggregator
from .data.batch import ImagesBatch, StudiesBatch, SubjectsBatch
from .data.bboxes import BoundingBoxes, BoundingBoxFormat, Representation
from .data.image import Image, LabelMap, ScalarImage
from .data.patch import PatchLocation
from .data.loader import (
    ImagesLoader,
    StudiesLoader,
    SubjectsLoader,
    collate_images,
    collate_studies,
    collate_subjects,
)
from .data.points import Points
from .data.queue import Queue
from .data.sampler import (
    GridSampler,
    LabelSampler,
    PatchSampler,
    UniformSampler,
    WeightedSampler,
)
from .data.subject import Study, Subject
from .io import read_header, read_nifti, write_nifti
from .io.matrix import read_matrix, write_matrix
from .logging import disable_logging, enable_logging
from .warmup import warmup
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
    CornucopiaAdapter,
    CopyAffine,
    Crop,
    CropOrPad,
    ElasticDeformation,
    EnsureShapeMultiple,
    Flip,
    Gamma,
    Ghosting,
    HistogramStandardization,
    IntensityTransform,
    KeepLargestComponent,
    LabelsToImage,
    Lambda,
    Mask,
    MonaiAdapter,
    Motion,
    Noise,
    Normalize,
    OneHot,
    OneOf,
    Pad,
    RemapLabels,
    RemoveLabels,
    Reorient,
    Resample,
    Resize,
    RescaleIntensity,
    SequentialLabels,
    SomeOf,
    Spatial,
    SpatialTransform,
    Spike,
    Standardize,
    Swap,
    To,
    ToReferenceSpace,
    Transpose,
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
    "CornucopiaAdapter",
    "CopyAffine",
    "Crop",
    "CropOrPad",
    "ElasticDeformation",
    "EnsureShapeMultiple",
    "Flip",
    "Gamma",
    "GridSampler",
    "Ghosting",
    "HistogramStandardization",
    "Image",
    "ImagesBatch",
    "ImagesLoader",
    "IntensityTransform",
    "KeepLargestComponent",
    "LabelMap",
    "LabelSampler",
    "LabelsToImage",
    "Lambda",
    "Mask",
    "MonaiAdapter",
    "Motion",
    "Noise",
    "Normalize",
    "OneHot",
    "OneOf",
    "Pad",
    "PatchAggregator",
    "PatchLocation",
    "PatchSampler",
    "Points",
    "Queue",
    "RemapLabels",
    "RemoveLabels",
    "Reorient",
    "Representation",
    "Resample",
    "Resize",
    "RescaleIntensity",
    "ScalarImage",
    "SequentialLabels",
    "SomeOf",
    "Spatial",
    "SpatialTransform",
    "Spike",
    "Standardize",
    "StudiesBatch",
    "StudiesLoader",
    "Study",
    "Subject",
    "SubjectsBatch",
    "SubjectsLoader",
    "Swap",
    "To",
    "ToReferenceSpace",
    "Transpose",
    "Transform",
    "TypeAffineMatrix",
    "TypeDirection",
    "TypeImageData",
    "TypeOrientationCodes",
    "TypeOrigin",
    "TypePath",
    "TypeSpacing",
    "TypeSpatialShape",
    "TypeTensorShape",
    "TypeWorldPoints",
    "UniformSampler",
    "WeightedSampler",
    "ZNormalization",
    "apply_inverse_transform",
    "collate_images",
    "collate_studies",
    "collate_subjects",
    "datasets",
    "profiling",
    "disable_logging",
    "enable_logging",
    "compute_histogram_landmarks",
    "get_inverse_transform",
    "random",
    "read_header",
    "read_matrix",
    "read_nifti",
    "seed",
    "warmup",
    "write_matrix",
    "write_nifti",
]

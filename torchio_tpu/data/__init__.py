from .aggregator import PatchAggregator
from .bboxes import BoundingBoxes, BoundingBoxFormat, Representation
from .image import Image, LabelMap, ScalarImage
from .invertible import Invertible
from .loader import (
    ImagesLoader,
    StudiesLoader,
    SubjectsLoader,
    collate_images,
    collate_studies,
    collate_subjects,
)
from .patch import PatchLocation
from .points import Points
from .queue import Queue
from .sampler import (
    GridSampler,
    LabelSampler,
    PatchSampler,
    UniformSampler,
    WeightedSampler,
)
from .subject import Study, Subject

__all__ = [
    "GridSampler",
    "ImagesLoader",
    "LabelSampler",
    "PatchAggregator",
    "PatchSampler",
    "Queue",
    "StudiesLoader",
    "SubjectsLoader",
    "UniformSampler",
    "WeightedSampler",
    "collate_images",
    "collate_studies",
    "collate_subjects",
    "BoundingBoxFormat",
    "BoundingBoxes",
    "Image",
    "Invertible",
    "LabelMap",
    "PatchLocation",
    "Points",
    "Representation",
    "ScalarImage",
    "Study",
    "Subject",
]

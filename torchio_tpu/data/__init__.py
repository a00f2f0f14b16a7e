from .bboxes import BoundingBoxes, BoundingBoxFormat, Representation
from .image import Image, LabelMap, ScalarImage
from .invertible import Invertible
from .patch import PatchLocation
from .points import Points
from .subject import Study, Subject

__all__ = [
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

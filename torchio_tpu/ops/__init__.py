from .gaussian import gaussian_blur, gaussian_blur_per_element
from .resample import build_coords, resample, upsample_field

__all__ = [
    "build_coords",
    "gaussian_blur",
    "gaussian_blur_per_element",
    "resample",
    "upsample_field",
]

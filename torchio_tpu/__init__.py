"""torchio_tpu: TPU-native 3D medical image preprocessing and augmentation.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of TorchIO v2
(reference: TorchIO-project/torchio). Volumes are (C, I, J, K) arrays with
RAS+ affine metadata; batches are (B, C, I, J, K) pytrees; transforms are
pure functions jit-fused per Compose pipeline.
"""

__version__ = "0.1.0"

from .core.affine import AffineMatrix
from .io import read_header, read_nifti, write_nifti

__all__ = [
    "AffineMatrix",
    "read_header",
    "read_nifti",
    "write_nifti",
]

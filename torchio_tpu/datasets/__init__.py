from .fpg import FPG
from .itk_snap import AorticValve, BrainTumor, SubjectITKSNAP, T1T2
from .ixi import ixi, ixi_tiny
from .medmnist import (
    adrenal_mnist_3d,
    fracture_mnist_3d,
    nodule_mnist_3d,
    organ_mnist_3d,
    synapse_mnist_3d,
    vessel_mnist_3d,
)
from .mni import (
    Colin27,
    ICBM2009CNonlinearSymmetric,
    Pediatric,
    Sheep,
    SubjectMNI,
)
from .slicer import Slicer
from .zone_plate import ZonePlate

__all__ = [
    "FPG",
    "AorticValve",
    "BrainTumor",
    "Colin27",
    "ICBM2009CNonlinearSymmetric",
    "Pediatric",
    "Sheep",
    "Slicer",
    "SubjectITKSNAP",
    "SubjectMNI",
    "T1T2",
    "ZonePlate",
    "adrenal_mnist_3d",
    "fracture_mnist_3d",
    "ixi",
    "ixi_tiny",
    "nodule_mnist_3d",
    "organ_mnist_3d",
    "synapse_mnist_3d",
    "vessel_mnist_3d",
]

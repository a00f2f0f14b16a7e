from .halo import halo_blur, halo_resample_affine
from .sampler import DistributedSubjectSampler
from .mesh import batch_sharding, make_mesh, replicated_sharding, shard_batch
from .step import make_augment_step, sample_step_params

__all__ = [
    "DistributedSubjectSampler",
    "batch_sharding",
    "halo_blur",
    "halo_resample_affine",
    "make_augment_step",
    "make_mesh",
    "replicated_sharding",
    "sample_step_params",
    "shard_batch",
]

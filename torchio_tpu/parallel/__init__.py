from .halo import halo_blur, halo_resample_affine
from .large import process_large_volume, shard_volume_from_file, write_volume_sharded
from .mesh import batch_sharding, make_mesh, replicated_sharding, shard_batch
from .patches import sharded_grid_inference
from .sampler import DistributedSubjectSampler
from .step import make_augment_step, sample_step_params

__all__ = [
    "DistributedSubjectSampler",
    "batch_sharding",
    "halo_blur",
    "halo_resample_affine",
    "make_augment_step",
    "make_mesh",
    "process_large_volume",
    "replicated_sharding",
    "sample_step_params",
    "shard_batch",
    "shard_volume_from_file",
    "sharded_grid_inference",
    "write_volume_sharded",
]

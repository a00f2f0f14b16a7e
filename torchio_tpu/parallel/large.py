"""Volumes larger than one device's memory: file -> mesh -> file.

SURVEY.md §5.7's TPU recipe end-to-end: the volume is read LAZILY from
disk in per-shard J slabs (``io/nifti.py`` region reads — uncompressed
NIfTI windows through ``np.memmap``), each slab lands directly on its
own device (``jax.make_array_from_callback``), Spatial/Blur run through
the halo-exchange ``shard_map`` kernels (:mod:`.halo`), and the result
streams back to disk shard-by-shard. No host or device ever holds the
full volume as one array.

Reference analog: ``docs/tutorials/large-volumes.md`` (lazy region reads
+ patch decomposition on one machine); the mesh dimension is this
framework's addition.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from .halo import halo_blur, halo_resample_spec


def shard_volume_from_file(image, mesh: Mesh, *, space_axis: str = "space"):
    """A (1, C, I, J, K) jax array J-sharded over the mesh, filled by
    per-shard lazy region reads of ``image`` (a lazy ``tio.Image``).

    Each device's slab is produced by a separate backend region read;
    the full volume never materializes on host or on any device.
    """
    c, si, sj, sk = image.shape
    n_space = mesh.shape[space_axis]
    if sj % n_space:
        raise ValueError(f"J={sj} not divisible by space={n_space}")
    spec = PartitionSpec(None, None, None, space_axis, None)
    sharding = NamedSharding(mesh, spec)
    dtype = np.float32

    def fetch(index) -> np.ndarray:
        # index is the global 5-d slice tuple of this device's shard
        region = image[index[1:]]
        return np.asarray(region.data, dtype)[None]

    return jax.make_array_from_callback(
        (1, c, si, sj, sk), sharding, fetch
    )


def write_volume_sharded(out_path, sharded, affine=None) -> None:
    """Stream a J-sharded (1, C, I, J, K) array to an uncompressed
    ``.nii``, one addressable shard at a time (host holds one slab)."""
    from ..io.nifti import _build_nifti1_header

    _, c, si, sj, sk = sharded.shape
    if affine is None:
        affine = np.eye(4)
    disk_shape = (si, sj, sk) if c == 1 else (si, sj, sk, c)
    header = _build_nifti1_header(disk_shape, np.dtype(np.float32), affine)
    out_path = Path(out_path)
    with open(out_path, "wb") as f:
        f.write(header)
        f.truncate(len(header) + int(np.prod(disk_shape)) * 4)
    mm = np.memmap(
        out_path, dtype=np.float32, mode="r+", offset=len(header),
        shape=disk_shape, order="F",
    )
    for shard in sharded.addressable_shards:
        sl = shard.index  # global 5-d slice tuple
        slab = np.asarray(shard.data)[0]  # (C, i, jl, k)
        if c == 1:
            mm[sl[2], sl[3], sl[4]] = slab[0]
        else:
            mm[sl[2], sl[3], sl[4], :] = np.moveaxis(slab, 0, -1)
    mm.flush()
    del mm


def process_large_volume(
    source,
    out_path,
    *,
    mesh: Mesh,
    space_axis: str = "space",
    matrix=None,
    control_points=None,
    sigma: float | None = None,
    mode: str = "linear",
    fill: float = 0.0,
):
    """Lazy file -> J-sharded mesh -> halo Spatial (+ Blur) -> file.

    ``matrix`` is a 4x4 output->input voxel map (augmentation-style:
    output space equals input space), ``control_points`` an optional
    coarse elastic displacement field, ``sigma`` an optional Gaussian
    blur (voxels) along the sharded axis. Returns the sharded result
    (also written to ``out_path``).
    """
    from ..data.image import ScalarImage

    image = source if hasattr(source, "shape") else ScalarImage(source)
    sharded = shard_volume_from_file(image, mesh, space_axis=space_axis)
    if matrix is not None or control_points is not None:
        m = np.eye(4) if matrix is None else np.asarray(matrix, np.float64)
        sharding = sharded.sharding
        sharded = halo_resample_spec(
            sharded,
            [m],
            [control_points],
            sharding=sharding,
            mode=mode,
            fill=fill,
        )
    if sigma is not None:
        sharded = halo_blur(sharded, sigma, mesh)
    write_volume_sharded(out_path, sharded, np.asarray(image.affine.data))
    return sharded

"""CPU reference baseline for BASELINE.md.

The reference (TorchIO) cannot be imported here (its nibabel/SimpleITK
deps are not installed), so this measures a faithful torch-CPU proxy of
its Compose(Affine + Elastic + BiasField + Noise) hot path over 256^3
volumes — the same op sequence the reference executes per
``SURVEY.md`` §3.2 (grid build -> F.grid_sample; coarse field ->
F.interpolate -> exp -> multiply; randn noise). Run:

    python benchmarks/baseline_cpu.py
"""

import time

import numpy as np
import torch
import torch.nn.functional as F

S = 256
B = 1


def affine_elastic_resample(data: torch.Tensor) -> torch.Tensor:
    # sample affine params like the reference
    scales = np.random.uniform(0.9, 1.1, 3)
    degrees = np.radians(np.random.uniform(-10, 10, 3))
    matrix = np.eye(4)
    cx, sx = np.cos(degrees[0]), np.sin(degrees[0])
    cy, sy = np.cos(degrees[1]), np.sin(degrees[1])
    cz, sz = np.cos(degrees[2]), np.sin(degrees[2])
    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    matrix[:3, :3] = rz @ ry @ rx @ np.diag(scales)
    matrix[:3, 3] = np.random.uniform(-5, 5, 3)
    m = torch.as_tensor(np.linalg.inv(matrix), dtype=torch.float32)

    # output voxel meshgrid -> input voxel coords (reference spatial.py:1604)
    rng = [torch.arange(S, dtype=torch.float32) for _ in range(3)]
    gi, gj, gk = torch.meshgrid(*rng, indexing="ij")
    coords = torch.stack([gi, gj, gk], dim=-1)
    ones = torch.ones(*coords.shape[:-1], 1)
    hom = torch.cat([coords, ones], -1)
    coords = (hom @ m.T)[..., :3]

    # elastic: coarse control grid -> dense trilinear field (spatial.py:2171)
    cp = (torch.rand(7, 7, 7, 3) - 0.5) * 2 * 7.5
    field = F.interpolate(
        cp.permute(3, 0, 1, 2)[None], size=(S, S, S),
        mode="trilinear", align_corners=True,
    )[0].permute(1, 2, 3, 0)
    coords = coords + field

    # normalize to [-1, 1], reorder to (D, H, W) (spatial.py:1627)
    sizes = torch.tensor([S - 1, S - 1, S - 1], dtype=torch.float32)
    grid = 2.0 * coords / sizes - 1.0
    grid = grid.permute(2, 1, 0, 3)[None]
    inp = data.permute(0, 1, 4, 3, 2)
    out = F.grid_sample(
        inp, grid.expand(data.shape[0], -1, -1, -1, -1),
        mode="bilinear", padding_mode="zeros", align_corners=True,
    )
    return out.permute(0, 1, 4, 3, 2)


def bias_field(data: torch.Tensor) -> torch.Tensor:
    small = [max(round(S * 0.025), 4)] * 3
    coarse = torch.normal(0.0, 0.5, size=(data.shape[0], 1, *small))
    field = F.interpolate(coarse, size=(S, S, S), mode="trilinear", align_corners=True)
    return data * torch.exp(field)


def noise(data: torch.Tensor) -> torch.Tensor:
    return data + 0.1 * torch.randn_like(data)


def main() -> None:
    import os; torch.set_num_threads(os.cpu_count() or 1)
    data = torch.rand(B, 1, S, S, S)
    # warmup
    out = noise(bias_field(affine_elastic_resample(data)))
    times = []
    for _ in range(3):
        t0 = time.time()
        out = noise(bias_field(affine_elastic_resample(data)))
        times.append(time.time() - t0)
    best = min(times)
    print(f"threads: {torch.get_num_threads()}")
    print(f"volumes/sec (CPU torch proxy, 256^3): {B / best:.4f}")
    print(f"seconds/volume: {best / B:.3f}")
    assert out.shape == data.shape


if __name__ == "__main__":
    main()

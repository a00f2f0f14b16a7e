import time, numpy as np, jax, jax.numpy as jnp
from torchio_tpu.ops.resample import resample, build_coords
from torchio_tpu.ops.pallas_resample import pallas_resample
from torchio_tpu.transforms.spatial.spatial import _forward_affine, _mapping_matrix
from torchio_tpu.core.affine import AffineMatrix
S=256
aff = AffineMatrix()
fwd = _forward_affine(scales=(0.95,1.05,1.02), degrees=(6,3,7), translation=(2,0,0), center="image", shape=(S,S,S), affine=aff)
m = _mapping_matrix(aff, aff, fwd)
coords = build_coords((S,S,S), m)
vol = jnp.asarray(np.random.default_rng(0).random((1,S,S,S), np.float32))
float(jnp.sum(vol))
def t(name, fn, iters=3):
    _ = float(jnp.sum(fn()))
    t0=time.time()
    for _ in range(iters): _ = float(jnp.sum(fn()))
    print(f"{name}: {(time.time()-t0)/iters*1000:.0f} ms", flush=True)
t("XLA gather", lambda: resample(vol[None], coords, mode="linear", fill=0.3))
t("Pallas", lambda: pallas_resample(vol, coords, m, mode="linear", fill=0.3))
t("XLA gather again", lambda: resample(vol[None], coords, mode="linear", fill=0.3))
t("Pallas again", lambda: pallas_resample(vol, coords, m, mode="linear", fill=0.3))

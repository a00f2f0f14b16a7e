import time, numpy as np, jax, jax.numpy as jnp
from torchio_tpu.ops.resample import resample, build_coords
from torchio_tpu.ops.pallas_resample import pallas_resample
from torchio_tpu.transforms.spatial.spatial import _forward_affine, _mapping_matrix
from torchio_tpu.core.affine import AffineMatrix
for S, rot in ((64, (6,3,7)), (128, (6,3,7)), (256, (2,1,2)), (256, (6,3,7))):
    aff = AffineMatrix()
    fwd = _forward_affine(scales=(0.98,1.02,1.0), degrees=rot, translation=(2,0,0), center="image", shape=(S,S,S), affine=aff)
    m = _mapping_matrix(aff, aff, fwd)
    coords = build_coords((S,S,S), m)
    vol = jnp.asarray(np.random.default_rng(0).random((1,S,S,S), np.float32))
    try:
        out = pallas_resample(vol, coords, m, mode="linear", fill=0.3)
        s0 = float(jnp.sum(out))
        t0=time.time()
        for _ in range(3): _ = float(jnp.sum(pallas_resample(vol, coords, m, mode="linear", fill=0.3)))
        dt = (time.time()-t0)/3
        ref = float(jnp.sum(resample(vol[None], coords, mode="linear", fill=0.3)))
        print(f"S={S} rot={rot}: pallas {dt*1000:.0f} ms, sum {s0:.1f} vs xla {ref:.1f}", flush=True)
    except Exception as e:
        print(f"S={S} rot={rot}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)

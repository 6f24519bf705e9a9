"""Drive warpconvnet_tpu public API end-to-end on the real TPU chip."""
import time
import numpy as np
import jax, jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

import warpconvnet_tpu
from warpconvnet_tpu.geometry import Points, Voxels, pad_stack
from warpconvnet_tpu.nn.functional.sparse_conv import spatially_sparse_conv
from warpconvnet_tpu.ops.keys import PAD_COORD

rng = np.random.default_rng(0)
# Two ragged scenes of random points -> padded batch (user entry path)
scenes = [rng.uniform(0, 2.0, size=(n, 3)).astype(np.float32) for n in (3000, 4500)]
feats = [rng.standard_normal((len(s), 16)).astype(np.float32) for s in scenes]
pc, nv = pad_stack(scenes, bucket=1024)
pf, _ = pad_stack(feats, bucket=1024)
pts = Points.create(pc, pf, nv)
print("points:", pts.coords.shape, "valid:", np.asarray(pts.num_valid), flush=True)

@jax.jit
def step(pts, w):
    vox = pts.to_voxels(voxel_size=0.05, reduction="mean")
    vox = vox.sort()
    def loss_fn(w):
        out, _ = spatially_sparse_conv(vox, w, kernel_size=3, stride=2)
        return jnp.sum(out.features ** 2), out.num_valid
    (loss, onv), grad = jax.value_and_grad(loss_fn, has_aux=True)(w)
    return loss, onv, grad

w = jnp.asarray(rng.standard_normal((27, 16, 32)).astype(np.float32) * 0.1)
t0 = time.perf_counter()
loss, onv, grad = jax.block_until_ready(step(pts, w))
t1 = time.perf_counter()
print(f"compile+run: {t1-t0:.1f}s  loss={float(loss):.4f}  out_valid={np.asarray(onv)}", flush=True)
t0 = time.perf_counter()
loss2, onv2, grad2 = jax.block_until_ready(step(pts, w))
t1 = time.perf_counter()
print(f"steady-state step: {(t1-t0)*1e3:.2f}ms", flush=True)
print("grad norm:", float(jnp.linalg.norm(grad)), "finite:", bool(jnp.all(jnp.isfinite(grad))), flush=True)

# CPU cross-check of the same computation for numerics
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    lc, onvc, gc = step(jax.device_put(pts, cpu), jax.device_put(w, cpu))
print("TPU vs CPU loss rel err:", abs(float(loss)-float(lc))/abs(float(lc)), flush=True)
print("TPU vs CPU grad rel err:", float(jnp.linalg.norm(grad - np.asarray(gc)) / jnp.linalg.norm(gc)), flush=True)
print("OK", flush=True)

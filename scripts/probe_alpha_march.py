"""Instrument the forest alpha re-trace march: live count + wall per pass."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.scenes import registry
from raytracer_tpu.render import integrator, camera as cam_mod
from raytracer_tpu.ops.pallas import icluster_kernel as ick
from raytracer_tpu.ops.intersect import _alpha_of
from raytracer_tpu.core.vecmath import MIRO_TMAX

W, H = 480, 270
scene, cam, st = registry.make('final_forest', width=W, height=H)
R = W * H
ys, xs = np.meshgrid(np.arange(H, dtype=np.float32),
                     np.arange(W, dtype=np.float32), indexing='ij')
px = jnp.asarray(xs.reshape(-1))
py = jnp.asarray(ys.reshape(-1))
rands = jnp.full((R, 5), 0.5)
o, d, tm = cam_mod.eye_rays(cam, W, H, px, py, 0., 1., 0., 1., rands)


@jax.jit
def one_pass(scene, o, d, tm, tmin, done):
    tmax_eff = jnp.where(done, -1.0, 1e12)
    perm = jnp.argsort(done.astype(jnp.int32), stable=True)
    inv = jnp.argsort(perm)
    h = ick.pallas_icluster_trace(scene, o[perm], d[perm], tm[perm],
                                  tmin[perm], tmax_eff[perm], False)
    h = jax.tree_util.tree_map(lambda x: x[inv], h)
    valid = h.tri >= 0
    alpha = _alpha_of(scene, jnp.maximum(h.tri, 0), h.a, h.b)
    opaque = valid & (alpha >= 0.5)
    live = ~done
    accept = live & opaque
    cutout = live & valid & ~opaque
    miss = live & ~valid
    tmin_new = jnp.where(cutout, h.t * (1.0 + 1e-4) + 1e-4, tmin)
    done2 = done | accept | miss
    return done2, tmin_new, jnp.sum(live), jnp.sum(cutout)


done = jnp.zeros(R, bool)
tmin = jnp.full(R, 1e-3)
one_pass(scene, o, d, tm, tmin, done)  # compile
for p in range(12):
    t0 = time.time()
    done, tmin, live, cut = one_pass(scene, o, d, tm, tmin, done)
    live, cut = int(live), int(cut)
    print(f'pass {p}: live={live} ({live/R*100:.1f}%) cutouts={cut} '
          f'wall={time.time()-t0:.3f}s', flush=True)
    if live == 0:
        break

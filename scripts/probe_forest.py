"""TPU probe: final_forest through the two-level cluster2 path.

Run from /root/repo with no PYTHONPATH (axon plugin registration breaks
otherwise). Inputs vary per timed iteration (the tunnel memoizes results).
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

W = int(os.environ.get('FW', 480))
H = int(os.environ.get('FH', 270))
MODE = os.environ.get('FMODE', 'auto')
TILE = int(os.environ.get('FTILE', 1024))

print('backend:', jax.default_backend(), flush=True)
from raytracer_tpu.scenes import registry
from raytracer_tpu.render import renderer, integrator

t0 = time.time()
scene, cam, st = registry.make('final_forest', width=W, height=H)
print(f'build {time.time()-t0:.1f}s tris={scene.num_tris} '
      f'icluster_ok={integrator._pallas_icluster_ok(scene)}', flush=True)
st = st.replace(intersector=MODE, ray_tile=TILE)

key = jax.random.PRNGKey(0)
t0 = time.time()
img = renderer.render(scene, cam, st, key, spp=1)
jax.block_until_ready(img)
print(f'compile+first {time.time()-t0:.1f}s', flush=True)
print('first mean', float(jnp.mean(img)), np.isfinite(np.asarray(img)).all(),
      flush=True)

times = []
for i in range(2):
    k = jax.random.fold_in(key, 100 + i)
    t0 = time.time()
    img = renderer.render(scene, cam, st, k, spp=1)
    # fetch-based timing: block_until_ready through the axon tunnel can
    # return before remote execution completes; a scalar fetch cannot
    s = float(jnp.sum(img))
    times.append(time.time() - t0)
    print(f'iter {i}: {times[-1]:.3f}s sum={s:.1f} '
          f'({W*H/times[-1]/1e6:.3f} Mray/s primary)', flush=True)
arr = np.asarray(img)
print('mean radiance', arr.mean(), 'finite', np.isfinite(arr).all(),
      flush=True)
np.save('_forest_img.npy', arr)

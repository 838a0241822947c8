import time, sys
LOG = open('/root/repo/_forest_log.txt', 'w')
def log(*a):
    print(*a, file=LOG, flush=True); print(*a, flush=True)
import jax, jax.numpy as jnp
from raytracer_tpu.scenes import registry
from raytracer_tpu.render import renderer
t0=time.time()
scene, cam, st = registry.make('final_forest', width=480, height=270,
                               n_trees=40, n_flowers=20, grass_grid=10,
                               max_bounces=3, dome_samples=2, ray_tile=32768)
log('build', round(time.time()-t0,1), 'tris', scene.num_tris,
    'instances', scene.instances.m.shape[0], 'single_level', scene.single_level)
key = jax.random.PRNGKey(0)
t0=time.time()
img = renderer.render(scene, cam, st, key, spp=1)
jax.block_until_ready(img)
log('compile+run', round(time.time()-t0,1))
t0=time.time()
img = renderer.render(scene, cam, st, jax.random.fold_in(key,1), spp=1)
jax.block_until_ready(img)
dt=time.time()-t0
R = st.width*st.height
log('run', round(dt,3), 'rays/s', round(R/dt,1), 'mean', float(img.mean()))

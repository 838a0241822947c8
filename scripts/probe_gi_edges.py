"""Calibrate the GI-boundary gradient estimator against finite differences.

Fixture: camera looks straight down at a diffuse (Blinn) floor patch; an
emissive panel and a blocker triangle hang above, both OUT OF FRAME. The
floor is lit only by one-bounce GI from the panel; moving the blocker
shifts the indirect shadow — a loss derivative that is purely the GI
boundary term (no lights -> no shadow-edge term; blocker off-frame -> no
camera-edge term; visibility steps -> interior gradient blind).
"""
import sys
import time

sys.path.insert(0, '.')

import numpy as np
import jax
import jax.numpy as jnp

from raytracer_tpu.core.types import Camera, RenderSettings
from raytracer_tpu.geometry.build import SceneBuilder
from raytracer_tpu.geometry import shapes
from raytracer_tpu.io.objload import make_single_triangle
from raytracer_tpu.parallel import sharding
from raytracer_tpu.render import renderer
from raytracer_tpu.diff import edges as ed

SIZE = 32


def gi_blocker_scene(dx=0.0):
    b = SceneBuilder()
    floor = b.add_blinn(kd=(0.8, 0.8, 0.8))
    b.add_mesh(shapes.quad((-4, 0, 4), (4, 0, 4), (4, 0, -4), (-4, 0, -4),
                           with_uv=False), floor)
    emit = b.add_blinn(kd=(0.0, 0.0, 0.0), le=(4.0, 4.0, 4.0),
                       emitted_power=3.0)
    b.add_mesh(shapes.quad((1.5, 3.0, 1.0), (3.5, 3.0, 1.0),
                           (3.5, 3.0, -1.0), (1.5, 3.0, -1.0),
                           with_uv=False), emit)
    blk = b.add_blinn(kd=(0.2, 0.2, 0.2))
    b.add_mesh(make_single_triangle((0.6 + dx, 1.2, -0.7),
                                    (0.6 + dx, 1.2, 0.7),
                                    (1.4 + dx, 1.2, 0.0), n=(0, 1, 0)), blk)
    b.set_bg_color((0, 0, 0))
    scene = b.build(bvh=False)
    cam = Camera.make(eye=(0.0, 2.2, 0.0), look_at=(0.0, 0.0, 0.01),
                      fov=35.0)
    st = RenderSettings(width=SIZE, height=SIZE, path_trace=True,
                        max_bounces=2, max_wavefront_steps=3,
                        ray_tile=SIZE * SIZE)
    return scene, cam, st


scene, cam, st = gi_blocker_scene()
params = sharding.get_params(scene)
target = renderer.render(gi_blocker_scene(0.2)[0], cam, st,
                         jax.random.PRNGKey(42), spp=64)
img0 = renderer.render(scene, cam, st, jax.random.PRNGKey(1), spp=64)
print('img mean', float(jnp.mean(img0)), 'max', float(jnp.max(img0)))


def loss_at(dx, k):
    img = renderer.render(gi_blocker_scene(dx)[0], cam, st, k, spp=64)
    return float(jnp.sum((img - target) ** 2) / (SIZE * SIZE * 3))


eps = 5e-2
t0 = time.time()
fds = [(loss_at(eps, jax.random.PRNGKey(k))
        - loss_at(-eps, jax.random.PRNGKey(k))) / (2 * eps)
       for k in range(3)]
print('fd per key', [round(f, 4) for f in fds], 'mean',
      round(float(np.mean(fds)), 4), f'({time.time()-t0:.0f}s)')

key = jax.random.PRNGKey(0)
for n in (8192, 32768):
    _, g = ed.loss_and_grads_with_edges(
        params, scene, cam, st, target, key, spp=8, edge_samples=n,
        shadow_edges=False, gi_edges=True)
    gv = np.asarray(g['vertices'])
    # blocker vertices are the LAST 3 rows (floor 4 + emitter 4 + blocker 3)
    print(f'n={n}: gi-edge blocker dL/dx {gv[-3:, 0].sum():+.4f} '
          f'(floor+emitter rows {gv[:-3, 0].sum():+.4f})', flush=True)

_, g0 = ed.loss_and_grads_with_edges(
    params, scene, cam, st, target, key, spp=8, edge_samples=8192,
    shadow_edges=False, gi_edges=False)
print('without gi_edges, blocker dL/dx',
      f"{np.asarray(g0['vertices'])[-3:, 0].sum():+.5f}")

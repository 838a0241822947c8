"""Instance-count scaling demo (reference marquee: 1M bunnies, webpage
'Instancing'): build + trace instanced_grid at growing n on the flat
segment kernel. Fetch-timed, dispatch-amortized."""
import sys
import time

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.scenes import registry
from raytracer_tpu.render import camera as cam_mod, integrator
from raytracer_tpu.ops.pallas import iseg_kernel as isg

NS = [int(x) for x in (sys.argv[1:] or ['10000', '100000'])]
NREP = 4

for n in NS:
    t0 = time.time()
    scene, cam, st = registry.make('instanced_grid', size=256, n=n)
    build_s = time.time() - t0
    icl = scene.iclusters
    print(f'n={n}: build {build_s:.1f}s entries={icl.num_entries} '
          f'tris_effective={n * 577 / 1e6:.1f}M', flush=True)

    W = H = 512
    R = W * H
    ys, xs = np.meshgrid(np.arange(H, dtype=np.float32),
                         np.arange(W, dtype=np.float32), indexing='ij')
    px = jnp.asarray(xs.reshape(-1))
    py = jnp.asarray(ys.reshape(-1))

    @jax.jit
    def tr(scene, eps):
        acc = 0.0
        for r in range(NREP):
            o, d, tm = cam_mod.eye_rays(cam, W, H, px + eps * (r + 1), py,
                                        0., 1., 0., 1., jnp.full((R, 5), 0.5))
            h = isg.pallas_iseg_trace(scene, o, d, tm, 1e-3, 1e12, False)
            acc += jnp.sum(h.t * (h.tri >= 0))
        return acc

    t0 = time.time()
    tr(scene, 0.0005)
    comp = time.time() - t0
    vals = []
    for i in range(3):
        t0 = time.time()
        v = float(tr(scene, 0.001 * (i + 1)))
        vals.append(time.time() - t0)
    w = min(vals) / NREP
    print(f'n={n}: trace {R} coherent primaries {w*1000:.0f} ms '
          f'({R/w/1e6:.2f} Mray/s, compile {comp:.0f}s) v={v:.0f}',
          flush=True)

"""Ray-block-size sweep for the flat segment kernel at high instance count.

At 1M instances the multi-slice path runs ~119 slice dispatches x nb ray
blocks; most (block, slice) grid steps are frustum-disabled, so the fixed
per-grid-step machinery (~0.9us measured: output-block writes + grid
bookkeeping) is the bound. Findings in PERF.md ("Remaining 1M bound"):
rb can NOT reduce the step count — the slice size is VMEM-capped
inversely to rb — and rb=64 scope-OOMs at the real 16 MB limit.
Builds the scene ONCE, then sweeps rb.
"""
import sys
import time

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.scenes import registry
from raytracer_tpu.render import camera as cam_mod
from raytracer_tpu.ops.pallas import iseg_kernel as isg

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
RBS = [int(x) for x in (sys.argv[2:] or ['32', '64', '128'])]
NREP = 4

t0 = time.time()
scene, cam, st = registry.make('instanced_grid', size=256, n=N)
print(f'n={N}: build {time.time() - t0:.1f}s '
      f'entries={scene.iclusters.num_entries}', flush=True)

W = H = 512
R = W * H
ys, xs = np.meshgrid(np.arange(H, dtype=np.float32),
                     np.arange(W, dtype=np.float32), indexing='ij')
px = jnp.asarray(xs.reshape(-1))
py = jnp.asarray(ys.reshape(-1))

for rb in RBS:
    @jax.jit
    def tr(scene, eps, rb=rb):
        acc = 0.0
        for r in range(NREP):
            o, d, tm = cam_mod.eye_rays(cam, W, H, px + eps * (r + 1), py,
                                        0., 1., 0., 1., jnp.full((R, 5), 0.5))
            h = isg.pallas_iseg_trace(scene, o, d, tm, 1e-3, 1e12, False,
                                      rb=rb)
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
    print(f'rb={rb}: trace {R} coherent primaries {w*1000:.0f} ms '
          f'({R/w/1e6:.2f} Mray/s, compile {comp:.0f}s) v={v:.0f}',
      flush=True)

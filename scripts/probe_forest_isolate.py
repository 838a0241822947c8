"""Isolate the TPU fault: trace ALL primary rays of a forest frame through
(a) the icluster kernel alone, (b) + MB chunks, (c) full cluster2 chain."""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

W = int(os.environ.get('FW', 960))
H = int(os.environ.get('FH', 540))
STAGE = os.environ.get('FSTAGE', 'a')

from raytracer_tpu.scenes import registry
from raytracer_tpu.render import integrator, camera as cam_mod
from raytracer_tpu.ops.pallas import icluster_kernel as ick
from raytracer_tpu.ops.pallas import cluster_kernel as ck
from raytracer_tpu.ops import cluster_trace as ct

scene, cam, st = registry.make('final_forest', width=W, height=H)
print('built', flush=True)

R = W * H
TILE = 8192
pad = (-R) % TILE
ys, xs = np.meshgrid(np.arange(H, dtype=np.float32),
                     np.arange(W, dtype=np.float32), indexing='ij')
px = np.concatenate([xs.reshape(-1), np.zeros(pad, np.float32)])
py = np.concatenate([ys.reshape(-1), np.zeros(pad, np.float32)])
n_tiles = len(px) // TILE
px = jnp.asarray(px.reshape(n_tiles, TILE))
py = jnp.asarray(py.reshape(n_tiles, TILE))


@jax.jit
def run(scene, px, py):
    def tile(args):
        pxt, pyt = args
        rands = jnp.full((TILE, 5), 0.5)
        o, d, tm = cam_mod.eye_rays(cam, W, H, pxt, pyt, 0., 1., 0., 1.,
                                    rands)
        if STAGE == 'a':
            h = ick.pallas_icluster_trace(scene, o, d, tm, 1e-3, 1e12, False)
        elif STAGE == 'b':
            h = ick.pallas_icluster_trace(scene, o, d, tm, 1e-3, 1e12, False)
            for tab in integrator._mb_chunks(scene.mb_clusters):
                h2 = ck.pallas_cluster_trace(scene, o, d, tm, 1e-3, 1e12,
                                             False, table=tab, mb=True)
                h = integrator._merge_hits(h, h2)
        else:
            tr = integrator.trace_fn(scene,
                                     st.replace(intersector='cluster2'))
            h = tr(o, d, tm, 1e-3, 1e12, False)
        return jnp.sum(h.t * (h.tri >= 0)), jnp.sum(h.tri >= 0)

    ts, ns = jax.lax.map(tile, (px, py))
    return jnp.sum(ts), jnp.sum(ns)


t0 = time.time()
ts, ns = run(scene, px, py)
ts, ns = float(ts), int(ns)
print(f'stage {STAGE}: {time.time()-t0:.1f}s t_sum={ts:.1f} hits={ns}',
      flush=True)
t0 = time.time()
ts, ns = run(scene, px + 0.001, py)
jax.block_until_ready((ts, ns))
print(f'second run {time.time()-t0:.3f}s', flush=True)

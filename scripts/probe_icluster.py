"""Fetch-timed breakdown of the forest cluster2 path on TPU.

Every timed quantity forces a device->host scalar fetch inside the timer
(block_until_ready through the axon tunnel is not trustworthy; memoization
is defeated by folding a fresh key into the ray origins).
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.scenes import registry
from raytracer_tpu.render import integrator, camera as cam_mod
from raytracer_tpu.ops.pallas import icluster_kernel as ick
from raytracer_tpu.ops.pallas import cluster_kernel as ck
from raytracer_tpu.ops import cluster_trace as ct

W, H = 480, 270
scene, cam, st = registry.make('final_forest', width=W, height=H)
print('built', flush=True)

R = W * H
ys, xs = np.meshgrid(np.arange(H, dtype=np.float32),
                     np.arange(W, dtype=np.float32), indexing='ij')
px = jnp.asarray(xs.reshape(-1))
py = jnp.asarray(ys.reshape(-1))


def eye(jit_eps):
    rands = jnp.full((R, 5), 0.5)
    o, d, tm = cam_mod.eye_rays(cam, W, H, px + jit_eps, py, 0., 1., 0., 1.,
                                rands)
    return o, d, tm


NREP = 4  # kernel calls per dispatch: the axon tunnel's ~25 ms
          # per-dispatch floor swamps single-call timings


@jax.jit
def t_icluster(scene, eps):
    acc = 0.0
    for r in range(NREP):
        o, d, tm = eye(eps * (r + 1))
        h = ick.pallas_icluster_trace(scene, o, d, tm, 1e-3, 1e12, False)
        acc += jnp.sum(h.t * (h.tri >= 0))
    return acc


@jax.jit
def t_mb(scene, eps):
    acc = 0.0
    for r in range(NREP):
        o, d, tm = eye(eps * (r + 1))
        h = None
        for tab in integrator._mb_chunks(scene.mb_clusters):
            h2 = ck.pallas_cluster_trace(scene, o, d, tm, 1e-3, 1e12, False,
                                         table=tab, mb=True)
            h = h2 if h is None else integrator._merge_hits(h, h2)
        acc += jnp.sum(h.t * (h.tri >= 0))
    return acc


@jax.jit
def t_chain(scene, eps):
    acc = 0.0
    tr = integrator.trace_fn(scene, st.replace(intersector='cluster2'))
    for r in range(NREP):
        o, d, tm = eye(eps * (r + 1))
        h = tr(o, d, tm, 1e-3, 1e12, False)
        acc += jnp.sum(h.t * (h.tri >= 0))
    return acc


@jax.jit
def t_shadowish(scene, eps):
    # dome-shadow-like rays: origins on the ground plane region, direction up
    acc = 0.0
    tr = integrator.trace_fn(scene, st.replace(intersector='cluster2'))
    for r in range(NREP):
        o, d, tm = eye(eps * (r + 1))
        P = o + 2.0 * d
        up = jnp.tile(jnp.asarray([[0.2, 0.9, 0.1]]), (R, 1))
        h = tr(P, up, tm, 1e-3, 1e12, True)
        acc += jnp.sum((h.tri >= 0).astype(jnp.float32))
    return acc


def bench(name, fn, iters=2):
    fn(scene, 0.0005)  # compile
    vals = []
    for i in range(iters):
        t0 = time.time()
        v = float(fn(scene, 0.001 * (i + 1)))
        vals.append(time.time() - t0)
    w = min(vals) / NREP
    mray = R / w / 1e6
    print(f'{name}: {w*1000:.1f} ms ({mray:.2f} Mray/s) v={v:.1f}',
          flush=True)


bench('icluster raw (coherent primary)', t_icluster)
bench('mb chunks (2 kernels)', t_mb)
bench('full chain (alpha march)', t_chain)
bench('any-hit chain (shadow-like)', t_shadowish)

"""Geometry-sharded ring tracer: ppermute rounds over cluster shards.

For scenes too large to replicate per chip, the flat cluster table
(geometry/clusters.py) is sharded over the mesh axis: device i holds
clusters [i*M/D, (i+1)*M/D). A wavefront trace then runs D rounds: each
round every device intersects its resident ray shard against its resident
cluster shard, then the RAY STATE rotates one hop around the ring
(lax.ppermute) while the geometry stays put. After D hops every ray has
been tested against every cluster and is back on its home device.

This is the ray-tracing analogue of ring attention (SURVEY §2.2): rays are
the queries streaming around a ring of resident KV (geometry) shards, with
compute (the dense cull + MT sweep) overlapping the ICI transfer of the
next round's ray state under XLA's async collective scheduling.

The reference has no distributed mode at all (single process, OpenMP —
src/Scene.cpp:111-201); capability is new.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import Scene
from ..core.vecmath import MIRO_TMAX
from .intersect import Hit, _alpha_of
from .cluster_trace import _cull, _mt_cluster

BIG = jnp.float32(3e38)


def shard_clusters(clusters, n_dev: int):
    """Host-side: pad the cluster axis to a multiple of n_dev.

    The returned table is sharded by passing it through shard_map with
    in_spec P(axis) on dim 0 of every per-cluster array.
    """
    M = clusters.tri.shape[0]
    pad = (-M) % n_dev

    def padm(x, fill=0.0):
        x = jnp.asarray(x)
        if pad == 0:
            return x
        w = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, w, constant_values=fill)

    return clusters.replace(
        bb_min=padm(clusters.bb_min, 3e37),
        bb_max=padm(clusters.bb_max, 3e37),  # point box (inverted boxes
        # pass the slab test after the per-axis min/max swap)
        p0=padm(clusters.p0), e1=padm(clusters.e1), e2=padm(clusters.e2),
        p0_t1=padm(clusters.p0_t1), e1_t1=padm(clusters.e1_t1),
        e2_t1=padm(clusters.e2_t1),
        tri=padm(clusters.tri, -1))


def _local_sweep(scene, cl, o, d, time, tmin, best, mb: bool, any_hit: bool,
                 max_iters: int):
    """Nearest-hit sweep of rays vs the LOCAL cluster shard, updating best.

    best: (t, tri, a, b, found). Same near-ordered candidate walk as
    cluster_trace, including its alpha-cutout filter (cluster_trace.py:
    in-sweep alpha test) — the scene's texture pack is replicated per device,
    only the cluster table is sharded.
    """
    R = o.shape[0]
    M = cl.tri.shape[0]
    near = _cull(cl, o, d, tmin, best[0])               # (R, M) vs current t
    order = jnp.argsort(near, axis=-1).astype(jnp.int32)
    near_sorted = jnp.take_along_axis(near, order, axis=-1)
    iters = max_iters or M

    def cond(s):
        k, best_t, best_tri, _, _, found = s
        key_k = jax.lax.dynamic_index_in_dim(
            near_sorted, jnp.minimum(k, M - 1), axis=1, keepdims=False)
        viable = (key_k < best_t) & (key_k < BIG)
        if any_hit:
            viable = viable & ~found
        return (k < iters) & jnp.any(viable)

    def body(s):
        k, best_t, best_tri, best_a, best_b, found = s
        kc = jnp.minimum(k, M - 1)
        m = jax.lax.dynamic_index_in_dim(order, kc, axis=1, keepdims=False)
        key_k = jax.lax.dynamic_index_in_dim(near_sorted, kc, axis=1,
                                             keepdims=False)
        active = (key_k < best_t) & (key_k < BIG)
        if any_hit:
            active = active & ~found
        t, a, b, ok, tid = _mt_cluster(cl, m, o, d, time, mb)
        ok = ok & active[:, None] & (t >= tmin[:, None]) \
            & (t < best_t[:, None])
        if scene.has_alpha_maps:
            alpha = _alpha_of(scene, jnp.maximum(tid, 0), a, b)
            ok = ok & (alpha >= 0.5)
        t = jnp.where(ok, t, BIG)
        j = jnp.argmin(t, axis=-1)
        rows = jnp.arange(R)
        tj = t[rows, j]
        got = tj < BIG
        best_t = jnp.where(got, tj, best_t)
        best_tri = jnp.where(got, tid[rows, j], best_tri)
        best_a = jnp.where(got, a[rows, j], best_a)
        best_b = jnp.where(got, b[rows, j], best_b)
        return (k + 1, best_t, best_tri, best_a, best_b, found | got)

    zero_i = jnp.zeros((), jnp.int32) + (best[0][0] * 0).astype(jnp.int32)
    s = (zero_i,) + best
    s = jax.lax.while_loop(cond, body, s)
    return s[1:]


def ring_trace(scene: Scene, o, d, time, tmin, tmax,
               any_hit: bool = False, axis: str = 'rays') -> Hit:
    """Trace a resident ray shard against the RING of cluster shards.

    Must be called inside shard_map over `axis`, with scene.clusters sharded
    on its cluster dimension (parallel/sharding.render_geometry_sharded sets
    this up). D = axis size rounds; the ray state makes a full loop so the
    result lands on the caller's device in the original ray order.
    """
    cl = jax.lax.stop_gradient(scene.clusters)
    scene = jax.lax.stop_gradient(scene)
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    time = jax.lax.stop_gradient(time)
    tmin = jax.lax.stop_gradient(tmin)
    tmax = jax.lax.stop_gradient(tmax)
    R = o.shape[0]
    mb = scene.has_motion_blur
    f32 = o.dtype
    # derive from o so scalar inputs pick up o's varying type (shard_map
    # vma): the ppermuted carry is varying, the init must match
    zero0 = jnp.zeros_like(o[:, 0])
    tmin = jnp.broadcast_to(jnp.asarray(tmin, f32), (R,)) + zero0
    tmax = jnp.broadcast_to(jnp.asarray(tmax, f32), (R,)) + zero0
    time = jnp.broadcast_to(jnp.asarray(time, f32), (R,)) + zero0

    D = jax.lax.axis_size(axis)
    perm = [(i, (i + 1) % D) for i in range(D)]

    zero = jnp.zeros_like(o[:, 0])
    best = (jnp.minimum(tmax, MIRO_TMAX) + zero,
            jnp.full((R,), -1, jnp.int32) + zero.astype(jnp.int32),
            zero, zero, zero > 1.0)
    state = (o, d, time, tmin, best)

    def round_fn(r, state):
        o_r, d_r, time_r, tmin_r, best_r = state
        best_r = _local_sweep(scene, cl, o_r, d_r, time_r, tmin_r, best_r,
                              mb, any_hit, 0)
        # rotate the ray state to the next device (geometry stays resident)
        moved = jax.lax.ppermute((o_r, d_r, time_r, tmin_r, best_r),
                                 axis, perm)
        return moved

    state = jax.lax.fori_loop(0, D, round_fn, state)
    _, _, _, _, (t, tri, a, b, _) = state
    t = jnp.where(tri >= 0, t, MIRO_TMAX)
    return Hit(t=t, tri=tri, inst=jnp.zeros((R,), jnp.int32)
               + zero.astype(jnp.int32), a=a, b=b)

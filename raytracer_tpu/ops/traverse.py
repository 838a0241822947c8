"""Wide-BVH traversal, vectorized over the ray wavefront.

TPU mapping of the reference's QBVH stack traversal + 4-wide triangle packets
(BVH::intersect src/BVH.cpp:1112-1295, QBVH_Node::intersect src/BVH.cpp:391-414,
intersect4 src/BVH.cpp:1297-1459): every ray runs a short-stack while-loop;
per node visit the B child slabs are tested vectorized, triangle leaves are
intersected as a (B*leaf_size)-wide Moller-Trumbore batch, instance leaves
push object-space BLAS subtrees (two-level traversal in one uniform loop over
the merged node pool — see geometry/bvh.py).

vmap batches the loop across rays: all rays advance in lockstep until every
ray's stack empties (the SIMT analogue of the reference's per-thread loop).
Returns integer ids + stop-gradient floats; use ops.intersect.refine_hit for
the differentiable (t, a, b).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.types import Scene
from ..core.vecmath import MIRO_TMAX, transform_point, transform_vector
from .intersect import Hit, mt_intersect, _alpha_of

MAX_LEAF = 4  # static leaf width baked by the host build (src/Miro.h:38)


def _safe_rcp(d):
    tiny = 1e-20
    return 1.0 / jnp.where(jnp.abs(d) < tiny,
                           jnp.where(d < 0, -tiny, tiny), d)


@partial(jax.jit, static_argnames=('any_hit', 'collect_stats'))
def bvh_trace(scene: Scene, o, d, time, tmin, tmax, any_hit: bool = False,
              collect_stats: bool = False) -> Hit:
    """Trace a wavefront against the merged BVH -> Hit.

    o, d: (R,3). time/tmin/tmax scalar or (R,). any_hit: accept the first
    hit (shadow rays, reference IS_SHADOW_RAY early-out src/BVH.cpp:1438).
    collect_stats: also return per-ray test counters {'ray_aabb', 'ray_tri'}
    (the reference's rayBoxIntersections / rayTriangleIntersections,
    src/BVH.h:116, src/Scene.cpp:202-216) as a second return value.
    """
    bvh = jax.lax.stop_gradient(scene.blas)
    inst = jax.lax.stop_gradient(scene.instances)
    scene = jax.lax.stop_gradient(scene)
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    time = jax.lax.stop_gradient(time)
    tmin = jax.lax.stop_gradient(tmin)
    tmax = jax.lax.stop_gradient(tmax)
    R = o.shape[0]
    B = bvh.child.shape[1]
    S = bvh.depth * (B - 1) + B * MAX_LEAF + 4  # worst-case stack bound
    two_level = not scene.single_level
    tmin = jnp.broadcast_to(jnp.asarray(tmin, o.dtype), (R,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, o.dtype), (R,))
    time = jnp.broadcast_to(jnp.asarray(time, o.dtype), (R,))
    root = scene.bvh_root

    def trace_one(o1, d1, time1, tmin1, tmax1):
        # derive carry inits from the per-ray inputs so their varying type
        # (shard_map vma) matches the loop body's outputs
        zero_f = o1[0] * 0.0
        zero_i = zero_f.astype(jnp.int32)
        stack_n = (jnp.zeros(S, jnp.int32) + zero_i).at[0].set(root)
        state = dict(sp=zero_i + 1,
                     best_t=jnp.minimum(tmax1, MIRO_TMAX) + zero_f,
                     best_tri=zero_i - 1, best_inst=zero_i,
                     best_a=zero_f, best_b=zero_f,
                     stack_n=stack_n)
        if two_level:
            # the per-ray instance stack only exists for true two-level
            # scenes: the (R, S) while-carry lives on-chip, so single-level
            # scenes save half the stack footprint
            state['stack_i'] = jnp.full(S, -1, jnp.int32) + zero_i
        if collect_stats:
            state['n_box'] = zero_i
            state['n_tri'] = zero_i

        def cond(s):
            go = s['sp'] > 0
            if any_hit:
                go = go & (s['best_tri'] < 0)
            return go

        def body(s):
            sp = s['sp'] - 1
            node = s['stack_n'][sp]

            if two_level:
                iid = s['stack_i'][sp]
                in_inst = iid >= 0
                mi = inst.m_inv[jnp.maximum(iid, 0)]
                oo = jnp.where(in_inst, transform_point(mi, o1), o1)
                dd = jnp.where(in_inst, transform_vector(mi, d1), d1)
            else:
                iid = jnp.int32(0)
                oo, dd = o1, d1
            inv_d = _safe_rcp(dd)

            bmin = bvh.node_min[node]                  # (B,3)
            bmax = bvh.node_max[node]
            t0 = (bmin - oo) * inv_d
            t1b = (bmax - oo) * inv_d
            near = jnp.max(jnp.minimum(t0, t1b), axis=-1)
            far = jnp.min(jnp.maximum(t0, t1b), axis=-1)
            limit = jnp.minimum(s['best_t'], tmax1)
            slab = (near <= far) & (far >= tmin1) & (near <= limit)

            child = bvh.child[node]                    # (B,)
            count = bvh.count[node]

            # ---- triangle leaves: (B*MAX_LEAF)-wide MT batch
            k = jnp.arange(MAX_LEAF, dtype=jnp.int32)
            tri_leaf = slab & (count > 0)
            pidx = child[:, None] + k[None, :]         # (B, L)
            pmask = tri_leaf[:, None] & (k[None, :] < count[:, None])
            pidx = jnp.clip(pidx, 0, bvh.prim_order.shape[0] - 1)
            tris = bvh.prim_order[pidx].reshape(-1)    # (B*L,)
            f = scene.geom.face_v[tris]                # (B*L, 3)
            p0 = scene.geom.vertices[f[:, 0]]
            p1 = scene.geom.vertices[f[:, 1]]
            p2 = scene.geom.vertices[f[:, 2]]
            if scene.has_motion_blur:
                q0 = scene.geom.vertices_t1[f[:, 0]]
                q1 = scene.geom.vertices_t1[f[:, 1]]
                q2 = scene.geom.vertices_t1[f[:, 2]]
                p0 = p0 + time1 * (q0 - p0)
                p1 = p1 + time1 * (q1 - p1)
                p2 = p2 + time1 * (q2 - p2)
            t, a, b, ok = mt_intersect(oo[None], dd[None], p0, p1, p2)
            ok = ok & pmask.reshape(-1) & (t >= tmin1) & (t < limit)
            if scene.has_alpha_maps:
                alpha = _alpha_of(scene, tris, a, b)
                ok = ok & (alpha >= 0.5)
            t = jnp.where(ok, t, jnp.inf)
            j = jnp.argmin(t)
            tj = t[j]
            found = jnp.isfinite(tj)
            best_t = jnp.where(found, tj, s['best_t'])
            best_tri = jnp.where(found, tris[j], s['best_tri'])
            best_inst = jnp.where(found, jnp.maximum(iid, 0), s['best_inst'])
            best_a = jnp.where(found, a[j], s['best_a'])
            best_b = jnp.where(found, b[j], s['best_b'])

            stack_n = s['stack_n']
            stack_i = s.get('stack_i')

            # ---- instance leaves: push BLAS roots (two-level only)
            if two_level:
                inst_leaf = slab & (count <= -2)
                n_inst = jnp.where(inst_leaf, -(count + 1), 0)
                for c in range(B):
                    for kk in range(MAX_LEAF):
                        pushi = inst_leaf[c] & (kk < n_inst[c])
                        ii = bvh.prim_order[jnp.clip(child[c] + kk, 0,
                                                     bvh.prim_order.shape[0] - 1)]
                        rooti = inst.root[jnp.clip(ii, 0,
                                                   inst.root.shape[0] - 1)]
                        stack_n = jnp.where(pushi, stack_n.at[sp].set(rooti),
                                            stack_n)
                        stack_i = jnp.where(pushi, stack_i.at[sp].set(ii),
                                            stack_i)
                        sp = jnp.where(pushi, sp + 1, sp)

            # ---- internal children: push far-first so near pops first
            # (reference near-child ordering, src/BVH.cpp:1194-1237)
            internal = slab & (count == 0)
            key_near = jnp.where(internal, near, -jnp.inf)
            order = jnp.argsort(-key_near)             # far first
            for c in range(B):
                idx = order[c]
                push = internal[idx]
                stack_n = jnp.where(push, stack_n.at[sp].set(child[idx]),
                                    stack_n)
                if two_level:
                    stack_i = jnp.where(push, stack_i.at[sp].set(iid),
                                        stack_i)
                sp = jnp.where(push, sp + 1, sp)

            out = dict(sp=sp, best_t=best_t, best_tri=best_tri,
                       best_inst=best_inst, best_a=best_a, best_b=best_b,
                       stack_n=stack_n)
            if two_level:
                out['stack_i'] = stack_i
            if collect_stats:
                out['n_box'] = s['n_box'] + B
                out['n_tri'] = s['n_tri'] + jnp.sum(pmask).astype(jnp.int32)
            return out

        out = jax.lax.while_loop(cond, body, state)
        res = (out['best_t'], out['best_tri'], out['best_inst'],
               out['best_a'], out['best_b'])
        if collect_stats:
            res = res + (out['n_box'], out['n_tri'])
        return res

    res = jax.vmap(trace_one)(o, d, time, tmin, tmax)
    t, tri, iid, a, b = res[:5]
    t = jnp.where(tri >= 0, t, MIRO_TMAX)
    hit = Hit(t=t, tri=tri, inst=iid, a=a, b=b)
    if collect_stats:
        return hit, dict(ray_aabb=res[5], ray_tri=res[6])
    return hit

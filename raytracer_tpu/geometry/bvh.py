"""Host-side BVH construction (numpy), flattened to wide SoA node arrays.

Mirrors the reference pipeline BVH_Node binned-SAH build -> QBVH collapse
(reference: src/BVH.cpp:625-1106 build, src/BVH.cpp:100-389 flatten) but emits
index arrays instead of pointer trees, and generalizes the 4-wide SSE node to
a configurable branching factor B (default 4) tested vectorized on the VPU.

Topology is non-differentiable by construction (int arrays); box planes are
f32 but traversal results are integer primitive ids, so no gradient flows
through the tree (BASELINE: "BVH build stays non-differentiable host-side").

Two-level structure (reference ProxyObject two-level BVH,
src/ProxyObject.cpp:76-95, src/Scene.cpp:62-79):
  - one BLAS subtree per prototype (and one for loose world geometry), all in
    a shared node pool,
  - a TLAS over instance world AABBs whose leaves reference instance ids.
"""
from __future__ import annotations

import numpy as np

from ..core import types as T

NUM_BINS = 8  # reference: src/Miro.h:67


class _Binary:
    """Binary SAH tree in flat numpy arrays (temporary, host-only)."""
    __slots__ = ('bb_min', 'bb_max', 'left', 'right', 'start', 'count', 'n')

    def __init__(self, cap):
        self.bb_min = np.empty((cap, 3), np.float32)
        self.bb_max = np.empty((cap, 3), np.float32)
        self.left = np.full(cap, -1, np.int64)
        self.right = np.full(cap, -1, np.int64)
        self.start = np.full(cap, -1, np.int64)
        self.count = np.zeros(cap, np.int64)
        self.n = 0

    def alloc(self):
        i = self.n
        self.n += 1
        return i


def _build_binary(bmin: np.ndarray, bmax: np.ndarray, leaf_size: int):
    """Binned-SAH binary build over primitive AABBs.

    Returns (_Binary tree, order) where order is the permutation of prim ids
    such that leaves cover contiguous ranges. Mirrors BVH_Node::buildBin /
    partitionSweepBin (src/BVH.cpp:625-793): NUM_BINS bins on centroid extent
    per axis, area sweeps, best-axis split, median fallback.
    """
    n = len(bmin)
    cent = 0.5 * (bmin + bmax)
    order = np.arange(n, dtype=np.int64)
    tree = _Binary(max(2 * n, 4))
    root = tree.alloc()
    stack = [(root, 0, n)]
    while stack:
        node, lo, hi = stack.pop()
        ids = order[lo:hi]
        nb_min = bmin[ids]
        nb_max = bmax[ids]
        tree.bb_min[node] = nb_min.min(0)
        tree.bb_max[node] = nb_max.max(0)
        cnt = hi - lo
        if cnt <= leaf_size:
            tree.start[node] = lo
            tree.count[node] = cnt
            continue
        c = cent[ids]
        c_lo = c.min(0)
        c_hi = c.max(0)
        ext = c_hi - c_lo
        best_cost = np.inf
        best_axis = -1
        best_bin = -1
        binned = None
        for axis in range(3):
            if ext[axis] <= 1e-12:
                continue
            scale = NUM_BINS * (1.0 - 1e-6) / ext[axis]
            b = np.minimum(((c[:, axis] - c_lo[axis]) * scale).astype(np.int64),
                           NUM_BINS - 1)
            # per-bin counts and bounds
            counts = np.bincount(b, minlength=NUM_BINS)
            bbl = np.full((NUM_BINS, 3), np.inf, np.float32)
            bbh = np.full((NUM_BINS, 3), -np.inf, np.float32)
            np.minimum.at(bbl, b, nb_min)
            np.maximum.at(bbh, b, nb_max)
            # left/right sweeps
            lmin = np.minimum.accumulate(bbl, 0)
            lmax = np.maximum.accumulate(bbh, 0)
            rmin = np.minimum.accumulate(bbl[::-1], 0)[::-1]
            rmax = np.maximum.accumulate(bbh[::-1], 0)[::-1]

            def area(mn, mx):
                d = np.maximum(mx - mn, 0.0)
                return d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]

            nl = np.cumsum(counts)[:-1]
            nr = cnt - nl
            cost = area(lmin, lmax)[:-1] * nl + area(rmin[1:], rmax[1:]) * nr
            cost = np.where((nl == 0) | (nr == 0), np.inf, cost)
            k = int(np.argmin(cost))
            if cost[k] < best_cost:
                best_cost = cost[k]
                best_axis = axis
                best_bin = k
                binned = b
        if best_axis < 0:
            # degenerate (all centroids equal): median split
            mid = lo + cnt // 2
        else:
            mask = binned <= best_bin
            order[lo:hi] = np.concatenate([ids[mask], ids[~mask]])
            mid = lo + int(mask.sum())
            if mid == lo or mid == hi:
                mid = lo + cnt // 2
        l = tree.alloc()
        r = tree.alloc()
        tree.left[node] = l
        tree.right[node] = r
        stack.append((l, lo, mid))
        stack.append((r, mid, hi))
    return tree, order


class _WidePool:
    """Accumulates wide-node blocks across all BLAS subtrees + prim order."""

    def __init__(self, branch: int):
        self.B = branch
        self.blocks: list[tuple] = []  # (node_min, node_max, child, count)
        self.prim_order: list[np.ndarray] = []
        self.prim_off = 0
        self.n_nodes = 0
        self.max_depth = 0

    def add_block(self, node_min, node_max, child, count, ordered_prims,
                  depth) -> int:
        """Append a pre-built subtree block (e.g. from the native builder);
        child ids must already be offset by the current node count."""
        root = self.n_nodes
        self.blocks.append((node_min, node_max, child, count))
        self.n_nodes += len(node_min)
        self.prim_order.append(np.asarray(ordered_prims, np.int64))
        self.prim_off += len(ordered_prims)
        self.max_depth = max(self.max_depth, depth)
        return root

    def add_subtree(self, tree: _Binary, order: np.ndarray,
                    prim_ids: np.ndarray) -> int:
        """Collapse the binary tree to wide nodes; returns root wide-node id.

        Collapse rule mirrors QBVH_Node::build (src/BVH.cpp:100-389): each
        wide node's children are the grandchildren of a binary node (children
        that are leaves stay as direct slots).
        """
        B = self.B
        out_min, out_max, out_child, out_count = [], [], [], []

        def collect(b: int, depth: int) -> list[int]:
            """Expand binary node ids until B slots, largest-area first."""
            slots = [b]
            def node_area(i):
                d = np.maximum(tree.bb_max[i] - tree.bb_min[i], 0)
                return float(d[0] * d[1] + d[1] * d[2] + d[2] * d[0])
            while len(slots) < B:
                # pick the internal slot with the largest area to expand
                cand = [(node_area(s), k) for k, s in enumerate(slots)
                        if tree.left[s] >= 0]
                if not cand:
                    break
                _, k = max(cand)
                s = slots.pop(k)
                slots.extend([tree.left[s], tree.right[s]])
            return slots

        sub_depth = [0]

        def emit(b: int, depth: int) -> int:
            my_id = len(out_min)
            out_min.append(np.full((B, 3), np.float32(np.inf)))
            out_max.append(np.full((B, 3), np.float32(-np.inf)))
            out_child.append(np.full(B, -1, np.int64))
            out_count.append(np.full(B, -1, np.int64))
            sub_depth[0] = max(sub_depth[0], depth + 1)
            slots = collect(b, depth)
            for c, s in enumerate(slots):
                out_min[my_id][c] = tree.bb_min[s]
                out_max[my_id][c] = tree.bb_max[s]
                if tree.left[s] < 0:  # binary leaf
                    out_child[my_id][c] = self.prim_off + tree.start[s]
                    out_count[my_id][c] = tree.count[s]
                else:
                    out_count[my_id][c] = 0
                    out_child[my_id][c] = emit(s, depth + 1)
            return my_id

        import sys
        old = sys.getrecursionlimit()
        sys.setrecursionlimit(max(old, 10000))
        try:
            # root is emitted first so subtree root id == current pool length
            root_local = emit(0, 0)
        finally:
            sys.setrecursionlimit(old)
        assert root_local == 0
        node_offset = self.n_nodes
        # fix child ids by offsetting internal links
        for i in range(len(out_child)):
            internal = out_count[i] == 0
            out_child[i][internal] += node_offset
        return self.add_block(np.stack(out_min), np.stack(out_max),
                              np.stack(out_child), np.stack(out_count),
                              prim_ids[order], sub_depth[0])

    def _node_count(self) -> int:
        return self.n_nodes

    def _stacked(self):
        node_min = np.concatenate([b[0] for b in self.blocks]).astype(np.float32)
        node_max = np.concatenate([b[1] for b in self.blocks]).astype(np.float32)
        child = np.concatenate([b[2] for b in self.blocks]).astype(np.int64)
        count = np.concatenate([b[3] for b in self.blocks]).astype(np.int64)
        return node_min, node_max, child, count

    def finalize(self) -> T.BVHArrays:
        node_min, node_max, child, count = self._stacked()
        return T.BVHArrays(
            node_min=node_min, node_max=node_max,
            child=child.astype(np.int32), count=count.astype(np.int32),
            prim_order=np.concatenate(self.prim_order).astype(np.int32))


def triangle_aabbs(geom: T.Geometry, tris: np.ndarray):
    """Per-triangle AABBs; motion-blurred triangles get the union of both
    time steps' boxes (reference MBObject::getAABB, src/MBObject.cpp)."""
    v = np.asarray(geom.vertices)
    v1 = np.asarray(geom.vertices_t1)
    f = np.asarray(geom.face_v)[tris]
    p0 = np.stack([v[f[:, k]] for k in range(3)], 1)       # (T,3,3)
    p1 = np.stack([v1[f[:, k]] for k in range(3)], 1)
    allp = np.concatenate([p0, p1], 1)
    return allp.min(1).astype(np.float32), allp.max(1).astype(np.float32)


def build_scene_bvh(geom: T.Geometry, instances: list[dict], protos,
                    leaf_size: int = 4, branch: int = 4):
    """Build BLAS pool + instance table + TLAS.

    `instances`: dicts with keys m (3,4), lo/hi (prototype tri range) or
    tris (explicit id array for the loose world geometry).
    """
    pool = _WidePool(branch)

    # one BLAS per distinct triangle set (prototypes shared across instances)
    blas_roots: dict = {}

    def blas_for(key, tri_ids):
        if key not in blas_roots:
            bmin, bmax = triangle_aabbs(geom, tri_ids)
            from .. import native
            nat = native.build_bvh_native(bmin, bmax, leaf_size, branch,
                                          pool.prim_off, pool.n_nodes)
            if nat is not None:
                nmin, nmax, child, count, order, depth = nat
                root = pool.add_block(nmin, nmax, child, count,
                                      tri_ids[order], depth)
            else:
                tree, order = _build_binary(bmin, bmax, leaf_size)
                root = pool.add_subtree(tree, order, tri_ids)
            blas_roots[key] = (root, bmin.min(0), bmax.max(0))
        return blas_roots[key]

    inst_m, inst_minv, inst_minvt, inst_root = [], [], [], []
    inst_lo, inst_hi = [], []
    world_min = []
    world_max = []
    for inst in instances:
        if inst['tris'] is not None:
            tri_ids = np.asarray(inst['tris'], np.int64)
            key = ('world',)
            lo, hi = -1, -1
        else:
            lo, hi = inst['lo'], inst['hi']
            tri_ids = np.arange(lo, hi, dtype=np.int64)
            key = (lo, hi)
        root, bmn, bmx = blas_for(key, tri_ids)
        m = np.asarray(inst['m'], np.float32)
        lin = m[:, :3]
        minv_lin = np.linalg.inv(lin)
        minv = np.concatenate([minv_lin, -(minv_lin @ m[:, 3])[:, None]], 1)
        inst_m.append(m)
        inst_minv.append(minv.astype(np.float32))
        inst_minvt.append(minv_lin.T.astype(np.float32))
        inst_root.append(root)
        inst_lo.append(lo if lo >= 0 else 0)
        inst_hi.append(hi if hi >= 0 else geom.face_v.shape[0])
        # world AABB: transform the 8 BLAS root box corners
        # (reference ProxyObject::getAABB, src/ProxyObject.cpp:97-130)
        cs = np.array([[x, y, z]
                       for x in (bmn[0], bmx[0])
                       for y in (bmn[1], bmx[1])
                       for z in (bmn[2], bmx[2])], np.float32)
        wc = cs @ lin.T + m[:, 3]
        world_min.append(wc.min(0))
        world_max.append(wc.max(0))

    inst_table = T.Instances(
        m=np.stack(inst_m), m_inv=np.stack(inst_minv),
        m_inv_t=np.stack(inst_minvt),
        root=np.asarray(inst_root, np.int32),
        tri_lo=np.asarray(inst_lo, np.int32),
        tri_hi=np.asarray(inst_hi, np.int32))

    # TLAS over instance world boxes
    tpool = _WidePool(branch)
    wmin = np.stack(world_min)
    wmax = np.stack(world_max)
    tree, order = _build_binary(wmin, wmax, leaf_size=min(leaf_size, 4))
    tpool.add_subtree(tree, order, np.arange(len(instances), dtype=np.int64))

    # merge BLAS pool + TLAS into one node pool (see BVHArrays docstring):
    # TLAS internal children offset by n_blas nodes; TLAS leaves become
    # instance leaves (count -> -(n+1)) pointing past the triangle section of
    # prim_order.
    n_blas = pool._node_count()
    n_tris = pool.prim_off
    b_min, b_max, b_child, b_count = pool._stacked()
    t_min, t_max, t_child, t_count = tpool._stacked()
    internal = t_count == 0
    leaf = t_count > 0
    t_child = np.where(internal, t_child + n_blas,
                       np.where(leaf, t_child + n_tris, t_child))
    t_count = np.where(leaf, -(t_count + 1), t_count)

    merged = T.BVHArrays(
        node_min=np.concatenate([b_min, t_min]).astype(np.float32),
        node_max=np.concatenate([b_max, t_max]).astype(np.float32),
        child=np.concatenate([b_child, t_child]).astype(np.int32),
        count=np.concatenate([b_count, t_count]).astype(np.int32),
        prim_order=np.concatenate(pool.prim_order
                                  + tpool.prim_order).astype(np.int32),
        depth=pool.max_depth + tpool.max_depth + 2)

    # traversal entry: TLAS root for true two-level scenes, the world BLAS
    # root (node 0) when there is a single identity instance
    single = (len(instances) == 1 and instances[0]['tris'] is not None)
    root = 0 if single else n_blas
    return merged, inst_table, root

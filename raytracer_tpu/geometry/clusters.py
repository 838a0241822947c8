"""Host-side triangle clustering for the block-coherent wavefront tracer.

TPU-native acceleration structure: instead of a deep per-ray pointer tree
(the reference's QBVH, src/BVH.cpp:100-389), the SAH build is cut into M flat
*clusters* of <= C triangles each (C = 128 = one VPU lane row). Traversal is
then two dense phases that map directly onto the VPU:

  1. cull: every ray slab-tests ALL M cluster AABBs at once — one (R, M)
     vector op, no gathers (the TPU generalization of the reference's 4-wide
     QBVH box test, src/BVH.cpp:391-414);
  2. sweep: rays visit their candidate clusters in near-t order; each visit
     Moller-Trumbore-tests a *contiguous* (C,)-triangle slab (the reference's
     TriCache4 packets, src/BVH.cpp:1297-1459, widened 4 -> 128).

Cluster triangle data is stored padded SoA (M, C) per component so a cluster
is a single aligned row read (VMEM-resident in the Pallas kernel). Padding
slots hold degenerate triangles (det == 0 -> always rejected) and tri id -1.

The build reuses the binned-SAH binary build (bvh.py) with leaf size C: every
binary leaf becomes one cluster, so cluster quality == SAH leaf quality.
"""
from __future__ import annotations

import numpy as np

from ..core import types as T
from flax import struct
from typing import Any

Array = Any


@struct.dataclass
class Clusters:
    """Padded SoA cluster table. M clusters x C triangles.

    p0/e1/e2 are the Moller-Trumbore basis (p0, p1-p0, p2-p0) per component;
    *_t1 hold the t=1 motion pose (linear in the vertices, so lerping the
    basis == lerping the vertices). For static scenes *_t1 is p0/e1/e2 itself
    (zero extra memory — same buffer).
    """
    bb_min: Array     # (M, 3) f32 — union of both motion poses
    bb_max: Array     # (M, 3) f32
    p0: Array         # (M, 3, C) f32  [component, lane]
    e1: Array         # (M, 3, C)
    e2: Array         # (M, 3, C)
    p0_t1: Array      # (M, 3, C)
    e1_t1: Array      # (M, 3, C)
    e2_t1: Array      # (M, 3, C)
    tri: Array        # (M, C) i32 — original triangle id, -1 = padding
    cluster_size: int = struct.field(pytree_node=False, default=128)

    @property
    def num_clusters(self) -> int:
        return self.tri.shape[0]


def _basis(verts: np.ndarray, faces: np.ndarray):
    """(T, 3) faces -> MT basis arrays (T, 3) p0, e1, e2."""
    p0 = verts[faces[:, 0]]
    e1 = verts[faces[:, 1]] - p0
    e2 = verts[faces[:, 2]] - p0
    return p0, e1, e2


def build_clusters(geom: T.Geometry, cluster_size: int = 128,
                   pad_clusters_to: int = 8,
                   tri_ids: np.ndarray | None = None) -> Clusters:
    """Cut the SAH tree into <=cluster_size-triangle clusters.

    tri_ids restricts the build to a triangle subset (used per-prototype by
    build_instanced_clusters and for the motion-blur partition of two-level
    scenes); the emitted tri table always holds GLOBAL triangle ids. Default
    (None) covers the whole geometry — the single-level table.
    """
    from .bvh import _build_binary, triangle_aabbs

    C = cluster_size
    if tri_ids is None:
        tri_ids = np.arange(geom.face_v.shape[0], dtype=np.int64)
    else:
        tri_ids = np.asarray(tri_ids, np.int64)

    # native fast path: binned-SAH + SoA pack in one C++ call
    # (native/rt_native.cpp rt_build_clusters); numpy below is the fallback
    from .. import native as native_mod
    has_mb_sub = bool(np.any(np.asarray(geom.face_mb)[tri_ids]))
    nat = native_mod.build_clusters_native(
        np.asarray(geom.vertices, np.float32),
        np.asarray(geom.vertices_t1, np.float32),
        np.asarray(geom.face_v, np.int32), tri_ids, C, has_mb_sub)
    if nat is not None:
        nb_min, nb_max, np0, ne1, ne2, nq0, nq1, nq2, ntri = nat
        M = max(len(ntri), 1)
        Mp = -(-M // pad_clusters_to) * pad_clusters_to
        pad = Mp - len(ntri)
        if pad:
            def padrow(x, fill):
                w = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
                return np.pad(x, w, constant_values=fill)
            # padding rows: far-away POINT boxes + degenerate triangles
            nb_min = padrow(nb_min, np.float32(3e37))
            nb_max = padrow(nb_max, np.float32(3e37))
            np0, ne1, ne2 = (padrow(x, 0.0) for x in (np0, ne1, ne2))
            if has_mb_sub:
                nq0, nq1, nq2 = (padrow(x, 0.0) for x in (nq0, nq1, nq2))
            else:
                nq0, nq1, nq2 = np0, ne1, ne2
            ntri = padrow(ntri, -1)
        return Clusters(bb_min=nb_min, bb_max=nb_max, p0=np0, e1=ne1,
                        e2=ne2, p0_t1=nq0, e1_t1=nq1, e2_t1=nq2,
                        tri=ntri, cluster_size=C)

    bmin, bmax = triangle_aabbs(geom, tri_ids)
    tree, order = _build_binary(bmin, bmax, leaf_size=C)  # subset positions

    # collect binary leaves -> (start, count) ranges over `order`
    leaves = np.flatnonzero(tree.left[:tree.n] < 0)
    starts = tree.start[leaves]
    counts = tree.count[leaves]
    M = max(len(leaves), 1)
    Mp = -(-M // pad_clusters_to) * pad_clusters_to

    v0 = np.asarray(geom.vertices, np.float32)
    v1 = np.asarray(geom.vertices_t1, np.float32)
    faces = np.asarray(geom.face_v)

    tri = np.full((Mp, C), -1, np.int32)
    # padding rows get a far-away POINT box (lo == hi == +3e37): an
    # inverted (lo > hi) box would still PASS the slab test because the
    # per-axis min/max swap un-inverts it into an infinite box
    cb_min = np.full((Mp, 3), np.float32(3e37))
    cb_max = np.full((Mp, 3), np.float32(3e37))
    p0 = np.zeros((Mp, 3, C), np.float32)
    e1 = np.zeros((Mp, 3, C), np.float32)
    e2 = np.zeros((Mp, 3, C), np.float32)
    has_mb = bool(np.any(np.asarray(geom.face_mb)[tri_ids]))
    if has_mb:
        q0 = np.zeros((Mp, 3, C), np.float32)
        q1 = np.zeros((Mp, 3, C), np.float32)
        q2 = np.zeros((Mp, 3, C), np.float32)

    b0_all, be1_all, be2_all = _basis(v0, faces)
    if has_mb:
        c0_all, ce1_all, ce2_all = _basis(v1, faces)

    for m in range(len(leaves)):
        pos = order[starts[m]:starts[m] + counts[m]]  # subset positions
        ids = tri_ids[pos]                            # global triangle ids
        k = len(ids)
        tri[m, :k] = ids
        cb_min[m] = bmin[pos].min(0)
        cb_max[m] = bmax[pos].max(0)
        p0[m, :, :k] = b0_all[ids].T
        e1[m, :, :k] = be1_all[ids].T
        e2[m, :, :k] = be2_all[ids].T
        if has_mb:
            q0[m, :, :k] = c0_all[ids].T
            q1[m, :, :k] = ce1_all[ids].T
            q2[m, :, :k] = ce2_all[ids].T

    if not has_mb:
        q0, q1, q2 = p0, e1, e2
    return Clusters(bb_min=cb_min, bb_max=cb_max,
                    p0=p0, e1=e1, e2=e2, p0_t1=q0, e1_t1=q1, e2_t1=q2,
                    tri=tri, cluster_size=C)


# far-away POINT box for padding lanes (see build_clusters: inverted boxes
# are NOT safe against the slab test)
NEVER_LO = np.float32(3e37)
NEVER_HI = np.float32(3e37)

# clusters per SEGMENT: the two-level kernel's sweep unit is a run of KIN
# consecutive prototype clusters, MT-tested as one (RB, KIN*C) pass; each
# (instance, chunk) pair becomes one flat segment entry with its own world
# AABB (prototype cluster tables are padded to KIN so chunks never straddle
# prototypes)
KIN = 4


@struct.dataclass
class InstancedClusters:
    """Two-level cluster tables: shared OBJECT-SPACE prototype clusters + a
    flat instance table with world AABBs and world->object transforms, laid
    out host-side in the exact shapes the Pallas kernel consumes
    (ops/pallas/icluster_kernel.py).

    The TPU analogue of the reference's ProxyObject two-level BVH
    (src/ProxyObject.cpp:76-95 ray transform, src/BVH.cpp:1305-1338 proxy
    lanes): the tracer dense-culls rays against the instance WORLD boxes,
    transforms surviving ray blocks into object space (direction NOT
    renormalized, so t is preserved across the transform — the same
    invariant the reference relies on), and sweeps the prototype's cluster
    slabs exactly like the single-level kernel. Prototype tables are stored
    once and shared by every instance, so VMEM holds one copy per prototype
    (the reference's 1M-instance memory story, webpage "Instancing").

    Static geometry only (motion-blurred triangles are split into a separate
    single-level table by build_instanced_clusters and traced by the existing
    MB kernel; results merge by nearest t). Lane paddings hold never-hit
    boxes / degenerate triangles / id -1.
    """
    ibb: Array           # (6, I) f32 — inst world box (xyz min, xyz max)
    iminv: Array         # (I, 12) f32 — world->object affine rows
    imeta: Array         # (I, 2) i32 — [prototype id, scene.instances row]
    pbb: Array           # (P*6, MP) f32 — per-proto cluster boxes, rows
                         # 6p..6p+5, lane = local cluster id
    pmeta: Array         # (P, 2) i32 — [cluster row offset, cluster count]
    tri: Array           # (Mtot, C) i32 — GLOBAL triangle ids, -1 padding
    # --- flat segment table + shared prototype pools (kernel working set)
    sbb: Array           # (6, E) f32 — segment WORLD boxes (lane-padded)
    smeta: Array         # (E, 3) i32 — [icl inst row, base cluster row,
                         #               scene.instances row]
    strf: Array          # (E, 12) f32 — per-ENTRY world->object affine
                         # (duplicates iminv so segment-table slices carry
                         # their own transforms — SMEM per slice)
    pool_proto: Array    # (Mtot,) i32 — prototype id per pool cluster row
    pool_local: Array    # (Mtot,) i32 — local cluster id within prototype
    p0: Array            # (Mtot*3, C) f32 — MT basis pool [row=3m+comp]
    e1: Array            # (Mtot*3, C)
    e2: Array            # (Mtot*3, C)
    cluster_size: int = struct.field(pytree_node=False, default=128)
    num_instances: int = struct.field(pytree_node=False, default=0)
    num_entries: int = struct.field(pytree_node=False, default=0)
    # largest prototype's cluster count — static so the tracer choice
    # (hierarchical vs flat segment kernel) stays a compile-time decision
    max_proto_clusters: int = struct.field(pytree_node=False, default=0)

    @property
    def num_clusters(self) -> int:
        return self.tri.shape[0]


def build_instanced_clusters(geom: T.Geometry, instances: list[dict],
                             inst_table, cluster_size: int = 128):
    """Two-level cluster build for instanced scenes.

    instances: the SceneBuilder dicts (m (3,4); lo/hi prototype tri range or
    tris= explicit world-tri ids); inst_table: the T.Instances built by
    build_scene_bvh (provides m/m_inv in the SAME row order — rows here are
    the inst ids the shader uses for normal fix-up).

    Returns (InstancedClusters | None, mb_clusters: Clusters | None):
      - motion-blurred WORLD triangles are split out into a single-level
        Clusters table (mb_clusters) traced separately and merged by t;
      - prototypes containing MB triangles are unsupported -> (None, None)
        (callers keep the BVH path).
    """
    face_mb = np.asarray(geom.face_mb)

    # prototype key -> (proto_idx, tri_ids); world static tris get their own
    proto_keys: dict = {}
    entries = []  # (key, inst_row) per kept instance
    mb_world: np.ndarray | None = None
    for row, inst in enumerate(instances):
        if inst['tris'] is not None:
            tri_ids = np.asarray(inst['tris'], np.int64)
            is_mb = face_mb[tri_ids]
            # accumulate MB triangles across world entries and key world
            # prototypes by their triangle content (SceneBuilder currently
            # emits one world entry, but a second must not silently alias
            # the first's geometry or drop its MB triangles)
            mb_world = (tri_ids[is_mb] if mb_world is None else
                        np.concatenate([mb_world, tri_ids[is_mb]]))
            tri_ids = tri_ids[~is_mb]
            if len(tri_ids) == 0:
                continue  # world geometry entirely MB
            key = ('world', tri_ids.tobytes())
        else:
            lo, hi = inst['lo'], inst['hi']
            key = (lo, hi)
            if key not in proto_keys:  # first sight of this prototype only
                tri_ids = np.arange(lo, hi, dtype=np.int64)
                if face_mb[tri_ids].any():
                    return None, None  # MB prototypes: BVH path only
                proto_keys[key] = (len(proto_keys), tri_ids)
            entries.append((key, row))
            continue
        if key not in proto_keys:
            proto_keys[key] = (len(proto_keys), tri_ids)
        entries.append((key, row))

    mb_clusters = None
    if mb_world is not None and len(mb_world) > 0:
        mb_clusters = build_clusters(geom, cluster_size, tri_ids=mb_world)

    if not proto_keys:
        return None, mb_clusters

    # ---- per-prototype cluster tables (object space), padded to KIN so
    # segment chunks never straddle prototypes
    C = cluster_size
    tabs = [None] * len(proto_keys)
    for key, (pidx, tri_ids) in proto_keys.items():
        tabs[pidx] = build_clusters(geom, C, pad_clusters_to=KIN,
                                    tri_ids=tri_ids)
    P = len(tabs)
    proto_len = np.asarray([t.tri.shape[0] for t in tabs], np.int64)
    proto_off = np.concatenate([[0], np.cumsum(proto_len)[:-1]])
    Mtot = int(proto_len.sum())

    cat = lambda k: np.concatenate(
        [np.asarray(getattr(t, k), np.float32) for t in tabs])
    p0 = cat('p0').reshape(Mtot * 3, C)
    e1 = cat('e1').reshape(Mtot * 3, C)
    e2 = cat('e2').reshape(Mtot * 3, C)
    tri = np.concatenate([np.asarray(t.tri, np.int32) for t in tabs])
    pmeta = np.stack([proto_off, proto_len], 1).astype(np.int32)

    MP = -(-int(proto_len.max()) // 128) * 128
    pbb = np.empty((P * 6, MP), np.float32)
    pbb[:] = NEVER_LO
    pbb[np.arange(P * 6) % 6 >= 3] = NEVER_HI
    for p in range(P):
        l_ = int(proto_len[p])
        pbb[6 * p:6 * p + 3, :l_] = np.asarray(tabs[p].bb_min).T
        pbb[6 * p + 3:6 * p + 6, :l_] = np.asarray(tabs[p].bb_max).T

    # ---- instance table (lane-padded to 128 with never-hit boxes)
    n_inst = len(entries)
    I = -(-n_inst // 128) * 128
    ibb = np.empty((6, I), np.float32)
    ibb[:3] = NEVER_LO
    ibb[3:] = NEVER_HI
    iminv = np.tile(np.eye(3, 4, dtype=np.float32).reshape(1, 12), (I, 1))
    imeta = np.zeros((I, 2), np.int32)
    m_all = np.asarray(inst_table.m)
    minv_all = np.asarray(inst_table.m_inv)

    # per-prototype chunk object boxes (union of the chunk's REAL clusters)
    chunk_lo, chunk_hi = [], []
    for p in range(P):
        t = tabs[p]
        lo = np.asarray(t.bb_min).reshape(-1, KIN, 3)
        hi = np.asarray(t.bb_max).reshape(-1, KIN, 3)
        real = lo[..., 0] < 1e37                   # (nchunk, KIN)
        m4 = real[..., None]
        chunk_lo.append(np.where(m4, lo, np.inf).min(1))
        chunk_hi.append(np.where(m4, hi, -np.inf).max(1))

    # ---- instance + flat segment tables, vectorized per prototype (the
    # many-instance scaling path: a python per-entry loop took minutes at
    # 100k instances). One segment per (instance, KIN-cluster chunk).
    ent_rows = np.asarray([row for (_, row) in entries], np.int64)
    ent_pidx = np.asarray([proto_keys[key][0] for (key, _) in entries],
                          np.int64)
    bits = ((np.arange(8)[:, None] >> np.asarray([2, 1, 0])) & 1) \
        .astype(np.float32)                              # (8, 3) corner mask

    def world_boxes(m, lo, hi):
        """m (k,3,4); lo/hi (nc,3) -> world lo/hi (k,nc,3) via 8 corners
        (reference ProxyObject::getAABB, src/ProxyObject.cpp:97-130)."""
        corners = lo[:, None] * (1 - bits)[None] \
            + hi[:, None] * bits[None]                   # (nc, 8, 3)
        wc = np.einsum('kij,cqj->kcqi', m[:, :, :3], corners) \
            + m[:, None, None, :, 3]                     # (k, nc, 8, 3)
        return wc.min(2), wc.max(2)

    seg_per_proto = np.asarray([len(chunk_lo[p]) for p in range(P)])
    ent_nseg = seg_per_proto[ent_pidx]
    ent_seg0 = np.concatenate([[0], np.cumsum(ent_nseg)[:-1]])
    n_ent = int(ent_nseg.sum())
    sb_lo = np.empty((n_ent, 3), np.float32)
    sb_hi = np.empty((n_ent, 3), np.float32)
    sm = np.empty((n_ent, 3), np.int32)
    for p in range(P):
        sel = np.flatnonzero(ent_pidx == p)
        if len(sel) == 0:
            continue
        m = m_all[ent_rows[sel]]                         # (k, 3, 4)
        t = tabs[p]
        # union of REAL clusters only (KIN padding rows are 3e37 points)
        real = np.asarray(t.bb_min)[:, 0] < 1e37
        bmn = np.asarray(t.bb_min)[real].min(0, keepdims=True)
        bmx = np.asarray(t.bb_max)[real].max(0, keepdims=True)
        wlo, whi = world_boxes(m, bmn, bmx)              # (k, 1, 3)
        ibb[:3, sel] = wlo[:, 0].T
        ibb[3:, sel] = whi[:, 0].T
        iminv[sel] = minv_all[ent_rows[sel]].reshape(-1, 12)
        imeta[sel, 0] = p
        imeta[sel, 1] = ent_rows[sel]

        clo, chi = chunk_lo[p], chunk_hi[p]
        slo, shi = world_boxes(m, clo, chi)              # (k, nc, 3)
        nc = len(clo)
        segids = (ent_seg0[sel][:, None]
                  + np.arange(nc)[None]).reshape(-1)     # (k*nc,)
        sb_lo[segids] = slo.reshape(-1, 3)
        sb_hi[segids] = shi.reshape(-1, 3)
        sm[segids, 0] = np.repeat(sel, nc)
        sm[segids, 1] = int(proto_off[p]) + np.tile(
            np.arange(nc) * KIN, len(sel))
        sm[segids, 2] = np.repeat(ent_rows[sel], nc)
    E = -(-n_ent // 128) * 128
    sbb = np.empty((6, E), np.float32)
    sbb[:3] = NEVER_LO
    sbb[3:] = NEVER_HI
    sbb[:3, :n_ent] = sb_lo.T
    sbb[3:, :n_ent] = sb_hi.T
    smeta = np.zeros((E, 3), np.int32)
    smeta[:n_ent] = sm
    strf = np.tile(np.eye(3, 4, dtype=np.float32).reshape(1, 12), (E, 1))
    strf[:n_ent] = iminv[smeta[:n_ent, 0]]

    return InstancedClusters(
        ibb=ibb, iminv=iminv.astype(np.float32), imeta=imeta,
        pbb=pbb, pmeta=pmeta, tri=tri,
        sbb=sbb, smeta=smeta, strf=strf, p0=p0, e1=e1, e2=e2,
        pool_proto=np.repeat(np.arange(P, dtype=np.int32), proto_len),
        pool_local=np.concatenate(
            [np.arange(n, dtype=np.int32) for n in proto_len]),
        cluster_size=C, num_instances=n_inst, num_entries=n_ent,
        max_proto_clusters=int(proto_len.max())), mb_clusters


def refresh_iclusters(icl: InstancedClusters, geom, inst_table):
    """Re-derive the two-level tables from the CURRENT vertices (device).

    The instanced analogue of refresh_clusters: differentiable vertex
    updates (parallel/sharding.apply_params) must rebuild the prototype
    MT-basis pool, per-cluster boxes (pbb), instance world boxes (ibb) and
    segment world boxes (sbb), or the instanced tracers keep intersecting
    the original geometry (forward hit values are pinned by
    intersect.refine_hit, freezing the render w.r.t. vertex params).
    Topology and instance TRANSFORMS stay fixed (transform gradients are
    out of scope — BASELINE targets vertex parameters); only box quality
    degrades for large deformations. All ops are jnp gathers/segment
    reductions, callable under jit.
    """
    import jax
    import jax.numpy as jnp

    tri = jnp.asarray(icl.tri)                           # (Mtot, C)
    Mtot, C = tri.shape
    valid = tri >= 0
    faces = jnp.asarray(geom.face_v)[jnp.maximum(tri, 0)]  # (Mtot, C, 3)
    verts = jnp.asarray(geom.vertices)
    p0 = verts[faces[..., 0]]                            # (Mtot, C, 3)
    e1 = verts[faces[..., 1]] - p0
    e2 = verts[faces[..., 2]] - p0
    m3 = valid[..., None]
    p0 = jnp.where(m3, p0, 0.0)
    e1 = jnp.where(m3, e1, 0.0)
    e2 = jnp.where(m3, e2, 0.0)

    # per-cluster object boxes
    pts = jnp.stack([p0, p0 + e1, p0 + e2], axis=2)      # (Mtot, C, 3, 3)
    m4 = valid[..., None, None]
    cb_lo = jnp.min(jnp.where(m4, pts, jnp.inf), axis=(1, 2))   # (Mtot, 3)
    cb_hi = jnp.max(jnp.where(m4, pts, -jnp.inf), axis=(1, 2))
    anyv = jnp.any(valid, axis=1)
    cb_lo = jnp.where(anyv[:, None], cb_lo, NEVER_LO)
    cb_hi = jnp.where(anyv[:, None], cb_hi, NEVER_HI)

    # pbb: scatter cluster boxes into the (P*6, MP) lane layout
    gp = jnp.asarray(icl.pool_proto, jnp.int32)
    lc = jnp.asarray(icl.pool_local, jnp.int32)
    pbb = jnp.asarray(icl.pbb)
    rows_lo = 6 * gp[:, None] + jnp.arange(3)[None]      # (Mtot, 3)
    rows_hi = rows_lo + 3
    pbb = pbb.at[rows_lo, lc[:, None]].set(cb_lo)
    pbb = pbb.at[rows_hi, lc[:, None]].set(cb_hi)

    # per-prototype object boxes -> instance world boxes via 8 corners
    P = icl.pmeta.shape[0]
    safe_lo = jnp.where(cb_lo < 1e37, cb_lo, jnp.inf)
    safe_hi = jnp.where(cb_hi < 1e37, cb_hi, -jnp.inf)
    plo = jax.ops.segment_min(safe_lo, gp, num_segments=P)   # (P, 3)
    phi = jax.ops.segment_max(safe_hi, gp, num_segments=P)
    bits = ((jnp.arange(8)[:, None] >> jnp.asarray([2, 1, 0])) & 1
            ).astype(jnp.float32)                        # (8, 3)

    def world_box(lo, hi, m):
        """lo/hi (K, 3) object boxes; m (K, 3, 4) -> world lo/hi."""
        corners = lo[:, None] * (1 - bits)[None] + hi[:, None] * bits[None]
        wc = jnp.einsum('kij,kqj->kqi', m[:, :, :3], corners) \
            + m[:, None, :, 3]                           # (K, 8, 3)
        return wc.min(1), wc.max(1)

    NI = icl.num_instances
    imeta = jnp.asarray(icl.imeta)
    m_all = jnp.asarray(inst_table.m)
    mi = m_all[imeta[:NI, 1]]                            # (NI, 3, 4)
    wlo, whi = world_box(plo[imeta[:NI, 0]], phi[imeta[:NI, 0]], mi)
    ibb = jnp.asarray(icl.ibb)
    ibb = ibb.at[:3, :NI].set(wlo.T).at[3:, :NI].set(whi.T)

    # per-KIN-chunk object boxes -> segment world boxes
    ch_lo = jnp.min(safe_lo.reshape(-1, KIN, 3), axis=1)
    ch_hi = jnp.max(safe_hi.reshape(-1, KIN, 3), axis=1)
    nE = icl.num_entries
    smeta = jnp.asarray(icl.smeta)
    me = m_all[smeta[:nE, 2]]                            # (nE, 3, 4)
    cid = smeta[:nE, 1] // KIN
    slo, shi = world_box(ch_lo[cid], ch_hi[cid], me)
    sbb = jnp.asarray(icl.sbb)
    sbb = sbb.at[:3, :nE].set(slo.T).at[3:, :nE].set(shi.T)

    def soa(x):  # (Mtot, C, 3) -> (Mtot*3, C)
        return x.transpose(0, 2, 1).reshape(Mtot * 3, C)

    return icl.replace(p0=soa(p0), e1=soa(e1), e2=soa(e2),
                       pbb=pbb, ibb=ibb, sbb=sbb)


def refresh_clusters(clusters: Clusters, geom, mb: bool) -> Clusters:
    """Re-derive the cluster MT basis + AABBs from the CURRENT vertices.

    `build_clusters` bakes vertex positions into the SoA table host-side;
    differentiable vertex updates (parallel/sharding.apply_params) must
    refresh the table device-side or the tracer keeps intersecting the
    original geometry (forward values are pinned to the traversal's hit by
    intersect.refine_hit, so stale tables freeze the render w.r.t. vertex
    params). Topology (tri-to-cluster assignment) stays fixed: cluster AABBs
    are recomputed so traversal remains exact, only SAH quality degrades for
    large deformations.

    All ops are jnp gathers/reductions — callable under jit; cost is one
    rebuild of the (M, 3, C) tables per parameter update.
    """
    import jax.numpy as jnp

    tri = jnp.asarray(clusters.tri)                      # (M, C)
    valid = tri >= 0
    faces = jnp.asarray(geom.face_v)[jnp.maximum(tri, 0)]  # (M, C, 3)

    def basis(verts):
        p0 = verts[faces[..., 0]]                        # (M, C, 3)
        e1 = verts[faces[..., 1]] - p0
        e2 = verts[faces[..., 2]] - p0
        m = valid[..., None]
        # padding lanes -> degenerate (det == 0, always rejected)
        return (jnp.where(m, p0, 0.0), jnp.where(m, e1, 0.0),
                jnp.where(m, e2, 0.0))

    def corners(p0, e1, e2):
        return jnp.stack([p0, p0 + e1, p0 + e2], axis=2)  # (M, C, 3corner, 3)

    p0, e1, e2 = basis(jnp.asarray(geom.vertices))
    pts = corners(p0, e1, e2)
    if mb:
        q0, q1, q2 = basis(jnp.asarray(geom.vertices_t1))
        pts = jnp.concatenate([pts, corners(q0, q1, q2)], axis=2)
    else:
        q0, q1, q2 = p0, e1, e2

    m4 = valid[..., None, None]
    bb_min = jnp.min(jnp.where(m4, pts, jnp.inf), axis=(1, 2))    # (M, 3)
    bb_max = jnp.max(jnp.where(m4, pts, -jnp.inf), axis=(1, 2))
    # empty (all-padding) clusters keep a never-hit box
    any_valid = jnp.any(valid, axis=1)[:, None]
    bb_min = jnp.where(any_valid, bb_min, 3e37)
    bb_max = jnp.where(any_valid, bb_max, 3e37)  # point box: see build_clusters

    def soa(x):  # (M, C, 3) -> (M, 3, C)
        return x.transpose(0, 2, 1)

    return clusters.replace(
        bb_min=bb_min, bb_max=bb_max,
        p0=soa(p0), e1=soa(e1), e2=soa(e2),
        p0_t1=soa(q0), e1_t1=soa(q1), e2_t1=soa(q2))

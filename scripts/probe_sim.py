"""Simulate sweep-scheme iteration counts on real cull data (CPU numpy).

For N sample ray blocks of the incoherent sponza_hd set, computes:
  cand   : number of cull-passing clusters (union over block rays)
  near   : clusters visited by the near-ordered one-at-a-time sweep (r4)
  laneK  : batches + clusters tested by lane-ordered K-batch (v3)
  nearK  : batches + clusters tested by NEAR-ordered K-batch (pick K
           nearest viable per iteration — the scheme under consideration)
  grpK   : near-ordered groups of GSZ, lane-K batches inside
"""
import os
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.scenes import registry
from raytracer_tpu.render import integrator

scene, cam, st = registry.make('sponza_proxy', width=64, height=36, hd=True)
tab = integrator._mb_chunks(scene.clusters, False)[0]
M = tab.tri.shape[0]
bbmin = np.asarray(tab.bb_min)
bbmax = np.asarray(tab.bb_max)
p0 = np.asarray(tab.p0)
e1 = np.asarray(tab.e1)
e2 = np.asarray(tab.e2)
tri = np.asarray(tab.tri)

RB = 32
NBLK = 24
R = RB * NBLK
key = jax.random.PRNGKey(1)
k1, k2, k3 = jax.random.split(key, 3)
o = np.stack([np.asarray(jax.random.uniform(k1, (R,), minval=-9, maxval=9)),
              np.asarray(jax.random.uniform(k2, (R,), minval=0.2, maxval=7.0)),
              np.asarray(jax.random.uniform(k3, (R,), minval=-4, maxval=4))], 1)
d = np.asarray(jax.random.normal(jax.random.fold_in(key, 7), (R, 3)))
d = d / np.linalg.norm(d, axis=-1, keepdims=True)

inv = 1.0 / np.where(np.abs(d) < 1e-20, 1e-20, d)
t0 = (bbmin[None] - o[:, None]) * inv[:, None]
t1 = (bbmax[None] - o[:, None]) * inv[:, None]
near = np.maximum.reduce(np.minimum(t0, t1), axis=2)
far = np.minimum.reduce(np.maximum(t0, t1), axis=2)
okbox = (near <= far) & (far >= 1e-3)
keymat = np.where(okbox, np.maximum(near, 0.0), 3e38)      # (R, M)


def mt_t(rows, c):
    """t of nearest valid MT hit per ray row for cluster c, else inf."""
    P0, E1, E2 = p0[c], e1[c], e2[c]                        # (3, C)
    dd = d[rows][:, :, None]
    oo = o[rows][:, :, None]
    pv = np.cross(dd, E2[None], axis=1)
    det = (E1[None] * pv).sum(1)
    with np.errstate(divide='ignore', invalid='ignore'):
        invd = 1.0 / det
        tv = oo - P0[None]
        a = (tv * pv).sum(1) * invd
        qv = np.cross(tv, E1[None], axis=1)
        b = (dd * qv).sum(1) * invd
        t = (E2[None] * qv).sum(1) * invd
    ok = (a >= 0) & (a <= 1) & (b >= 0) & (a + b <= 1) & (det != 0) \
        & (tri[c][None] >= 0) & (t >= 1e-3)
    t = np.where(ok, t, np.inf)
    return t.min(1)


stats = {k: [] for k in ('cand', 'near_visits', 'laneK_it', 'laneK_vis',
                         'nearK_it', 'nearK_vis', 'winK_it', 'winK_vis',
                         'runK_it', 'runK_vis',
                         'grp_outer', 'grp_inner', 'grp_vis')}
K = 8
GSZ = 32
ALPHA, DELTA = 2.0, 0.02

for blk in range(NBLK):
    rows = np.arange(blk * RB, (blk + 1) * RB)
    km = keymat[rows]                                       # (RB, M)
    best = np.full(RB, 1e30)
    stats['cand'].append(int((km < 3e38).any(0).sum()))

    # near-ordered single sweep
    k2_ = km.copy()
    visits = 0
    while True:
        v = k2_ < best[:, None]
        if not v.any():
            break
        col = np.where(v, k2_, np.inf).min(0)
        c = int(np.argmin(col))
        tmin = mt_t(rows, c)
        best = np.minimum(best, tmin)
        k2_[:, c] = 3e38
        visits += 1
    stats['near_visits'].append(visits)

    # lane-ordered K batches (v3)
    best = np.full(RB, 1e30)
    donev = np.zeros(M, bool)
    it = vis = 0
    while True:
        v = (km < best[:, None]).any(0) & ~donev
        if not v.any():
            break
        idx = np.flatnonzero(v)[:K]
        for c in idx:
            best = np.minimum(best, mt_t(rows, int(c)))
        donev[idx] = True
        it += 1
        vis += len(idx)
    stats['laneK_it'].append(it)
    stats['laneK_vis'].append(vis)

    # NEAR-ordered K batches
    best = np.full(RB, 1e30)
    donev = np.zeros(M, bool)
    it = vis = 0
    while True:
        vm = (km < best[:, None]) & ~donev[None]
        if not vm.any():
            break
        col = np.where(vm, km, np.inf).min(0)
        idx = np.argsort(col)[:K]
        idx = idx[np.isfinite(col[idx])]
        for c in idx:
            best = np.minimum(best, mt_t(rows, int(c)))
        donev[idx] = True
        it += 1
        vis += len(idx)
    stats['nearK_it'].append(it)
    stats['nearK_vis'].append(vis)

    # threshold-window K batches: lanes with colkey <= a*tau0 + delta,
    # lane-rank-limited to K (the cheap vectorized near-order proxy)
    best = np.full(RB, 1e30)
    donev = np.zeros(M, bool)
    it = vis = 0
    while True:
        vm = (km < best[:, None]) & ~donev[None]
        vany = vm.any(0)
        if not vany.any():
            break
        col = np.where(vm, km, np.inf).min(0)
        tau = col.min()
        w = vany & (col <= ALPHA * tau + DELTA)
        idx = np.flatnonzero(w)[:K]
        for c in idx:
            best = np.minimum(best, mt_t(rows, int(c)))
        donev[idx] = True
        it += 1
        vis += len(idx)
    stats['winK_it'].append(it)
    stats['winK_vis'].append(vis)

    # consecutive-run batches seeded at the nearest viable lane: ONE
    # scalar extract per iteration, K-run marked done (correct: keys are
    # invariant and best_t only decreases)
    best = np.full(RB, 1e30)
    donev = np.zeros(M, bool)
    it = 0
    while True:
        vm = (km < best[:, None]) & ~donev[None]
        vany = vm.any(0)
        if not vany.any():
            break
        col = np.where(vm, km, np.inf).min(0)
        j0 = int(np.argmin(col))
        j0 = min(j0, M - K)
        for c in range(j0, j0 + K):
            best = np.minimum(best, mt_t(rows, c))
        donev[j0:j0 + K] = True
        it += 1
    stats['runK_it'].append(it)
    stats['runK_vis'].append(it * K)

    # near-ordered GROUPS of GSZ, lane-K batches inside
    G = -(-M // GSZ)
    gmin = np.full((RB, G), np.inf)
    for g in range(G):
        gmin[:, g] = km[:, g * GSZ:(g + 1) * GSZ].min(1)
    best = np.full(RB, 1e30)
    gdone = np.zeros(G, bool)
    outer = inner = vis = 0
    while True:
        gv = (gmin < best[:, None]) & ~gdone[None]
        if not gv.any():
            break
        gcol = np.where(gv, gmin, np.inf).min(0)
        g = int(np.argmin(gcol))
        outer += 1
        lo, hi = g * GSZ, min((g + 1) * GSZ, M)
        donev = np.zeros(hi - lo, bool)
        while True:
            vm = (km[:, lo:hi] < best[:, None]) & ~donev[None]
            vany = vm.any(0)
            if not vany.any():
                break
            idx = np.flatnonzero(vany)[:K]
            for c in idx:
                best = np.minimum(best, mt_t(rows, int(lo + c)))
            donev[idx] = True
            inner += 1
            vis += len(idx)
        gdone[g] = True
    stats['grp_outer'].append(outer)
    stats['grp_inner'].append(inner)
    stats['grp_vis'].append(vis)

for k, v in stats.items():
    a = np.asarray(v, float)
    print(f'{k:12s} mean {a.mean():7.1f}  p50 {np.median(a):6.0f}  '
          f'max {a.max():6.0f}')

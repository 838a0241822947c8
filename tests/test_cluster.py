"""Cluster wavefront tracer: XLA impl and Pallas kernel vs brute force.

Mirrors the reference's implicit BVH validation (BVH results must equal the
linear fallback, src/BVH.cpp:1114-1126); here each tracer backend must agree
hit-for-hit on random rays, including motion blur and any-hit shadow mode.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracer_tpu.scenes import registry
from raytracer_tpu.ops import intersect, cluster_trace
from raytracer_tpu.ops.pallas import cluster_kernel


def _random_rays(scene, R, seed):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    # ignore padding cluster rows (point boxes at +3e37)
    real = np.asarray(scene.clusters.tri)[:, 0] >= 0
    lo = np.asarray(scene.clusters.bb_min)[real].min(0)
    hi = np.asarray(scene.clusters.bb_max)[real].max(0)
    ctr, ext = (lo + hi) / 2, (hi - lo).max()
    o = jnp.asarray(ctr) + jax.random.normal(k1, (R, 3)) * ext
    tgt = jnp.asarray(ctr) + jax.random.uniform(
        k2, (R, 3), minval=-0.5, maxval=0.5) * ext
    d = tgt - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    time = jax.random.uniform(k3, (R,))
    return o, d, time


SCENES = ['teapot_blinn', 'cornell_pt', 'mb_bullet']


@pytest.mark.parametrize('name', SCENES)
def test_cluster_trace_matches_brute(name):
    scene, cam, st = registry.make(name, size=16, bvh=True)
    o, d, time = _random_rays(scene, 256, 1)
    hb = intersect.brute_force_trace(scene, o, d, time, 1e-3, 1e12, False)
    hc = cluster_trace.cluster_trace(scene, o, d, time, 1e-3, 1e12, False)
    np.testing.assert_array_equal(np.asarray(hb.tri), np.asarray(hc.tri))
    hit = np.asarray(hb.tri) >= 0
    np.testing.assert_allclose(np.asarray(hb.t)[hit], np.asarray(hc.t)[hit],
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('name', SCENES)
def test_pallas_cluster_kernel_matches_xla(name):
    scene, cam, st = registry.make(name, size=16, bvh=True)
    o, d, time = _random_rays(scene, 300, 2)  # not a multiple of rb
    hx = cluster_trace.cluster_trace(scene, o, d, time, 1e-3, 1e12, False)
    hp = cluster_kernel.pallas_cluster_trace(scene, o, d, time, 1e-3, 1e12,
                                             False, rb=128)
    np.testing.assert_array_equal(np.asarray(hx.tri), np.asarray(hp.tri))
    hit = np.asarray(hx.tri) >= 0
    np.testing.assert_allclose(np.asarray(hx.t)[hit], np.asarray(hp.t)[hit],
                               rtol=1e-4, atol=1e-5)


def test_cluster_any_hit_agrees():
    scene, cam, st = registry.make('cornell_pt', size=16, bvh=True)
    o, d, time = _random_rays(scene, 256, 3)
    hb = intersect.brute_force_trace(scene, o, d, time, 1e-3, 5.0, True)
    hc = cluster_trace.cluster_trace(scene, o, d, time, 1e-3, 5.0, True)
    hp = cluster_kernel.pallas_cluster_trace(scene, o, d, time, 1e-3, 5.0,
                                             True, rb=128)
    got_b = np.asarray(hb.tri) >= 0
    np.testing.assert_array_equal(got_b, np.asarray(hc.tri) >= 0)
    np.testing.assert_array_equal(got_b, np.asarray(hp.tri) >= 0)


@pytest.mark.slow
def test_cluster_render_matches_bvh_render():
    """End-to-end: full radiance through the cluster backend equals the BVH
    backend bit-for-bit (same RNG keys, same estimator)."""
    from raytracer_tpu.render import renderer
    scene, cam, st = registry.make('cornell_pt', size=16, bvh=True,
                                   max_bounces=2)
    key = jax.random.PRNGKey(0)
    img_bvh = np.asarray(renderer.render(
        scene, cam, st.replace(intersector='bvh'), key, spp=1))
    img_cl = np.asarray(renderer.render(
        scene, cam, st.replace(intersector='cluster'), key, spp=1))
    np.testing.assert_allclose(img_bvh, img_cl, rtol=1e-4, atol=1e-5)


def test_refresh_clusters_tracks_vertex_updates():
    """apply_params must refresh the baked cluster tables: after a vertex
    shift, cluster_trace on the updated scene must agree with brute force on
    the updated geometry (regression: stale tables froze the forward render
    w.r.t. vertex params on the TPU path)."""
    from raytracer_tpu.parallel import sharding
    scene, cam, settings = registry.make('teapot_blinn', size=8, bvh=True)
    params = sharding.get_params(scene)
    params['vertices'] = params['vertices'] + jnp.asarray([0.0, 0.37, 0.0])
    shifted = jax.jit(sharding.apply_params)(scene, params)

    o, d, time = _random_rays(scene, 128, seed=11)
    o = o + jnp.asarray([0.0, 0.37, 0.0])  # keep rays relative to geometry
    hit_cl = cluster_trace.cluster_trace(shifted, o, d, time, 1e-3, 1e12)
    hit_bf = intersect.brute_force_trace(shifted, o, d, time, 1e-3, 1e12)
    np.testing.assert_array_equal(np.asarray(hit_cl.tri),
                                  np.asarray(hit_bf.tri))
    np.testing.assert_allclose(np.asarray(hit_cl.t), np.asarray(hit_bf.t),
                               rtol=1e-5, atol=1e-5)
    # and the stale table really would have been wrong: original-scene
    # clusters on shifted rays give different hits
    hit_stale = cluster_trace.cluster_trace(scene, o, d, time, 1e-3, 1e12)
    assert not np.array_equal(np.asarray(hit_stale.tri),
                              np.asarray(hit_bf.tri))


def test_alpha_aware_pallas_matches_brute():
    """Alpha-cutout scenes through the pallas kernel + re-trace wrapper must
    agree with the alpha-aware brute-force tracer (interpret mode on CPU)."""
    scene, cam, settings = registry.make('alpha_leaf', size=8, max_bounces=2)
    assert scene.has_alpha_maps
    from raytracer_tpu.render import camera as cam_mod
    R = 256
    key = jax.random.PRNGKey(3)
    px = jnp.arange(R, dtype=jnp.float32) % 8
    py = (jnp.arange(R, dtype=jnp.float32) // 8) % 8
    rands = jax.random.uniform(key, (R, 5))
    o, d, tm = cam_mod.eye_rays(cam, 8, 8, px, py, 0.0, 1.0, 0.0, 1.0, rands)

    @jax.jit
    def traced(scene, o, d, tm):
        def once(o_, d_, t_, tn_, tx_, ah):
            return cluster_kernel.pallas_cluster_trace(scene, o_, d_, t_,
                                                       tn_, tx_, ah)
        return cluster_trace.alpha_aware_trace(scene, once, o, d, tm,
                                               1e-3, 1e12)

    hit_p = traced(scene, o, d, tm)
    hit_b = intersect.brute_force_trace(scene, o, d, tm, 1e-3, 1e12)
    np.testing.assert_array_equal(np.asarray(hit_p.tri), np.asarray(hit_b.tri))
    np.testing.assert_allclose(np.asarray(hit_p.t), np.asarray(hit_b.t),
                               rtol=1e-5, atol=1e-4)


def test_native_cluster_build_valid():
    """Native cluster-table builder (rt_native.cpp rt_build_clusters) must
    emit a complete, geometry-consistent table: every subset triangle
    appears exactly once, each lane's MT basis matches the vertex pool, and
    cluster AABBs contain their triangles (incl. the motion-blur union)."""
    from raytracer_tpu import native
    from raytracer_tpu.geometry import clusters as cl_mod

    if native.get_lib() is None:
        pytest.skip('native library unavailable')
    scene, cam, st = registry.make('mb_bullet', size=8, bvh=True)
    cl = scene.clusters
    tri = np.asarray(cl.tri)
    real = tri[tri >= 0]
    assert len(real) == scene.num_tris
    assert len(np.unique(real)) == scene.num_tris
    v = np.asarray(scene.geom.vertices)
    v1 = np.asarray(scene.geom.vertices_t1)
    f = np.asarray(scene.geom.face_v)
    m, lane = np.nonzero(tri >= 0)
    ids = tri[m, lane]
    np.testing.assert_array_equal(np.asarray(cl.p0)[m, :, lane],
                                  v[f[ids][:, 0]])
    np.testing.assert_array_equal(np.asarray(cl.e1)[m, :, lane],
                                  v[f[ids][:, 1]] - v[f[ids][:, 0]])
    np.testing.assert_array_equal(np.asarray(cl.p0_t1)[m, :, lane],
                                  v1[f[ids][:, 0]])
    pts = np.concatenate([v[f[ids]], v1[f[ids]]], axis=1)
    assert (pts.min(1) >= np.asarray(cl.bb_min)[m] - 1e-4).all()
    assert (pts.max(1) <= np.asarray(cl.bb_max)[m] + 1e-4).all()
    # tracing through the native table == brute force (MB lerp included)
    o, d, time = _random_rays(scene, 128, 21)
    hb = intersect.brute_force_trace(scene, o, d, time, 1e-3, 1e12, False)
    hc = cluster_trace.cluster_trace(scene, o, d, time, 1e-3, 1e12, False)
    np.testing.assert_array_equal(np.asarray(hb.tri), np.asarray(hc.tri))

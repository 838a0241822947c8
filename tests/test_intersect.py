"""Intersection tests: Moller-Trumbore vs the scalar oracle; brute vs BVH."""
import numpy as np
import jax
import jax.numpy as jnp

from raytracer_tpu.ops import intersect, traverse
from raytracer_tpu.scenes import registry
from . import oracle


def test_mt_basic():
    o = jnp.asarray([[0.0, 0.0, 1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    p0 = jnp.asarray([[-1.0, -1.0, 0.0]])
    p1 = jnp.asarray([[1.0, -1.0, 0.0]])
    p2 = jnp.asarray([[0.0, 1.0, 0.0]])
    t, a, b, ok = intersect.mt_intersect(o, d, p0, p1, p2)
    assert bool(ok[0])
    assert np.allclose(float(t[0]), 1.0, atol=1e-6)


def _random_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = np.asarray([0, 3, 6], np.float32) + 0.1 * rng.normal(size=(n, 3))
    d = rng.normal(size=(n, 3))
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    # bias half the rays toward the scene
    d[: n // 2] = (np.asarray([0, 0.5, 0]) - o[: n // 2])
    d[: n // 2] /= np.linalg.norm(d[: n // 2], axis=1, keepdims=True)
    return o.astype(np.float32), d.astype(np.float32)


def test_brute_force_matches_oracle():
    scene, cam, settings = registry.make('triangle_sphere', size=16, bvh=False)
    verts = np.asarray(scene.geom.vertices, np.float64)
    faces = np.asarray(scene.geom.face_v)
    o, d = _random_rays(32)
    hit = intersect.brute_force_trace(scene, jnp.asarray(o), jnp.asarray(d),
                                      0.0, 1e-3, 1e12)
    tri = np.asarray(hit.tri)
    t = np.asarray(hit.t)
    for i in range(len(o)):
        ot, otri, _, _ = oracle.trace(verts, faces, o[i].astype(np.float64),
                                      d[i].astype(np.float64))
        assert otri == tri[i], f'ray {i}: oracle tri {otri} vs {tri[i]}'
        if otri >= 0:
            assert abs(ot - t[i]) < 1e-3 * max(1.0, abs(ot))


def test_bvh_matches_brute_force():
    scene, cam, settings = registry.make('teapot_blinn', size=16, bvh=True)
    o, d = _random_rays(64, seed=1)
    hb = intersect.brute_force_trace(scene, jnp.asarray(o), jnp.asarray(d),
                                     0.0, 1e-3, 1e12)
    hv = traverse.bvh_trace(scene, jnp.asarray(o), jnp.asarray(d),
                            0.0, 1e-3, 1e12, False)
    assert np.array_equal(np.asarray(hb.tri), np.asarray(hv.tri))
    np.testing.assert_allclose(np.asarray(hb.t), np.asarray(hv.t), rtol=1e-5)


def test_bvh_any_hit_shadow():
    scene, cam, settings = registry.make('teapot_blinn', size=16, bvh=True)
    o, d = _random_rays(64, seed=2)
    hb = intersect.brute_force_trace(scene, jnp.asarray(o), jnp.asarray(d),
                                     0.0, 1e-3, 1e12)
    ha = traverse.bvh_trace(scene, jnp.asarray(o), jnp.asarray(d),
                            0.0, 1e-3, 1e12, True)
    # any-hit finds a hit iff closest-hit does
    assert np.array_equal(np.asarray(hb.tri) >= 0, np.asarray(ha.tri) >= 0)


def test_refine_hit_matches_trace():
    scene, cam, settings = registry.make('triangle_sphere', size=16, bvh=False)
    o, d = _random_rays(32, seed=3)
    o, d = jnp.asarray(o), jnp.asarray(d)
    hit = intersect.brute_force_trace(scene, o, d, 0.0, 1e-3, 1e12)
    t, a, b = intersect.refine_hit(scene, o, d, jnp.zeros(o.shape[0]), hit)
    m = np.asarray(hit.tri) >= 0
    np.testing.assert_allclose(np.asarray(t)[m], np.asarray(hit.t)[m],
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(a)[m], np.asarray(hit.a)[m],
                               atol=1e-4)

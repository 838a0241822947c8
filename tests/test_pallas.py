"""Pallas MT kernel vs the jnp brute-force tracer (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from raytracer_tpu.ops import intersect as isect
from raytracer_tpu.ops import pallas as plk
from raytracer_tpu.ops.pallas import mt_kernel
from raytracer_tpu.render import renderer, camera as cam_mod
from raytracer_tpu.scenes import registry


def _random_tris(n, key):
    k1, k2, k3 = jax.random.split(key, 3)
    c = jax.random.uniform(k1, (n, 3), minval=-2, maxval=2)
    e1 = jax.random.normal(k2, (n, 3)) * 0.5
    e2 = jax.random.normal(k3, (n, 3)) * 0.5
    return c, c + e1, c + e2


def test_kernel_matches_reference_mt():
    key = jax.random.PRNGKey(0)
    p0, p1, p2 = _random_tris(1000, key)
    o = jnp.zeros((300, 3)) + jnp.array([0.0, 0.0, 5.0])
    d = jax.random.normal(jax.random.PRNGKey(1), (300, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    valid = jnp.ones((1000,), jnp.int32)

    t, tri, a, b = mt_kernel.mt_trace_pallas(o, d, p0, p1, p2, valid,
                                             1e-3, 1e12, interpret=True)

    # dense jnp reference
    tr, ar, br, ok = isect.mt_intersect(o[:, None], d[:, None],
                                        p0[None], p1[None], p2[None])
    ok = ok & (tr >= 1e-3) & (tr < 1e12)
    tr = jnp.where(ok, tr, jnp.inf)
    j = jnp.argmin(tr, axis=1)
    rows = jnp.arange(o.shape[0])
    t_ref = tr[rows, j]
    hit_ref = np.isfinite(np.asarray(t_ref))

    assert np.array_equal(np.asarray(tri >= 0), hit_ref)
    np.testing.assert_allclose(np.asarray(t)[hit_ref],
                               np.asarray(t_ref)[hit_ref], rtol=2e-5)
    assert np.array_equal(np.asarray(tri)[hit_ref], np.asarray(j)[hit_ref])


def test_kernel_respects_tmin_tmax():
    p0 = jnp.array([[-1.0, -1.0, -1.0], [-1.0, -1.0, -3.0]])
    p1 = jnp.array([[1.0, -1.0, -1.0], [1.0, -1.0, -3.0]])
    p2 = jnp.array([[0.0, 1.0, -1.0], [0.0, 1.0, -3.0]])
    o = jnp.zeros((1, 3))
    d = jnp.array([[0.0, 0.0, -1.0]])
    valid = jnp.ones((2,), jnp.int32)
    # tmin past the first triangle -> second wins
    t, tri, a, b = mt_kernel.mt_trace_pallas(o, d, p0, p1, p2, valid,
                                             2.0, 1e12, interpret=True)
    assert int(tri[0]) == 1 and abs(float(t[0]) - 3.0) < 1e-5
    # tmax before everything -> miss
    t, tri, a, b = mt_kernel.mt_trace_pallas(o, d, p0, p1, p2, valid,
                                             1e-3, 0.5, interpret=True)
    assert int(tri[0]) == -1


def test_pallas_tracer_matches_brute_on_scene():
    scene, cam, settings = registry.make('triangle_sphere', size=12,
                                         bvh=False)
    o, d, tm = cam_mod.center_rays(cam, 12, 12)
    h_ref = isect.brute_force_trace(scene, o, d, tm, 1e-3, 1e12)
    h_plk = plk.pallas_brute_trace(scene, o, d, tm, 1e-3, 1e12)
    assert np.array_equal(np.asarray(h_ref.tri), np.asarray(h_plk.tri))
    hit = np.asarray(h_ref.tri) >= 0
    np.testing.assert_allclose(np.asarray(h_plk.t)[hit],
                               np.asarray(h_ref.t)[hit], rtol=2e-5)


def test_render_with_pallas_intersector():
    scene, cam, settings = registry.make('triangle_sphere', size=12,
                                         bvh=False)
    st_p = settings.replace(intersector='pallas')
    key = jax.random.PRNGKey(0)
    a = np.asarray(renderer.render_center(scene, cam, settings, key))
    b = np.asarray(renderer.render_center(scene, cam, st_p, key))
    np.testing.assert_allclose(b, a, atol=1e-4)

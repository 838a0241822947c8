"""Gradient checks: autodiff vs finite differences (BASELINE: "gradient
max-abs-err vs finite differences"). Targets: light power, material albedo,
vertex positions, texture texels."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from raytracer_tpu.render import renderer
from raytracer_tpu.scenes import registry

SIZE = 8


def _loss_fn(scene, cam, settings):
    key = jax.random.PRNGKey(0)

    def loss(s):
        img = renderer.render_center(s, cam, settings, key)
        return jnp.mean(img ** 2)

    return loss


def _fd(loss, scene, get, set_, eps=3e-3):
    v0 = get(scene)
    lp = loss(set_(scene, v0 + eps))
    lm = loss(set_(scene, v0 - eps))
    return (lp - lm) / (2 * eps)


def test_grad_light_power():
    scene, cam, settings = registry.make('triangle_sphere', size=SIZE,
                                         bvh=False)
    loss = _loss_fn(scene, cam, settings)

    def set_power(s, p):
        return s.replace(point_lights=s.point_lights.replace(
            power=jnp.asarray([p], jnp.float32)))

    g = jax.grad(lambda p: loss(set_power(scene, p)))(700.0)
    fd = _fd(loss, scene, lambda s: 700.0, set_power, eps=1.0)
    assert np.isfinite(g)
    np.testing.assert_allclose(g, fd, rtol=1e-2)


def test_grad_albedo():
    scene, cam, settings = registry.make('triangle_sphere', size=SIZE,
                                         bvh=False)
    loss = _loss_fn(scene, cam, settings)

    def set_kd(s, v):
        kd = jnp.full_like(s.materials.kd, v)
        return s.replace(materials=s.materials.replace(kd=kd))

    g = jax.grad(lambda v: loss(set_kd(scene, v)))(1.0)
    fd = _fd(loss, scene, lambda s: 1.0, set_kd, eps=1e-2)
    assert np.isfinite(g) and g > 0
    np.testing.assert_allclose(g, fd, rtol=2e-2)


@pytest.mark.slow
def test_grad_vertices():
    """Shift all vertices along +y and compare against a common-random-
    numbers finite difference of the SAME jittered loss.

    For a whole-scene translate of this fixture the boundary contributions
    nearly cancel (silhouettes gain at the top what they lose at the
    bottom; measured: interior 0.00256, CRN-FD 0.00258 +- 0.0005 over 3
    keys, so the net boundary term is ~0): the interior gradient must hit
    the FD TIGHTLY (this replaces the historical rtol=0.3 hedge).
    Boundary-DOMINATED regimes are validated to rtol 0.25-0.3 in
    tests/test_edge_grad.py (translating silhouette, shadow blocker,
    convergence fit) — a near-zero sum of large canceling edge terms is
    not resolvable by the MC boundary estimator at this resolution, so the
    combined gradient is only sanity-bounded here."""
    from raytracer_tpu.parallel import sharding
    from raytracer_tpu.diff import edges as ed

    size, spp = 32, 16
    scene, cam, settings = registry.make('triangle_sphere', size=size,
                                         bvh=False)
    settings = settings.replace(ray_tile=size * size)
    params = sharding.get_params(scene)
    key = jax.random.PRNGKey(3)
    target = jnp.zeros((size, size, 3), jnp.float32)

    def loss_dy(dy, k):
        p = dict(params)
        p['vertices'] = params['vertices'] + jnp.asarray([0.0, dy, 0.0])
        l, _ = sharding.loss_and_grads_scanned(
            p, scene, cam, settings, target, k, spp=spp, tile=size * size)
        return float(l)

    eps = 1e-2
    fd = float(np.mean([(loss_dy(eps, jax.random.PRNGKey(k))
                         - loss_dy(-eps, jax.random.PRNGKey(k))) / (2 * eps)
                        for k in range(2)]))

    _, g_int = sharding.loss_and_grads_scanned(
        params, scene, cam, settings, target, key, spp=spp,
        tile=size * size)
    g_i = float(jnp.sum(g_int['vertices'][:, 1]))
    assert np.isfinite(g_i) and np.isfinite(fd)
    np.testing.assert_allclose(g_i, fd, rtol=0.15)

    # combined gradient stays same-sign and bounded (see docstring)
    _, grads = ed.loss_and_grads_with_edges(
        params, scene, cam, settings, target, key, spp=spp,
        edge_samples=8192)
    g_c = float(jnp.sum(grads['vertices'][:, 1]))
    assert np.isfinite(g_c) and np.sign(g_c) == np.sign(fd)
    assert abs(g_c) < 10 * abs(fd)


def test_grad_through_spp_render():
    scene, cam, settings = registry.make('triangle_sphere', size=SIZE,
                                         bvh=False)
    key = jax.random.PRNGKey(1)

    def loss(p):
        s = scene.replace(point_lights=scene.point_lights.replace(
            power=jnp.asarray([p], jnp.float32)))
        return jnp.mean(renderer.render(s, cam, settings, key, spp=2))

    g = jax.grad(loss)(700.0)
    assert np.isfinite(g) and g > 0


@pytest.mark.slow
def test_grad_rect_power():
    """Rect-light wattage gradient vs finite differences (BASELINE target;
    area normalization src/RectangleLight.cpp:14-40)."""
    scene, cam, settings = registry.make('cornell_pt', size=SIZE,
                                         num_rect_samples=1, bvh=True,
                                         max_bounces=2)
    loss = _loss_fn(scene, cam, settings)

    def set_power(s, p):
        return s.replace(rect_lights=s.rect_lights.replace(
            power=jnp.full_like(s.rect_lights.power, p)))

    p0 = float(scene.rect_lights.power[0])
    g = jax.grad(lambda p: loss(set_power(scene, p)))(p0)
    fd = _fd(loss, scene, lambda s: p0, set_power, eps=0.5)
    assert np.isfinite(g) and g != 0.0
    np.testing.assert_allclose(g, fd, rtol=2e-2)


@pytest.mark.slow
def test_scanned_loss_ignores_padding_lanes():
    """A tile that does not divide W*H pads the ray set; padding lanes
    re-render pixel (0,0) against a zero target and must NOT contribute to
    loss or grads. Reference value computed tile-by-tile with the same
    per-tile RNG, summing squared error over REAL lanes only."""
    from raytracer_tpu.parallel import sharding

    scene, cam, settings = registry.make('triangle_sphere', size=SIZE,
                                         bvh=False)
    params = sharding.get_params(scene)
    key = jax.random.PRNGKey(3)
    H = W = SIZE
    R = W * H
    target = jnp.zeros((H, W, 3), jnp.float32)
    tile = 48                      # 64 rays -> 2 tiles, 32 padding lanes
    loss, grads = sharding.loss_and_grads_scanned(
        params, scene, cam, settings, target, key, spp=1, tile=tile)

    ys, xs = np.meshgrid(np.arange(H, dtype=np.float32),
                         np.arange(W, dtype=np.float32), indexing='ij')
    px = np.concatenate([xs.reshape(-1), np.zeros(32, np.float32)])
    py = np.concatenate([ys.reshape(-1), np.zeros(32, np.float32)])
    s = sharding.apply_params(scene, params)
    render_tile = jax.jit(lambda s_, pxt, pyt, k: sharding._render_local(
        s_, cam, settings, 1, pxt, pyt, k))
    ref = 0.0
    for ti in range(2):
        k = jax.random.fold_in(key, ti)
        L = np.asarray(render_tile(
            s, jnp.asarray(px[ti * 48:(ti + 1) * 48]),
            jnp.asarray(py[ti * 48:(ti + 1) * 48]), k))
        real = min(48, max(0, R - ti * 48))
        ref += float(np.sum(L[:real] ** 2))
    np.testing.assert_allclose(float(loss), ref / (R * 3), rtol=1e-5)
    # a scanned run whose tile divides R must agree on loss scale too
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_grad_texture_texels():
    """Texture-texel gradients vs finite differences (BASELINE target:
    texels are declared differentiable params, parallel/sharding.get_params)."""
    from raytracer_tpu.geometry.build import SceneBuilder
    from raytracer_tpu.geometry import shapes
    from raytracer_tpu.core.types import Camera, RenderSettings

    b = SceneBuilder()
    tex = b.add_texture(np.full((4, 4, 3), 0.5, np.float32))
    m = b.add_blinn(kd=(1, 1, 1), tex_color=tex)
    b.add_mesh(shapes.quad((-2, 0, -2), (2, 0, -2), (2, 0, 2), (-2, 0, 2)),
               m)
    b.add_point_light((2, 5, 2), 400.0)
    scene = b.build(bvh=False)
    cam = Camera.make(eye=(0, 4, 4), look_at=(0, 0, 0), fov=45.0)
    settings = RenderSettings(width=SIZE, height=SIZE, path_trace=False,
                              max_wavefront_steps=2)
    loss = _loss_fn(scene, cam, settings)

    def set_tex(s, v):
        return s.replace(textures=s.textures.replace(
            data=jnp.full_like(s.textures.data, v)))

    g = jax.grad(lambda v: loss(set_tex(scene, v)))(0.5)
    fd = _fd(loss, scene, lambda s: 0.5, set_tex, eps=1e-2)
    assert np.isfinite(g) and g > 0.0
    np.testing.assert_allclose(g, fd, rtol=2e-2)

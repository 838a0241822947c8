"""Visibility (silhouette) gradients via edge sampling (diff/edges.py).

BASELINE north star: d(loss)/d(vertices) across silhouettes, where the
interior (refine_hit) gradient is blind. Validated against finite
differences on a translating bright triangle over a dark background — a
loss whose derivative is almost entirely the boundary term.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from raytracer_tpu.core.types import Camera, RenderSettings
from raytracer_tpu.geometry.build import SceneBuilder
from raytracer_tpu.io.objload import make_single_triangle
from raytracer_tpu.parallel import sharding
from raytracer_tpu.render import renderer
from raytracer_tpu.diff import edges as ed

pytestmark = pytest.mark.slow  # multi-replica renders / FD sweeps

SIZE = 32


def _tri_scene(dx=0.0):
    b = SceneBuilder()
    lam = b.add_lambert(kd=(1.0, 1.0, 1.0))
    b.add_mesh(make_single_triangle((-1.0 + dx, -1.0, 0.0),
                                    (1.0 + dx, -1.0, 0.0),
                                    (0.0 + dx, 1.0, 0.0),
                                    n=(0, 0, 1)), lam)
    b.add_point_light((0, 0, 5), 300.0, cast_shadows=False)
    b.set_bg_color((0.0, 0.0, 0.0))
    scene = b.build(bvh=False)
    cam = Camera.make(eye=(0, 0, 4), look_at=(0, 0, 0), fov=60.0)
    st = RenderSettings(width=SIZE, height=SIZE, path_trace=False,
                        max_wavefront_steps=2, ray_tile=SIZE * SIZE)
    return scene, cam, st


def test_edge_table_adjacency():
    scene, _, _ = _tri_scene()
    et = scene.edges
    assert et is not None
    assert et.vid.shape == (3, 2)          # one triangle -> 3 open edges
    assert (np.asarray(et.fid)[:, 1] == -1).all()


def test_edge_grad_matches_fd_on_silhouette():
    """Fit a triangle to a target rendered with the triangle shifted +0.2 in
    x: at dx=0 the loss derivative is dominated by silhouette motion
    (coverage mismatch). The interior gradient is blind to it; the
    edge-sampled boundary term must reproduce the finite difference.

    Validated magnitudes (128-spp FD, 4 keys): fd = -0.1417 +- 0.004,
    edge estimator = -0.1389 +- 0.002, interior = 0."""
    key = jax.random.PRNGKey(0)
    scene, cam, st = _tri_scene()
    params = sharding.get_params(scene)
    s_t, _, _ = _tri_scene(0.2)
    target = renderer.render(s_t, cam, st, jax.random.PRNGKey(42), spp=64)

    # FD needs pixel-INTEGRATED coverage (center rays see no sub-pixel
    # silhouette shift): jittered render with common random numbers —
    # interior samples cancel, only side-flips remain.
    def loss_at(dx, k):
        s, _, _ = _tri_scene(dx)
        img = renderer.render(s, cam, st, k, spp=64)
        return float(jnp.sum((img - target) ** 2) / (SIZE * SIZE * 3))

    eps = 2e-2
    fds = [(loss_at(eps, jax.random.PRNGKey(k))
            - loss_at(-eps, jax.random.PRNGKey(k))) / (2 * eps)
           for k in range(2)]
    fd = float(np.mean(fds))

    # combined gradient, projected on the uniform +x translation direction
    loss, grads = ed.loss_and_grads_with_edges(
        params, scene, cam, st, target, key, spp=8, edge_samples=16384)
    g_dx = float(jnp.sum(grads['vertices'][:, 0]))

    # interior-only gradient misses the silhouette term
    _, g_int = sharding.loss_and_grads_scanned(
        params, scene, cam, st, target, key, spp=8, tile=SIZE * SIZE)
    g_int_dx = float(jnp.sum(g_int['vertices'][:, 0]))

    assert np.isfinite(fd) and abs(fd) > 0.05, fd
    assert abs(g_int_dx) < 0.25 * abs(fd), (
        f'interior grad {g_int_dx} should be blind to the silhouette '
        f'(fd {fd})')
    assert np.sign(g_dx) == np.sign(fd), (g_dx, fd)
    np.testing.assert_allclose(g_dx, fd, rtol=0.25)

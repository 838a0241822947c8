"""End-to-end forward-radiance tests vs the scalar oracle (BASELINE config #1)."""
import numpy as np
import jax
import jax.numpy as jnp

from raytracer_tpu.render import renderer
from raytracer_tpu.scenes import registry
from . import oracle

SIZE = 16


def test_triangle_sphere_matches_oracle():
    scene, cam, settings = registry.make('triangle_sphere', size=SIZE,
                                         bvh=False)
    img = np.asarray(renderer.render_center(scene, cam, settings,
                                            jax.random.PRNGKey(0)))
    ref = oracle.render_lambert_point(
        np.asarray(scene.geom.vertices, np.float64),
        np.asarray(scene.geom.face_v),
        np.asarray(scene.geom.normals, np.float64),
        np.asarray(scene.geom.face_n),
        kd=(1.0, 1.0, 1.0), light_pos=np.asarray([10.0, 10.0, 10.0]),
        light_power=700.0, eye=(0, 3, 6), look_at=(0, 0, 0), up=(0, 1, 0),
        fov_deg=45.0, W=SIZE, H=SIZE, bg=(0, 0, 0.2))
    # all pixels close; allow a tiny count of grazing-edge mismatches
    diff = np.abs(img - ref)
    bad = (diff.max(-1) > 5e-3).sum()
    assert bad <= 1, f'{bad} mismatched pixels, max diff {diff.max()}'


def test_uniform_spp_close_to_center():
    scene, cam, settings = registry.make('triangle_sphere', size=SIZE,
                                         bvh=False)
    img_c = np.asarray(renderer.render_center(scene, cam, settings,
                                              jax.random.PRNGKey(0)))
    img_s = np.asarray(renderer.render(scene, cam, settings,
                                       jax.random.PRNGKey(0), spp=4))
    # jittered sampling agrees with center sampling away from edges
    interior = np.abs(img_c - img_s).mean()
    assert interior < 0.05


def test_render_deterministic():
    scene, cam, settings = registry.make('triangle_sphere', size=8, bvh=False)
    a = np.asarray(renderer.render(scene, cam, settings,
                                   jax.random.PRNGKey(7), spp=2))
    b = np.asarray(renderer.render(scene, cam, settings,
                                   jax.random.PRNGKey(7), spp=2))
    assert np.array_equal(a, b)


def test_bg_color_on_miss():
    scene, cam, settings = registry.make('triangle_sphere', size=SIZE,
                                         bvh=False)
    img = np.asarray(renderer.render_center(scene, cam, settings,
                                            jax.random.PRNGKey(0)))
    # top corner rays miss everything -> background color
    assert np.allclose(img[-1, 0], [0.0, 0.0, 0.2], atol=1e-6)

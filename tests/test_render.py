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


def test_adaptive_matches_uniform_within_noise():
    """Adaptive supersampling (Scene::adaptiveSampleScene,
    src/Scene.cpp:250-293) must agree with a high-spp uniform render within
    the perceptual noise threshold it is driven by."""
    scene, cam, settings = registry.make('cornell_pt', size=16,
                                         num_rect_samples=1, bvh=True,
                                         max_bounces=2)
    st = settings.replace(min_subdivs=2, max_subdivs=4, noise_threshold=0.05)
    key = jax.random.PRNGKey(2)
    img_a, counts = renderer.render_adaptive(scene, cam, st, key,
                                             with_counts=True)
    img_u = renderer.render(scene, cam, st, key, spp=16)
    img_a = np.asarray(img_a)
    img_u = np.asarray(img_u)
    counts = np.asarray(counts)
    assert np.isfinite(img_a).all()
    # same scene content: gamma-space agreement within a few noise widths
    from raytracer_tpu.core import vecmath as vm
    # linear_to_gamma_f is in 0..255 units (reference LUT,
    # src/Image.cpp gamma tables); two independent MC estimates of this
    # scene agree to a few gray levels on average
    ga = np.asarray(vm.linear_to_gamma_f(jnp.asarray(img_a)))
    gu = np.asarray(vm.linear_to_gamma_f(jnp.asarray(img_u)))
    assert np.mean(np.abs(ga - gu)) < 20.0
    # control logic: counts bounded by the level schedule
    max_count = sum(k * k for k in range(1, 5))
    assert counts.min() >= 1 + 4  # everyone renders levels 1 and 2
    assert counts.max() <= max_count


def test_adaptive_saves_work_on_flat_regions():
    """A flat, trivially-converging scene (constant background, no hits)
    must stop at min_subdivs: the per-pixel sample counts expose the
    compacted early-out."""
    from raytracer_tpu.geometry.build import SceneBuilder
    from raytracer_tpu.io.objload import make_single_triangle
    from raytracer_tpu.core.types import Camera, RenderSettings
    b = SceneBuilder()
    lam = b.add_lambert(kd=(1, 1, 1))
    # tiny off-screen triangle: every camera ray misses -> constant bg
    b.add_mesh(make_single_triangle((100, 100, 100), (101, 100, 100),
                                    (100, 101, 100)), lam)
    b.add_point_light((10, 10, 10), 100.0)
    b.set_bg_color((0.1, 0.2, 0.3))
    scene = b.build(bvh=False)
    cam = Camera.make(eye=(0, 0, 5), look_at=(0, 0, 0), fov=45.0)
    st = RenderSettings(width=16, height=16, path_trace=False,
                        max_wavefront_steps=2, min_subdivs=2, max_subdivs=5,
                        noise_threshold=0.05)
    img, counts = renderer.render_adaptive(scene, cam, st,
                                           jax.random.PRNGKey(0),
                                           with_counts=True)
    counts = np.asarray(counts)
    # every pixel converges at level 2: 1 + 4 samples, never 3^2/4^2/5^2 more
    assert counts.max() == 5, counts.max()
    np.testing.assert_allclose(np.asarray(img)[..., 2], 0.3, atol=1e-5)

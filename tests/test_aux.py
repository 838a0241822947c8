"""Auxiliary subsystems: profiling counters, BVH stats, checkpoint/resume."""
import numpy as np
import jax
import jax.numpy as jnp

from raytracer_tpu.render import renderer, camera as cam_mod
from raytracer_tpu.scenes import registry
from raytracer_tpu.utils import checkpoint as ckpt
from raytracer_tpu.utils import profiling


def test_bvh_stats():
    scene, cam, settings = registry.make('cornell_pt', size=8, bvh=True)
    s = profiling.bvh_stats(scene.blas)
    assert s['nodes'] >= 1
    assert s['tri_refs'] == scene.num_tris  # every triangle referenced once
    assert 0 < s['faces_per_leaf'] <= 4.0
    assert s['max_depth'] >= 1


def test_trace_stats_counts():
    scene, cam, settings = registry.make('cornell_pt', size=8, bvh=True)
    o, d, t = cam_mod.center_rays(cam, 8, 8)
    st = profiling.trace_stats(scene, o, d, t)
    assert st['rays'] == 64
    # every ray visits at least the root node (branch-wide AABB tests)
    assert st['ray_aabb'] >= 64 * scene.blas.count.shape[1]
    # cornell rays all hit geometry -> triangle tests happened
    assert st['ray_tri'] > 0
    assert st['tri_per_ray'] < scene.num_tris  # BVH culls vs brute force


def test_stats_do_not_change_hits():
    from raytracer_tpu.ops import traverse
    scene, cam, settings = registry.make('cornell_pt', size=8, bvh=True)
    o, d, t = cam_mod.center_rays(cam, 8, 8)
    h0 = traverse.bvh_trace(scene, o, d, t, 1e-3, 1e12)
    h1, st = traverse.bvh_trace(scene, o, d, t, 1e-3, 1e12,
                                collect_stats=True)
    assert np.array_equal(np.asarray(h0.tri), np.asarray(h1.tri))
    assert np.array_equal(np.asarray(h0.t), np.asarray(h1.t))
    assert int(jnp.sum(st['ray_tri'])) > 0


def test_render_with_stats_matches_render():
    scene, cam, settings = registry.make('triangle_sphere', size=8, bvh=False)
    key = jax.random.PRNGKey(0)
    img, report = profiling.render_with_stats(scene, cam, settings, key,
                                              spp=1, probe=False, log=False)
    ref = renderer.render(scene, cam, settings, key, spp=1)
    assert np.array_equal(np.asarray(img), np.asarray(ref))
    assert report.primary_rays == 64
    assert report.wall_s > 0


def test_checkpoint_roundtrip(tmp_path):
    tree = dict(a=jnp.arange(5.0), b=(jnp.zeros((2, 3)), jnp.int32(7)))
    p = str(tmp_path / 'state.npz')
    ckpt.save_state(p, tree, step=3, loss=0.5)
    tree2, scalars = ckpt.load_state(p, tree)
    assert np.array_equal(np.asarray(tree2['a']), np.arange(5.0))
    assert int(scalars['step']) == 3
    assert float(scalars['loss']) == 0.5
    assert ckpt.load_state(str(tmp_path / 'missing.npz'), tree) is None


def test_progressive_resume_identical(tmp_path):
    """Interrupted + resumed progressive render == uninterrupted render."""
    scene, cam, settings = registry.make('triangle_sphere', size=8, bvh=False)
    key = jax.random.PRNGKey(3)
    full = ckpt.render_progressive(scene, cam, settings, key,
                                   spp_total=4, spp_batch=1)

    p = str(tmp_path / 'render.npz')
    # run only the first 2 batches by checkpointing then truncating: simulate
    # an interruption by doing a partial run with spp_total=2 to the ckpt,
    # then rewriting the cursor as if 2 of 4 batches completed
    part = ckpt.render_progressive(scene, cam, settings, key,
                                   spp_total=2, spp_batch=1, ckpt_path=p)
    resumed = ckpt.render_progressive(scene, cam, settings, key,
                                      spp_total=4, spp_batch=1, ckpt_path=p)
    assert np.allclose(np.asarray(full), np.asarray(resumed), atol=1e-6)
    assert not np.allclose(np.asarray(part), np.asarray(resumed))


def test_progressive_cli_resume_identical(tmp_path):
    """The --progressive CLI front end: interrupting (first invocation with
    a lower --spp) and resuming via --ckpt produces the identical image to
    one uninterrupted run, and intermediate images are written after every
    batch (the reference MiroWindow progressive blit + screenshot,
    src/MiroWindow.cpp:471-488)."""
    from raytracer_tpu import cli
    from raytracer_tpu.io import imageio

    out1 = str(tmp_path / 'a.ppm')
    out2 = str(tmp_path / 'b.ppm')
    ck = str(tmp_path / 'prog.npz')
    base = ['--scene', 'triangle_sphere', '--size', '8', '--seed', '7']
    # uninterrupted 4-spp progressive render
    assert cli.main(base + ['--spp', '4', '--progressive', '2',
                            '--out', out1]) == 0
    # interrupted after 2 spp, then resumed to 4
    assert cli.main(base + ['--spp', '2', '--progressive', '2',
                            '--out', out2, '--ckpt', ck]) == 0
    mid, _ = imageio.load_ppm(out2)
    assert cli.main(base + ['--spp', '4', '--progressive', '2',
                            '--out', out2, '--ckpt', ck]) == 0
    a, _ = imageio.load_ppm(out1)
    b, _ = imageio.load_ppm(out2)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(mid, b)  # the intermediate write differed


def test_train_state_roundtrip(tmp_path):
    import optax
    params = dict(w=jnp.ones((3,)))
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    p = str(tmp_path / 'train.npz')
    ckpt.save_train_state(p, params, opt_state, step=11, loss=1.25)
    out = ckpt.load_train_state(p, params, opt_state)
    assert out is not None
    params2, opt_state2, step = out
    assert step == 11
    assert np.array_equal(np.asarray(params2['w']), np.ones(3))

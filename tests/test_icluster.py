"""Two-level instanced cluster tracer (ops/pallas/icluster_kernel) vs the
BVH traversal, hit-for-hit, plus the MB-partition merge path.

The reference analogue being validated: ProxyObject::intersect ray
transforms + two-level traversal (src/ProxyObject.cpp:76-95,
src/BVH.cpp:1305-1338)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracer_tpu.scenes import registry
from raytracer_tpu.ops import traverse
from raytracer_tpu.ops.pallas import icluster_kernel
from raytracer_tpu.render import integrator, renderer


def _random_rays(scene, R, seed):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    ibb = np.asarray(scene.iclusters.ibb)
    n = scene.iclusters.num_instances
    lo = ibb[:3, :n].min(1)
    hi = ibb[3:, :n].max(1)
    ctr, ext = (lo + hi) / 2, (hi - lo).max()
    o = jnp.asarray(ctr) + jax.random.normal(k1, (R, 3)) * ext
    tgt = jnp.asarray(ctr) + jax.random.uniform(
        k2, (R, 3), minval=-0.4, maxval=0.4) * ext
    d = tgt - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d, jnp.zeros(R, jnp.float32)


def test_icluster_builds_for_instanced_scene():
    scene, cam, st = registry.make('instanced_teapots', size=16, grid=2)
    assert scene.iclusters is not None
    assert scene.mb_clusters is None  # static scene
    icl = scene.iclusters
    # 2 prototypes: teapot + loose world floor
    assert icl.pmeta.shape[0] == 2
    assert icl.num_instances == 5  # world + 4 teapots
    # every global tri appears exactly once in the pool
    tris = np.asarray(icl.tri).reshape(-1)
    tris = np.sort(tris[tris >= 0])
    teapot_tris = np.unique(tris)
    assert len(teapot_tris) <= scene.num_tris
    # instance ids reference scene.instances rows
    ids = np.asarray(icl.imeta[:icl.num_instances, 1])
    assert ids.min() == 0 and ids.max() == 4


def test_icluster_matches_bvh_hit_for_hit():
    scene, cam, st = registry.make('instanced_teapots', size=16, grid=2)
    o, d, time = _random_rays(scene, 256, 1)
    hb = traverse.bvh_trace(scene, o, d, time, 1e-3, 1e12, False)
    hp = icluster_kernel.pallas_icluster_trace(scene, o, d, time, 1e-3,
                                               1e12, False, rb=128)
    tb = np.asarray(hb.t)
    tp = np.asarray(hp.t)
    # identical hit/miss classification and t (ties between coplanar tris
    # may select different ids; t must agree everywhere)
    np.testing.assert_array_equal(tb >= 1e11, tp >= 1e11)
    hit = tb < 1e11
    np.testing.assert_allclose(tb[hit], tp[hit], rtol=1e-4, atol=1e-5)
    same = np.asarray(hb.tri) == np.asarray(hp.tri)
    assert same[hit].mean() > 0.99
    # instance ids agree where the triangle agrees
    np.testing.assert_array_equal(np.asarray(hb.inst)[hit & same],
                                  np.asarray(hp.inst)[hit & same])


def test_icluster_any_hit():
    scene, cam, st = registry.make('instanced_teapots', size=16, grid=2)
    o, d, time = _random_rays(scene, 200, 3)
    hb = traverse.bvh_trace(scene, o, d, time, 1e-3, 1e12, True)
    hp = icluster_kernel.pallas_icluster_trace(scene, o, d, time, 1e-3,
                                               1e12, True, rb=128)
    np.testing.assert_array_equal(np.asarray(hb.valid), np.asarray(hp.valid))


def test_cluster2_render_matches_bvh():
    """End-to-end: the cluster2 trace mode renders the same image as bvh."""
    scene, cam, st = registry.make('instanced_teapots', size=16, grid=2)
    key = jax.random.PRNGKey(0)
    img_b = np.asarray(renderer.render_center(
        scene, cam, st.replace(intersector='bvh'), key))
    img_c = np.asarray(renderer.render_center(
        scene, cam, st.replace(intersector='cluster2'), key))
    # tie-broken silhouette pixels may differ; nearly all must match
    close = np.abs(img_b - img_c).max(-1) < 1e-4
    assert close.mean() > 0.99, f'only {close.mean():.3f} pixels match'


@pytest.mark.slow
def test_forest_cluster2_matches_bvh():
    """The flagship instanced scene (alpha-cutout canopy + MB explosion +
    1905 instances): the full cluster2 trace chain (two-level kernel + MB
    chunks + alpha re-trace wrapper) must agree with the BVH traversal on
    primary rays — including rays through many stacked transparent leaf
    texels (regression: the wrapper dropped hit.inst and ran out of passes
    in the canopy)."""
    import jax.numpy as jnp
    from raytracer_tpu.render import camera as cam_mod

    scene, cam, st = registry.make('final_forest', width=480, height=270)
    W, H = 480, 270
    px = jnp.asarray(np.linspace(5, W - 5, 64, dtype=np.float32))
    py = jnp.asarray(np.full(64, H * 0.45, np.float32))
    rands = jnp.full((64, 5), 0.5)
    o, d, tm = cam_mod.eye_rays(cam, W, H, px, py, 0., 1., 0., 1., rands)

    @jax.jit
    def tr2(scene, o, d, tm):
        tr = integrator.trace_fn(scene, st.replace(intersector='cluster2'))
        h = tr(o, d, tm, 1e-3, 1e12, False)
        return h.t, h.tri, h.inst

    @jax.jit
    def trb(scene, o, d, tm):
        h = traverse.bvh_trace(scene, o, d, tm, 1e-3, 1e12, False)
        return h.t, h.tri, h.inst

    tp, trip, ip = [np.asarray(x) for x in tr2(scene, o, d, tm)]
    tb, trib, ib = [np.asarray(x) for x in trb(scene, o, d, tm)]
    np.testing.assert_array_equal(trib, trip)
    hit = trib >= 0
    np.testing.assert_allclose(tb[hit], tp[hit], rtol=1e-3, atol=1e-4)
    np.testing.assert_array_equal(ib[hit], ip[hit])


def test_instanced_grid_segment_kernel_matches_bvh():
    """Shallow-prototype scenes route to the flat segment kernel
    (iseg_kernel), which batches several instances into each MT pass and
    slices its table past 32k entries — the instance-count scaling path
    (reference 1M bunnies, webpage 'Instancing'). Hit-for-hit vs BVH."""
    from raytracer_tpu.ops.pallas import iseg_kernel

    scene, cam, st = registry.make('instanced_grid', size=16, n=300)
    icl = scene.iclusters
    assert icl.max_proto_clusters <= 16      # -> segment kernel selected
    assert icl.num_entries >= 300            # >= 1 segment per instance
    o, d, time = _random_rays(scene, 256, 9)
    hb = traverse.bvh_trace(scene, o, d, time, 1e-3, 1e12, False)
    hp = iseg_kernel.pallas_iseg_trace(scene, o, d, time, 1e-3, 1e12, False)
    tb, tp = np.asarray(hb.t), np.asarray(hp.t)
    np.testing.assert_array_equal(tb >= 1e11, tp >= 1e11)
    hit = tb < 1e11
    np.testing.assert_allclose(tb[hit], tp[hit], rtol=1e-4, atol=1e-5)
    same = np.asarray(hb.tri) == np.asarray(hp.tri)
    assert same[hit].mean() > 0.99
    np.testing.assert_array_equal(np.asarray(hb.inst)[hit & same],
                                  np.asarray(hp.inst)[hit & same])


def test_instance_count_does_not_gate_kernel_path():
    """Regression for the round-4 VMEM cliff: eligibility used to fail once
    the (RB, I) instance cull matrix outgrew scoped VMEM (~2k instances),
    silently dropping to the ~10-25x slower vmap BVH path. The segment
    table is now sliced inside the kernel wrapper, so instance count never
    disqualifies the kernel path."""
    from raytracer_tpu.render.integrator import _pallas_icluster_ok

    scene, cam, st = registry.make('instanced_grid', size=16, n=2500)
    assert scene.iclusters.num_instances >= 2500
    assert _pallas_icluster_ok(scene)


def test_icluster_mb_split_and_merge():
    """Instances + motion-blurred world geometry: the static two-level pass
    and the MB single-level pass merge to the BVH result."""
    from raytracer_tpu.geometry.build import SceneBuilder
    from raytracer_tpu.io.objload import make_single_triangle
    from raytracer_tpu.core.types import Camera, RenderSettings

    b = SceneBuilder()
    mat = b.add_blinn(kd=(0.8, 0.5, 0.3))
    b.begin_prototype()
    b.add_mesh(make_single_triangle((-1, 0, -1), (1, 0, -1), (0, 0, 1),
                                    n=(0, 1, 0)), mat)
    proto = b.end_prototype()
    for dx in (-2.0, 0.0, 2.0):
        m = np.asarray([[1, 0, 0, dx], [0, 1, 0, 0], [0, 0, 1, 0]],
                       np.float32)
        b.add_instance(proto, m)
    # MB world triangle sweeping upward
    t0 = make_single_triangle((-3, 1, -1), (3, 1, -1), (0, 1, 1), n=(0, 1, 0))
    t1 = make_single_triangle((-3, 2, -1), (3, 2, -1), (0, 2, 1), n=(0, 1, 0))
    b.add_mesh(t0, mat, mesh_t1=t1)
    b.add_point_light((0, 10, 0), 500.0)
    scene = b.build(bvh=True)
    assert scene.iclusters is not None
    assert scene.mb_clusters is not None
    assert scene.has_motion_blur

    R = 128
    key = jax.random.PRNGKey(5)
    o = jnp.stack([jax.random.uniform(key, (R,), minval=-3, maxval=3),
                   jnp.full(R, 5.0), jax.random.uniform(
                       jax.random.fold_in(key, 1), (R,), minval=-1, maxval=1)],
                  axis=1)
    d = jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]]), (R, 1))
    time = jax.random.uniform(jax.random.fold_in(key, 2), (R,))

    hb = traverse.bvh_trace(scene, o, d, time, 1e-3, 1e12, False)
    settings = RenderSettings(intersector='cluster2')
    tracer = integrator.trace_fn(scene, settings)
    hm = tracer(o, d, time, 1e-3, 1e12, False)
    np.testing.assert_array_equal(np.asarray(hb.tri), np.asarray(hm.tri))
    hit = np.asarray(hb.tri) >= 0
    np.testing.assert_allclose(np.asarray(hb.t)[hit], np.asarray(hm.t)[hit],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(hb.inst), np.asarray(hm.inst))


def test_segment_kernel_multislice_block_cull_matches_bvh():
    """Sliced segment tables + the per-(block, slice) frustum cull.

    20k instances -> 40k segments -> 3 table slices: exercises (a) the
    nearest-t merge across slices and (b) the conservative interval slab
    test that disables whole ray blocks per slice (the instance-count
    scaling lever; a late-binding bug here once corrupted the cull's
    closure state on the second slice). Hit-for-hit vs the BVH."""
    from raytracer_tpu.ops.pallas import iseg_kernel

    scene, cam, st = registry.make('instanced_grid', size=16, n=20000)
    assert scene.iclusters.sbb.shape[1] > 32768   # really multi-slice
    o, d, time = _random_rays(scene, 64, 11)
    hb = traverse.bvh_trace(scene, o, d, time, 1e-3, 1e12, False)
    hp = iseg_kernel.pallas_iseg_trace(scene, o, d, time, 1e-3, 1e12, False)
    tb, tp = np.asarray(hb.t), np.asarray(hp.t)
    np.testing.assert_array_equal(tb >= 1e11, tp >= 1e11)
    hit = tb < 1e11
    np.testing.assert_allclose(tb[hit], tp[hit], rtol=1e-4, atol=1e-5)
    same = np.asarray(hb.tri) == np.asarray(hp.tri)
    assert same[hit].mean() > 0.99

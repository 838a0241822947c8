"""Headline benchmark: rays/sec/chip, forward+backward, Sponza-scale 1080p 1spp.

sponza.obj is not shipped with the reference (BASELINE.md), so the workload is
the procedural sponza_proxy in its HD configuration (~175k tris with a
second-story gallery + upper colonnade for real interior occlusion, rect
area light, path traced at the registry's own max_bounces=10) at 1920x1080,
1 spp, forward render + backward pass to all differentiable scene
parameters. (Rounds 1-3 benched the 58k-tri single-story proxy at 3
bounces; this workload is deliberately harder and closer to real Sponza —
numbers are not comparable across that change.)

vs_baseline: the reference publishes no rays/s number; its final frame
(1920x1080, adaptive 9-25 spp, ~20 min on an i7 quad-core,
webpage/aguzman_jschwarzhaupt.html) implies ~15k primary rays/s forward-only.
We report our fwd+bwd primary rays/s divided by that estimate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REF_RAYS_PER_SEC = 15_000.0  # i7 estimate, see module docstring


def main():
    import jax
    import jax.numpy as jnp
    from raytracer_tpu.scenes import registry
    from raytracer_tpu.render import renderer
    from raytracer_tpu.parallel import sharding

    width = int(os.environ.get('RT_BENCH_W', 1920))
    height = int(os.environ.get('RT_BENCH_H', 1080))
    bounces = int(os.environ.get('RT_BENCH_BOUNCES', 10))
    spp = int(os.environ.get('RT_BENCH_SPP', 1))
    # 32k-ray tiles measured fastest at 1080p (8k: dispatch-latency bound
    # through the TPU tunnel; 64k: slightly past the sweet spot)
    tile = int(os.environ.get('RT_BENCH_TILE', 32 * 1024))

    scene, cam, settings = registry.make(
        'sponza_proxy', width=width, height=height, bvh=True, hd=True,
        path_trace=True, max_bounces=bounces, ray_tile=tile)
    key = jax.random.PRNGKey(0)

    params = sharding.get_params(scene)
    target = jnp.zeros((height, width, 3), jnp.float32)

    mode = os.environ.get('RT_BENCH_MODE', 'scanned')

    def step(k):
        fn = (sharding.loss_and_grads_scanned if mode == 'scanned'
              else sharding.loss_and_grads_streamed)
        return fn(params, scene, cam, settings, target, k, spp=spp,
                  tile=tile)

    # compile (one tile shape compiles once; the loop then streams)
    t0 = time.time()
    loss, grads = step(key)
    jax.block_until_ready((loss, grads))
    compile_s = time.time() - t0

    # timed runs — distinct RNG key per iteration: identical inputs would be
    # served from the execution-result cache and time as ~0. Median of
    # several runs with the spread reported: wall time through the shared
    # axon tunnel varies +-10-40% run to run.
    n_iter = int(os.environ.get('RT_BENCH_ITERS', 5))
    walls = []
    for i in range(n_iter):
        t0 = time.time()
        loss, grads = step(jax.random.fold_in(key, 1000 + i))
        # fetch-based completion: block_until_ready through the axon tunnel
        # can return before remote execution finishes; a host fetch cannot
        float(loss)
        float(jnp.sum(grads['kd']))
        walls.append(time.time() - t0)
    dt = float(np.median(walls))

    rays = width * height * spp
    rays_per_sec = rays / dt
    print(json.dumps({
        'metric': 'primary_rays_per_sec_per_chip_fwd_bwd_sponza_hd_1080p',
        'value': round(rays_per_sec, 1),
        'unit': 'rays/s',
        'vs_baseline': round(rays_per_sec / REF_RAYS_PER_SEC, 3),
        'wall_median_s': round(dt, 2),
        'wall_spread_s': [round(min(walls), 2), round(max(walls), 2)],
        'iters': n_iter,
    }))
    print(f'# loss={float(loss):.6f} walls={[round(w, 2) for w in walls]} '
          f'compile={compile_s:.1f}s tris={scene.num_tris} '
          f'bounces={bounces}', file=sys.stderr)


if __name__ == '__main__':
    main()

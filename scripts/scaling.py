"""Scaling-efficiency harness: rays/s vs device count (BASELINE: >=85%
rays/s scaling efficiency from 1 chip to >=2 hosts).

On real multi-chip hardware run as-is (devices = jax.devices()); in this
build environment only one TPU chip is reachable, so --cpu runs the same
harness on virtual CPU devices to validate the measurement plumbing (CPU
numbers are NOT perf-representative).

Prints one JSON line per device count plus the efficiency summary.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, '.')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cpu', action='store_true',
                    help='force 8 virtual CPU devices (plumbing check)')
    ap.add_argument('--scene', default='cornell_pt')
    ap.add_argument('--size', type=int, default=256)
    ap.add_argument('--spp', type=int, default=1)
    ap.add_argument('--iters', type=int, default=3)
    ap.add_argument('--mode', choices=['replicated', 'geometry_sharded'],
                    default='replicated')
    args = ap.parse_args()

    import os
    if args.cpu:
        os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                                   + ' --xla_force_host_platform_device_count=8')
    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from raytracer_tpu.scenes import registry
    from raytracer_tpu.parallel import sharding

    n_avail = len(jax.devices())
    scene, cam, settings = registry.make(args.scene, size=args.size,
                                         bvh=True, max_bounces=2)
    key = jax.random.PRNGKey(0)
    R = settings.width * settings.height * args.spp

    render = (sharding.render_geometry_sharded
              if args.mode == 'geometry_sharded'
              else sharding.render_sharded)

    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]
    results = []
    for n in counts:
        mesh = sharding.make_mesh(n)
        img = render(scene, cam, settings, key, mesh, spp=args.spp)
        jax.block_until_ready(img)
        t0 = time.time()
        for i in range(args.iters):
            img = render(scene, cam, settings,
                         jax.random.fold_in(key, 100 + i), mesh,
                         spp=args.spp)
            jax.block_until_ready(img)
        dt = (time.time() - t0) / args.iters
        rps = R / dt
        results.append((n, rps))
        print(json.dumps({'devices': n, 'rays_per_sec': round(rps, 1),
                          'rays_per_sec_per_device': round(rps / n, 1)}),
              flush=True)

    if len(results) > 1:
        base = results[0][1]
        n_last, rps_last = results[-1]
        eff = rps_last / (base * n_last)
        print(json.dumps({'scaling_efficiency': round(eff, 3),
                          'from_devices': results[0][0],
                          'to_devices': n_last,
                          'target': 0.85}), flush=True)


if __name__ == '__main__':
    main()

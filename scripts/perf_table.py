"""Tracer-backend perf table on the current jax backend.

Measures trace-only rays/s per intersector backend per scene and writes a
markdown table to PERF_TABLE.md (PERF.md holds the curated analysis). Run
on the TPU (default env) — results feed the 'auto' backend preference in
render/integrator.trace_fn.

Timing is FETCH-based (a scalar reduced from the hits is pulled to the
host inside the timer): jax.block_until_ready through the axon TPU tunnel
returns before remote execution completes, and repeated identical inputs
are served from the relay's execution-result cache — both flaws shaped the
round-3 numbers. Inputs are jittered per iteration.

Usage: python scripts/perf_table.py [--rays 32768] [--iters 3]
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, '.')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--rays', type=int, default=32768)
    ap.add_argument('--iters', type=int, default=3)
    ap.add_argument('--out', default='PERF_TABLE.md')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from raytracer_tpu.scenes import registry
    from raytracer_tpu.render import camera as cam_mod

    backend = jax.default_backend()
    R = args.rays

    scenes = [
        ('teapot_blinn', dict(size=256, bvh=True)),
        ('cornell_pt', dict(size=256, bvh=True)),
        ('sponza_proxy', dict(width=256, height=256, bvh=True)),
    ]
    modes = ['bvh', 'cluster', 'cluster_pallas']

    rows = []
    for name, kw in scenes:
        scene, cam, settings = registry.make(name, **kw)
        key = jax.random.PRNGKey(0)
        px = jnp.arange(R, dtype=jnp.float32) % 256
        py = (jnp.arange(R, dtype=jnp.float32) // 256) % 256
        rands = jax.random.uniform(key, (R, 5))
        o, d, tm = cam_mod.eye_rays(cam, 256, 256, px, py,
                                    0.0, 1.0, 0.0, 1.0, rands)
        jax.block_until_ready((o, d))
        row = {'scene': name, 'tris': scene.num_tris}
        for mode in modes:
            if mode.startswith('cluster') and scene.clusters is None:
                row[mode] = None
                continue
            try:
                if mode == 'bvh':
                    from raytracer_tpu.ops import traverse
                    tr1 = lambda s, o, d: traverse.bvh_trace(
                        s, o, d, 0.5, 1e-3, 1e12, False)
                elif mode == 'cluster':
                    from raytracer_tpu.ops import cluster_trace as ct
                    tr1 = lambda s, o, d: ct.cluster_trace(
                        s, o, d, 0.5, 1e-3, 1e12, False)
                else:
                    from raytracer_tpu.ops.pallas import cluster_kernel as ck
                    tr1 = lambda s, o, d: ck.pallas_cluster_trace(
                        s, o, d, 0.5, 1e-3, 1e12, False)

                # NREP trace calls per dispatch: the axon tunnel has a
                # ~25 ms per-dispatch floor that dominated single-call
                # timings (round-4 table was floor-bound)
                NREP = 4

                def f(s, o, d, _t=tr1):
                    acc = 0.0
                    for r_ in range(NREP):
                        acc += jnp.sum(_t(s, o + 1e-5 * (r_ + 1), d).t)
                    return acc
                f = jax.jit(f)
                float(f(scene, o, d))  # compile + warm
                dts = []
                for it in range(args.iters):
                    oj = o + 1e-4 * (it + 1)  # defeat result memoization
                    t0 = time.time()
                    float(f(scene, oj, d))  # fetch-based completion
                    dts.append(time.time() - t0)
                dt = min(dts) / NREP
                row[mode] = R / dt
                print(f'{name} {mode}: {R / dt:,.0f} rays/s '
                      f'({dt * 1e3:.2f} ms)', flush=True)
            except Exception as e:  # noqa: BLE001 — record and move on
                print(f'{name} {mode}: FAILED {type(e).__name__}: '
                      f'{str(e)[:120]}', flush=True)
                row[mode] = None
        rows.append(row)

    lines = [
        f'# Tracer backend perf ({backend}, {R} rays/trace, '
        f'{args.iters} iters)',
        '',
        'Trace-only nearest-hit rays/s (camera rays, coherent). '
        'Feeds trace_fn `auto` selection.',
        '',
        '| scene | tris | ' + ' | '.join(modes) + ' |',
        '|---|---|' + '---|' * len(modes),
    ]
    for row in rows:
        cells = [f"{row[m] / 1e6:.2f} Mray/s" if row[m] else 'n/a'
                 for m in modes]
        lines.append(f"| {row['scene']} | {row['tris']} | "
                     + ' | '.join(cells) + ' |')
    with open(args.out, 'w') as fh:
        fh.write('\n'.join(lines) + '\n')
    print(f'wrote {args.out}')


if __name__ == '__main__':
    main()

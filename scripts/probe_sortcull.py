"""Cost of the XLA-side cull + per-block candidate ordering on TPU.

If cull (R, M) + block-min (nb, M) + argsort (nb, M) costs << the ~40 ms
the in-kernel sweep takes today, the sorted-candidate-list kernel design
wins. Fetch-timed."""
import time

import jax
import jax.numpy as jnp

from raytracer_tpu.scenes import registry
from raytracer_tpu.render import integrator

scene, cam, st = registry.make('sponza_proxy', width=64, height=36, hd=True)
cl = scene.clusters
M = cl.tri.shape[0]
print('M', M, flush=True)

R = 32 * 1024
RB = 32
nb = R // RB
key = jax.random.PRNGKey(1)
k1, k2, k3 = jax.random.split(key, 3)
o = jnp.stack([jax.random.uniform(k1, (R,), minval=-9, maxval=9),
               jax.random.uniform(k2, (R,), minval=0.2, maxval=7.0),
               jax.random.uniform(k3, (R,), minval=-4, maxval=4)], 1)
d = jax.random.normal(jax.random.fold_in(key, 7), (R, 3))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

BIG = jnp.float32(3e38)


@jax.jit
def cull_sort(o, d, eps):
    o = o + eps
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)
    t0 = (cl.bb_min[None] - o[:, None]) * inv[:, None]
    t1 = (cl.bb_max[None] - o[:, None]) * inv[:, None]
    near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    ok = (near <= far) & (far >= 1e-3)
    keymat = jnp.where(ok, jnp.maximum(near, 0.0), BIG)    # (R, M)
    bkey = jnp.min(keymat.reshape(nb, RB, M), axis=1)      # (nb, M)
    order = jnp.argsort(bkey, axis=-1).astype(jnp.int32)   # (nb, M)
    skey = jnp.take_along_axis(bkey, order, axis=-1)
    nviable = jnp.sum(skey < BIG, axis=-1)
    return jnp.sum(order[:, 0] + nviable), jnp.max(nviable)


@jax.jit
def cull_only(o, d, eps):
    o = o + eps
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)
    t0 = (cl.bb_min[None] - o[:, None]) * inv[:, None]
    t1 = (cl.bb_max[None] - o[:, None]) * inv[:, None]
    near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    ok = (near <= far) & (far >= 1e-3)
    keymat = jnp.where(ok, jnp.maximum(near, 0.0), BIG)
    bkey = jnp.min(keymat.reshape(nb, RB, M), axis=1)
    return jnp.sum(bkey * (bkey < BIG))


for name, fn in (('cull_only', cull_only), ('cull+sort', cull_sort)):
    fn(o, d, 0.0)
    ts = []
    for i in range(3):
        t0_ = time.time()
        jax.tree.map(lambda x: float(x), fn(o, d, 1e-4 * (i + 1)))
        ts.append(time.time() - t0_)
    print(f'{name}: {min(ts)*1000:.2f} ms', flush=True)

print('max viable per block:', int(cull_sort(o, d, 0.0)[1]))

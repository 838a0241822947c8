"""Conservative per-ray-block frustum culling for the Pallas tracers.

Both instanced kernels lay wavefronts out as (nb, 9, RB) ray blocks and
skip a whole block when every lane's tmax < 0. make_block_culler builds
an interval slab test over each block's ray-bundle hull (origin interval,
inverse-direction interval): a table slice / scene whose bbox no ray of
the block can enter gets that block's tmax forced negative for the call,
so the kernel's existing whole-block skip prunes it. The test is
CONSERVATIVE — interval arithmetic can only over-approximate the bundle,
never cull a hittable box (pinned hit-for-hit by
tests/test_icluster.py::test_segment_kernel_multislice_block_cull_matches_bvh).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

BIG = np.float32(3e38)


def box_union(bb6, real=None):
    """(blo (3,), bhi (3,)) union of lane boxes bb6 (6, L).

    Lane padding carries never-hit boxes with lo = hi = +3e37
    (geometry/clusters.NEVER_LO/HI), which would corrupt a naive max over
    the hi rows; `real` (L,) bool masks them (default: lo.x < 1e37)."""
    if real is None:
        real = bb6[0] < 1e37
    blo = jnp.min(jnp.where(real, bb6[0:3], BIG), axis=1)
    bhi = jnp.max(jnp.where(real, bb6[3:6], -BIG), axis=1)
    return blo, bhi


def make_block_culler(rays):
    """rays (nb, 9, RB) -> enabled(blo, bhi) -> (nb,) bool.

    Precomputes each block's live-lane bundle hull once; each call tests
    one AABB against every block's hull."""
    live_b = rays[:, 7, :] > 0.0                          # (nb, RB)
    lb3 = live_b[:, None, :]

    def _mn(v, m):
        return jnp.min(jnp.where(m, v, BIG), axis=-1)

    def _mx(v, m):
        return jnp.max(jnp.where(m, v, -BIG), axis=-1)

    olo = _mn(rays[:, 0:3, :], lb3)                       # (nb, 3)
    ohi = _mx(rays[:, 0:3, :], lb3)
    dlo = _mn(rays[:, 3:6, :], lb3)
    dhi = _mx(rays[:, 3:6, :], lb3)
    tmin_lo = _mn(rays[:, 6, :], live_b)                  # (nb,)
    tmax_hi = _mx(rays[:, 7, :], live_b)
    any_live = jnp.any(live_b, axis=-1)
    # conservative inverse-direction interval per axis (straddling zero
    # -> unbounded: the slab test then always passes)
    eps = jnp.float32(1e-12)
    pos = dlo > eps
    neg = dhi < -eps
    inv_a = jnp.where(pos, 1.0 / jnp.where(pos, dhi, 1.0),
                      jnp.where(neg, 1.0 / jnp.where(neg, dlo, 1.0), -BIG))
    inv_b = jnp.where(pos, 1.0 / jnp.where(pos, dlo, 1.0),
                      jnp.where(neg, 1.0 / jnp.where(neg, dhi, 1.0), BIG))

    def enabled(blo, bhi):
        """Can ANY live ray of each block hit [blo, bhi] in [tmin, tmax]?"""
        hulls = []
        for s in (blo[None, :] - ohi, blo[None, :] - olo,
                  bhi[None, :] - ohi, bhi[None, :] - olo):
            hulls.append(s * inv_a)
            hulls.append(s * inv_b)
        ax_lo = hulls[0]
        ax_hi = hulls[0]
        for h in hulls[1:]:
            ax_lo = jnp.minimum(ax_lo, h)
            ax_hi = jnp.maximum(ax_hi, h)
        t0 = jnp.max(ax_lo, axis=1)                       # (nb,)
        t1 = jnp.min(ax_hi, axis=1)
        return any_live & (t1 >= t0) & (t1 >= tmin_lo) & (t0 <= tmax_hi)

    return enabled


def disable_blocks(rays, enabled):
    """rays with tmax < 0 on blocks where enabled is False."""
    return rays.at[:, 7, :].set(
        jnp.where(enabled[:, None], rays[:, 7, :], jnp.float32(-1.0)))

"""Primary ray generation: pinhole + thin-lens DOF + shutter time sampling.

Mirrors Camera::eyeRay / eyeRayAdaptive (reference: src/Camera.cpp:88-175)
and getTimeSample (src/Camera.h:46). Batched over pixels; rand inputs are
uniforms in [0,1):
  rands[..., 0:2] sub-pixel jitter, rands[..., 2:4] aperture disc,
  rands[..., 4] shutter time.
The reference rejection-samples the aperture disc; we use the equivalent
polar warp (same uniform-disc distribution, RNG-stream differences only).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import Camera
from ..core import vecmath as vm
from ..core.vecmath import EPSILON, PI


def camera_basis(cam: Camera):
    """(uDir, vDir, wDir) with wDir = -viewDir (src/Camera.cpp:93-95)."""
    w = vm.normalize(-cam.view_dir)
    u = vm.normalize(jnp.cross(cam.up, w))
    v = jnp.cross(w, u)
    return u, v, w


def eye_rays(cam: Camera, width: int, height: int, px, py,
             off_min_x, off_max_x, off_min_y, off_max_y, rands):
    """Generate camera rays -> (origin (R,3), dir (R,3), time (R,)).

    px, py: integer pixel coords (y = 0 is the bottom scanline); offsets
    bound the stratified jitter sub-quadrant (src/Camera.cpp:143-150).
    """
    u_dir, v_dir, w_dir = camera_basis(cam)
    aspect = jnp.float32(width) / jnp.float32(height)
    top = jnp.tan(cam.fov * (PI / 360.0))  # fov degrees (src/Camera.cpp:133)
    right = aspect * top

    x_off = (off_max_x - off_min_x) * rands[..., 0] + off_min_x
    y_off = (off_max_y - off_min_y) * rands[..., 1] + off_min_y
    im_u = -right + 2.0 * right * ((px + x_off) / width)
    im_v = -top + 2.0 * top * ((py + y_off) / height)

    d = vm.normalize(im_u[..., None] * u_dir + im_v[..., None] * v_dir - w_dir)

    # time weighted toward the interval end: 1 - r^3 * shutter (src/Camera.h:46)
    r = rands[..., 4]
    time = 1.0 - r * r * r * cam.shutter

    # thin lens: sample the aperture disc, aim at the focal plane
    # (src/Camera.cpp:155-173); polar warp replaces rejection sampling
    radius = jnp.sqrt(rands[..., 2])
    phi = 2.0 * PI * rands[..., 3]
    du = radius * jnp.cos(phi)
    dv = radius * jnp.sin(phi)
    focal = d * cam.focus_plane + cam.eye
    o_dof = cam.aperture * (du[..., None] * u_dir + dv[..., None] * v_dir) + cam.eye
    d_dof = vm.normalize(focal - o_dof)

    use_dof = cam.aperture >= EPSILON
    o = jnp.where(use_dof, o_dof, jnp.broadcast_to(cam.eye, d.shape))
    d = jnp.where(use_dof, d_dof, d)
    return o, d, time


def center_rays(cam: Camera, width: int, height: int):
    """Deterministic center-of-pixel rays for the whole image
    (reference eyeRay with +0.5 offsets, src/Camera.cpp:88-114).
    Returns (o, d, time) with shape (H*W, 3) / (H*W,), row 0 = bottom."""
    ys, xs = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32), indexing='ij')
    px = xs.reshape(-1)
    py = ys.reshape(-1)
    rands = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.0], jnp.float32),
                     (px.shape[0], 1))
    return eye_rays(cam, width, height, px, py, 0.5, 0.5, 0.5, 0.5, rands)

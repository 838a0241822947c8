"""Scalar numpy oracle renderer for tiny scenes.

An independent per-pixel implementation of the reference math
(Moller-Trumbore src/Object.cpp:109-147, Lambert + point light
src/Lambert.cpp:19-53 / src/PointLight.cpp:8-82, pinhole camera
src/Camera.cpp:88-114) used to validate the vectorized JAX pipeline
(SURVEY.md §4: "a scalar numpy oracle tracer mirroring Moller-Trumbore/
Lambert math for tiny scenes").
"""
from __future__ import annotations

import numpy as np

INV_4PI = 0.25 / np.pi


def mt_one(o, d, p0, p1, p2, tmin):
    e0 = p1 - p0
    e1 = p2 - p0
    pvec = np.cross(d, e1)
    det = e0 @ pvec
    if det == 0.0:
        return None
    inv = 1.0 / det
    tvec = o - p0
    a = (tvec @ pvec) * inv
    if a < 0 or a > 1:
        return None
    qvec = np.cross(tvec, e0)
    b = (d @ qvec) * inv
    if b < 0 or a + b > 1:
        return None
    t = (e1 @ qvec) * inv
    if t < tmin:
        return None
    return t, a, b


def trace(verts, faces, o, d, tmin=1e-3, tmax=1e12):
    best = (tmax, -1, 0.0, 0.0)
    for i, f in enumerate(faces):
        r = mt_one(o, d, verts[f[0]], verts[f[1]], verts[f[2]], tmin)
        if r is not None and r[0] < best[0]:
            best = (r[0], i, r[1], r[2])
    return best  # (t, tri, a, b)


def render_lambert_point(verts, faces, normals, face_n, kd, light_pos,
                         light_power, eye, look_at, up, fov_deg, W, H,
                         bg=(0, 0, 0.2)):
    """Center-ray Lambert render with one point light + hard shadows."""
    eye = np.asarray(eye, np.float64)
    view = np.asarray(look_at, np.float64) - eye
    view /= np.linalg.norm(view)
    up = np.asarray(up, np.float64)
    up /= np.linalg.norm(up)
    wd = -view
    ud = np.cross(up, wd)
    ud /= np.linalg.norm(ud)
    vd = np.cross(wd, ud)
    aspect = W / H
    top = np.tan(fov_deg * np.pi / 360.0)
    right = aspect * top

    img = np.zeros((H, W, 3))
    for y in range(H):
        for x in range(W):
            iu = -right + 2 * right * ((x + 0.5) / W)
            iv = -top + 2 * top * ((y + 0.5) / H)
            d = iu * ud + iv * vd - wd
            d /= np.linalg.norm(d)
            t, tri, a, b = trace(verts, faces, eye, d)
            if tri < 0:
                img[y, x] = bg
                continue
            P = eye + t * d
            c = 1 - a - b
            fn = face_n[tri]
            N = c * normals[fn[0]] + a * normals[fn[1]] + b * normals[fn[2]]
            N /= np.linalg.norm(N)
            L = light_pos - P
            d2 = L @ L
            dist = np.sqrt(d2)
            Lh = L / dist
            ndl = N @ Lh
            atten = 0.0
            if ndl > 0:
                ts, trs, _, _ = trace(verts, faces, P, Lh, 1e-3, dist)
                atten = ndl if trs < 0 else 0.0
            img[y, x] = np.asarray(kd) * light_power * INV_4PI / d2 * atten
    return img

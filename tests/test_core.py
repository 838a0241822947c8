"""Core math + IO loader tests."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from raytracer_tpu.core import vecmath as vm
from raytracer_tpu.io import imageio, objload

ASSETS = os.environ.get('RT_ASSETS', '/root/reference')


def test_normalize_and_dot():
    a = jnp.asarray([[3.0, 0.0, 4.0]])
    n = vm.normalize(a)
    assert np.allclose(np.asarray(vm.length(n)), 1.0, atol=1e-6)
    assert np.allclose(np.asarray(vm.dot(a, a)), 25.0)


def test_reflect():
    d = jnp.asarray([[1.0, -1.0, 0.0]]) / np.sqrt(2)
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    r = vm.reflect(d, n)
    assert np.allclose(np.asarray(r), [[1 / np.sqrt(2), 1 / np.sqrt(2), 0]],
                       atol=1e-6)


def test_fresnel_normal_incidence():
    # Rs at normal incidence = ((n1-n2)/(n1+n2))^2
    rs = vm.fresnel(jnp.asarray(1.0), jnp.asarray(1.5), jnp.asarray(1.0))
    assert np.allclose(np.asarray(rs), ((1 - 1.5) / (1 + 1.5)) ** 2, atol=1e-6)


def test_fresnel_tir():
    # glass->air beyond the critical angle: total internal reflection
    cos_i = 0.2  # theta ~ 78deg > asin(1/1.5) ~ 41.8deg
    rs = vm.fresnel(jnp.asarray(1.5), jnp.asarray(1.0), jnp.asarray(cos_i))
    assert np.allclose(np.asarray(rs), 1.0, atol=1e-6)


def test_refract_straight_through():
    d = jnp.asarray([[0.0, -1.0, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    t = vm.refract(d, n, jnp.asarray([1.0]), jnp.asarray([1.0 / 1.5]))
    assert np.allclose(np.asarray(t), np.asarray(d), atol=1e-6)


def test_tone_map_matches_reference_lut():
    # reference: Map() clamps to 32768 then linear_to_gamma LUT (src/Image.cpp:71-76)
    c = jnp.asarray([0.0, 0.5, 1.0, 2.0])
    u8 = np.asarray(vm.tone_map_u8(c))
    expect = []
    for r in [0.0, 0.5, 1.0, 2.0]:
        linear = min(int(32768.0 * r), 32768)
        expect.append(int((linear / 32768.0) ** (1 / 2.2) * 255.0 + 0.5))
    assert list(u8) == expect


def test_cosine_sample_distribution():
    import jax
    n = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (20000, 1))
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    e1 = jax.random.uniform(k1, (20000,))
    e2 = jax.random.uniform(k2, (20000,))
    s = np.asarray(vm.cosine_sample(n, e1, e2))
    assert (s[:, 2] > 0).all()
    # E[cos theta] for cosine-weighted = 2/3 (with the 0.99 clamp ~ same)
    assert abs(s[:, 2].mean() - 2 / 3) < 0.02


def test_obj_load_triangle():
    m = objload.load_obj(os.path.join(ASSETS, 'Models', 'triangle.obj'))
    assert m.num_tris >= 1
    assert m.vertices.shape[1] == 3


def test_obj_load_teapot_normals():
    m = objload.load_obj(os.path.join(ASSETS, 'Models', 'teapot.obj'))
    assert m.num_tris == 576
    lens = np.linalg.norm(m.normals, axis=1)
    assert np.all(lens > 0.99) and np.all(lens < 1.01)


def test_tga_load():
    img, t = imageio.load_tga(os.path.join(ASSETS, 'Textures',
                                           'grass-color-01.tga'))
    assert img.ndim == 3 and img.shape[2] in (1, 3, 4)
    assert img.min() >= 0.0 and img.max() <= 1.0


def test_tga_gamma_lut():
    # gamma->linear table matches reference quantization (src/Image.cpp:24-27)
    val = np.floor((128 / 255.0) ** 2.2 * 32768.0 + 0.5) / 32768.0
    assert abs(imageio._G2L[128] - val) < 1e-7


def test_hdr_load():
    img, t = imageio.load_hdr(os.path.join(ASSETS, 'Textures', 'sky.hdr'))
    assert t == imageio.HDR
    assert img.ndim == 3 and img.shape[2] == 3
    assert np.isfinite(img).all() and img.max() > 0


def test_ppm_roundtrip(tmp_path):
    img = (np.arange(2 * 3 * 3).reshape(2, 3, 3) * 10).astype(np.uint8)
    p = str(tmp_path / 'x.ppm')
    imageio.write_ppm(p, img)
    back, _ = imageio.load_ppm(p)
    # writer flips vertically (file stores top-first); loader keeps file order
    assert np.allclose(back[::-1] * 255, img)

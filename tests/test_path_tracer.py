"""Path tracer: sampling-correctness sanity + small scene renders."""

import jax
import jax.numpy as jnp
import numpy as np

from sailor_tpu.assets import primitives
from sailor_tpu.core import math3d as m3
from sailor_tpu.raytracing import lighting_model as lm
from sailor_tpu.raytracing import path_tracer as pt


def _scene(meshes, materials=None, **kw):
    soup = primitives.merge(meshes)
    return pt.scene_from_mesh(soup, materials, **kw)


def test_cosine_sampling_distribution():
    key = jax.random.PRNGKey(0)
    n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (8192, 3))
    u1 = jax.random.uniform(key, (8192,))
    u2 = jax.random.uniform(jax.random.PRNGKey(1), (8192,))
    d, pdf = lm.sample_cosine_hemisphere(n, u1, u2)
    cosz = np.asarray(d[:, 2])
    assert (cosz >= 0).all()
    # E[cos] under cosine-weighted sampling = 2/3
    assert abs(cosz.mean() - 2 / 3) < 0.02
    np.testing.assert_allclose(np.asarray(pdf), cosz / np.pi, atol=1e-3)


def test_ggx_half_vector_concentrates_with_smoothness():
    key = jax.random.PRNGKey(2)
    n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (4096, 3))
    u1 = jax.random.uniform(key, (4096,))
    u2 = jax.random.uniform(jax.random.PRNGKey(3), (4096,))
    h_smooth = lm.sample_ggx_half(n, jnp.full((4096,), 0.05), u1, u2)
    h_rough = lm.sample_ggx_half(n, jnp.full((4096,), 0.9), u1, u2)
    assert float(h_smooth[:, 2].mean()) > float(h_rough[:, 2].mean())
    assert float(h_smooth[:, 2].mean()) > 0.99


def test_power_heuristic_limits():
    w = lm.power_heuristic(jnp.asarray(1.0), jnp.asarray(0.0))
    np.testing.assert_allclose(float(w), 1.0)
    w2 = lm.power_heuristic(jnp.asarray(1.0), jnp.asarray(1.0))
    np.testing.assert_allclose(float(w2), 0.5)


def test_render_sky_only():
    # camera above an empty-ish scene looking up: pure sky
    scene = _scene([(primitives.cube(0.1), np.eye(4))])
    cam = jnp.asarray([0.0, 5.0, 0.0])
    view = m3.look_at(cam, jnp.asarray([0.0, 10.0, 0.1]), jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective(jnp.pi / 3, 1.0, 0.1, 100.0)
    img, rays = pt.render(
        scene, cam, view, proj, width=32, height=32, spp=2, max_bounces=2
    )
    img = np.asarray(img)
    assert float(rays) > 0
    # roughly sky zenith color
    assert abs(img[16, 16, 2] - 0.85) < 0.3
    assert (img >= 0).all() and np.isfinite(img).all()


def test_render_shadowed_ground():
    # cube on a plane, sun from an angle: cube casts a shadow
    meshes = [
        (primitives.plane(20.0), np.eye(4)),
        (primitives.cube(2.0), np.asarray(
            [[1, 0, 0, 0], [0, 1, 0, 1.0], [0, 0, 1, 0], [0, 0, 0, 1]], np.float32
        )),
    ]
    scene = _scene(
        meshes, sun_direction=(0.0, -1.0, 0.01), sun_intensity=(8.0, 8.0, 8.0)
    )
    cam = jnp.asarray([0.0, 6.0, 9.0])
    view = m3.look_at(cam, jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective(jnp.pi / 3, 1.0, 0.1, 100.0)
    img, rays = pt.render(
        scene, cam, view, proj, width=48, height=48, spp=4, max_bounces=2,
    )
    img = np.asarray(img)
    assert np.isfinite(img).all()
    # the cube's unlit side faces (image center) are much darker than the
    # sunlit ground beside them; the sky band at top is dimmer than ground
    center = img[22:26, 22:27].mean()
    side = img[22:26, 4:10].mean()
    assert side > center * 1.5, (center, side)
    sky = img[2:8].mean()
    ground = img[36:46].mean()
    assert ground > sky * 2.0


def test_energy_conservation_white_furnace():
    # white diffuse sphere under uniform white sky: radiance ~= sky color
    scene = _scene(
        [(primitives.uv_sphere(1.0, 12, 24), np.eye(4))],
        materials={
            "albedo": np.asarray([[1.0, 1.0, 1.0]], np.float32),
            "metallic": np.asarray([0.0], np.float32),
            "roughness": np.asarray([1.0], np.float32),
            "emissive": np.zeros((1, 3), np.float32),
        },
        sun_intensity=(0.0, 0.0, 0.0),
        sky_zenith=(1.0, 1.0, 1.0),
        sky_horizon=(1.0, 1.0, 1.0),
    )
    cam = jnp.asarray([0.0, 0.0, 3.0])
    view = m3.look_at(cam, jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective(jnp.pi / 3, 1.0, 0.1, 100.0)
    img, _ = pt.render(
        scene, cam, view, proj, width=32, height=32, spp=16, max_bounces=6,
        key=jax.random.PRNGKey(5),
    )
    center = float(np.asarray(img)[16, 16].mean())
    # Perfect furnace = 1.0; finite bounces + fresnel loss put it below,
    # but it should be within ~35%.
    assert 0.6 < center <= 1.15, center

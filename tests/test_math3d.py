import jax.numpy as jnp
import numpy as np
import pytest

from sailor_tpu.core import bounds, math3d as m3


def test_normalize_and_length():
    v = jnp.asarray([[3.0, 4.0, 0.0], [0.0, 0.0, 2.0]])
    np.testing.assert_allclose(m3.length(v), [5.0, 2.0], rtol=1e-6)
    n = m3.normalize(v)
    np.testing.assert_allclose(m3.length(n), [1.0, 1.0], rtol=1e-6)


def test_quat_rotate_matches_mat3():
    rng = np.random.default_rng(0)
    axis = rng.normal(size=(16, 3)).astype(np.float32)
    ang = rng.uniform(0, 2 * np.pi, size=(16,)).astype(np.float32)
    q = m3.quat_from_axis_angle(jnp.asarray(axis), jnp.asarray(ang))
    v = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    r1 = m3.quat_rotate(q, v)
    r2 = jnp.einsum("...ij,...j->...i", m3.quat_to_mat3(q), v)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)


def test_quat_mul_composition():
    qa = m3.quat_from_axis_angle(jnp.asarray([0.0, 1.0, 0.0]), jnp.pi / 2)
    qb = m3.quat_from_axis_angle(jnp.asarray([1.0, 0.0, 0.0]), jnp.pi / 2)
    v = jnp.asarray([0.0, 0.0, 1.0])
    r1 = m3.quat_rotate(m3.quat_mul(qa, qb), v)
    r2 = m3.quat_rotate(qa, m3.quat_rotate(qb, v))
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-6)


def test_trs_transform_point():
    t = jnp.asarray([1.0, 2.0, 3.0])
    r = m3.quat_from_axis_angle(jnp.asarray([0.0, 1.0, 0.0]), jnp.pi / 2)
    s = jnp.asarray([2.0, 2.0, 2.0])
    m = m3.trs(t, r, s)
    p = m3.transform_point(m, jnp.asarray([1.0, 0.0, 0.0]))
    # scale: (2,0,0); rotate 90deg about y: (0,0,-2); translate: (1,2,1)
    np.testing.assert_allclose(np.asarray(p), [1.0, 2.0, 1.0], atol=1e-5)


def test_look_at_properties():
    eye = jnp.asarray([0.0, 0.0, 5.0])
    view = m3.look_at(eye, jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([0.0, 1.0, 0.0]))
    # eye maps to origin
    np.testing.assert_allclose(
        np.asarray(m3.transform_point(view, eye)), [0, 0, 0], atol=1e-6
    )
    # forward point maps to -z
    p = m3.transform_point(view, jnp.asarray([0.0, 0.0, 0.0]))
    assert p[2] < 0


def test_perspective_reverse_z_depth_range():
    proj = m3.perspective(jnp.pi / 3, 16 / 9, 0.1, 100.0, reverse_z=True)
    near = m3.homogenize(m3.transform_point_h(proj, jnp.asarray([0.0, 0.0, -0.1])))
    far = m3.homogenize(m3.transform_point_h(proj, jnp.asarray([0.0, 0.0, -100.0])))
    np.testing.assert_allclose(float(near[2]), 1.0, atol=1e-5)
    np.testing.assert_allclose(float(far[2]), 0.0, atol=1e-5)


def test_frustum_sphere_culling():
    proj = m3.perspective(jnp.pi / 3, 1.0, 0.1, 100.0, reverse_z=True)
    view = m3.look_at(
        jnp.asarray([0.0, 0.0, 0.0]),
        jnp.asarray([0.0, 0.0, -1.0]),
        jnp.asarray([0.0, 1.0, 0.0]),
    )
    planes = bounds.extract_frustum_planes(proj @ view)
    centers = jnp.asarray(
        [
            [0.0, 0.0, -10.0],   # inside
            [0.0, 0.0, 10.0],    # behind camera
            [0.0, 0.0, -200.0],  # beyond far
            [50.0, 0.0, -10.0],  # off to the side
            [0.0, 0.0, -0.05],   # before near plane but radius overlaps
        ]
    )
    radii = jnp.asarray([1.0, 1.0, 1.0, 1.0, 1.0])
    vis = bounds.frustum_contains_sphere(planes[None], centers, radii)
    np.testing.assert_array_equal(
        np.asarray(vis), [True, False, False, False, True]
    )


def test_frustum_aabb():
    proj = m3.perspective(jnp.pi / 3, 1.0, 0.1, 100.0, reverse_z=True)
    view = m3.identity4()
    planes = bounds.extract_frustum_planes(proj @ view)
    bmin = jnp.asarray([[-1.0, -1.0, -11.0], [30.0, 30.0, -11.0]])
    bmax = jnp.asarray([[1.0, 1.0, -9.0], [32.0, 32.0, -9.0]])
    vis = bounds.frustum_contains_aabb(planes[None], bmin, bmax)
    np.testing.assert_array_equal(np.asarray(vis), [True, False])


def test_ray_triangle():
    v0 = jnp.asarray([0.0, 0.0, -5.0])
    v1 = jnp.asarray([1.0, 0.0, -5.0])
    v2 = jnp.asarray([0.0, 1.0, -5.0])
    o = jnp.asarray([[0.2, 0.2, 0.0], [0.9, 0.9, 0.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    t, u, v, hit = bounds.ray_triangle(o, d, v0, v1, v2)
    np.testing.assert_array_equal(np.asarray(hit), [True, False])
    np.testing.assert_allclose(float(t[0]), 5.0, atol=1e-6)


def test_ray_aabb():
    o = jnp.asarray([0.0, 0.0, 0.0])
    d = jnp.asarray([0.0, 0.0, -1.0])
    inv_d = 1.0 / d
    hit, t = bounds.ray_aabb(o, inv_d, jnp.asarray([-1, -1, -5.0]), jnp.asarray([1, 1, -3.0]))
    assert bool(hit)
    np.testing.assert_allclose(float(t), 3.0, atol=1e-6)
    hit2, _ = bounds.ray_aabb(o, inv_d, jnp.asarray([-1, -1, 3.0]), jnp.asarray([1, 1, 5.0]))
    assert not bool(hit2)


def test_transform_aabb():
    m = m3.translation(jnp.asarray([5.0, 0.0, 0.0]))
    bmin, bmax = bounds.transform_aabb(
        m, jnp.asarray([-1.0, -1.0, -1.0]), jnp.asarray([1.0, 1.0, 1.0])
    )
    np.testing.assert_allclose(np.asarray(bmin), [4.0, -1.0, -1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(bmax), [6.0, 1.0, 1.0], atol=1e-6)


def test_srgb_roundtrip():
    c = jnp.linspace(0.0, 1.0, 64)
    rt = m3.srgb_to_linear(m3.linear_to_srgb(c))
    np.testing.assert_allclose(np.asarray(rt), np.asarray(c), atol=1e-5)


def test_yxy_roundtrip():
    rng = np.random.default_rng(1)
    rgb = jnp.asarray(rng.uniform(0.05, 1.0, size=(32, 3)).astype(np.float32))
    rt = m3.yxy_to_rgb(m3.rgb_to_yxy(rgb))
    np.testing.assert_allclose(np.asarray(rt), np.asarray(rgb), atol=1e-3)


def test_refract_reflect():
    n = jnp.asarray([0.0, 1.0, 0.0])
    i = m3.normalize(jnp.asarray([1.0, -1.0, 0.0]))
    r = m3.reflect(i, n)
    np.testing.assert_allclose(np.asarray(r), np.asarray(m3.normalize(jnp.asarray([1.0, 1.0, 0.0]))), atol=1e-6)
    tr = m3.refract(i, n, 1.0)  # eta=1 -> direction unchanged
    np.testing.assert_allclose(np.asarray(tr), np.asarray(i), atol=1e-6)

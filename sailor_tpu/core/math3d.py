"""Vector / quaternion / matrix math as batched jnp ops.

TPU-native counterpart of the reference's glm-based math layer
(Runtime/Math/Math.h, Runtime/Math/Transform.h).  Everything is arrays:
a "vec3" is any (..., 3) array, a quaternion is (..., 4) stored (x, y, z, w),
a matrix is (..., 4, 4) with column-vector convention (``M @ v``).

Conventions:
- Right-handed world space, y-up.
- View space looks down -Z (OpenGL/glm style, matching glm::lookAt used by
  the reference's CameraECS).
- Clip space: Vulkan-style depth in [0, 1]; reverse-Z supported (the
  reference uses reverse-Z, see ComputeLightCulling.shader "Reverse Z").
"""

from __future__ import annotations

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Vectors
# ---------------------------------------------------------------------------


def dot(a, b, keepdims: bool = False):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def length(v, keepdims: bool = False):
    return jnp.sqrt(jnp.maximum(dot(v, v, keepdims=keepdims), 0.0))


def normalize(v, eps: float = 1e-12):
    return v * jnp.reciprocal(jnp.maximum(length(v, keepdims=True), eps))


def cross(a, b):
    return jnp.cross(a, b)


def reflect(i, n):
    """GLSL reflect: i - 2*dot(n,i)*n."""
    return i - 2.0 * dot(n, i, keepdims=True) * n


def refract(i, n, eta):
    """GLSL refract for incident i, normal n, ratio of IORs eta."""
    cosi = -dot(n, i, keepdims=True)
    k = 1.0 - eta * eta * (1.0 - cosi * cosi)
    t = eta * i + (eta * cosi - jnp.sqrt(jnp.maximum(k, 0.0))) * n
    return jnp.where(k < 0.0, jnp.zeros_like(i), t)


def lerp(a, b, t):
    return a + (b - a) * t


def saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def homogenize(v4):
    """(..., 4) clip-space -> (..., 3) NDC by perspective divide."""
    return v4[..., :3] / v4[..., 3:4]


def transform_point(m, p):
    """Apply (..., 4, 4) matrix to (..., 3) points (w=1). Returns (..., 3)."""
    r = jnp.einsum("...ij,...j->...i", m[..., :3, :3], p) + m[..., :3, 3]
    return r


def transform_point_h(m, p):
    """Apply matrix to points, returning homogeneous (..., 4)."""
    p4 = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
    return jnp.einsum("...ij,...j->...i", m, p4)


def transform_vector(m, v):
    """Apply matrix to directions (w=0)."""
    return jnp.einsum("...ij,...j->...i", m[..., :3, :3], v)


# ---------------------------------------------------------------------------
# Quaternions (x, y, z, w) — matches glm memory order used by the reference's
# Transform serialization (Runtime/Math/Transform.h).
# ---------------------------------------------------------------------------


def quat_identity(shape=()):
    q = jnp.zeros(shape + (4,))
    return q.at[..., 3].set(1.0)


def quat_mul(a, b):
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0])


def quat_rotate(q, v):
    """Rotate (..., 3) vectors by (..., 4) quaternions."""
    qv = q[..., :3]
    t = 2.0 * jnp.cross(qv, v)
    return v + q[..., 3:4] * t + jnp.cross(qv, t)


def quat_from_axis_angle(axis, angle):
    axis = normalize(jnp.asarray(axis, dtype=jnp.float32))
    angle = jnp.asarray(angle)
    half = angle * 0.5
    s = jnp.sin(half)
    return jnp.concatenate(
        [axis * s[..., None], jnp.cos(half)[..., None]], axis=-1
    )


def quat_to_mat3(q):
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def quat_from_euler(yaw, pitch, roll):
    """ZYX euler (yaw about Y, pitch about X, roll about Z), radians."""
    qy = quat_from_axis_angle(jnp.asarray([0.0, 1.0, 0.0]), yaw)
    qx = quat_from_axis_angle(jnp.asarray([1.0, 0.0, 0.0]), pitch)
    qz = quat_from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), roll)
    return quat_mul(qy, quat_mul(qx, qz))


# ---------------------------------------------------------------------------
# Matrices
# ---------------------------------------------------------------------------


def identity4(shape=()):
    return jnp.broadcast_to(jnp.eye(4), shape + (4, 4))


def translation(t):
    """(..., 3) -> (..., 4, 4)."""
    t = jnp.asarray(t)
    m = jnp.broadcast_to(jnp.eye(4), t.shape[:-1] + (4, 4))
    return m.at[..., :3, 3].set(t)


def scale(s):
    s = jnp.asarray(s)
    m = jnp.zeros(s.shape[:-1] + (4, 4))
    m = m.at[..., 0, 0].set(s[..., 0])
    m = m.at[..., 1, 1].set(s[..., 1])
    m = m.at[..., 2, 2].set(s[..., 2])
    return m.at[..., 3, 3].set(1.0)


def trs(t, r, s):
    """Compose translate/rotate(quat)/scale into (..., 4, 4) model matrices.

    Matches glm::translate * glm::mat4_cast(rot) * glm::scale as used by the
    reference's TransformComponent matrix cache (Runtime/ECS/TransformECS.h).
    """
    t = jnp.asarray(t)
    rot = quat_to_mat3(r) * jnp.asarray(s)[..., None, :]
    m = jnp.zeros(t.shape[:-1] + (4, 4))
    m = m.at[..., :3, :3].set(rot)
    m = m.at[..., :3, 3].set(t)
    return m.at[..., 3, 3].set(1.0)


def look_at(eye, center, up):
    """glm::lookAtRH equivalent: view matrix looking from eye to center."""
    eye = jnp.asarray(eye, dtype=jnp.float32)
    f = normalize(jnp.asarray(center, dtype=jnp.float32) - eye)
    s = normalize(jnp.cross(f, jnp.asarray(up, dtype=jnp.float32)))
    u = jnp.cross(s, f)
    m = jnp.stack(
        [
            jnp.concatenate([s, -dot(s, eye)[..., None]], axis=-1),
            jnp.concatenate([u, -dot(u, eye)[..., None]], axis=-1),
            jnp.concatenate([-f, dot(f, eye)[..., None]], axis=-1),
            jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.0, 1.0]), eye.shape[:-1] + (4,)),
        ],
        axis=-2,
    )
    return m


def perspective(fov_y_rad, aspect, z_near, z_far, reverse_z: bool = True):
    """Vulkan-style perspective: clip depth in [0,1], optional reverse-Z.

    With reverse_z=True (engine default, matching the reference renderer's
    reverse depth), z_near maps to depth 1 and z_far to depth 0.
    """
    f = 1.0 / jnp.tan(jnp.asarray(fov_y_rad) * 0.5)
    m = jnp.zeros((4, 4))
    m = m.at[0, 0].set(f / aspect)
    m = m.at[1, 1].set(f)
    if reverse_z:
        m = m.at[2, 2].set(z_near / (z_far - z_near))
        m = m.at[2, 3].set(z_far * z_near / (z_far - z_near))
    else:
        m = m.at[2, 2].set(z_far / (z_near - z_far))
        m = m.at[2, 3].set(z_far * z_near / (z_near - z_far))
    m = m.at[3, 2].set(-1.0)
    return m


def ortho(left, right, bottom, top, z_near, z_far, reverse_z: bool = False):
    """Vulkan-style orthographic projection, depth in [0,1]."""
    m = jnp.zeros((4, 4))
    m = m.at[0, 0].set(2.0 / (right - left))
    m = m.at[1, 1].set(2.0 / (top - bottom))
    m = m.at[0, 3].set(-(right + left) / (right - left))
    m = m.at[1, 3].set(-(top + bottom) / (top - bottom))
    if reverse_z:
        m = m.at[2, 2].set(1.0 / (z_far - z_near))
        m = m.at[2, 3].set(z_far / (z_far - z_near))
    else:
        m = m.at[2, 2].set(-1.0 / (z_far - z_near))
        m = m.at[2, 3].set(-z_near / (z_far - z_near))
    m = m.at[3, 3].set(1.0)
    return m


def inverse(m):
    return jnp.linalg.inv(m)


# ---------------------------------------------------------------------------
# Color helpers (Content/Shaders/Formats.glsl analogs)
# ---------------------------------------------------------------------------


def srgb_to_linear(c):
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(c):
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c <= 0.0031308, c * 12.92, 1.055 * c ** (1.0 / 2.4) - 0.055)


def luminance(rgb):
    from sailor_tpu.config import RGB_TO_LUM

    return dot(rgb, jnp.asarray(RGB_TO_LUM))


def rgb_to_yxy(rgb):
    """RGB -> Yxy (Formats.glsl convertRGB2Yxy equivalent, CIE D65)."""
    m = jnp.asarray(
        [
            [0.4124564, 0.3575761, 0.1804375],
            [0.2126729, 0.7151522, 0.0721750],
            [0.0193339, 0.1191920, 0.9503041],
        ]
    )
    xyz = jnp.einsum("ij,...j->...i", m, rgb)
    s = jnp.maximum(jnp.sum(xyz, axis=-1, keepdims=True), 1e-8)
    return jnp.stack(
        [xyz[..., 1], xyz[..., 0] / s[..., 0], xyz[..., 1] / s[..., 0]], axis=-1
    )


def yxy_to_rgb(yxy):
    Y, x, y = yxy[..., 0], yxy[..., 1], jnp.maximum(yxy[..., 2], 1e-8)
    X = x * Y / y
    Z = (1.0 - x - yxy[..., 2]) * Y / y
    xyz = jnp.stack([X, Y, Z], axis=-1)
    m = jnp.asarray(
        [
            [3.2404542, -1.5371385, -0.4985314],
            [-0.9692660, 1.8760108, 0.0415560],
            [0.0556434, -0.2040259, 1.0572252],
        ]
    )
    return jnp.einsum("ij,...j->...i", m, xyz)


def mat3_to_quat(m):
    """Rotation matrix (..., 3, 3) -> quaternion (x, y, z, w), branchless."""
    m00, m11, m22 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]
    t = m00 + m11 + m22
    qw = jnp.sqrt(jnp.maximum(1.0 + t, 1e-12)) * 0.5
    inv4w = 1.0 / jnp.maximum(4.0 * qw, 1e-9)
    qx = (m[..., 2, 1] - m[..., 1, 2]) * inv4w
    qy = (m[..., 0, 2] - m[..., 2, 0]) * inv4w
    qz = (m[..., 1, 0] - m[..., 0, 1]) * inv4w
    q = jnp.stack([qx, qy, qz, qw], axis=-1)
    return normalize(q)


def quat_look_rotation(forward, up=(0.0, 1.0, 0.0)):
    """Quaternion rotating -Z onto ``forward`` with ``up`` hint (camera
    aiming: a transform with this rotation makes inv(model) a look-at view).
    """
    f = normalize(jnp.asarray(forward, jnp.float32))
    upv = jnp.asarray(up, jnp.float32)
    s = normalize(jnp.cross(f, upv))
    u = jnp.cross(s, f)
    # columns = basis vectors: x=s, y=u, z=-f (camera looks down -z)
    m = jnp.stack([s, u, -f], axis=-1)
    return mat3_to_quat(m)

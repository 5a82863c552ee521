"""Quaternion operations over trailing-dim-4 arrays, (x, y, z, w) layout.

Matches the conventions of glare-core's Quatf as used by the reference
(gui_client/JoltUtils.h conversions; Jolt also uses (x, y, z, w)).
Every function broadcasts over leading batch axes so the physics step can
operate on [N, 4] body orientation arrays directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# np (not jnp): module import must stay host-only (no backend init) so
# bench.py's outage-fallback can report before any device is touched.
IDENTITY = np.array([0.0, 0.0, 0.0, 1.0], dtype=np.float32)


def identity(batch_shape=(), dtype=jnp.float32):
    q = jnp.zeros(batch_shape + (4,), dtype=dtype)
    return q.at[..., 3].set(1.0)


def mul(a, b):
    """Hamilton product a*b (apply b's rotation, then a's)."""
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


def conjugate(q):
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def normalize(q, eps=1e-12):
    n2 = jnp.sum(q * q, axis=-1, keepdims=True)
    return q * jax.lax.rsqrt(jnp.maximum(n2, eps))


def rotate_vec(q, v):
    """Rotate vector(s) v by quaternion(s) q.  v: [..., 3]."""
    u = q[..., :3]
    w = q[..., 3:4]
    uv = jnp.cross(u, v)
    uuv = jnp.cross(u, uv)
    return v + 2.0 * (w * uv + uuv)


def inverse_rotate_vec(q, v):
    return rotate_vec(conjugate(q), v)


def from_axis_angle(axis, angle):
    """axis: [..., 3] (unit), angle: [...]."""
    half = 0.5 * angle
    s = jnp.sin(half)[..., None]
    w = jnp.cos(half)[..., None]
    return jnp.concatenate([axis * s, w], axis=-1)


def to_matrix(q):
    """Rotation matrix [..., 3, 3] from unit quaternion."""
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


def from_matrix(m):
    """Unit quaternion from rotation matrix [..., 3, 3] (branch-free)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate constructions; pick the numerically best via where-chains.
    qw = jnp.sqrt(jnp.maximum(0.0, 1.0 + tr)) * 0.5
    qx = jnp.sqrt(jnp.maximum(0.0, 1.0 + m00 - m11 - m22)) * 0.5
    qy = jnp.sqrt(jnp.maximum(0.0, 1.0 - m00 + m11 - m22)) * 0.5
    qz = jnp.sqrt(jnp.maximum(0.0, 1.0 - m00 - m11 + m22)) * 0.5
    qx = jnp.copysign(qx, m21 - m12)
    qy = jnp.copysign(qy, m02 - m20)
    qz = jnp.copysign(qz, m10 - m01)
    return normalize(jnp.stack([qx, qy, qz, qw], axis=-1))


def integrate(q, omega, dt):
    """Integrate orientation by angular velocity omega [..., 3] over dt.

    First-order: q' = normalize(q + 0.5 * dt * (omega_quat * q)) — the same
    scheme Jolt uses inside its integrator for small steps.
    """
    ow = jnp.zeros_like(q[..., :1])
    oq = jnp.concatenate([omega, ow], axis=-1)
    dq = 0.5 * dt * mul(oq, q)
    return normalize(q + dq)


def slerp(a, b, t):
    """Spherical interpolation with shortest-path sign fix; t: [...]"""
    d = jnp.sum(a * b, axis=-1, keepdims=True)
    b = jnp.where(d < 0, -b, b)
    d = jnp.abs(d)
    d = jnp.clip(d, -1.0, 1.0)
    theta = jnp.arccos(d)
    sin_theta = jnp.sin(theta)
    t = jnp.asarray(t)[..., None]
    # Fall back to lerp for nearly-parallel quats.
    use_lerp = sin_theta < 1e-4
    wa = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    wb = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    return normalize(wa * a + wb * b)


def to_axis_angle(q):
    """Return (axis [...,3], angle [...]) from a unit quaternion."""
    q = jnp.where(q[..., 3:4] < 0, -q, q)  # angle in [0, pi]
    sin_half = jnp.linalg.norm(q[..., :3], axis=-1)
    angle = 2.0 * jnp.arctan2(sin_half, q[..., 3])
    safe = jnp.maximum(sin_half, 1e-12)[..., None]
    axis = jnp.where(sin_half[..., None] < 1e-8,
                     jnp.array([1.0, 0.0, 0.0], dtype=q.dtype),
                     q[..., :3] / safe)
    return axis, angle

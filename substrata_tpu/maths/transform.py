"""TRS transforms and inertia helpers.

Reproduces the semantics of the reference's object-to-world construction
(gui_client/PhysicsWorld.cpp:660-704 computeToWorldAndToObMatrices):
ob_to_world = T(pos) * R(quat) * S(scale), with zero-scale components clamped
when inverting so the inverse stays finite.
"""

from __future__ import annotations

import jax.numpy as jnp

from substrata_tpu.maths import quat as quatm


def trs_matrix(pos, q, scale):
    """[..., 4, 4] object-to-world from pos [...,3], quat [...,4], scale [...,3]."""
    r = quatm.to_matrix(q) * scale[..., None, :]
    m = jnp.zeros(r.shape[:-2] + (4, 4), dtype=r.dtype)
    m = m.at[..., :3, :3].set(r)
    m = m.at[..., :3, 3].set(pos)
    m = m.at[..., 3, 3].set(1.0)
    return m


def inverse_trs_matrix(pos, q, scale, min_scale=1e-6):
    """World-to-object inverse with zero-scale clamping (PhysicsWorld.cpp:683-704)."""
    safe = jnp.where(jnp.abs(scale) < min_scale, jnp.sign(scale) * min_scale + (scale == 0) * min_scale, scale)
    inv_scale = 1.0 / safe
    rt = jnp.swapaxes(quatm.to_matrix(q), -1, -2)  # R^T
    r = inv_scale[..., :, None] * rt  # S^-1 R^T
    t = -jnp.einsum("...ij,...j->...i", r, pos)
    m = jnp.zeros(r.shape[:-2] + (4, 4), dtype=r.dtype)
    m = m.at[..., :3, :3].set(r)
    m = m.at[..., :3, 3].set(t)
    m = m.at[..., 3, 3].set(1.0)
    return m


def transform_point(m, p):
    return jnp.einsum("...ij,...j->...i", m[..., :3, :3], p) + m[..., :3, 3]


def transform_dir(m, d):
    return jnp.einsum("...ij,...j->...i", m[..., :3, :3], d)


def world_inv_inertia(q, inv_inertia_local_diag):
    """World-space inverse inertia tensor [..., 3, 3].

    Bodies store a diagonal local-space inverse inertia (principal axes are
    folded into the shape at build time); world tensor = R diag(I^-1) R^T.
    """
    r = quatm.to_matrix(q)
    return jnp.einsum("...ik,...k,...jk->...ij", r, inv_inertia_local_diag, r)


def box_inertia(half_extents, mass):
    """Diagonal local inertia of a solid box; he: [...,3]."""
    hx, hy, hz = half_extents[..., 0], half_extents[..., 1], half_extents[..., 2]
    c = mass / 3.0
    return jnp.stack([c * (hy * hy + hz * hz),
                      c * (hx * hx + hz * hz),
                      c * (hx * hx + hy * hy)], axis=-1)


def sphere_inertia(radius, mass):
    i = 0.4 * mass * radius * radius
    return jnp.stack([i, i, i], axis=-1)


def capsule_inertia(radius, half_height, mass):
    """Solid capsule aligned with local Z: cylinder of half-height h + 2 hemi caps."""
    r, h = radius, half_height
    vol_cyl = jnp.pi * r * r * (2 * h)
    vol_sph = (4.0 / 3.0) * jnp.pi * r ** 3
    vol = vol_cyl + vol_sph
    m_cyl = mass * vol_cyl / vol
    m_sph = mass * vol_sph / vol
    # Cylinder about its center (axis = z)
    iz = 0.5 * m_cyl * r * r + 0.4 * m_sph * r * r
    ixy_cyl = m_cyl * ((1.0 / 12.0) * (2 * h) ** 2 + 0.25 * r * r)
    # Hemispheres offset by h from center (parallel axis)
    d = h + 3.0 * r / 8.0
    ixy_sph = 0.4 * m_sph * r * r + m_sph * d * d
    ixy = ixy_cyl + ixy_sph
    return jnp.stack([ixy, ixy, iz], axis=-1)

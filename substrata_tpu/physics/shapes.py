"""Host-side shape factories.

Replaces the reference's Jolt shape factory functions
(gui_client/PhysicsWorld.cpp):
- createJoltShapeForBatchedMesh dynamic branch -> convex hull from vertices
  (871-1083, incl. skinned-vertex baking + uint16 dequantisation upstream)
- static triangle mesh (735-868) -> physics.state.build_trimesh
- heightfield (1086-1119) -> physics.state.Heightfield
- ground quad (1123-1135) -> box
- COM-offset (1138-1152) and scaled shapes (1155-1166) -> baked at build

Hulls are reduced to <= max_verts well-spread extreme vertices, recentred on
the centroid and rotated into principal axes so bodies can use a diagonal
local inertia; the principal-frame AABB doubles as the OBB used for
hull-vs-dynamic collision.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from substrata_tpu.physics.state import ShapeType, compute_shape_mass_props


@dataclass
class PhysicsShape:
    """Host mirror of the reference's PhysicsShape (PhysicsObject.h:33-44):
    shape type + params + cached mass properties."""

    shape_type: int
    params: np.ndarray          # [4] f32 (see state.ShapeType)
    mass: float
    inv_mass: float
    inv_inertia: np.ndarray     # [3] diagonal local
    volume: float
    bound_radius: float
    # Hull-only payload (uploaded into the device HullLibrary by PhysicsWorld):
    hull_verts: np.ndarray | None = None       # [V, 3] in principal frame
    hull_contact_verts: np.ndarray | None = None  # [8, 3]
    # Rotation from original mesh frame into the principal frame (host info).
    principal_rot: np.ndarray = field(default_factory=lambda: np.eye(3, dtype=np.float32))

    def size_bytes(self) -> int:
        n = 16 + 12 + 4 * 7
        if self.hull_verts is not None:
            n += self.hull_verts.nbytes + self.hull_contact_verts.nbytes
        return n


def make_sphere(radius: float, density: float = 1000.0, mass: float = 0.0) -> PhysicsShape:
    params = np.array([radius, 0, 0, 0], np.float32)
    m, im, ii, vol, br = compute_shape_mass_props(ShapeType.SPHERE, params, density, mass)
    return PhysicsShape(int(ShapeType.SPHERE), params, m, im, ii, vol, br)


def make_box(half_extents, density: float = 1000.0, mass: float = 0.0) -> PhysicsShape:
    he = np.asarray(half_extents, np.float32)
    params = np.array([he[0], he[1], he[2], 0], np.float32)
    m, im, ii, vol, br = compute_shape_mass_props(ShapeType.BOX, params, density, mass)
    return PhysicsShape(int(ShapeType.BOX), params, m, im, ii, vol, br)


def make_capsule(radius: float, half_height: float, density: float = 1000.0,
                 mass: float = 0.0) -> PhysicsShape:
    params = np.array([radius, half_height, 0, 0], np.float32)
    m, im, ii, vol, br = compute_shape_mass_props(ShapeType.CAPSULE, params, density, mass)
    return PhysicsShape(int(ShapeType.CAPSULE), params, m, im, ii, vol, br)


def make_ground_quad(half_w: float = 1000.0, thickness: float = 0.5) -> PhysicsShape:
    """Reference ground-quad box (PhysicsWorld.cpp:1123-1135)."""
    return make_box([half_w, half_w, thickness])


def _reduce_hull_verts(verts: np.ndarray, max_verts: int) -> np.ndarray:
    """Pick <= max_verts extreme vertices via support sampling over a sphere
    of directions (cheap quickhull substitute adequate for contact support)."""
    if len(verts) <= max_verts:
        return verts
    # Fibonacci sphere directions.
    k = max_verts * 4
    i = np.arange(k) + 0.5
    phi = np.arccos(1 - 2 * i / k)
    theta = np.pi * (1 + 5 ** 0.5) * i
    dirs = np.stack([np.sin(phi) * np.cos(theta),
                     np.sin(phi) * np.sin(theta),
                     np.cos(phi)], axis=1)
    support = np.argmax(verts @ dirs.T, axis=0)
    uniq = list(dict.fromkeys(support.tolist()))
    return verts[np.array(uniq[:max_verts])]


def make_convex_hull(vertices, density: float = 1000.0, mass: float = 0.0,
                     max_verts: int = 32) -> PhysicsShape:
    """Convex hull from a vertex cloud (reference: ConvexHullShapeSettings
    from BatchedMesh vertices, PhysicsWorld.cpp:1000-1060).

    The hull is recentred on its centroid and rotated into principal axes
    (diagonalised point-cloud covariance as the inertia proxy)."""
    v = np.asarray(vertices, np.float32).reshape(-1, 3)
    centroid = v.mean(axis=0)
    v = v - centroid
    # Principal axes via covariance eigenvectors.
    cov = np.cov(v.T) if len(v) > 3 else np.eye(3)
    w, rot = np.linalg.eigh(cov + 1e-9 * np.eye(3))
    if np.linalg.det(rot) < 0:
        rot[:, 0] = -rot[:, 0]
    vp = v @ rot  # principal frame
    vp = _reduce_hull_verts(vp, max_verts)
    obb_he = np.maximum(np.abs(vp).max(axis=0), 1e-4)
    bound = float(np.linalg.norm(vp, axis=1).max())
    # Volume estimate: OBB volume * 0.66 (hulls are typically ~2/3 their OBB).
    vol = float(8.0 * obb_he.prod() * 0.66)
    m = mass if mass > 0 else density * vol
    # Point-mass inertia of the vertex cloud scaled to the mass (principal frame).
    r2 = (vp ** 2).sum(axis=1)
    inertia = np.array([
        (r2 - vp[:, 0] ** 2).mean(), (r2 - vp[:, 1] ** 2).mean(),
        (r2 - vp[:, 2] ** 2).mean()], np.float32) * m
    inv_inertia = np.where(inertia > 1e-9, 1.0 / inertia, 0.0).astype(np.float32)
    params = np.array([0, obb_he[0], obb_he[1], obb_he[2]], np.float32)  # [0]=hull slot, set on add

    # 8 contact vertices: extremes along the 8 corner directions.
    corner_dirs = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
                           np.float32)
    contact_idx = np.argmax(vp @ corner_dirs.T, axis=0)
    contact_verts = vp[contact_idx]

    return PhysicsShape(
        int(ShapeType.HULL), params, float(m), 1.0 / m if m > 0 else 0.0,
        inv_inertia, vol, bound,
        hull_verts=vp.astype(np.float32),
        hull_contact_verts=contact_verts.astype(np.float32),
        principal_rot=rot.astype(np.float32),
    )


def scaled(shape: PhysicsShape, scale) -> PhysicsShape:
    """Bake a scale into the shape (reference re-decorates Jolt shapes on
    scale change, PhysicsWorld.cpp:546-633, 1155-1166).  Non-uniform scale on
    spheres/capsules uses the max component (Jolt makeScaleValid parity-ish)."""
    s = np.asarray(scale, np.float32) * np.ones(3, np.float32)
    if np.allclose(s, 1.0):
        return shape
    st = shape.shape_type
    if st == int(ShapeType.SPHERE):
        return make_sphere(float(shape.params[0] * np.max(np.abs(s))),
                           mass=shape.mass)
    if st == int(ShapeType.BOX):
        return make_box(shape.params[:3] * np.abs(s), mass=shape.mass)
    if st == int(ShapeType.CAPSULE):
        sr = float(np.max(np.abs(s[:2])))
        return make_capsule(float(shape.params[0] * sr), float(shape.params[1] * abs(s[2])),
                            mass=shape.mass)
    # Hull: rescale vertices.
    return make_convex_hull(shape.hull_verts * s, mass=shape.mass,
                            max_verts=len(shape.hull_verts))

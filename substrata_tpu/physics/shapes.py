"""Host-side shape factories.

Replaces the reference's Jolt shape factory functions
(gui_client/PhysicsWorld.cpp):
- createJoltShapeForBatchedMesh dynamic branch -> convex hull from vertices
  (871-1083, incl. skinned-vertex baking + uint16 dequantisation upstream)
- static triangle mesh (735-868) -> physics.state.build_trimesh
- heightfield (1086-1119) -> physics.state.Heightfield
- ground quad (1123-1135) -> box
- COM-offset (1138-1152) and scaled shapes (1155-1166) -> baked at build

Hulls are exact (scipy qhull): reduced to <= max_verts extreme vertices,
recentred on the solid COM and rotated into principal axes (tetrahedron-
decomposition volume/COM/inertia) with face planes stored for the
narrowphase SAT and ray clipping.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from substrata_tpu.physics.state import ShapeType, compute_shape_mass_props


# Host-side (x, y, z, w) quaternion math, mirroring maths/quat.py exactly —
# the per-object host-mirror pose paths must never touch the device (each
# jnp op there is a remote dispatch; see PhysicsShape._principal_quat).
def _np_quat_mul(a, b):
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return np.array([aw * bx + ax * bw + ay * bz - az * by,
                     aw * by - ax * bz + ay * bw + az * bx,
                     aw * bz + ax * by - ay * bx + az * bw,
                     aw * bw - ax * bx - ay * by - az * bz], np.float32)


def _np_quat_conj(q):
    return np.array([-q[0], -q[1], -q[2], q[3]], np.float32)


def _np_quat_rotate(q, v):
    u, w = q[:3], q[3]
    uv = np.cross(u, v)
    uuv = np.cross(u, uv)
    return np.asarray(v, np.float32) + 2.0 * (w * uv + uuv)


def _np_quat_from_matrix(m):
    m = np.asarray(m, np.float64)
    tr = m[0, 0] + m[1, 1] + m[2, 2]
    qw = np.sqrt(max(0.0, 1.0 + tr)) * 0.5
    qx = np.sqrt(max(0.0, 1.0 + m[0, 0] - m[1, 1] - m[2, 2])) * 0.5
    qy = np.sqrt(max(0.0, 1.0 - m[0, 0] + m[1, 1] - m[2, 2])) * 0.5
    qz = np.sqrt(max(0.0, 1.0 - m[0, 0] - m[1, 1] + m[2, 2])) * 0.5
    qx = np.copysign(qx, m[2, 1] - m[1, 2])
    qy = np.copysign(qy, m[0, 2] - m[2, 0])
    qz = np.copysign(qz, m[1, 0] - m[0, 1])
    q = np.array([qx, qy, qz, qw], np.float64)
    return (q / max(np.linalg.norm(q), 1e-12)).astype(np.float32)


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
    hull_planes: np.ndarray | None = None      # [F, 4] unit outward (n, d): n·x <= d
    # Rotation from original mesh frame into the principal frame, and the
    # mesh-frame COM: the BODY pose is the principal frame at the COM
    # (reference: Jolt COM-offset shape decoration, PhysicsWorld.cpp:1138-1152).
    principal_rot: np.ndarray = field(default_factory=lambda: np.eye(3, dtype=np.float32))
    com_offset: np.ndarray = field(default_factory=lambda: np.zeros(3, dtype=np.float32))

    # (numpy quat helpers defined at module scope below the class)

    def pose_is_identity(self) -> bool:
        """True when body pose == mesh pose (no COM offset, principal frame
        = mesh frame) — the common case (primitive shapes); cached so the
        per-tick readback can skip pose composition entirely."""
        v = getattr(self, "_pose_ident", None)
        if v is None:
            v = bool(np.all(self.com_offset == 0.0)
                     and np.allclose(self.principal_rot, np.eye(3)))
            object.__setattr__(self, "_pose_ident", v)
        return v

    def _principal_quat(self) -> np.ndarray:
        """Quaternion of principal_rot, cached — pure numpy: this runs
        per OBJECT per TICK on the host mirror path, and a jnp version
        cost one device dispatch per op (78 s/tick at 12k objects over
        the remote TPU tunnel — measured, r4)."""
        q = getattr(self, "_q_principal", None)
        if q is None:
            q = _np_quat_from_matrix(self.principal_rot)
            object.__setattr__(self, "_q_principal", q)
        return q

    def body_pose_from_mesh(self, pos, quat):
        """Compose an authored mesh-frame pose into the body (COM/principal)
        pose the simulator integrates."""
        pos = np.asarray(pos, np.float32)
        quat = np.asarray(quat, np.float32)
        body_q = _np_quat_mul(quat, self._principal_quat())
        body_p = pos + _np_quat_rotate(quat, self.com_offset)
        return body_p.astype(np.float32), body_q.astype(np.float32)

    def mesh_pose_from_body(self, pos, quat):
        """Inverse of body_pose_from_mesh (for render/replication readback)."""
        pos = np.asarray(pos, np.float32)
        quat = np.asarray(quat, np.float32)
        q_p = self._principal_quat()
        mesh_q = _np_quat_mul(quat, _np_quat_conj(q_p))
        mesh_p = pos - _np_quat_rotate(mesh_q, self.com_offset)
        return mesh_p.astype(np.float32), mesh_q.astype(np.float32)

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


def _hull_mass_properties(verts: np.ndarray, simplices: np.ndarray):
    """Exact solid volume / COM / covariance of a convex hull by tetrahedron
    decomposition (the same integrals Jolt computes for ConvexHullShape mass
    properties).

    Returns (volume, com [3], C_com [3,3]) with C_com = ∫ x xᵀ dV about the
    COM.  Decomposes from an interior point with |det| (qhull simplices are
    not consistently oriented; with an interior apex every tet is disjoint,
    and the integrals below are symmetric in (a, b, c) so orientation only
    affects the det sign).
    """
    p = verts.mean(axis=0)  # interior point of a convex hull
    a = verts[simplices[:, 0]] - p
    b = verts[simplices[:, 1]] - p
    c = verts[simplices[:, 2]] - p
    det = np.abs(np.einsum("ij,ij->i", a, np.cross(b, c)))  # 6 * tet volume
    vol = det.sum() / 6.0
    com_l = (det[:, None] * (a + b + c)).sum(axis=0) / 24.0 / max(vol, 1e-12)
    # ∫ x xᵀ over tet(0,a,b,c) = det/120 * (Σ v vᵀ + S Sᵀ), S = a+b+c.
    s = a + b + c
    cov = (np.einsum("i,ij,ik->jk", det, a, a)
           + np.einsum("i,ij,ik->jk", det, b, b)
           + np.einsum("i,ij,ik->jk", det, c, c)
           + np.einsum("i,ij,ik->jk", det, s, s)) / 120.0
    cov_com = cov - vol * np.outer(com_l, com_l)
    return float(vol), p + com_l, cov_com


def _hull_face_planes(verts: np.ndarray, max_faces: int = 32) -> np.ndarray:
    """Unit outward face planes (n, d with n·x <= d) of the convex hull of
    ``verts``, coplanar triangles merged.  Padded callers mask with n = 0."""
    from scipy.spatial import ConvexHull
    hull = ConvexHull(verts, qhull_options="QJ")
    eqs = hull.equations  # [F, 4]: n·x + offset <= 0 with |n| = 1
    planes = np.column_stack([eqs[:, :3], -eqs[:, 3]])
    # Merge coplanar triangle faces (quantised key).
    key = np.round(planes / 1e-4).astype(np.int64)
    _, idx = np.unique(key, axis=0, return_index=True)
    planes = planes[np.sort(idx)]
    if len(planes) > max_faces:
        # Keep the largest-offset-spread faces: prefer planes whose normals
        # are most spread (greedy farthest-normal selection).
        keep = [0]
        normals = planes[:, :3]
        d = np.full(len(planes), np.inf)
        for _ in range(max_faces - 1):
            d = np.minimum(d, 1.0 - normals @ normals[keep[-1]])
            nxt = int(np.argmax(d))
            keep.append(nxt)
            d[nxt] = -np.inf
        planes = planes[np.array(sorted(set(keep)))]
    return planes.astype(np.float32)


def make_convex_hull(vertices, density: float = 1000.0, mass: float = 0.0,
                     max_verts: int = 32) -> PhysicsShape:
    """Convex hull from a vertex cloud (reference: ConvexHullShapeSettings
    from BatchedMesh vertices, PhysicsWorld.cpp:1000-1060).

    Exact hull (scipy qhull): solid volume / COM / inertia by tetrahedron
    decomposition, recentred on the COM and rotated into principal axes so
    the body uses a diagonal local inertia.  Face planes are stored for the
    narrowphase SAT and ray clipping."""
    v = np.asarray(vertices, np.float64).reshape(-1, 3)
    try:
        from scipy.spatial import ConvexHull
        hull = ConvexHull(v, qhull_options="QJ")
        hv = v[hull.vertices]
        vol0, com, cov_com = _hull_mass_properties(
            v, hull.simplices.astype(np.int64))
        vol = max(vol0, 1e-9)
    except Exception:
        # Degenerate input (planar / tiny): fall back to the point cloud.
        hv = v
        com = v.mean(axis=0)
        vol = max(float(np.ptp(v, axis=0).prod()) * 0.5, 1e-6)
        cov_com = np.einsum("ij,ik->jk", v - com, v - com) / max(len(v), 1) * vol

    m = mass if mass > 0 else density * vol
    # Covariance about the COM, scaled to mass; inertia = tr(C)·I − C.
    cov_m = cov_com * (m / vol)
    inertia_t = np.trace(cov_m) * np.eye(3) - cov_m
    inertia_t = 0.5 * (inertia_t + inertia_t.T)
    w, rot = np.linalg.eigh(inertia_t)
    if np.linalg.det(rot) < 0:
        rot[:, 0] = -rot[:, 0]

    vp = (hv - com) @ rot  # principal frame, COM at origin
    vp = _reduce_hull_verts(vp.astype(np.float32), max_verts)
    try:
        planes = _hull_face_planes(vp.astype(np.float64))
    except Exception:
        planes = np.zeros((0, 4), np.float32)
    obb_he = np.maximum(np.abs(vp).max(axis=0), 1e-4)
    bound = float(np.linalg.norm(vp, axis=1).max())
    inertia = np.maximum(w, 1e-9)
    inv_inertia = (1.0 / inertia).astype(np.float32)
    params = np.array([0, obb_he[0], obb_he[1], obb_he[2]], np.float32)  # [0]=hull slot, set on add

    # 8 contact vertices: extremes along the 8 corner directions (static
    # heightfield/trimesh sampling).
    corner_dirs = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
                           np.float32)
    contact_idx = np.argmax(vp @ corner_dirs.T, axis=0)
    contact_verts = vp[contact_idx]

    return PhysicsShape(
        int(ShapeType.HULL), params, float(m), 1.0 / m if m > 0 else 0.0,
        inv_inertia, float(vol), bound,
        hull_verts=vp.astype(np.float32),
        hull_contact_verts=contact_verts.astype(np.float32),
        hull_planes=planes,
        principal_rot=rot.astype(np.float32),
        com_offset=np.asarray(com, np.float32),
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

"""Extra model-format decoders: OBJ, STL, MagicaVoxel VOX, and the format
dispatcher (reference: gui_client/ModelLoading.cpp:487-948 dispatches vox /
subvox / obj / gltf / glb / vrm / stl / igmesh / bmesh / sog).

Formats handled here are implemented from their public specifications:

- Wavefront OBJ: text `v`/`f` statements, polygon fan triangulation,
  `usemtl` material switching (ModelLoading.cpp:614).
- STL: binary (80-byte header + 50-byte facet records) and ASCII
  (`solid`/`facet`/`vertex`), with vertex dedup (ModelLoading.cpp:803).
- MagicaVoxel VOX: RIFF-style MAIN/SIZE/XYZI chunks decoded into voxel
  coords + palette-derived materials, meshed with the same greedy mesher
  voxel objects use (ModelLoading.cpp:487 VoxLoading path).

NOT handled (raise with a clear reason):

- igmesh: the Indigo SDK's binary mesh; its reader lives in the external
  Indigo dll (ModelLoading.cpp:862 Indigo::Mesh::readFromFile), not in the
  reference tree, so there is no spec to implement from.
- sog / subvox: Gaussian-splat and in-house packed-voxel renderer formats —
  renderer territory (SURVEY.md §7).

All decoders return ``(verts f32[N,3], tris i32[T,3], tri_mats i32[T])`` in
object space, matching GLTFModel.merged_mesh()/BMesh.merged_mesh().
"""

from __future__ import annotations

import struct

import numpy as np

from substrata_tpu.shared.voxel import make_greedy_mesh


class UnsupportedModelFormat(ValueError):
    pass


# ---------------------------------------------------------------------------
# Wavefront OBJ
# ---------------------------------------------------------------------------

def load_obj(data: bytes):
    verts: list = []
    tris: list = []
    tri_mats: list = []
    mat_ids: dict[str, int] = {}
    cur_mat = 0
    for raw in data.decode("utf-8", errors="replace").splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        tag = parts[0]
        if tag == "v" and len(parts) >= 4:
            verts.append((float(parts[1]), float(parts[2]), float(parts[3])))
        elif tag == "usemtl" and len(parts) >= 2:
            cur_mat = mat_ids.setdefault(parts[1], len(mat_ids))
        elif tag == "f" and len(parts) >= 4:
            # Each corner is v, v/vt, v//vn or v/vt/vn; indices 1-based,
            # negative = relative to current vertex count.
            idx = []
            for c in parts[1:]:
                vi = int(c.split("/")[0])
                idx.append(vi - 1 if vi > 0 else len(verts) + vi)
            for k in range(1, len(idx) - 1):   # fan triangulation
                tris.append((idx[0], idx[k], idx[k + 1]))
                tri_mats.append(cur_mat)
    if not verts or not tris:
        raise UnsupportedModelFormat("OBJ has no geometry")
    v = np.asarray(verts, np.float32)
    t = np.asarray(tris, np.int32)
    if t.min() < 0 or t.max() >= len(v):
        raise UnsupportedModelFormat("OBJ face index out of range")
    return v, t, np.asarray(tri_mats, np.int32)


# ---------------------------------------------------------------------------
# STL (binary + ASCII)
# ---------------------------------------------------------------------------

def load_stl(data: bytes):
    tri_pts = None
    if len(data) >= 84:
        (n,) = struct.unpack_from("<I", data, 80)
        if len(data) == 84 + 50 * n and n > 0:
            rec = np.frombuffer(data, np.uint8, count=50 * n, offset=84)
            rec = rec.reshape(n, 50)[:, :48].copy()
            f = rec.view(np.float32).reshape(n, 12)
            tri_pts = f[:, 3:12].reshape(n, 3, 3)   # skip the facet normal
    if tri_pts is None:
        if not data.lstrip()[:5].lower() == b"solid":
            raise UnsupportedModelFormat("not a valid STL")
        pts = []
        for line in data.decode("ascii", errors="replace").splitlines():
            parts = line.split()
            if parts and parts[0] == "vertex":
                pts.append((float(parts[1]), float(parts[2]),
                            float(parts[3])))
        if not pts or len(pts) % 3:
            raise UnsupportedModelFormat("ASCII STL has no triangles")
        tri_pts = np.asarray(pts, np.float32).reshape(-1, 3, 3)
    # Dedup shared corners so hull building / trimesh appends stay compact.
    flat = tri_pts.reshape(-1, 3)
    verts, inv = np.unique(flat.round(6), axis=0, return_inverse=True)
    tris = inv.reshape(-1, 3).astype(np.int32)
    ok = ((tris[:, 0] != tris[:, 1]) & (tris[:, 1] != tris[:, 2])
          & (tris[:, 0] != tris[:, 2]))
    tris = tris[ok]
    if len(tris) == 0:
        raise UnsupportedModelFormat("STL degenerate")
    return (verts.astype(np.float32), tris,
            np.zeros(len(tris), np.int32))


# ---------------------------------------------------------------------------
# MagicaVoxel VOX
# ---------------------------------------------------------------------------

def load_vox(data: bytes, voxel_size: float = 1.0):
    if data[:4] != b"VOX ":
        raise UnsupportedModelFormat("not a VOX file")
    pos = 8  # magic + version
    coords_all = []
    colors_all = []

    def parse_chunk(p):
        cid = data[p:p + 4]
        (nbytes, nchild) = struct.unpack_from("<II", data, p + 4)
        body = data[p + 12:p + 12 + nbytes]
        return cid, body, p + 12 + nbytes, p + 12 + nbytes + nchild

    cid, body, child_start, _ = parse_chunk(pos)
    if cid != b"MAIN":
        raise UnsupportedModelFormat("VOX missing MAIN chunk")
    p = child_start
    palette = None
    while p + 12 <= len(data):
        cid, body, _, nxt = parse_chunk(p)
        if cid == b"XYZI":
            (n,) = struct.unpack_from("<I", body, 0)
            arr = np.frombuffer(body, np.uint8, count=4 * n, offset=4)
            arr = arr.reshape(n, 4)
            coords_all.append(arr[:, :3].astype(np.int32))
            colors_all.append(arr[:, 3].astype(np.int32))
        elif cid == b"RGBA":
            palette = np.frombuffer(body, np.uint8, count=1024).reshape(256, 4)
        p = nxt
    if not coords_all:
        raise UnsupportedModelFormat("VOX has no voxels")
    coords = np.concatenate(coords_all)
    colors = np.concatenate(colors_all)
    # Palette indices -> compact material ids in first-seen order (the
    # reference maps VOX palette colours onto WorldMaterials the same way).
    uniq, mats = np.unique(colors, return_inverse=True)
    del palette  # colour values feed materials, not physics
    return make_greedy_mesh(coords, mats.astype(np.int32),
                            voxel_size=voxel_size)


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

def decode_model(url: str, data: bytes):
    """Decode model bytes by URL extension into (verts, tris, tri_mats)
    (ModelLoading.cpp format dispatch parity)."""
    low = url.lower()
    if low.endswith(".bmesh"):
        from substrata_tpu.shared.bmesh import load_bmesh
        return load_bmesh(data).merged_mesh()
    if low.endswith((".gltf", ".glb", ".vrm")):   # vrm is a glb container
        from substrata_tpu.shared.gltf import load_gltf
        return load_gltf(data).merged_mesh()
    if low.endswith(".obj"):
        return load_obj(data)
    if low.endswith(".stl"):
        return load_stl(data)
    if low.endswith(".vox"):
        return load_vox(data)
    if low.endswith((".igmesh", ".sog", ".subvox")):
        raise UnsupportedModelFormat(
            f"{url}: format not supported (igmesh needs the external "
            "Indigo SDK reader; sog/subvox are renderer formats)")
    raise UnsupportedModelFormat(f"{url}: unknown model format")

"""glTF loader tests (FormatDecoderGLTF / ModelLoading parity)."""

import base64
import json
import struct

import numpy as np
import pytest

from substrata_tpu.shared.gltf import load_gltf, physics_shape_for_gltf


def make_cube_gltf(as_glb=False, scale_node=None):
    """Minimal valid glTF cube (8 verts, 12 tris) with one material."""
    verts = np.array([[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)],
                     np.float32)
    tris = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.uint16)
    vbytes = verts.tobytes()
    ibytes = tris.tobytes()
    pad = (-len(ibytes)) % 4
    buf = vbytes + ibytes + b"\x00" * pad
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, **({"scale": scale_node} if scale_node else {})}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0}, "indices": 1, "material": 0}]}],
        "materials": [{"name": "red", "pbrMetallicRoughness": {
            "baseColorFactor": [1, 0, 0, 1], "roughnessFactor": 0.3}}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 8, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 36, "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(vbytes)},
            {"buffer": 0, "byteOffset": len(vbytes), "byteLength": len(ibytes)},
        ],
        "buffers": [{"byteLength": len(buf)}],
    }
    if as_glb:
        j = json.dumps(gltf).encode()
        j += b" " * ((-len(j)) % 4)
        out = struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(j) + 8 + len(buf))
        out += struct.pack("<II", len(j), 0x4E4F534A) + j
        out += struct.pack("<II", len(buf), 0x004E4942) + buf
        return out
    gltf["buffers"][0]["uri"] = ("data:application/octet-stream;base64,"
                                 + base64.b64encode(buf).decode())
    return json.dumps(gltf).encode()


def test_load_gltf_json():
    model = load_gltf(make_cube_gltf())
    assert len(model.primitives) == 1
    p = model.primitives[0]
    assert p.positions.shape == (8, 3)
    assert p.indices.shape == (12, 3)
    assert model.materials[0].base_color == (1, 0, 0, 1)
    assert model.materials[0].roughness == 0.3


def test_load_glb():
    model = load_gltf(make_cube_gltf(as_glb=True))
    verts, tris, mats = model.merged_mesh()
    assert verts.shape == (8, 3)
    assert len(tris) == 12
    assert (mats == 0).all()


def test_node_transform_applied():
    model = load_gltf(make_cube_gltf(scale_node=[2.0, 2.0, 2.0]))
    verts, _, _ = model.merged_mesh()
    assert verts.max() == pytest.approx(2.0)


def test_physics_shape_from_gltf():
    model = load_gltf(make_cube_gltf())
    hull, _ = physics_shape_for_gltf(model, dynamic=True, mass=10.0)
    assert hull is not None
    assert hull.mass == 10.0
    assert hull.hull_verts is not None and len(hull.hull_verts) <= 32
    _, trimesh_src = physics_shape_for_gltf(model, dynamic=False)
    verts, tris, tri_mats = trimesh_src
    assert len(tris) == 12


def test_gltf_into_physics_world():
    from substrata_tpu.physics.state import MotionType, SimConfig
    from substrata_tpu.physics.world import PhysicsObject, PhysicsWorld
    model = load_gltf(make_cube_gltf(as_glb=True))
    w = PhysicsWorld(SimConfig(capacity=16, max_pairs=64, grid_dim=16, cell_size=4.0))
    # Static trimesh from the model.
    verts, tris, tri_mats = model.merged_mesh()
    w.set_static_trimesh(verts + np.array([0, 0, 0.0], np.float32), tris, tri_mats)
    # Dynamic hull object dropped onto it.
    hull, _ = physics_shape_for_gltf(model, dynamic=True)
    ob = w.add_object(PhysicsObject(shape=hull, pos=np.array([0.5, 0.5, 4.0], np.float32),
                                    motion_type=int(MotionType.DYNAMIC)))
    for _ in range(240):
        w.think(1 / 60)
    w.sync_transforms()
    # Landed on the cube's top surface (z=1) or slid onto the ground plane.
    assert 0.2 < ob.pos[2] < 2.2, ob.pos

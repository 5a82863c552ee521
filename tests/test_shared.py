"""Shared world-model tests: serialisation, voxels, LOD, resources
(reference test strategy: WorldObject/WorldMaterial serialisation +
VoxelMeshBuilding::test + LODGeneration, SURVEY.md §4)."""

import numpy as np
import pytest

from substrata_tpu.shared.lod import (
    compute_lod_level, downscale_texture, generate_lod_meshes, lod_model_url,
    simplify_mesh,
)
from substrata_tpu.shared.resources import (
    ResourceManager, compute_content_url, escape_url_to_filename,
)
from substrata_tpu.shared.voxel import (
    compress_voxel_group, decompress_voxel_group, make_greedy_mesh,
    make_mesh_for_voxel_group,
)
from substrata_tpu.shared.world_object import (
    DYNAMIC_FLAG, WorldMaterial, WorldObject,
)
from substrata_tpu.shared.avatar import Avatar
from substrata_tpu.shared.parcel import Parcel


def test_world_object_serialisation_roundtrip():
    ob = WorldObject(uid=42, model_url="m.glb", script="<script/>",
                     audio_source_url="s.wav", audio_volume=0.7,
                     pos=np.array([1.5, -2.0, 3.0]),
                     scale=np.array([2, 2, 2], np.float32),
                     flags=DYNAMIC_FLAG | 1, mass=75.0, friction=0.4,
                     restitution=0.3, physics_owner_id=9,
                     materials=[WorldMaterial(colour_rgb=(1, 0, 0), roughness=0.2)],
                     voxel_data=b"\x01\x02\x03")
    ob.set_rotation_quat(np.array([0, 0, np.sin(0.5), np.cos(0.5)]))
    back = WorldObject.from_bytes(ob.to_bytes())
    assert back.uid == 42
    assert back.model_url == "m.glb"
    assert abs(back.audio_volume - 0.7) < 1e-6
    np.testing.assert_allclose(back.pos, ob.pos)
    np.testing.assert_allclose(back.quat, ob.quat, atol=1e-6)
    assert back.mass == 75.0
    assert back.physics_owner_id == 9
    assert back.materials[0].colour_rgb == (1.0, 0.0, 0.0)
    assert back.voxel_data == b"\x01\x02\x03"
    assert back.is_dynamic()


def test_avatar_parcel_serialisation():
    av = Avatar(uid=7, name="bob", pos=np.array([1.0, 2, 3]),
                rotation=np.array([0, 0.1, 1.2], np.float32),
                anim_state=3, entered_vehicle_uid=99, vehicle_seat_index=1)
    back = Avatar.from_bytes(av.to_bytes())
    assert back.name == "bob" and back.entered_vehicle_uid == 99
    p = Parcel(parcel_id=5, owner_id=2, aabb_min=np.zeros(3),
               aabb_max=np.array([10.0, 10, 10]), writer_ids=[3, 4])
    back_p = Parcel.from_bytes(p.to_bytes())
    assert back_p.user_has_write_perms(3)
    assert not back_p.user_has_write_perms(8)
    assert back_p.contains([5, 5, 5])


def test_voxel_compression_roundtrip():
    coords = np.array([[0, 0, 0], [1, 0, 0], [5, 5, 5]], np.int32)
    mats = np.array([0, 0, 2], np.int32)
    data = compress_voxel_group(coords, mats)
    c2, m2 = decompress_voxel_group(data)
    order = np.lexsort(c2.T)
    np.testing.assert_array_equal(c2[order], coords[np.lexsort(coords.T)])
    assert set(m2) == {0, 2}


def test_greedy_mesh_single_voxel():
    verts, tris, tmats = make_greedy_mesh(np.array([[0, 0, 0]]), np.array([0]))
    assert len(verts) == 8
    assert len(tris) == 12  # 6 faces * 2
    # Closed mesh: every edge shared by exactly 2 triangles.
    edges = {}
    for t in tris:
        for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            edges[(min(a, b), max(a, b))] = edges.get((min(a, b), max(a, b)), 0) + 1
    assert all(v == 2 for v in edges.values())


def test_greedy_mesh_merges_coplanar_faces():
    # A 4x4x1 slab of one material: top face should be ONE quad (2 tris),
    # total = 6 faces -> 12 tris regardless of the 16 voxels.
    xs, ys = np.meshgrid(np.arange(4), np.arange(4), indexing="ij")
    coords = np.stack([xs.ravel(), ys.ravel(), np.zeros(16, int)], axis=1)
    verts, tris, _ = make_greedy_mesh(coords, np.zeros(16, int))
    assert len(tris) == 12, len(tris)


def test_greedy_mesh_interior_faces_culled():
    # 2x1x1 pair: the shared face is culled -> 2 boxes merged = 12 tris.
    coords = np.array([[0, 0, 0], [1, 0, 0]])
    verts, tris, _ = make_greedy_mesh(coords, np.zeros(2, int))
    assert len(tris) == 12


def test_voxel_payload_to_mesh():
    data = compress_voxel_group(np.array([[0, 0, 0], [0, 0, 1]]), np.array([1, 1]))
    verts, tris, tmats = make_mesh_for_voxel_group(data, voxel_size=0.5)
    assert verts[:, 2].max() == 1.0  # two voxels of size 0.5 stacked
    assert (tmats == 1).all()


def test_simplify_mesh_reduces():
    # Dense grid plane.
    n = 32
    xs, ys = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n), indexing="ij")
    verts = np.stack([xs.ravel(), ys.ravel(), np.zeros(n * n)], axis=1)
    tris = []
    for i in range(n - 1):
        for j in range(n - 1):
            v = i * n + j
            tris.append([v, v + n, v + 1])
            tris.append([v + 1, v + n, v + n + 1])
    tris = np.array(tris)
    sv, st, sm = simplify_mesh(verts, tris, target_fraction=0.1)
    assert 0 < len(st) < len(tris) * 0.5
    # Simplified verts stay within the original AABB.
    assert sv.min() >= -1e-5 and sv.max() <= 1.0 + 1e-5
    lods = generate_lod_meshes(verts, tris)
    assert len(lods[2][1]) <= len(lods[1][1]) <= len(lods[0][1])


def test_lod_urls_and_levels():
    assert lod_model_url("tree.glb", 1) == "tree_lod1.glb"
    assert lod_model_url("tree.glb", 0) == "tree.glb"
    assert compute_lod_level(10.0, 50.0) == 0
    assert compute_lod_level(1.0, 50.0) == 1
    assert compute_lod_level(1.0, 500.0) == 2


def test_downscale_texture():
    img = np.random.default_rng(0).uniform(size=(64, 64, 3)).astype(np.float32)
    half = downscale_texture(img, 1)
    assert half.shape == (32, 32, 3)
    assert abs(half.mean() - img.mean()) < 0.01


def test_resource_manager(tmp_path):
    rm = ResourceManager(str(tmp_path))
    url = compute_content_url(b"hello-model", "model", ".glb")
    assert not rm.is_file_present(url)
    rm.store_resource(url, b"hello-model")
    assert rm.is_file_present(url)
    assert rm.load_resource(url) == b"hello-model"
    # Same content -> same URL (dedup).
    assert compute_content_url(b"hello-model", "model", ".glb") == url
    # Nasty URLs are sanitised.
    bad = "http://evil/../../etc/passwd?x=1"
    path = rm.path_for_url(bad)
    suffix = path.split(str(tmp_path))[1]
    assert "/" not in suffix.lstrip("/") and ".." not in suffix
    assert rm.total_size_bytes() == len(b"hello-model")

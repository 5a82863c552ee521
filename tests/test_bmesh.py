"""BatchedMesh (.bmesh) codec tests.

Validation has two legs: round-trips through our own writer, and — when
the reference checkout is present — decoding the reference's OWN shipped
.bmesh assets (resources/*.bmesh) and checking structural invariants
(AABB-exact positions, in-range indices, per-batch materials).  That
cross-checks the reverse-engineered format against real producer output.
"""

import os

import numpy as np
import pytest

from substrata_tpu.shared.bmesh import (BMesh, load_bmesh,
                                        physics_shape_for_bmesh, write_bmesh)

REF_RES = "/root/reference/resources"
needs_ref = pytest.mark.skipif(not os.path.isdir(REF_RES),
                               reason="reference assets not present")


def _cube(n=1.0):
    verts = np.array([[x, y, z] for x in (0, n) for y in (0, n)
                      for z in (0, n)], np.float32)
    tris = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                     [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                     [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
    return verts, tris


def test_roundtrip_small():
    verts, tris = _cube()
    mats = np.array([0] * 6 + [1] * 6, np.int32)
    data = write_bmesh(verts, tris, mats)
    m = load_bmesh(data)
    assert np.allclose(m.verts, verts)
    # Triangles survive as a set (batching reorders by material).
    got = {tuple(t) for t in m.tris.tolist()}
    want = {tuple(t) for t in tris.tolist()}
    assert got == want
    assert sorted(m.tri_mats.tolist()) == sorted(mats.tolist())


def test_roundtrip_large_u32_indices():
    rng = np.random.default_rng(0)
    verts = rng.normal(size=(70_000, 3)).astype(np.float32)
    tris = rng.integers(0, 70_000, (5000, 3)).astype(np.int64)
    m = load_bmesh(write_bmesh(verts, tris))
    assert np.allclose(m.verts, verts)
    assert (m.tris == tris).all()


@needs_ref
@pytest.mark.parametrize("name", [
    "Quad_obj_17249492137259942610",        # v1 u8 indices
    "Capsule_obj_7611321750126528672",      # v1 u16
    "elm_RT_glb_3393252396927074015",       # v1 two batches
    "portal",                               # v3 float positions
    "spotlight5",                           # v3 multiple materials
])
def test_decode_reference_assets(name):
    with open(os.path.join(REF_RES, f"{name}.bmesh"), "rb") as f:
        m = load_bmesh(f.read())
    assert len(m.verts) >= 3 and len(m.tris) >= 1
    assert m.tris.min() >= 0 and m.tris.max() < len(m.verts)
    # Positions must exactly fill the header AABB (catches any dequant /
    # layout / delta-decode mistake).
    assert np.allclose(m.verts.min(0), m.aabb_min, atol=1e-3)
    assert np.allclose(m.verts.max(0), m.aabb_max, atol=1e-3)
    assert len(m.tri_mats) == len(m.tris)


@needs_ref
def test_decode_skinned_v1_with_joints():
    path = ("/root/reference/server_dist_resources/"
            "xbot_glb_3242545562312850498.bmesh")
    if not os.path.exists(path):
        pytest.skip("skinned sample absent")
    with open(path, "rb") as f:
        m = load_bmesh(f.read())
    assert m.joints is not None and m.joints.shape == (len(m.verts), 4)
    assert m.weights is not None and m.weights.shape == (len(m.verts), 4)
    # Hull from the skinned rest pose (PhysicsWorld.cpp:735-811 baking).
    hull, _ = physics_shape_for_bmesh(m, dynamic=True, mass=60.0)
    assert hull is not None and hull.hull_verts is not None
    assert hull.mass == 60.0


@pytest.mark.slow
def test_client_loads_bmesh_object():
    """A .bmesh model_url object gets real collision geometry through the
    client asset path (same flow as glTF)."""
    from substrata_tpu.client_app import ClientApp
    from substrata_tpu.physics.state import SimConfig
    from substrata_tpu.shared.world_object import WorldObject
    verts, tris = _cube()
    app = ClientApp(config=SimConfig(capacity=64, max_pairs=256, grid_dim=16,
                                     cell_size=4.0),
                    enable_audio=False)
    app.provide_resource("box.bmesh", write_bmesh(verts * 4.0, tris))
    ob = WorldObject(flags=1, pos=np.array([2.0, 2.0, 2.0]),
                     model_url="box.bmesh")
    app.create_object(ob)
    app.timer_event(1 / 60)
    hit, t, n, hit_ob, mat = app.physics_world.trace_ray(
        [4.0, 4.0, 20.0], [0.0, 0.0, -1.0], 30.0)
    # Cube spans z [2, 6] in world: top at 6.0.
    assert hit and abs((20.0 - t) - 6.0) < 0.05, (hit, t)
    assert hit_ob is not None and hit_ob.userdata is ob

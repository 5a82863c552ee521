"""Particle system tests (reference: ParticleManager.cpp:145-271)."""

import numpy as np

from substrata_tpu.physics.particles import ParticleManager
from substrata_tpu.physics.state import SimConfig
from substrata_tpu.physics.world import PhysicsWorld
import pytest

DT = 1.0 / 60.0


def make_world(**kw):
    w = PhysicsWorld(SimConfig(capacity=32, max_pairs=64, grid_dim=16,
                               cell_size=4.0))
    w.set_ground_plane(0.0)
    return w


def test_particle_falls_and_bounces():
    w = make_world()
    pm = ParticleManager(w, capacity=64)
    pm.add_particle(pos=[0, 0, 2.0], vel=[0, 0, 0], restitution=0.6,
                    dopacity_dt=-0.01, mass=1e-3, area=1e-6)
    max_z_after_bounce = 0.0
    bounced = False
    prev_vz = 0.0
    for i in range(180):
        pm.think(DT)
        vz = float(np.asarray(pm.state.vel)[0, 2])
        z = float(np.asarray(pm.state.pos)[0, 2])
        if prev_vz < -1.0 and vz > 0.5:
            bounced = True
        if bounced:
            max_z_after_bounce = max(max_z_after_bounce, z)
        prev_vz = vz
    assert bounced
    assert 0.1 < max_z_after_bounce < 1.5


def test_particle_fades_and_dies():
    w = make_world()
    pm = ParticleManager(w, capacity=64)
    pm.add_particle(pos=[0, 0, 5.0], vel=[0, 0, 0], opacity=1.0,
                    dopacity_dt=-2.0)
    assert pm.num_alive == 0  # not flushed yet
    pm.think(DT)
    assert pm.num_alive == 1
    for _ in range(40):
        pm.think(DT)
    assert pm.num_alive == 0


def test_die_when_hit_surface():
    w = make_world()
    pm = ParticleManager(w, capacity=64)
    pm.add_particle(pos=[0, 0, 0.5], vel=[0, 0, -5.0], dopacity_dt=-0.01,
                    die_when_hit_surface=True)
    pm.think(DT)
    assert pm.num_alive == 1
    for _ in range(30):
        pm.think(DT)
    assert pm.num_alive == 0


def test_foam_decal_on_water():
    w = make_world()
    w.set_water_buoyancy_enabled(True)
    w.water_z = 1.0
    decals = []
    pm = ParticleManager(w, capacity=64)
    pm.on_foam_decal = lambda pos, width: decals.append((pos, width))
    pm.add_particle(pos=[0, 0, 2.0], vel=[0, 0, -4.0], dopacity_dt=-0.01,
                    die_when_hit_surface=True)
    for _ in range(60):
        pm.think(DT)
    assert len(decals) == 1
    assert abs(decals[0][0][2] - 1.0) < 1e-5


def test_water_buoyancy_clamp():
    w = make_world()
    w.set_water_buoyancy_enabled(True)
    w.water_z = 5.0
    w.set_ground_plane(-10.0)
    pm = ParticleManager(w, capacity=64)
    pm.add_particle(pos=[0, 0, 2.0], vel=[0, 0, -2.0], dopacity_dt=-0.001,
                    die_when_hit_surface=False)
    for _ in range(30):
        pm.think(DT)
    # Underwater particles get vel_z clamped >= 0.5 before drag (hacky
    # buoyancy, ParticleManager.cpp:209); drag then shaves it a little, so
    # at tick end it floats upward but may sit slightly below the clamp.
    assert float(np.asarray(pm.state.vel)[0, 2]) > 0.3


@pytest.mark.slow
def test_10k_particles_over_heightfield():
    w = make_world()
    xs = np.linspace(-40, 40, 33)
    H = (np.sin(xs[:, None] * 0.3) * 1.0).astype(np.float32)
    w.set_heightfield(H, origin=[-40, -40], cell_w=2.5)
    pm = ParticleManager(w, capacity=10_000)
    rng = np.random.default_rng(0)
    for i in range(1000):
        pm.add_particle(pos=[rng.uniform(-10, 10), rng.uniform(-10, 10),
                             rng.uniform(2, 5)],
                        vel=rng.normal(size=3) * 2, dopacity_dt=-0.05,
                        restitution=0.4)
    for _ in range(30):
        pm.think(DT)
    pos = np.asarray(pm.state.pos)
    alive = np.asarray(pm.state.alive)
    assert alive.sum() == 1000
    assert np.isfinite(pos[alive]).all()
    # Nothing tunnelled deep under the terrain.
    assert pos[alive, 2].min() > -2.5

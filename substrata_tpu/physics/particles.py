"""Point-particle system with ray-traced collisions.

TPU-native port of the reference ParticleManager
(gui_client/ParticleManager.{h,cpp}) — per-tick behaviour from
ParticleManager::think (ParticleManager.cpp:145-271):

- trace each particle's motion ray; on hit, reflect the velocity about the
  hit normal, scale by restitution, nudge 1e-3 off the surface, continue for
  the remaining dt (or die if die_when_hit_surface)
- water: die-on-surface particles crossing water_z die (spawning a foam
  decal event); others get the hacky buoyancy clamp vel_z >= 0.5
- gravity 9.81 when not underwater
- quadratic air drag: rho=1.293, C_d=0.5, accel magnitude clamped to 10
- opacity += dopacity_dt * dt, width += dwidth_dt * dt; dead when opacity<=0

Device design: fixed-capacity SoA arrays, one fused jitted step batched over
all particles (the reference notes this is "embarrassingly parallel" —
SURVEY.md flags it as the natural first kernel).  Spawning scatters into a
host-managed ring cursor; foam-decal events are returned as a packed mask.
"""

from __future__ import annotations

from functools import partial

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from substrata_tpu.physics import queries
from substrata_tpu.physics.state import BodyState, SimConfig, SimParams, StaticWorld

AIR_RHO = 1.293
DRAG_CD = 0.5
MAX_DRAG_ACCEL = 10.0
SURFACE_NUDGE = 1.0e-3

# Sprite types (ParticleManager.h:25-60).
TYPE_SMOKE = 0
TYPE_FOAM = 1


@flax.struct.dataclass
class ParticleState:
    pos: jnp.ndarray          # [P, 3]
    vel: jnp.ndarray          # [P, 3]
    area: jnp.ndarray         # [P]
    mass: jnp.ndarray         # [P]
    restitution: jnp.ndarray  # [P]
    width: jnp.ndarray        # [P]
    dwidth_dt: jnp.ndarray    # [P]
    opacity: jnp.ndarray      # [P]
    dopacity_dt: jnp.ndarray  # [P]
    theta: jnp.ndarray        # [P] sprite rotation
    sprite_type: jnp.ndarray  # [P] i32
    die_on_hit: jnp.ndarray   # [P] bool (die_when_hit_surface)
    alive: jnp.ndarray        # [P] bool

    @property
    def capacity(self):
        return self.pos.shape[0]


def zero_particles(capacity: int) -> ParticleState:
    f = jnp.float32
    p = capacity
    return ParticleState(
        pos=jnp.zeros((p, 3), f), vel=jnp.zeros((p, 3), f),
        area=jnp.full((p,), 1e-4, f), mass=jnp.full((p,), 1e-6, f),
        restitution=jnp.full((p,), 0.5, f), width=jnp.full((p,), 0.1, f),
        dwidth_dt=jnp.zeros((p,), f), opacity=jnp.zeros((p,), f),
        dopacity_dt=jnp.zeros((p,), f), theta=jnp.zeros((p,), f),
        sprite_type=jnp.zeros((p,), jnp.int32),
        die_on_hit=jnp.zeros((p,), bool), alive=jnp.zeros((p,), bool),
    )


@partial(jax.jit, static_argnames=("config", "n_ray_steps"))
def particles_step(ps: ParticleState, body: BodyState, world: StaticWorld,
                   dt, params: SimParams, config: SimConfig,
                   n_ray_steps: int = 4, table=None):
    """One tick for all particles.  Returns (new_state, foam_events) where
    foam_events is a [P] bool mask of particles that died on the water
    surface this tick (the host turns these into foam decals,
    ParticleManager.cpp:196-205)."""
    dt = jnp.asarray(dt, jnp.float32)
    speed = jnp.linalg.norm(ps.vel, axis=-1)
    dirs = ps.vel / jnp.maximum(speed, 1e-9)[:, None]
    max_ts = speed * dt

    # Particle motion rays are shorter than a broadphase cell (speed * dt),
    # so the body march uses the single-midpoint fast path (body_steps=1)
    # and skips duplicate masking — at 10k rays the dedup sort alone
    # dominated the whole tick.
    hits = queries.trace_rays(ps.pos, dirs, jnp.maximum(max_ts, 1e-6), body,
                              world, config, n_steps=n_ray_steps, table=table,
                              body_steps=1, dedup=False)
    hit = hits.hit & ps.alive & (max_ts > 1e-6)
    to_hit_dt = jnp.where(hit, hits.t / jnp.maximum(speed, 1e-9), 0.0)
    remaining = dt - to_hit_dt

    # Reflect + restitution (ParticleManager.cpp:176-183).
    vn = jnp.sum(hits.normal * ps.vel, -1)
    vel_refl = (ps.vel - hits.normal * (2.0 * vn)[:, None]) * ps.restitution[:, None]
    hitpos = ps.pos + ps.vel * to_hit_dt[:, None]
    pos_hit = hitpos + hits.normal * SURFACE_NUDGE + vel_refl * remaining[:, None]
    pos_free = ps.pos + ps.vel * dt

    pos = jnp.where(hit[:, None], pos_hit, pos_free)
    vel = jnp.where(hit[:, None], vel_refl, ps.vel)
    died_on_surface = hit & ps.die_on_hit

    # Water interaction (ParticleManager.cpp:196-212).
    underwater = (~hit) & (pos[:, 2] < params.water_z)
    die_in_water = underwater & ps.die_on_hit & (vel[:, 2] < 0)
    foam_events = die_in_water & ps.alive
    vel_z_water = jnp.maximum(vel[:, 2], 0.5)
    vel_z_grav = vel[:, 2] - 9.81 * dt
    new_vz = jnp.where(underwater, vel_z_water, jnp.where(hit, vel[:, 2], vel_z_grav))
    vel = vel.at[:, 2].set(new_vz)

    # Quadratic air drag with accel clamp (ParticleManager.cpp:217-242).
    v2 = jnp.sum(vel * vel, -1)
    f_d = 0.5 * AIR_RHO * v2 * DRAG_CD * ps.area
    accel = jnp.minimum(MAX_DRAG_ACCEL, f_d / jnp.maximum(ps.mass, 1e-12))
    scale = jnp.maximum(0.0, 1.0 - accel * dt / jnp.maximum(jnp.sqrt(v2), 1e-3))
    vel = vel * jnp.where(v2 > 1e-6, scale, 1.0)[:, None]

    opacity = ps.opacity + ps.dopacity_dt * dt
    width = ps.width + ps.dwidth_dt * dt
    opacity = jnp.where(died_on_surface | die_in_water, -1.0, opacity)
    alive = ps.alive & (opacity > 0.0)

    return ps.replace(pos=pos, vel=vel, opacity=opacity, width=width,
                      alive=alive), foam_events


@partial(jax.jit, donate_argnums=(0,))
def _scatter_spawn(ps: ParticleState, idx, pos, vel, area, mass, restitution,
                   width, dwidth_dt, opacity, dopacity_dt, theta, sprite_type,
                   die_on_hit, alive):
    return ps.replace(
        pos=ps.pos.at[idx].set(pos, mode="drop"),
        vel=ps.vel.at[idx].set(vel, mode="drop"),
        area=ps.area.at[idx].set(area, mode="drop"),
        mass=ps.mass.at[idx].set(mass, mode="drop"),
        restitution=ps.restitution.at[idx].set(restitution, mode="drop"),
        width=ps.width.at[idx].set(width, mode="drop"),
        dwidth_dt=ps.dwidth_dt.at[idx].set(dwidth_dt, mode="drop"),
        opacity=ps.opacity.at[idx].set(opacity, mode="drop"),
        dopacity_dt=ps.dopacity_dt.at[idx].set(dopacity_dt, mode="drop"),
        theta=ps.theta.at[idx].set(theta, mode="drop"),
        sprite_type=ps.sprite_type.at[idx].set(sprite_type, mode="drop"),
        die_on_hit=ps.die_on_hit.at[idx].set(die_on_hit, mode="drop"),
        alive=ps.alive.at[idx].set(alive, mode="drop"),
    )


class ParticleManager:
    """Host facade (ParticleManager.h API shape): addParticle / think /
    per-tick render transforms.  Spawns are queued and scattered in one
    batched update; a ring cursor recycles the oldest slots when full."""

    SPAWN_CHUNK = 256

    def __init__(self, physics_world, capacity: int = 16_384):
        self.world = physics_world
        self.state = zero_particles(capacity)
        self._cursor = 0
        self._pending: list[dict] = []
        self._maybe_alive = False
        self._ticks_since_check = 0
        self.foam_decal_events: list[np.ndarray] = []
        self.on_foam_decal = None  # callback(pos, width) — TerrainDecalManager hook

    def add_particle(self, pos, vel, area=1e-4, mass=1e-6, restitution=0.5,
                     width=0.1, dwidth_dt=0.0, opacity=1.0, dopacity_dt=-0.5,
                     theta=0.0, sprite_type=TYPE_SMOKE, die_when_hit_surface=False):
        self._pending.append(dict(
            pos=np.asarray(pos, np.float32), vel=np.asarray(vel, np.float32),
            area=area, mass=mass, restitution=restitution, width=width,
            dwidth_dt=dwidth_dt, opacity=opacity, dopacity_dt=dopacity_dt,
            theta=theta, sprite_type=sprite_type,
            die_on_hit=die_when_hit_surface))

    def _flush_spawns(self):
        if self._pending:
            self._maybe_alive = True
        while self._pending:
            chunk = self._pending[:self.SPAWN_CHUNK]
            del self._pending[:self.SPAWN_CHUNK]
            k = self.SPAWN_CHUNK
            pad = k - len(chunk)
            cap = self.state.capacity
            idx = np.array([(self._cursor + i) % cap for i in range(len(chunk))]
                           + [cap] * pad, np.int32)
            self._cursor = (self._cursor + len(chunk)) % cap

            def col(name, shape=(), dtype=np.float32):
                out = np.zeros((k,) + shape, dtype)
                for j, c in enumerate(chunk):
                    out[j] = c[name]
                return out

            self.state = _scatter_spawn(
                self.state, jnp.asarray(idx),
                jnp.asarray(col("pos", (3,))), jnp.asarray(col("vel", (3,))),
                jnp.asarray(col("area")), jnp.asarray(col("mass")),
                jnp.asarray(col("restitution")), jnp.asarray(col("width")),
                jnp.asarray(col("dwidth_dt")), jnp.asarray(col("opacity")),
                jnp.asarray(col("dopacity_dt")), jnp.asarray(col("theta")),
                jnp.asarray(col("sprite_type", (), np.int32)),
                jnp.asarray(col("die_on_hit", (), bool)),
                jnp.asarray(np.array([True] * len(chunk) + [False] * pad)))

    def think(self, dt: float):
        """ParticleManager::think parity (ParticleManager.cpp:145-271)."""
        had_pending = bool(self._pending)
        self._flush_spawns()
        if not had_pending and not self._maybe_alive:
            return  # nothing to simulate — skip the device step entirely
        w = self.world
        w._flush()
        self.state, foam = particles_step(
            self.state, w.state, w.static_world, jnp.float32(dt), w.params,
            w.config)
        # Cheap host-side liveness heuristic: re-check occasionally.
        self._ticks_since_check += 1
        if self._ticks_since_check >= 60:
            self._ticks_since_check = 0
            self._maybe_alive = self.num_alive > 0
        if self.on_foam_decal is not None:
            fm = np.asarray(foam)
            if fm.any():
                pos = np.asarray(self.state.pos)[fm]
                width = np.asarray(self.state.width)[fm]
                for p, wd in zip(pos, width):
                    foam_pos = p.copy()
                    foam_pos[2] = float(self.world.water_z)
                    self.on_foam_decal(foam_pos, float(wd))

    @property
    def num_alive(self) -> int:
        return int(np.asarray(self.state.alive).sum())

    def get_render_data(self):
        """(pos [P,3], width [P], theta [P], opacity [P], sprite_type [P],
        alive [P]) — the transform data the GL layer consumes."""
        s = self.state
        return (np.asarray(s.pos), np.asarray(s.width), np.asarray(s.theta),
                np.asarray(s.opacity), np.asarray(s.sprite_type),
                np.asarray(s.alive))

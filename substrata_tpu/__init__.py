"""substrata_tpu — a TPU-native simulation engine.

A ground-up re-design of the capabilities of glaretechnologies/substrata's
per-tick inner loop (reference: /root/reference) for TPU hardware:

- Rigid-body physics (broadphase, contact generation, impulse solve,
  integration, sleeping, buoyancy) as one jitted SoA step
  (reference: gui_client/PhysicsWorld.{h,cpp} backed by Jolt 5.3.0).
- Character controller (reference: gui_client/PlayerPhysics.{h,cpp}).
- Vehicle controllers: car / bike / boat / hovercar
  (reference: gui_client/{Car,Bike,Boat,HoverCar}Physics.{h,cpp}).
- Particle system (reference: gui_client/ParticleManager.{h,cpp}).
- Terrain heightfield queries + scattering
  (reference: gui_client/TerrainSystem.{h,cpp}, TerrainScattering.{h,cpp}).
- Spatial audio mixing (reference: audio/AudioEngine.{h,cpp}).
- Server-authoritative networked physics: snapshots, dejitter,
  interpolation, ownership (reference: docs/networked physics.txt,
  shared/Protocol.h, gui_client/ClientThread.cpp, server/Server.cpp).

Design: world state lives as SoA arrays in HBM; one jitted ``step`` advances
physics + particles + audio per tick; the host orchestrator owns networking,
asset loading and scripting and exchanges only packed dirty slices with the
device.  Multi-chip scaling is expressed with jax.sharding (world-instance
data parallelism and audio-source model parallelism over a Mesh).
"""

__version__ = "0.1.0"

from substrata_tpu.physics.world import PhysicsWorld, PhysicsObject  # noqa: F401
from substrata_tpu.physics.state import MotionType, ShapeType  # noqa: F401

"""TPU-native rigid-body physics.

Replaces the reference's Jolt-backed PhysicsWorld
(gui_client/PhysicsWorld.{h,cpp}) with a fully batched SoA pipeline:
broadphase (uniform grid) -> narrowphase (vectorized contact gen) ->
mass-splitting impulse solver -> semi-implicit Euler integration ->
sleeping -> buoyancy, all inside one jitted step.
"""

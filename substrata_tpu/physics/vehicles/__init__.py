"""Vehicle controllers: car, bike, boat, hovercar.

TPU-native re-design of the reference's vehicle layer
(gui_client/{Vehicle,Car,Bike,Boat,HoverCar}Physics.{h,cpp}): instead of
Jolt's per-vehicle constraint controllers, ALL vehicles update in one
batched jitted pass (wheel suspension raycasts, tyre impulses, boat/hover
force models), producing chassis velocity deltas applied in a single
scatter (SURVEY.md §2.7: "vehicle wheel raycasts + suspension/tyre forces
batched over all vehicles").
"""

from substrata_tpu.physics.vehicles.manager import (  # noqa: F401
    VehicleManager, VehicleSettings, VehiclePhysicsInput,
    CarPhysics, BikePhysics, BoatPhysics, HoverCarPhysics,
    VEHICLE_CAR, VEHICLE_BIKE, VEHICLE_BOAT, VEHICLE_HOVER,
)

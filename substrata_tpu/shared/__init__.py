"""Shared world model: WorldObject / Avatar / Parcel / resources.

Parity with the reference's shared/ layer (shared/WorldObject.*, Avatar.*,
Parcel.*, Resource*, WorldSettings.*): the scene-state records exchanged
between client, server and bots.
"""

from substrata_tpu.shared.world_object import WorldObject, ObjectType  # noqa: F401
from substrata_tpu.shared.avatar import Avatar  # noqa: F401
from substrata_tpu.shared.parcel import Parcel  # noqa: F401

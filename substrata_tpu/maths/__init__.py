"""SoA math core: quaternions, transforms, small geometry helpers.

TPU-native replacement for the simulation-relevant subset of glare-core's
Vec4f / Matrix4f / Quatf (reference call sites e.g.
gui_client/PhysicsWorld.cpp:660-704 computeToWorldAndToObMatrices).
All functions are pure, dtype-preserving, and written to be vmapped/jitted
over leading batch axes.
"""

from substrata_tpu.maths import quat  # noqa: F401
from substrata_tpu.maths import transform  # noqa: F401

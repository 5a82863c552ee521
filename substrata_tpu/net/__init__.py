"""Networking / replication layer.

Host-side re-implementation of the reference's networked-physics loop
(shared/Protocol.h, gui_client/ClientThread.*, server/Server.cpp,
server/WorkerThread.*, docs/networked physics.txt): length-prefixed binary
protocol over TCP, UDP voice relay, server-authoritative state with
per-world dirty-set broadcasting on a 100 ms tick, client-side snapshot
rings with interpolation + dejitter + smoothing, and timestamp-based
physics-ownership arbitration.  The device-resident physics step stays on
TPU; this layer exchanges packed snapshot tensors with it once per tick.
"""

from substrata_tpu.net import protocol  # noqa: F401

"""Depth-N pipelined device->host readbacks for remote TPU runtimes.

A blocking ``np.asarray(device_array)`` on a tunneled runtime costs the
full device round trip (~40-55 ms measured on the axon tunnel at r4) —
per READ, not per byte.  A 60 Hz client tick therefore cannot afford even
one synchronous readback.  The fix is the same one the reference applies
between its sim and render threads (GUIClient decouples them by a frame):
consume the value that was DISPATCHED N ticks ago.  By then its transfer
(started eagerly with ``copy_to_host_async``) has landed, so the consume
is a local memcpy; the value is N ticks stale, which network dejitter
buffers (100 ms, net/snapshots.py PADDING_DELAY) already dwarf.

Steady-state tick cost goes from RTT to ~max(host work, RTT/(depth+1)).
"""

from __future__ import annotations

from collections import deque

import numpy as np


class PipelinedReadback:
    """Ring of in-flight device values; push the newest, pop the oldest.

    ``push(x)`` starts the async device->host copy of ``x`` (a jax.Array
    or any pytree-leaf-like object exposing ``copy_to_host_async``) and
    returns the oldest entry's host value once the ring holds more than
    ``depth`` entries, else ``None`` (pipeline still filling).

    ``depth=0`` degenerates to a synchronous readback of every pushed
    value — callers can keep one code path.
    """

    def __init__(self, depth: int = 3):
        self.depth = int(depth)
        self._ring: deque = deque()

    def push(self, value):
        self._start_copy(value)
        self._ring.append(value)
        if len(self._ring) > self.depth:
            return self._to_host(self._ring.popleft())
        return None

    def flush(self) -> list:
        """Drain every in-flight entry (host values, oldest first)."""
        out = [self._to_host(v) for v in self._ring]
        self._ring.clear()
        return out

    def clear(self):
        self._ring.clear()

    def __len__(self):
        return len(self._ring)

    @staticmethod
    def _start_copy(value):
        if isinstance(value, tuple):
            for v in value:
                PipelinedReadback._start_copy(v)
            return
        try:
            value.copy_to_host_async()
        except AttributeError:
            pass   # numpy / host value already

    @staticmethod
    def _to_host(value):
        if value is None:
            return None
        if isinstance(value, tuple):
            return tuple(PipelinedReadback._to_host(v) for v in value)
        return np.asarray(value)

"""ctypes bindings to libsubstrata_native.so (built from /native).

The reference's runtime-support layer is C++ (glare-core allocators, codecs,
protocol plumbing); here the native library provides the host-side hot
paths: wire-protocol snapshot packing, lock-free audio output ring, voxel
greedy meshing, and (optionally) an MP3 decoder.  Every entry point has a
pure-Python fallback so the framework works without the native build.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        path = os.path.join(here, "native", "libsubstrata_native.so")
        if os.path.exists(path):
            try:
                _LIB = ctypes.CDLL(path)
            except OSError:
                _LIB = None
    return _LIB


def available() -> bool:
    return _lib() is not None


def has_mp3() -> bool:
    lib = _lib()
    return lib is not None and hasattr(lib, "decode_mp3")


def decode_mp3(path):
    raise NotImplementedError("native MP3 decoder not built")


# ---------------------------------------------------------------------------
# Snapshot packet codec (native fast path; see native/protocol_codec.cpp)
# ---------------------------------------------------------------------------

def pack_physics_snapshots(uids, pos, quat, linvel, angvel, client_time) -> bytes:
    """Pack N ObjectPhysicsTransformUpdate payloads into one buffer."""
    lib = _lib()
    n = len(uids)
    uids = np.ascontiguousarray(uids, np.uint64)
    block = np.ascontiguousarray(
        np.concatenate([pos, quat, linvel, angvel], axis=1), np.float32)
    ct = np.ascontiguousarray(client_time, np.float64)
    if lib is not None and hasattr(lib, "pack_snapshots"):
        out = np.empty(n * (8 + 13 * 4 + 8), np.uint8)
        lib.pack_snapshots(
            ctypes.c_int(n),
            uids.ctypes.data_as(ctypes.c_void_p),
            block.ctypes.data_as(ctypes.c_void_p),
            ct.ctypes.data_as(ctypes.c_void_p),
            out.ctypes.data_as(ctypes.c_void_p))
        return out.tobytes()
    # Python fallback: structured array round-trip.
    rec = np.zeros(n, dtype=_SNAPSHOT_DTYPE)
    rec["uid"] = uids
    rec["state"] = block
    rec["t"] = ct
    return rec.tobytes()


_SNAPSHOT_DTYPE = np.dtype([("uid", "<u8"), ("state", "<f4", (13,)), ("t", "<f8")])


def unpack_physics_snapshots(data: bytes):
    rec = np.frombuffer(data, dtype=_SNAPSHOT_DTYPE)
    state = rec["state"]
    return (rec["uid"].copy(), state[:, 0:3].copy(), state[:, 3:7].copy(),
            state[:, 7:10].copy(), state[:, 10:13].copy(), rec["t"].copy())

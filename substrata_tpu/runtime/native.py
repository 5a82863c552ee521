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
    from substrata_tpu.runtime import codecs
    return codecs.has_mp3()


def decode_mp3(path):
    """Decode an MP3 file to a SoundFile (system libmpg123 via
    runtime.codecs — the reference vendors minimp3 for the same job,
    audio/MP3AudioFileReader.cpp)."""
    from substrata_tpu.audio.readers import SoundFile
    from substrata_tpu.runtime import codecs
    arr, rate = codecs.decode_mp3(path)
    nch = 1 if arr.ndim == 1 else arr.shape[1]
    return SoundFile(buf=arr, num_channels=nch, sample_rate=rate)


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


# ---------------------------------------------------------------------------
# Lock-free SPSC audio output ring (native/substrata_native.cpp)
# ---------------------------------------------------------------------------

class NativeAudioRing:
    """Lock-free single-producer/single-consumer stereo f32 ring — the
    device-callback side of the audio engine (reference: mutex-guarded ring
    in AudioEngine.cpp:191-226; this one is wait-free on both sides)."""

    def __init__(self, capacity_frames: int = 48_000):
        lib = _lib()
        if lib is None:
            raise RuntimeError("native library not built (make -C native)")
        lib.audio_ring_create.restype = ctypes.c_void_p
        lib.audio_ring_write.restype = ctypes.c_uint32
        lib.audio_ring_read.restype = ctypes.c_uint32
        lib.audio_ring_queued.restype = ctypes.c_uint32
        self._lib = lib
        self._ring = lib.audio_ring_create(ctypes.c_uint32(capacity_frames))
        if not self._ring:
            raise MemoryError("audio ring allocation failed")

    def write(self, frames: np.ndarray) -> int:
        frames = np.ascontiguousarray(frames, np.float32)
        return int(self._lib.audio_ring_write(
            ctypes.c_void_p(self._ring),
            frames.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_uint32(len(frames))))

    def read(self, n_frames: int) -> np.ndarray:
        out = np.empty((n_frames, 2), np.float32)
        self._lib.audio_ring_read(
            ctypes.c_void_p(self._ring),
            out.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_uint32(n_frames))
        return out

    @property
    def queued_frames(self) -> int:
        return int(self._lib.audio_ring_queued(ctypes.c_void_p(self._ring)))

    def __del__(self):
        lib = getattr(self, "_lib", None)
        ring = getattr(self, "_ring", None)
        if lib is not None and ring:
            lib.audio_ring_destroy(ctypes.c_void_p(ring))
            self._ring = None


# ---------------------------------------------------------------------------
# Greedy voxel mesher (native fast path)
# ---------------------------------------------------------------------------

def greedy_mesh_voxels_native(coords: np.ndarray, materials: np.ndarray,
                              voxel_size: float = 1.0):
    """Native greedy mesher; returns (verts, tris, tri_mats) or None when
    the library is unavailable (callers fall back to the numpy mesher)."""
    lib = _lib()
    if lib is None or not hasattr(lib, "greedy_mesh_voxels"):
        return None
    coords = np.ascontiguousarray(coords, np.int32)
    materials = np.ascontiguousarray(materials, np.int32)
    n = len(coords)
    max_verts = max(64, n * 8)
    max_tris = max(64, n * 12)
    for _ in range(3):  # grow buffers on overflow
        verts = np.empty((max_verts, 3), np.float32)
        tris = np.empty((max_tris, 3), np.int32)
        tmats = np.empty(max_tris, np.int32)
        nv = ctypes.c_int32(0)
        nt = ctypes.c_int32(0)
        rc = lib.greedy_mesh_voxels(
            ctypes.c_int(n),
            coords.ctypes.data_as(ctypes.c_void_p),
            materials.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_float(voxel_size),
            verts.ctypes.data_as(ctypes.c_void_p), ctypes.c_int32(max_verts),
            ctypes.byref(nv),
            tris.ctypes.data_as(ctypes.c_void_p),
            tmats.ctypes.data_as(ctypes.c_void_p), ctypes.c_int32(max_tris),
            ctypes.byref(nt))
        if rc == 0:
            return (verts[:nv.value].copy(), tris[:nt.value].copy(),
                    tmats[:nt.value].copy())
        if rc == -1:
            max_verts = max(max_verts * 2, nv.value + 8)
            max_tris = max(max_tris * 2, nt.value + 8)
            continue
        return None
    return None

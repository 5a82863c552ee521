"""Wire protocol: message ids + length-prefixed framing + payload codecs.

Message-id and framing parity with shared/Protocol.h (version 54): every
message is [u32 msg_type][u32 msg_len][payload] with msg_len covering the
whole message including the 8-byte header (the v31+ length-prefixed format;
packet init/length patching helper parity with shared/MessageUtils.h).
Payload layouts are this engine's own (we are not wire-compatible with the
C++ build — same ids + semantics, fresh encoding).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

# Handshake (Protocol.h:57-76)
CYBERSPACE_HELLO = 1357924680
CYBERSPACE_PROTOCOL_VERSION = 54
CLIENT_PROTOCOL_OK = 10000
CLIENT_PROTOCOL_TOO_OLD = 10001
CLIENT_UDP_SOCKET_OPEN = 10003

CONNECTION_TYPE_UPDATES = 500  # ConnectionTypeUpdates

# Avatars (Protocol.h:81-94)
AVATAR_CREATED = 1000
AVATAR_DESTROYED = 1001
AVATAR_TRANSFORM_UPDATE = 1002
AVATAR_FULL_UPDATE = 1003
AVATAR_IS_HERE = 1005
AVATAR_PERFORM_GESTURE = 1010
AVATAR_STOP_GESTURE = 1011
AVATAR_ENTERED_VEHICLE = 1100

# Chat
CHAT_MESSAGE_ID = 2000

# Objects (Protocol.h:113-137)
OBJECT_CREATED = 3000
OBJECT_DESTROYED = 3001
OBJECT_TRANSFORM_UPDATE = 3002
OBJECT_FULL_UPDATE = 3003
OBJECT_LIGHTMAP_URL_CHANGED = 3010
OBJECT_MODEL_URL_CHANGED = 3011
OBJECT_FLAGS_CHANGED = 3012
OBJECT_PHYSICS_OWNERSHIP_TAKEN = 3013
OBJECT_PHYSICS_TRANSFORM_UPDATE = 3016
OBJECT_CONTENT_CHANGED = 3017
SUMMON_OBJECT = 3018
QUERY_OBJECTS = 3020
OBJECT_INITIAL_SEND = 3021
QUERY_OBJECTS_IN_AABB = 3022
OBJECT_INITIAL_SEND_COMPRESSED = 3023

# Parcels (Protocol.h:140-146)
PARCEL_CREATED = 3100
PARCEL_DESTROYED = 3101
PARCEL_FULL_UPDATE = 3103

# World settings
WORLD_SETTINGS_UPDATE = 3200
WORLD_DETAILS_UPDATE = 3201

# Users / info (Protocol.h:182-204)
USER_SELECTED_OBJECT = 7000
INFO_MESSAGE_ID = 7001
ERROR_MESSAGE_ID = 7002
USER_USED_OBJECT_MESSAGE = 7010
USER_TOUCHED_OBJECT_MESSAGE = 7011
USER_MOVED_NEAR_TO_OBJECT_MESSAGE = 7012
USER_MOVED_AWAY_FROM_OBJECT_MESSAGE = 7013
USER_ENTERED_PARCEL_MESSAGE = 7014
USER_EXITED_PARCEL_MESSAGE = 7015
LOG_IN_MESSAGE = 8000
LOG_OUT_MESSAGE = 8001
SIGN_UP_MESSAGE = 8002
LOGGED_IN_MESSAGE_ID = 8003
LOGGED_OUT_MESSAGE_ID = 8004

TIME_SYNC_MESSAGE = 9000
KEEP_ALIVE = 13000
PING = 13001  # ping/pong keepalive family (Protocol.h:218-221)
PONG = 13002

# Capability bits (Protocol.h:246-253)
STREAMING_COMPRESSED_OBJECT_SUPPORT = 0x1

# UDP packet types (server/UDPHandlerThread.cpp:55-95)
UDP_VOICE_PACKET = 1
UDP_DISCOVERY_PACKET = 2

HEADER = struct.Struct("<II")


def make_message(msg_type: int, payload: bytes = b"") -> bytes:
    """Length includes the 8-byte header (MessageUtils parity)."""
    return HEADER.pack(msg_type, len(payload) + 8) + payload


class MessageReader:
    """Incremental frame splitter for a TCP stream."""

    def __init__(self):
        self._buf = bytearray()

    def feed(self, data: bytes):
        self._buf.extend(data)

    def messages(self):
        while len(self._buf) >= 8:
            msg_type, msg_len = HEADER.unpack_from(self._buf, 0)
            if msg_len < 8 or msg_len > 64 * 1024 * 1024:
                raise ValueError(f"bad message length {msg_len}")
            if len(self._buf) < msg_len:
                return
            payload = bytes(self._buf[8:msg_len])
            del self._buf[:msg_len]
            yield msg_type, payload


# --- Payload codecs -------------------------------------------------------

def pack_string(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack("<I", len(b)) + b


def unpack_string(buf: bytes, off: int):
    (n,) = struct.unpack_from("<I", buf, off)
    off += 4
    return buf[off:off + n].decode("utf-8"), off + n


_PHYS_SNAP = struct.Struct("<Q13fdI")


def pack_physics_transform_update(uid: int, pos, quat, linvel, angvel,
                                  client_time: float, owner_avatar_uid: int) -> bytes:
    """ObjectPhysicsTransformUpdate 3016 payload (WorkerThread.cpp:1968-2039
    semantics: pos/rot/vel/angvel + client timestamp + sender)."""
    return _PHYS_SNAP.pack(uid, *np.asarray(pos, np.float32),
                           *np.asarray(quat, np.float32),
                           *np.asarray(linvel, np.float32),
                           *np.asarray(angvel, np.float32),
                           client_time, owner_avatar_uid)


def unpack_physics_transform_update(payload: bytes):
    vals = _PHYS_SNAP.unpack(payload)
    uid = vals[0]
    f = np.array(vals[1:14], np.float32)
    return (uid, f[0:3], f[3:7], f[7:10], f[10:13], vals[14], vals[15])


_OWNERSHIP = struct.Struct("<QId")


def pack_physics_ownership_taken(uid: int, physics_owner_id: int,
                                 global_time: float, flags: int = 0) -> bytes:
    return _OWNERSHIP.pack(uid, physics_owner_id, global_time) + struct.pack("<I", flags)


def unpack_physics_ownership_taken(payload: bytes):
    uid, owner, t = _OWNERSHIP.unpack_from(payload, 0)
    (flags,) = struct.unpack_from("<I", payload, _OWNERSHIP.size)
    return uid, owner, t, flags


_AVATAR_TRANSFORM = struct.Struct("<Q6fIQII")


def pack_avatar_transform_update(uid: int, pos, rot, anim_state: int,
                                 vehicle_uid: int = 0, seat: int = 0,
                                 input_bitflags: int = 0) -> bytes:
    """AvatarTransformUpdate 1002: pos + (roll, pitch, heading) + anim state
    bitflags (shared/Avatar.h:133-141) + vehicle occupancy and the driver's
    input bitflags for remote vehicle replay (VehiclePhysics.h:79)."""
    return _AVATAR_TRANSFORM.pack(uid, *np.asarray(pos, np.float64).astype(np.float32),
                                  *np.asarray(rot, np.float32), anim_state,
                                  vehicle_uid, seat, input_bitflags)


def unpack_avatar_transform_update(payload: bytes):
    vals = _AVATAR_TRANSFORM.unpack(payload)
    return (vals[0], np.array(vals[1:4], np.float32),
            np.array(vals[4:7], np.float32), vals[7], vals[8], vals[9],
            vals[10])


def pack_time_sync(global_time: float) -> bytes:
    return struct.pack("<d", global_time)


def unpack_time_sync(payload: bytes) -> float:
    return struct.unpack("<d", payload)[0]


def pack_chat_message(name: str, msg: str) -> bytes:
    return pack_string(name) + pack_string(msg)


def unpack_chat_message(payload: bytes):
    name, off = unpack_string(payload, 0)
    msg, _ = unpack_string(payload, off)
    return name, msg

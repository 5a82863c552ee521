"""Avatar animation state machine + gesture playback.

Behavioural port of the animation-relevant part of
gui_client/AvatarGraphics.{h,cpp} + AnimationManager.* + GestureUI.* (the
skeletal skinning itself belongs to the renderer; what the engine owns is
WHICH animation plays, blend weights, procedural locomotion phase, and the
per-avatar root transform — `updateAvatarGraphics` in the tick,
GUIClient.cpp:8235).

States: idle / walk / run / fly / jump-in-air / sitting (vehicle seat),
selected from velocity + anim_state bitflags (shared/Avatar.h:141),
blended over short transitions; gestures override the upper body for their
duration (GestureSettings).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from substrata_tpu.shared.avatar import (
    ANIM_STATE_FLYING, ANIM_STATE_IN_AIR, ANIM_STATE_MOVE_IMPULSE_ZERO,
)

ANIM_IDLE = "idle"
ANIM_WALK = "walking"
ANIM_RUN = "running"
ANIM_FLY = "flying"
ANIM_JUMP = "in_air"
ANIM_SIT = "sitting"

WALK_RUN_THRESHOLD = 6.0   # m/s; run factor 5 * 3 m/s base >> this
MOVE_THRESHOLD = 0.3
BLEND_TIME = 0.2

# Built-in gestures (GestureUI gesture list shape).
GESTURES = {
    "Wave": {"duration": 2.5, "animate_head": False},
    "Clap": {"duration": 3.0, "animate_head": False},
    "Dance": {"duration": 8.0, "animate_head": True},
    "Sit": {"duration": 1e9, "animate_head": False},
}


@dataclass
class AnimEvents:
    """Per-update outputs the app layer reacts to (footstep sounds etc.)."""

    footstrike: bool = False
    footstrike_pos: np.ndarray = field(default_factory=lambda: np.zeros(3))


class AvatarGraphics:
    def __init__(self, avatar=None):
        self.avatar = avatar
        self.cur_anim = ANIM_IDLE
        self.prev_anim = ANIM_IDLE
        self.blend = 1.0               # 0 -> prev, 1 -> cur
        self.locomotion_phase = 0.0    # walk cycle phase [0, 2pi)
        self.gesture: str | None = None
        self.gesture_time_left = 0.0
        self.gesture_animate_head = False
        self.sitting = False
        self.last_pos = None
        self.smoothed_speed = 0.0
        self.root_transform = np.eye(4, dtype=np.float32)

    # ------------------------------------------------------------------
    def perform_gesture(self, name: str):
        g = GESTURES.get(name)
        if g is None:
            return False
        self.gesture = name
        self.gesture_time_left = g["duration"]
        self.gesture_animate_head = g["animate_head"]
        return True

    def stop_gesture(self):
        self.gesture = None
        self.gesture_time_left = 0.0

    def set_sitting(self, sitting: bool):
        self.sitting = sitting

    # ------------------------------------------------------------------
    def _select_anim(self, speed_xy: float, anim_state: int) -> str:
        if self.sitting:
            return ANIM_SIT
        if anim_state & ANIM_STATE_FLYING:
            return ANIM_FLY
        if anim_state & ANIM_STATE_IN_AIR:
            return ANIM_JUMP
        if speed_xy > WALK_RUN_THRESHOLD:
            return ANIM_RUN
        if speed_xy > MOVE_THRESHOLD and not (anim_state & ANIM_STATE_MOVE_IMPULSE_ZERO):
            return ANIM_WALK
        return ANIM_IDLE

    def update(self, pos, heading: float, anim_state: int, dt: float) -> AnimEvents:
        """Per-tick update (updateAvatarGraphics parity).  Returns events."""
        pos = np.asarray(pos, np.float64)
        ev = AnimEvents()
        if self.last_pos is None:
            self.last_pos = pos.copy()
        vel = (pos - self.last_pos) / max(dt, 1e-6)
        self.last_pos = pos.copy()
        speed_xy = float(np.linalg.norm(vel[:2]))
        self.smoothed_speed += (speed_xy - self.smoothed_speed) * min(1.0, 10.0 * dt)

        want = self._select_anim(self.smoothed_speed, anim_state)
        if want != self.cur_anim:
            self.prev_anim = self.cur_anim
            self.cur_anim = want
            self.blend = 0.0
        self.blend = min(1.0, self.blend + dt / BLEND_TIME)

        # Locomotion phase advances with distance (stride ~1.7 m walk,
        # ~2.6 m run) so footfalls track ground speed.
        if self.cur_anim in (ANIM_WALK, ANIM_RUN):
            stride = 1.7 if self.cur_anim == ANIM_WALK else 2.6
            old_phase = self.locomotion_phase
            self.locomotion_phase = (self.locomotion_phase
                                     + 2 * math.pi * self.smoothed_speed * dt / stride)
            # Footstrike at each half cycle.
            if int(old_phase / math.pi) != int(self.locomotion_phase / math.pi):
                ev.footstrike = True
                ev.footstrike_pos = pos.copy()
            self.locomotion_phase %= 2 * math.pi

        if self.gesture is not None:
            self.gesture_time_left -= dt
            if self.gesture_time_left <= 0:
                self.stop_gesture()

        ch, sh = math.cos(heading), math.sin(heading)
        m = np.eye(4, dtype=np.float32)
        m[0, 0], m[0, 1] = ch, -sh
        m[1, 0], m[1, 1] = sh, ch
        m[:3, 3] = pos.astype(np.float32)
        self.root_transform = m
        return ev

    def get_pose_params(self) -> dict:
        """Pose parameters a renderer consumes: animation names + blend +
        phase + gesture override."""
        return {
            "anim": self.cur_anim,
            "prev_anim": self.prev_anim,
            "blend": self.blend,
            "phase": self.locomotion_phase,
            "gesture": self.gesture,
            "gesture_animate_head": self.gesture_animate_head,
            "root": self.root_transform,
        }


class AvatarGraphicsManager:
    """Per-avatar graphics registry driven by the client tick."""

    def __init__(self):
        self.by_uid: dict[int, AvatarGraphics] = {}

    def update_avatar(self, avatar, dt: float) -> AnimEvents:
        g = self.by_uid.get(avatar.uid)
        if g is None:
            g = AvatarGraphics(avatar)
            self.by_uid[avatar.uid] = g
            avatar.graphics = g
        heading = float(avatar.rotation[2])
        g.set_sitting(avatar.entered_vehicle_uid != 0)
        return g.update(avatar.pos, heading, avatar.anim_state, dt)

    def remove_avatar(self, uid: int):
        self.by_uid.pop(uid, None)

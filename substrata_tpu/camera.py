"""CameraController: first/third-person camera.

Parity with gui_client/CameraController.{h,cpp}: yaw/pitch mouse look,
forwards/right/up move vectors consumed by PlayerPhysics input processing
(PlayerPhysics.cpp:159-217 uses cam.getForwardsMoveVec / getRightMoveVec),
camera modes (first person / third person / free), third-person boom with
obstruction shortening (the tick's third-person camera trace), and
selfie-mode flip.
"""

from __future__ import annotations

import math
from enum import IntEnum

import numpy as np


class CameraMode(IntEnum):
    FIRST_PERSON = 0
    THIRD_PERSON = 1
    FREE_CAMERA = 2  # CameraMode_FreeCamera (PlayerPhysics.cpp:205)


class CameraController:
    MOUSE_SENSITIVITY = 0.0035
    PITCH_LIMIT = math.pi / 2 - 0.05
    THIRD_PERSON_DIST_DEFAULT = 3.0
    THIRD_PERSON_DIST_MIN = 0.5
    THIRD_PERSON_DIST_MAX = 20.0

    def __init__(self):
        self.heading = 0.0       # radians about +z; 0 = +y forward
        self.pitch = 0.0         # radians; + looks up
        self.mode = CameraMode.FIRST_PERSON
        self.third_person_dist = self.THIRD_PERSON_DIST_DEFAULT
        self.eye_pos = np.array([0, 0, 1.67], np.float64)
        self.selfie_mode = False

    # ------------------------------------------------------------------
    def mouse_look(self, dx_pixels: float, dy_pixels: float):
        self.heading -= dx_pixels * self.MOUSE_SENSITIVITY
        self.pitch = float(np.clip(self.pitch - dy_pixels * self.MOUSE_SENSITIVITY,
                                   -self.PITCH_LIMIT, self.PITCH_LIMIT))

    def handle_scroll(self, dy: float):
        if self.mode == CameraMode.THIRD_PERSON:
            self.third_person_dist = float(np.clip(
                self.third_person_dist * (0.9 if dy > 0 else 1.1),
                self.THIRD_PERSON_DIST_MIN, self.THIRD_PERSON_DIST_MAX))

    # Basis vectors (z-up world; heading 0 looks along +y).
    def forward_vec(self) -> np.ndarray:
        ch, sh = math.cos(self.heading), math.sin(self.heading)
        cp, sp = math.cos(self.pitch), math.sin(self.pitch)
        return np.array([-sh * cp, ch * cp, sp], np.float32)

    def right_vec(self) -> np.ndarray:
        ch, sh = math.cos(self.heading), math.sin(self.heading)
        return np.array([ch, sh, 0.0], np.float32)

    def up_vec(self) -> np.ndarray:
        return np.cross(self.right_vec(), self.forward_vec())

    # Movement vectors for PlayerPhysics (horizontal-plane forward).
    def get_forwards_move_vec(self) -> np.ndarray:
        f = self.forward_vec()
        h = np.array([f[0], f[1], 0.0], np.float32)
        n = np.linalg.norm(h)
        return h / n if n > 1e-6 else np.array([0, 1, 0], np.float32)

    def get_right_move_vec(self) -> np.ndarray:
        return self.right_vec()

    def rotation_quat(self) -> np.ndarray:
        """World rotation of the head (heading then pitch)."""
        hh, hp = self.heading / 2, self.pitch / 2
        qz = np.array([0, 0, math.sin(hh), math.cos(hh)], np.float32)
        qx = np.array([math.sin(hp), 0, 0, math.cos(hp)], np.float32)
        x1, y1, z1, w1 = qz
        x2, y2, z2, w2 = qx
        return np.array([
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2], np.float32)

    def camera_position(self, physics_world=None) -> np.ndarray:
        """Effective camera position: eye for first-person; boomed-back for
        third-person, shortened by an obstruction ray (the tick's
        third-person camera trace)."""
        if self.mode != CameraMode.THIRD_PERSON:
            return self.eye_pos.copy()
        back = -self.forward_vec()
        if self.selfie_mode:
            back = -back
        dist = self.third_person_dist
        if physics_world is not None:
            hit, t, n, ob, mat = physics_world.trace_ray(
                self.eye_pos.astype(np.float32), back.astype(np.float32),
                dist, n_steps=8)
            if hit:
                dist = max(t - 0.2, self.THIRD_PERSON_DIST_MIN)
        return self.eye_pos + back.astype(np.float64) * dist

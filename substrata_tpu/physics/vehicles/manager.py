"""Batched vehicle controllers.

Reference behaviours (all constants cited from /root/reference):

- **Car** (gui_client/CarPhysics.cpp): Jolt WheeledVehicleController with
  per-wheel suspension spring freq/damping, friction-curve scaled
  longitudinal/lateral grip, steering relax 3/s (CarPhysics.cpp:299-345),
  righting torque controller matching a desired angular velocity
  (CarPhysics.cpp:360-395).  Here: 4 suspension raycasts + spring/damper +
  velocity-kill tyre impulses clamped by a friction circle — the standard
  raycast-car formulation, batched over vehicles.
- **Bike** (gui_client/BikePhysics.cpp): motorcycle with a lean controller
  (enable on mount, BikePhysics.cpp:491-492), brake limiting while leaning
  (435), steering smoothing.  Here: 2-wheel raycast bike + PD lean-torque
  controller toward the centripetal-balance lean angle.
- **Boat** (gui_client/BoatPhysics.cpp:130-330): propeller thrust at
  propellor_point_os when submerged, thrust vectoring, rudder deflection
  force = right * -input * forward_vel * factor at the propeller point,
  quadratic water drag with per-axis cross-sectional areas and drag
  coefficients 0.1/0.5/0.75, buoyancy from the world pass with
  use_zero_linear_drag.
- **HoverCar** (gui_client/HoverCarPhysics.cpp:140-330): hover force
  up_vec*(1+up*0.6)/max(0.7,cos_theta)*m*g when not flipped, unflip impulse
  window, forward force m*10*input, extra up compensation, pitch/yaw/roll
  control torques (m*-0.5, m*-3, m*2), keep-upright controller
  (desired_angvel = axis*angle*3, torque = (desired-angvel)*m*1.5), air
  drag with areas 2/4/8 and C_d 0.2/0.5/0.75, lift C_L=2 within 25 deg.

All vehicles update in ONE jitted pass over SoA vehicle arrays producing
chassis velocity deltas, applied in a single scatter before the world step
(tick ordering: vehicle controllers run before physics_world think,
GUIClient.cpp:6418-6430).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from substrata_tpu.maths import quat as quatm
from substrata_tpu.maths import transform as tmath
from substrata_tpu.physics import queries
from substrata_tpu.physics.state import BodyState, SimConfig, SimParams, StaticWorld

VEHICLE_CAR = 0
VEHICLE_BIKE = 1
VEHICLE_BOAT = 2
VEHICLE_HOVER = 3

MAX_WHEELS = 4

# --- Drivetrain constants (Jolt 5.3 defaults: the reference builds its
# WheeledVehicleController with default engine curve / transmission /
# differential settings and only overrides MaxTorque + MaxRPM,
# CarPhysics.cpp:188-216) ---
GEAR_RATIOS = np.array([2.66, 1.78, 1.30, 1.0, 0.74], np.float32)
REVERSE_GEAR_RATIO = -2.90
DIFF_RATIO = 3.42              # VehicleDifferentialSettings::mDifferentialRatio
LEFT_RIGHT_SPLIT = 0.5         # open differential torque split
SHIFT_UP_RPM = 4000.0          # VehicleTransmissionSettings::mShiftUpRPM
SHIFT_DOWN_RPM = 2000.0
SHIFT_SWITCH_TIME = 0.5        # clutch disengaged while shifting (s)
ENGINE_MIN_RPM = 1000.0
# Bike drivetrain is HARDCODED in the reference regardless of script
# settings (BikePhysics.cpp:211-222): 390 Nm engine ("approximately the
# smallest value that allows wheelies"), 10000 max RPM, 6 bicycle-derived
# gear ratios, 9000/5000 shift points, 0.2 s switch time.
BIKE_ENGINE_TORQUE = 390.0
BIKE_ENGINE_MAX_RPM = 10000.0
BIKE_GEAR_RATIOS = np.array([2.27, 1.63, 1.30, 1.09, 0.96, 0.88], np.float32)
BIKE_SHIFT_UP_RPM = 9000.0
BIKE_SHIFT_DOWN_RPM = 5000.0
BIKE_SHIFT_SWITCH_TIME = 0.2
# Car gear table padded to the bike table's length so the per-type select
# is a where over two same-shape constants.
_CAR_GEARS_PAD = np.array([2.66, 1.78, 1.30, 1.0, 0.74, 0.74], np.float32)
# Normalised engine torque curve points (VehicleEngineSettings default):
# fraction-of-max-RPM -> torque fraction.
ENGINE_CURVE_X = np.array([0.0, 0.66, 1.0], np.float32)
ENGINE_CURVE_Y = np.array([0.8, 1.0, 0.8], np.float32)
# Longitudinal slip-ratio friction curve Y values (WheelSettingsWV
# default: peak 1.2 near 6% slip, sliding 1.0 past 20%); the script's
# longitudinal_friction_factor scales these (CarPhysics.cpp:177-180).
LONG_MU_PEAK = 1.2
LONG_MU_SLIDE = 1.0
# Bike tyres use ABSOLUTE longitudinal curve values 15/8/3
# (BikePhysics.cpp:184-187 overwrites the points), modelled two-regime as
# peak 8 (the optimal-slip point) / slide 3, and lateral default curve
# scaled by (5, 3, 2) (BikePhysics.cpp:189-191).
BIKE_LONG_MU_PEAK = 8.0
BIKE_LONG_MU_SLIDE = 3.0
# Lateral slip-angle curve (degrees -> mu), scaled by
# lateral_friction_factor (CarPhysics.cpp:182-185).
LAT_CURVE_DEG = np.array([0.0, 3.0, 20.0], np.float32)
LAT_CURVE_MU = np.array([0.0, 1.2, 1.0], np.float32)
BIKE_LAT_CURVE_MU = np.array([0.0, 3.6, 2.0], np.float32)
WHEEL_INERTIA = 0.9            # WheelSettings::mInertia default (kg m^2)
RPM_PER_RAD_S = 60.0 / (2.0 * np.pi)


@dataclass
class VehicleSettings:
    """Host-side settings (mirrors Scripting.h VehicleScriptedSettings
    subclasses: CarScriptSettings:149-177, BikeScriptSettings:135,
    BoatScriptSettings:97-120, HoverCarScriptSettings:83)."""

    vehicle_type: int = VEHICLE_CAR
    model_to_y_forwards_rot: np.ndarray = field(
        default_factory=lambda: np.array([0, 0, 0, 1], np.float32))
    # Wheels (car: FL, FR, RL, RR; bike: front, rear) in object space.
    wheel_attach_os: np.ndarray = field(
        default_factory=lambda: np.array(
            [[-0.8, 1.2, -0.2], [0.8, 1.2, -0.2],
             [-0.8, -1.2, -0.2], [0.8, -1.2, -0.2]], np.float32))
    wheel_radius: float = 0.35
    suspension_min_length: float = 0.1
    suspension_max_length: float = 0.5
    suspension_spring_freq: float = 2.0     # Hz (Jolt default 1.5-2)
    suspension_spring_damping: float = 0.5  # damping ratio
    max_steering_angle: float = 0.6         # rad
    engine_max_torque: float = 500.0        # Nm at the crank (Scripting.cpp:339)
    engine_max_rpm: float = 6000.0          # rev limit (Scripting.cpp:340)
    max_brake_torque: float = 1500.0
    max_handbrake_torque: float = 4000.0
    # Friction-curve SCALE FACTORS (CarPhysics.cpp:177-185 multiplies the Y
    # values of Jolt's default slip curves by these; 1.0 = stock tyres,
    # Scripting.cpp:346-347 defaults).
    longitudinal_friction_factor: float = 1.0
    lateral_friction_factor: float = 1.0
    steering_relax_rate: float = 3.0        # rad/s (CarPhysics steering relax)
    # Bike
    lean_spring: float = 30.0
    lean_damping: float = 8.0
    # Boat (BoatScriptSettings)
    thrust_force: float = 20000.0
    propellor_point_os: np.ndarray = field(
        default_factory=lambda: np.array([0, -2.0, -0.3], np.float32))
    rudder_deflection_force_factor: float = 500.0
    thrust_vector_lateral_amount: float = 0.3
    front_cross_sectional_area: float = 1.5
    side_cross_sectional_area: float = 4.0
    top_cross_sectional_area: float = 8.0


@flax.struct.dataclass
class VehicleArrays:
    """Device SoA for all registered vehicles (capacity V)."""

    vtype: jnp.ndarray            # [V] i32
    body_slot: jnp.ndarray        # [V] i32 chassis body
    y_fwd_quat: jnp.ndarray       # [V, 4] model -> y-forward rotation
    wheel_attach: jnp.ndarray     # [V, 4, 3]
    wheel_radius: jnp.ndarray     # [V]
    n_wheels: jnp.ndarray         # [V] i32
    sus_min: jnp.ndarray          # [V]
    sus_max: jnp.ndarray          # [V]
    spring_freq: jnp.ndarray      # [V]
    spring_damping: jnp.ndarray   # [V]
    max_steer: jnp.ndarray        # [V]
    engine_torque: jnp.ndarray    # [V]
    engine_max_rpm: jnp.ndarray   # [V]
    brake_torque: jnp.ndarray     # [V]
    handbrake_torque: jnp.ndarray  # [V]
    mu_long: jnp.ndarray          # [V]
    mu_lat: jnp.ndarray           # [V]
    steer_relax: jnp.ndarray      # [V]
    lean_spring: jnp.ndarray      # [V]
    lean_damping: jnp.ndarray     # [V]
    thrust_force: jnp.ndarray     # [V]
    propellor_os: jnp.ndarray     # [V, 3]
    rudder_factor: jnp.ndarray    # [V]
    thrust_lateral: jnp.ndarray   # [V]
    areas: jnp.ndarray            # [V, 3] front/side/top
    active: jnp.ndarray           # [V] bool (user in driver seat)
    # Mutable controller state
    steering: jnp.ndarray         # [V] current smoothed steering angle
    prev_sus_len: jnp.ndarray     # [V, 4]
    wheel_omega: jnp.ndarray      # [V, 4] wheel spin for graphics/audio
    wheel_rot: jnp.ndarray        # [V, 4]
    unflip_time: jnp.ndarray      # [V] unflip window remaining
    righting_active: jnp.ndarray  # [V] bool
    wheel_contact: jnp.ndarray    # [V, 4] bool (for particles/audio)
    gear: jnp.ndarray             # [V] i32 current forward gear (0-based)
    shift_timer: jnp.ndarray      # [V] f32 clutch-disengaged time left
    engine_rpm: jnp.ndarray       # [V] f32 (drives engine-audio pitch)


def zero_vehicles(capacity: int = 32) -> VehicleArrays:
    f = jnp.float32
    v = capacity
    return VehicleArrays(
        vtype=jnp.zeros((v,), jnp.int32),
        body_slot=jnp.full((v,), -1, jnp.int32),
        y_fwd_quat=quatm.identity((v,)),
        wheel_attach=jnp.zeros((v, 4, 3), f),
        wheel_radius=jnp.full((v,), 0.35, f),
        n_wheels=jnp.zeros((v,), jnp.int32),
        sus_min=jnp.full((v,), 0.1, f),
        sus_max=jnp.full((v,), 0.5, f),
        spring_freq=jnp.full((v,), 2.0, f),
        spring_damping=jnp.full((v,), 0.5, f),
        max_steer=jnp.full((v,), 0.6, f),
        engine_torque=jnp.full((v,), 500.0, f),
        engine_max_rpm=jnp.full((v,), 6000.0, f),
        brake_torque=jnp.full((v,), 1500.0, f),
        handbrake_torque=jnp.full((v,), 4000.0, f),
        mu_long=jnp.full((v,), 1.0, f),
        mu_lat=jnp.full((v,), 1.0, f),
        steer_relax=jnp.full((v,), 3.0, f),
        lean_spring=jnp.full((v,), 30.0, f),
        lean_damping=jnp.full((v,), 8.0, f),
        thrust_force=jnp.full((v,), 20000.0, f),
        propellor_os=jnp.zeros((v, 3), f),
        rudder_factor=jnp.full((v,), 500.0, f),
        thrust_lateral=jnp.full((v,), 0.3, f),
        areas=jnp.ones((v, 3), f),
        active=jnp.zeros((v,), bool),
        steering=jnp.zeros((v,), f),
        prev_sus_len=jnp.full((v, 4), 0.5, f),
        wheel_omega=jnp.zeros((v, 4), f),
        wheel_rot=jnp.zeros((v, 4), f),
        unflip_time=jnp.zeros((v,), f),
        righting_active=jnp.zeros((v,), bool),
        wheel_contact=jnp.zeros((v, 4), bool),
        gear=jnp.zeros((v,), jnp.int32),
        shift_timer=jnp.zeros((v,), f),
        engine_rpm=jnp.full((v,), ENGINE_MIN_RPM, f),
    )


@flax.struct.dataclass
class VehicleInputs:
    """Per-vehicle control inputs (PlayerPhysicsInput bitflag parity —
    gui_client/PlayerPhysicsInput.h; also replayed for remote vehicles from
    last_physics_input_bitflags, VehiclePhysics.h:79)."""

    forward: jnp.ndarray    # [V] -1..1 (W/S)
    right: jnp.ndarray      # [V] -1..1 (D/A)
    up: jnp.ndarray         # [V] 0..1 (space — hover lift / jump)
    brake: jnp.ndarray      # [V] bool
    handbrake: jnp.ndarray  # [V] bool


# PlayerPhysicsInput bitflags (wire parity for remote replay).
BF_W, BF_S, BF_A, BF_D, BF_SPACE, BF_C, BF_LEFT, BF_RIGHT, BF_UP, BF_DOWN, BF_B = (
    1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024)


@dataclass
class VehiclePhysicsInput:
    forward: float = 0.0
    right: float = 0.0
    up: float = 0.0
    brake: bool = False
    handbrake: bool = False

    @classmethod
    def from_bitflags(cls, bf: int):
        fwd = (1.0 if bf & (BF_W | BF_UP) else 0.0) - (1.0 if bf & (BF_S | BF_DOWN) else 0.0)
        right = (1.0 if bf & (BF_D | BF_RIGHT) else 0.0) - (1.0 if bf & (BF_A | BF_LEFT) else 0.0)
        return cls(forward=fwd, right=right, up=1.0 if bf & BF_SPACE else 0.0,
                   brake=bool(bf & BF_C), handbrake=bool(bf & BF_B))

    def to_bitflags(self) -> int:
        bf = 0
        if self.forward > 0.5: bf |= BF_W
        if self.forward < -0.5: bf |= BF_S
        if self.right > 0.5: bf |= BF_D
        if self.right < -0.5: bf |= BF_A
        if self.up > 0.5: bf |= BF_SPACE
        if self.brake: bf |= BF_C
        if self.handbrake: bf |= BF_B
        return bf


def _righting_torque_dv(up_ws, quat, angvel, mass, inv_inertia_w, y_fwd_quat, dt,
                        gain_vel=3.0, gain_torque=1.5):
    """Keep-upright controller (HoverCarPhysics.cpp:215-240, CarPhysics
    righting ~360-395): desired angular velocity = axis*angle*gain toward
    upright-with-current-yaw; torque = (desired - angvel) * mass * gain."""
    right_ws = quatm.rotate_vec(quat, quatm.rotate_vec(quatm.conjugate(y_fwd_quat),
                                                       jnp.array([1.0, 0.0, 0.0])))
    yaw = jnp.arctan2(right_ws[1], right_ws[0])
    desired_rot = quatm.mul(quatm.from_axis_angle(jnp.array([0.0, 0.0, 1.0]), yaw),
                            y_fwd_quat)
    cur_to_desired = quatm.mul(desired_rot, quatm.conjugate(quat))
    axis, angle = quatm.to_axis_angle(cur_to_desired)
    desired_w = axis * angle * gain_vel
    torque = (desired_w - angvel) * mass * gain_torque
    return jnp.einsum("ij,j->i", inv_inertia_w, torque) * dt


def _vehicle_update_one(vt, active, body_pos, body_quat, body_lin, body_ang,
                        mass, inv_inertia_w, inp_fwd, inp_right, inp_up,
                        inp_brake, inp_handbrake,
                        y_fwd_quat, wheel_attach, wheel_radius, n_wheels,
                        sus_min, sus_max, spring_freq, spring_damping,
                        max_steer, engine_torque, engine_max_rpm,
                        brake_torque, handbrake_torque,
                        mu_long, mu_lat, steer_relax, lean_spring, lean_damping,
                        thrust_force, propellor_os, rudder_factor, thrust_lateral,
                        areas, steering, prev_sus_len, wheel_omega, wheel_rot,
                        unflip_time, righting_active, gear, shift_timer,
                        wheel_hit_t, wheel_hit_n, wheel_hit_ok,
                        water_z, dt):
    """Per-vehicle force computation (scalar over one vehicle; vmapped).

    wheel_hit_* come from the batched suspension raycast done outside.
    Returns (dv, dw, new_steering, new_prev_len, new_omega, new_rot,
    new_unflip, wheel_contact).
    """
    # Frame vectors: model space -> world, via y-forward convention
    # (BoatPhysics.cpp:146-166).
    inv_yq = quatm.conjugate(y_fwd_quat)
    fwd_os = quatm.rotate_vec(inv_yq, jnp.array([0.0, 1.0, 0.0]))
    right_os = quatm.rotate_vec(inv_yq, jnp.array([1.0, 0.0, 0.0]))
    up_os = jnp.cross(right_os, fwd_os)
    fwd_w = quatm.rotate_vec(body_quat, fwd_os)
    right_w = quatm.rotate_vec(body_quat, right_os)
    up_w = quatm.rotate_vec(body_quat, up_os)

    dv = jnp.zeros(3)
    dw = jnp.zeros(3)

    def add_force_at(dv, dw, force, point):
        dv = dv + force * (dt / mass)
        tau = jnp.cross(point - body_pos, force)
        dw = dw + jnp.einsum("ij,j->i", inv_inertia_w, tau) * dt
        return dv, dw

    def add_torque(dw, tau):
        return dw + jnp.einsum("ij,j->i", inv_inertia_w, tau) * dt

    is_wheeled = (vt == VEHICLE_CAR) | (vt == VEHICLE_BIKE)

    # --- Steering smoothing (CarPhysics steering relax 3/s) ---
    target_steer = -inp_right * max_steer
    steer_delta = jnp.clip(target_steer - steering, -steer_relax * dt, steer_relax * dt)
    new_steering = jnp.where(is_wheeled & active, steering + steer_delta, 0.0)

    # --- Wheeled vehicles: suspension + tyres ---
    wheel_idx = jnp.arange(MAX_WHEELS)
    wheel_on = wheel_idx < n_wheels
    attach_w = body_pos + quatm.rotate_vec(body_quat[None, :], wheel_attach)
    sus_dir = -up_w  # suspension points down in vehicle frame

    ray_len = sus_max + wheel_radius
    hit = wheel_hit_ok & wheel_on & (wheel_hit_t <= ray_len)
    sus_len = jnp.clip(wheel_hit_t - wheel_radius, sus_min, sus_max)
    compression = sus_max - sus_len
    comp_rate = (prev_sus_len - sus_len) / dt

    m_quarter = mass / jnp.maximum(n_wheels.astype(jnp.float32), 1.0)
    k = m_quarter * (2 * jnp.pi * spring_freq) ** 2
    c = spring_damping * 2.0 * jnp.sqrt(k * m_quarter)
    f_spring = jnp.maximum(k * compression + c * comp_rate, 0.0)  # [4]
    load = jnp.where(hit, f_spring, 0.0)

    contact_pt = attach_w + sus_dir[None, :] * wheel_hit_t[:, None]
    n_g = wheel_hit_n  # [4,3] ground normals

    # Front wheels steer (wheels 0,1 for car; wheel 0 for bike).
    is_front = jnp.where(vt == VEHICLE_BIKE, wheel_idx == 0, wheel_idx < 2)
    ca, sa = jnp.cos(new_steering), jnp.sin(new_steering)
    wheel_fwd = jnp.where(is_front[:, None],
                          fwd_w[None, :] * ca - right_w[None, :] * sa,
                          jnp.broadcast_to(fwd_w, (4, 3)))
    # Project into contact plane.
    wfl = wheel_fwd - n_g * jnp.sum(wheel_fwd * n_g, -1, keepdims=True)
    wfl = wfl / jnp.maximum(jnp.linalg.norm(wfl, axis=-1, keepdims=True), 1e-6)
    wlat = jnp.cross(n_g, wfl)

    # Contact point velocity.
    v_cp = body_lin[None, :] + jnp.cross(jnp.broadcast_to(body_ang, (4, 3)),
                                         contact_pt - body_pos[None, :])
    v_long = jnp.sum(v_cp * wfl, -1)
    v_lat = jnp.sum(v_cp * wlat, -1)

    # --- Drivetrain: engine curve -> auto transmission -> differential
    # (CarPhysics.cpp:188-216; Jolt 5.3 default ratios/curves, module
    # constants above).  Front-wheel drive for cars (mDifferentials[0] =
    # wheels 0,1, CarPhysics.cpp:195-198); rear wheel for bikes. ---
    driven = jnp.where(vt == VEHICLE_BIKE, wheel_idx == 1, wheel_idx < 2)
    # Transmission sees the CHASSIS forward speed through the ratio, not
    # spun-up wheel omega or contact-point velocity — wheelspin (or
    # suspension-settle pitch bounce at the contact offsets) feeding the
    # shift logic causes phantom upshift/clutch-out/downshift cycling;
    # Jolt avoids it with a separate clutch-coupled engine ODE, we avoid
    # it kinematically.
    speed_fwd_body = jnp.sum(body_lin * fwd_w)
    omega_avg = jnp.abs(speed_fwd_body) / wheel_radius
    in_reverse = (inp_fwd < -0.01) & (speed_fwd_body < 0.5)
    # Reverse input while rolling forward = brake, not reverse drive.
    brake_from_input = (inp_fwd < -0.01) & (speed_fwd_body >= 0.5)

    # Per-type transmission constants (the bike table is hardcoded in the
    # reference, BikePhysics.cpp:218-222).
    is_bike = vt == VEHICLE_BIKE
    gear_table = jnp.where(is_bike, jnp.asarray(BIKE_GEAR_RATIOS),
                           jnp.asarray(_CAR_GEARS_PAD))
    max_gear = jnp.where(is_bike, BIKE_GEAR_RATIOS.shape[0] - 1,
                         GEAR_RATIOS.shape[0] - 1)
    shift_up_rpm = jnp.where(is_bike, BIKE_SHIFT_UP_RPM, SHIFT_UP_RPM)
    shift_down_rpm = jnp.where(is_bike, BIKE_SHIFT_DOWN_RPM, SHIFT_DOWN_RPM)
    switch_time = jnp.where(is_bike, BIKE_SHIFT_SWITCH_TIME, SHIFT_SWITCH_TIME)

    ratio_fwd = jnp.sum(jax.nn.one_hot(gear, BIKE_GEAR_RATIOS.shape[0])
                        * gear_table)             # no dynamic [ax] under vmap
    ratio = jnp.where(in_reverse, REVERSE_GEAR_RATIO, ratio_fwd) * DIFF_RATIO
    rpm_raw = jnp.abs(omega_avg) * jnp.abs(ratio) * RPM_PER_RAD_S
    new_rpm = jnp.clip(rpm_raw, ENGINE_MIN_RPM, engine_max_rpm)

    # Auto shift with clutch time (mShiftUpRPM/mShiftDownRPM/mSwitchTime).
    can_shift = shift_timer <= 0.0
    shift_up = (can_shift & ~in_reverse & (rpm_raw > shift_up_rpm)
                & (gear < max_gear))
    shift_down = can_shift & ~in_reverse & (rpm_raw < shift_down_rpm) & (gear > 0)
    new_gear = gear + shift_up.astype(jnp.int32) - shift_down.astype(jnp.int32)
    new_shift_timer = jnp.where(shift_up | shift_down, switch_time,
                                jnp.maximum(shift_timer - dt, 0.0))
    clutch_engaged = shift_timer <= 0.0

    throttle = jnp.abs(inp_fwd)
    t_norm = jnp.interp(new_rpm / jnp.maximum(engine_max_rpm, 1.0),
                        jnp.asarray(ENGINE_CURVE_X), jnp.asarray(ENGINE_CURVE_Y))
    t_norm = jnp.where(rpm_raw >= engine_max_rpm, 0.0, t_norm)  # rev limiter
    t_engine = engine_torque * t_norm * throttle
    # Per driven wheel: crank torque through gear+diff, split left/right.
    t_wheel = t_engine * ratio * jnp.where(vt == VEHICLE_BIKE, 1.0,
                                           LEFT_RIGHT_SPLIT)
    driving = clutch_engaged & ~brake_from_input & (throttle > 0.01)
    f_drive = jnp.where(driven & hit & driving, t_wheel / wheel_radius, 0.0)

    # Brakes only on brake input (space; CarPhysics.cpp:312 — releasing
    # the throttle does NOT brake).  Coasting applies engine braking
    # through the drivetrain instead: drag torque = engine angular damping
    # x engine inertia x engine omega (Jolt VehicleEngineSettings defaults
    # 0.2 / 0.5), through the gear ratio to the driven wheels.
    braking = inp_brake | brake_from_input
    coasting = (jnp.abs(inp_fwd) < 0.01) & clutch_engaged
    engine_omega = new_rpm / RPM_PER_RAD_S
    f_eng_brake_cap = jnp.where(driven & coasting,
                                0.2 * 0.5 * engine_omega * jnp.abs(ratio)
                                / wheel_radius, 0.0)
    f_brake_cap = jnp.where(inp_handbrake & (wheel_idx >= 2), handbrake_torque,
                            jnp.where(braking, brake_torque, 0.0)) / wheel_radius
    f_brake_cap = f_brake_cap + f_eng_brake_cap
    # Brake force opposes rolling, capped so it kills v_long at most.
    f_brake = -jnp.sign(v_long) * jnp.minimum(f_brake_cap,
                                              jnp.abs(v_long) * m_quarter / dt)
    f_long_want = f_drive + jnp.where(hit, f_brake, 0.0)
    # Lateral: impulse to kill sideways contact velocity.
    f_lat_want = -v_lat * m_quarter / dt

    # --- Tyre friction curves (WheelSettingsWV defaults, Y values scaled
    # by the script factors — CarPhysics.cpp:177-185).  Longitudinal:
    # two-regime slip-ratio curve (peak grip 1.2 until demand exceeds it,
    # then sliding at 1.0); lateral: slip-angle curve in degrees. ---
    mu_pk = jnp.where(is_bike, BIKE_LONG_MU_PEAK, LONG_MU_PEAK * mu_long)
    mu_sl = jnp.where(is_bike, BIKE_LONG_MU_SLIDE, LONG_MU_SLIDE * mu_long)
    f_peak = mu_pk * load
    f_slide = mu_sl * load
    spinning = jnp.abs(f_long_want) > f_peak
    f_long_max = jnp.where(spinning, f_slide, f_peak)
    f_long = jnp.clip(f_long_want, -f_long_max, f_long_max)
    slip_angle_deg = jnp.degrees(jnp.arctan2(
        jnp.abs(v_lat), jnp.maximum(jnp.abs(v_long), 0.3)))
    lat_mu_curve = jnp.where(is_bike, jnp.asarray(BIKE_LAT_CURVE_MU),
                             jnp.asarray(LAT_CURVE_MU) * mu_lat)
    mu_lat_eff = jnp.interp(slip_angle_deg, jnp.asarray(LAT_CURVE_DEG),
                            lat_mu_curve)
    f_lat = jnp.clip(f_lat_want, -mu_lat_eff * load, mu_lat_eff * load)

    def wheel_forces(dv, dw):
        for wi in range(MAX_WHEELS):
            force = (sus_dir * (-f_spring[wi])
                     + wfl[wi] * f_long[wi] + wlat[wi] * f_lat[wi])
            force = jnp.where(hit[wi], force, jnp.zeros(3))
            dv, dw = add_force_at(dv, dw, force, contact_pt[wi])
        return dv, dw

    dv_wh, dw_wh = wheel_forces(jnp.zeros(3), jnp.zeros(3))
    use_wheels = is_wheeled
    dv = dv + jnp.where(use_wheels, dv_wh, 0.0)
    dw = dw + jnp.where(use_wheels, dw_wh, 0.0)

    # Bike lean controller (BikePhysics lean controller; enabled while
    # driven): PD toward centripetal-balance lean angle.
    speed_fwd = jnp.sum(body_lin * fwd_w)
    wheelbase = jnp.maximum(jnp.abs(wheel_attach[0, 1] - wheel_attach[1, 1]), 0.5)
    yaw_rate_target = speed_fwd * jnp.tan(new_steering) / wheelbase
    lean_target = jnp.arctan2(speed_fwd * yaw_rate_target, 9.81)
    lean_target = jnp.clip(lean_target, -0.9, 0.9)
    # Current lean: angle of up vector about the forward axis.
    lean_cur = jnp.arctan2(jnp.sum(jnp.cross(jnp.array([0.0, 0.0, 1.0]), up_w) * fwd_w),
                           up_w[2])
    lean_rate = jnp.sum(body_ang * fwd_w)
    lean_tau = fwd_w * ((lean_target - lean_cur) * lean_spring - lean_rate * lean_damping) * mass * 0.1
    dw = dw + jnp.where((vt == VEHICLE_BIKE) & active,
                        add_torque(jnp.zeros(3), lean_tau), 0.0)

    # --- Boat (BoatPhysics.cpp:175-262) ---
    prop_w = body_pos + quatm.rotate_vec(body_quat, propellor_os)
    prop_submerged = prop_w[2] <= water_z
    thrust_dir = fwd_w - up_w * 0.2 - right_w * (inp_right * thrust_lateral)
    thrust_dir = thrust_dir / jnp.maximum(jnp.linalg.norm(thrust_dir), 1e-6)
    f_thrust = thrust_dir * (thrust_force * inp_fwd)
    dv_b, dw_b = add_force_at(jnp.zeros(3), jnp.zeros(3), f_thrust, prop_w)
    fwd_vel = jnp.sum(body_lin * fwd_w)
    f_rudder = right_w * (-inp_right * fwd_vel * rudder_factor)
    dv_b2, dw_b2 = add_force_at(dv_b, dw_b, f_rudder, prop_w)
    boat_on = (vt == VEHICLE_BOAT) & active & prop_submerged
    dv = dv + jnp.where(boat_on & (jnp.abs(inp_fwd) > 0), dv_b - 0 * dv_b, 0.0) * 0  # thrust added below
    # (thrust needs the submerged gate; rudder applies whenever steering)
    dv = dv + jnp.where(boat_on, dv_b2, 0.0)
    dw = dw + jnp.where(boat_on, dw_b2, 0.0)

    # Boat water drag (quadratic, per-axis areas; BoatPhysics.cpp:238-262).
    v_mag = jnp.linalg.norm(body_lin)
    nv = body_lin / jnp.maximum(v_mag, 1e-6)
    rho_w = 1020.0
    submerged = body_pos[2] < water_z + 1.0
    proj = jnp.stack([jnp.abs(jnp.sum(nv * fwd_w)) * areas[0] * 0.1,
                      jnp.abs(jnp.sum(nv * right_w)) * areas[1] * 0.5,
                      jnp.abs(jnp.sum(nv * up_w)) * areas[2] * 0.75])
    f_d_mag = 0.5 * rho_w * v_mag * v_mag * jnp.sum(proj)
    f_drag = -nv * f_d_mag
    drag_dv = f_drag * (dt / mass)
    drag_dv = jnp.where(jnp.linalg.norm(drag_dv) > v_mag, -body_lin, drag_dv)
    dv = dv + jnp.where((vt == VEHICLE_BOAT) & submerged & (v_mag > 1e-3), drag_dv, 0.0)

    # --- Hovercar (HoverCarPhysics.cpp:152-240) ---
    cos_theta = up_w[2]
    up_factor = 1.0 / jnp.maximum(0.7, cos_theta)
    hover_f = up_w * ((1.0 + inp_up * 0.6) * up_factor * mass * 9.81)
    hover_f = jnp.where(cos_theta > 0, hover_f, jnp.zeros(3))
    fwd_f = fwd_w * (mass * 10.0 * inp_fwd)
    extra_up = up_w * (-fwd_f[2])
    pitch_tau = right_w * (mass * -0.5 * inp_fwd)
    yaw_tau = up_w * (mass * -3.0 * inp_right)
    roll_tau = fwd_w * (mass * 2.0 * inp_right)
    dv_h = (hover_f + fwd_f + extra_up) * (dt / mass)
    dw_h = add_torque(jnp.zeros(3), pitch_tau + yaw_tau + roll_tau)
    # Keep-upright.
    dw_h = dw_h + _righting_torque_dv(up_w, body_quat, body_ang, mass,
                                      inv_inertia_w, y_fwd_quat, dt)
    # Unflip window (HoverCarPhysics.cpp:165-185).
    new_unflip = jnp.where(unflip_time > 0,
                           jnp.where(cos_theta > 0.2, -1.0, unflip_time - dt),
                           jnp.where(cos_theta < -0.9, 1.0, unflip_time))
    unflip_dv = jnp.array([0.0, 0.0, 9.81 * dt])
    dv_h = dv_h + jnp.where((unflip_time > 0) & (cos_theta <= 0.2), unflip_dv, 0.0)
    # Air drag (areas 2/4/8, C_d 0.2/0.5/0.75).
    rho_a = 1.293
    proj_a = jnp.stack([jnp.abs(jnp.sum(nv * fwd_w)) * 2.0 * 0.2,
                        jnp.abs(jnp.sum(nv * right_w)) * 4.0 * 0.5,
                        jnp.abs(jnp.sum(nv * up_w)) * 8.0 * 0.75])
    f_ad = -nv * (0.5 * rho_a * v_mag * v_mag * jnp.sum(proj_a))
    dv_h = dv_h + jnp.where(v_mag > 1e-3, f_ad * (dt / mass), 0.0)
    hover_on = (vt == VEHICLE_HOVER) & active
    dv = dv + jnp.where(hover_on, dv_h, 0.0)
    dw = dw + jnp.where(hover_on, dw_h, 0.0)
    new_unflip = jnp.where(hover_on, new_unflip, unflip_time)

    # --- Righting (user-requested, car/bike: CarPhysics ~360-395) ---
    dw_right = _righting_torque_dv(up_w, body_quat, body_ang, mass,
                                   inv_inertia_w, y_fwd_quat, dt)
    dw = dw + jnp.where(righting_active & is_wheeled, dw_right, 0.0)

    # Wheel spin state: rolls with the ground while gripping; spins up from
    # excess drive torque past the friction peak (wheelspin); relaxes in
    # the air.  Capped at the rev limit through the current total ratio.
    excess_tau = jnp.maximum(jnp.abs(f_long_want) - f_slide, 0.0) * wheel_radius
    omega_spin = wheel_omega + jnp.sign(f_long_want) * excess_tau / WHEEL_INERTIA * dt
    omega_cap = (engine_max_rpm / RPM_PER_RAD_S) / jnp.maximum(jnp.abs(ratio), 0.1)
    omega_spin = jnp.clip(omega_spin, -omega_cap, omega_cap)
    new_omega = jnp.where(hit & spinning & driven, omega_spin,
                          jnp.where(hit, v_long / wheel_radius,
                                    wheel_omega * 0.95))
    new_rot = wheel_rot + new_omega * dt
    new_gear = jnp.where(is_wheeled & active, new_gear, gear)
    new_shift_timer = jnp.where(is_wheeled, new_shift_timer, shift_timer)
    new_rpm = jnp.where(is_wheeled, new_rpm, 0.0)

    gate = active | (vt == VEHICLE_HOVER) | is_wheeled  # wheels settle even riderless
    dv = jnp.where(gate, dv, 0.0)
    dw = jnp.where(gate, dw, 0.0)
    return (dv, dw, new_steering, sus_len, new_omega, new_rot, new_unflip,
            hit, new_gear, new_shift_timer, new_rpm)


@partial(jax.jit, static_argnames=("config",))
def vehicles_update(veh: VehicleArrays, inputs: VehicleInputs, body: BodyState,
                    world: StaticWorld, dt, params: SimParams,
                    config: SimConfig, table=None):
    """Batched update of every vehicle: suspension raycasts for all wheels of
    all vehicles in one trace_rays call, then vmapped force models.

    Returns (new_veh, dv [V,3], dw [V,3], slots [V]) — the host applies the
    velocity deltas in one scatter.
    """
    v = veh.vtype.shape[0]
    dt = jnp.asarray(dt, jnp.float32)
    slots = jnp.maximum(veh.body_slot, 0)
    has_body = veh.body_slot >= 0

    pos = body.pos[slots]
    quat = body.quat[slots]
    lin = body.linvel[slots]
    ang = body.angvel[slots]
    mass = 1.0 / jnp.maximum(body.inv_mass[slots], 1e-9)
    iw = tmath.world_inv_inertia(quat, body.inv_inertia[slots])

    # Batched wheel rays: [V*4] rays.
    inv_yq = quatm.conjugate(veh.y_fwd_quat)
    up_os = jnp.cross(quatm.rotate_vec(inv_yq, jnp.array([1.0, 0.0, 0.0])),
                      quatm.rotate_vec(inv_yq, jnp.array([0.0, 1.0, 0.0])))
    up_w = quatm.rotate_vec(quat, up_os)
    attach_w = pos[:, None, :] + quatm.rotate_vec(quat[:, None, :], veh.wheel_attach)
    sus_dir = -up_w
    origins = attach_w.reshape(v * 4, 3)
    dirs = jnp.broadcast_to(sus_dir[:, None, :], (v, 4, 3)).reshape(v * 4, 3)
    ray_len = (veh.sus_max + veh.wheel_radius)
    max_ts = jnp.broadcast_to(ray_len[:, None], (v, 4)).reshape(v * 4)
    exclude = jnp.broadcast_to(slots[:, None], (v, 4)).reshape(v * 4)
    hits = queries.trace_rays(origins, dirs, max_ts, body, world, config,
                              n_steps=4, exclude=exclude, table=table)
    hit_t = hits.t.reshape(v, 4)
    hit_n = hits.normal.reshape(v, 4, 3)
    hit_ok = hits.hit.reshape(v, 4) & has_body[:, None]

    outs = jax.vmap(_vehicle_update_one, in_axes=tuple([0] * 47 + [None, None]))(
        veh.vtype, veh.active, pos, quat, lin, ang, mass, iw,
        inputs.forward, inputs.right, inputs.up, inputs.brake, inputs.handbrake,
        veh.y_fwd_quat, veh.wheel_attach, veh.wheel_radius, veh.n_wheels,
        veh.sus_min, veh.sus_max, veh.spring_freq, veh.spring_damping,
        veh.max_steer, veh.engine_torque, veh.engine_max_rpm,
        veh.brake_torque, veh.handbrake_torque,
        veh.mu_long, veh.mu_lat, veh.steer_relax, veh.lean_spring, veh.lean_damping,
        veh.thrust_force, veh.propellor_os, veh.rudder_factor, veh.thrust_lateral,
        veh.areas, veh.steering, veh.prev_sus_len, veh.wheel_omega, veh.wheel_rot,
        veh.unflip_time, veh.righting_active, veh.gear, veh.shift_timer,
        hit_t, hit_n, hit_ok,
        params.water_z, dt)
    (dv, dw, steering, sus_len, omega, rot, unflip, contact, gear,
     shift_timer, engine_rpm) = outs
    ok = has_body[:, None]
    dv = jnp.where(ok, dv, 0.0)
    dw = jnp.where(ok, dw, 0.0)
    new_veh = veh.replace(steering=steering, prev_sus_len=sus_len,
                          wheel_omega=omega, wheel_rot=rot,
                          unflip_time=unflip, wheel_contact=contact,
                          gear=gear, shift_timer=shift_timer,
                          engine_rpm=engine_rpm)
    return new_veh, dv, dw, veh.body_slot


@partial(jax.jit, donate_argnums=(0,))
def _apply_vehicle_deltas(state: BodyState, slots, dv, dw):
    ok = slots >= 0
    dst = jnp.where(ok, slots, state.pos.shape[0])
    return state.replace(
        linvel=state.linvel.at[dst].add(jnp.where(ok[:, None], dv, 0.0), mode="drop"),
        angvel=state.angvel.at[dst].add(jnp.where(ok[:, None], dw, 0.0), mode="drop"),
        awake=state.awake.at[dst].set(True, mode="drop"),
        sleep_timer=state.sleep_timer.at[dst].set(0.0, mode="drop"),
    )


class VehicleManager:
    """Host registry + per-tick batched update (the reference keeps a
    vehicle_controllers map on GUIClient, GUIClient.h:502-815; update order
    is before physics think, GUIClient.cpp:6418-6430)."""

    def __init__(self, physics_world, capacity: int = 32):
        self.world = physics_world
        self.veh = zero_vehicles(capacity)
        self.controllers: dict[int, "VehiclePhysicsBase"] = {}
        self._free = list(range(capacity - 1, -1, -1))
        self._inputs: dict[int, VehiclePhysicsInput] = {}

    def _register(self, controller: "VehiclePhysicsBase",
                  settings: VehicleSettings, body_ob) -> int:
        if not self._free:
            raise RuntimeError("vehicle capacity reached")
        i = self._free.pop()
        s = settings
        nw = 2 if s.vehicle_type == VEHICLE_BIKE else (
            4 if s.vehicle_type == VEHICLE_CAR else 0)
        wa = np.zeros((4, 3), np.float32)
        wa[: len(s.wheel_attach_os)] = np.asarray(s.wheel_attach_os, np.float32)[:4]
        self.veh = self.veh.replace(
            vtype=self.veh.vtype.at[i].set(s.vehicle_type),
            body_slot=self.veh.body_slot.at[i].set(body_ob.slot),
            y_fwd_quat=self.veh.y_fwd_quat.at[i].set(jnp.asarray(s.model_to_y_forwards_rot)),
            wheel_attach=self.veh.wheel_attach.at[i].set(jnp.asarray(wa)),
            wheel_radius=self.veh.wheel_radius.at[i].set(s.wheel_radius),
            n_wheels=self.veh.n_wheels.at[i].set(nw),
            sus_min=self.veh.sus_min.at[i].set(s.suspension_min_length),
            sus_max=self.veh.sus_max.at[i].set(s.suspension_max_length),
            spring_freq=self.veh.spring_freq.at[i].set(s.suspension_spring_freq),
            spring_damping=self.veh.spring_damping.at[i].set(s.suspension_spring_damping),
            max_steer=self.veh.max_steer.at[i].set(s.max_steering_angle),
            engine_torque=self.veh.engine_torque.at[i].set(s.engine_max_torque),
            engine_max_rpm=self.veh.engine_max_rpm.at[i].set(s.engine_max_rpm),
            brake_torque=self.veh.brake_torque.at[i].set(s.max_brake_torque),
            handbrake_torque=self.veh.handbrake_torque.at[i].set(s.max_handbrake_torque),
            mu_long=self.veh.mu_long.at[i].set(s.longitudinal_friction_factor),
            mu_lat=self.veh.mu_lat.at[i].set(s.lateral_friction_factor),
            steer_relax=self.veh.steer_relax.at[i].set(s.steering_relax_rate),
            lean_spring=self.veh.lean_spring.at[i].set(s.lean_spring),
            lean_damping=self.veh.lean_damping.at[i].set(s.lean_damping),
            thrust_force=self.veh.thrust_force.at[i].set(s.thrust_force),
            propellor_os=self.veh.propellor_os.at[i].set(jnp.asarray(
                np.asarray(s.propellor_point_os, np.float32))),
            rudder_factor=self.veh.rudder_factor.at[i].set(s.rudder_deflection_force_factor),
            thrust_lateral=self.veh.thrust_lateral.at[i].set(s.thrust_vector_lateral_amount),
            areas=self.veh.areas.at[i].set(jnp.asarray(np.array(
                [s.front_cross_sectional_area, s.side_cross_sectional_area,
                 s.top_cross_sectional_area], np.float32))),
            prev_sus_len=self.veh.prev_sus_len.at[i].set(s.suspension_max_length),
        )
        self.controllers[i] = controller
        self._inputs[i] = VehiclePhysicsInput()
        return i

    def remove(self, controller: "VehiclePhysicsBase"):
        i = controller.index
        self.veh = self.veh.replace(body_slot=self.veh.body_slot.at[i].set(-1),
                                    active=self.veh.active.at[i].set(False))
        self.controllers.pop(i, None)
        self._inputs.pop(i, None)
        self._free.append(i)

    def set_input(self, index: int, inp: VehiclePhysicsInput):
        self._inputs[index] = inp

    def set_active(self, index: int, active: bool):
        self.veh = self.veh.replace(active=self.veh.active.at[index].set(bool(active)))

    def set_righting(self, index: int, on: bool):
        self.veh = self.veh.replace(
            righting_active=self.veh.righting_active.at[index].set(bool(on)))

    def update(self, dt: float):
        """One batched controller step; call before world.think(dt)."""
        if not self.controllers:
            return  # no vehicles registered — skip the device pass
        w = self.world
        w._flush()
        v = self.veh.vtype.shape[0]
        f = np.zeros(v, np.float32)
        r = np.zeros(v, np.float32)
        u = np.zeros(v, np.float32)
        br = np.zeros(v, bool)
        hb = np.zeros(v, bool)
        for i, inp in self._inputs.items():
            f[i], r[i], u[i] = inp.forward, inp.right, inp.up
            br[i], hb[i] = inp.brake, inp.handbrake
        inputs = VehicleInputs(forward=jnp.asarray(f), right=jnp.asarray(r),
                               up=jnp.asarray(u), brake=jnp.asarray(br),
                               handbrake=jnp.asarray(hb))
        self.veh, dv, dw, slots = vehicles_update(
            self.veh, inputs, w.state, w.static_world, jnp.float32(dt),
            w.params, w.config)
        w.state = _apply_vehicle_deltas(w.state, slots, dv, dw)
        # Direct state write bypasses the host mutation paths — clear the
        # fully-asleep latch so think() resumes stepping (a driven vehicle
        # in an otherwise-sleeping world must move).
        w._world_asleep = False


class VehiclePhysicsBase:
    """VehiclePhysics interface parity (gui_client/VehiclePhysics.h:30-80)."""

    vehicle_type: int = VEHICLE_CAR

    def __init__(self, manager: VehicleManager, body_ob,
                 settings: VehicleSettings | None = None):
        self.settings = settings or VehicleSettings(vehicle_type=self.vehicle_type)
        self.settings.vehicle_type = self.vehicle_type
        self.manager = manager
        self.body_ob = body_ob
        self.index = manager._register(self, self.settings, body_ob)
        self.user_in_driver_seat = False

    def get_body_id(self):
        return self.body_ob.slot

    def update(self, inp: VehiclePhysicsInput):
        """Queue this vehicle's input for the next batched manager update."""
        self.manager.set_input(self.index, inp)

    def player_entered(self, seat_index: int = 0):
        self.user_in_driver_seat = seat_index == 0
        self.manager.set_active(self.index, self.user_in_driver_seat)

    def player_exited(self):
        self.user_in_driver_seat = False
        self.manager.set_active(self.index, False)

    def start_righting(self):
        self.manager.set_righting(self.index, True)

    def stop_righting(self):
        self.manager.set_righting(self.index, False)

    def get_wheel_state(self):
        i = self.index
        return (np.asarray(self.manager.veh.wheel_rot[i]),
                np.asarray(self.manager.veh.wheel_omega[i]),
                np.asarray(self.manager.veh.wheel_contact[i]),
                np.asarray(self.manager.veh.prev_sus_len[i]))

    def get_doppler_factor(self, listener_pos, listener_vel=None):
        """Doppler from projected source/listener velocities, c=343
        (audio/AudioEngine.cpp:131-146; vehicle hook VehiclePhysics.h)."""
        c = 343.0
        src_pos = np.asarray(self.body_ob.pos, np.float32)
        src_vel = np.asarray(self.body_ob.linvel, np.float32)
        lv = np.zeros(3, np.float32) if listener_vel is None else np.asarray(listener_vel)
        to_listener = np.asarray(listener_pos, np.float32) - src_pos
        d = np.linalg.norm(to_listener)
        if d < 1e-6:
            return 1.0
        dirn = to_listener / d
        vs = float(np.dot(src_vel, dirn))
        vl = float(np.dot(lv, dirn))
        return float(np.clip((c - vl) / max(c - vs, 1e-3), 0.5, 2.0))


class CarPhysics(VehiclePhysicsBase):
    vehicle_type = VEHICLE_CAR


class BikePhysics(VehiclePhysicsBase):
    vehicle_type = VEHICLE_BIKE

    def __init__(self, manager, body_ob, settings=None):
        # The reference hardcodes the bike engine regardless of script
        # settings (BikePhysics.cpp:211-213): 390 Nm ("approximately the
        # smallest value that allows wheelies"), 10000 max RPM.
        settings = settings or VehicleSettings(vehicle_type=VEHICLE_BIKE)
        settings.engine_max_torque = BIKE_ENGINE_TORQUE
        settings.engine_max_rpm = BIKE_ENGINE_MAX_RPM
        super().__init__(manager, body_ob, settings)


class BoatPhysics(VehiclePhysicsBase):
    vehicle_type = VEHICLE_BOAT

    def __init__(self, manager, body_ob, settings=None):
        super().__init__(manager, body_ob, settings)
        # Boats do custom drag; the world buoyancy pass skips linear drag
        # (BoatPhysics.cpp:36 use_zero_linear_drag).
        self.body_ob.use_zero_linear_drag = True
        manager.world._dirty[self.body_ob.slot] = (self.body_ob, True)


class HoverCarPhysics(VehiclePhysicsBase):
    vehicle_type = VEHICLE_HOVER

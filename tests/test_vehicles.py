"""Vehicle controller behavioural tests (reference:
gui_client/{Car,Bike,Boat,HoverCar}Physics.cpp)."""

import numpy as np
import pytest

from substrata_tpu.physics import shapes
from substrata_tpu.physics.state import MotionType, SimConfig
from substrata_tpu.physics.vehicles import (
    BikePhysics, BoatPhysics, CarPhysics, HoverCarPhysics, VehicleManager,
    VehiclePhysicsInput, VehicleSettings,
)
from substrata_tpu.physics.world import PhysicsObject, PhysicsWorld

DT = 1.0 / 60.0


def make_world(**kw):
    cfg = SimConfig(capacity=64, max_pairs=256, grid_dim=16, cell_size=8.0,
                    solver_iters=8)
    w = PhysicsWorld(cfg)
    w.set_ground_plane(0.0)
    return w


def add_chassis(w, pos, he=(0.9, 1.8, 0.4), density=150.0):
    return w.add_object(PhysicsObject(
        shape=shapes.make_box(list(he), density=density),
        pos=np.array(pos, np.float32),
        motion_type=int(MotionType.DYNAMIC),
        friction=0.3))


def drive(w, vm, veh, inp, ticks):
    veh.update(inp)
    for _ in range(ticks):
        vm.update(DT)
        w.think(DT)
    w.sync_transforms()


@pytest.mark.slow
def test_car_settles_on_suspension():
    w = make_world()
    vm = VehicleManager(w)
    chassis = add_chassis(w, [0, 0, 1.0])
    car = CarPhysics(vm, chassis)
    drive(w, vm, car, VehiclePhysicsInput(), 240)
    # Suspension holds the chassis off the ground: wheel attach at z=-0.2,
    # radius 0.35, max sus 0.5 -> chassis centre roughly 0.5-0.9 m.
    assert 0.3 < chassis.pos[2] < 1.2, chassis.pos
    # Chassis is level.
    from substrata_tpu.maths import quat as quatm
    import jax.numpy as jnp
    up = np.asarray(quatm.rotate_vec(jnp.asarray(chassis.rot), jnp.array([0., 0., 1.])))
    assert up[2] > 0.95


def test_car_drives_forward():
    w = make_world()
    vm = VehicleManager(w)
    chassis = add_chassis(w, [0, 0, 0.8])
    car = CarPhysics(vm, chassis)
    car.player_entered(0)
    drive(w, vm, car, VehiclePhysicsInput(forward=1.0), 240)
    # +y is forward with identity model rotation.
    assert chassis.pos[1] > 5.0, chassis.pos
    assert abs(chassis.pos[0]) < 2.0, chassis.pos


def test_car_steers():
    w = make_world()
    vm = VehicleManager(w)
    chassis = add_chassis(w, [0, 0, 0.8])
    car = CarPhysics(vm, chassis)
    car.player_entered(0)
    drive(w, vm, car, VehiclePhysicsInput(forward=1.0, right=0.5), 300)
    # Turned: significant lateral displacement.
    assert abs(chassis.pos[0]) > 1.0, chassis.pos


@pytest.mark.slow
def test_car_brakes():
    w = make_world()
    vm = VehicleManager(w)
    chassis = add_chassis(w, [0, 0, 0.8])
    car = CarPhysics(vm, chassis)
    car.player_entered(0)
    drive(w, vm, car, VehiclePhysicsInput(forward=1.0), 180)
    speed_before = np.linalg.norm(chassis.linvel)
    drive(w, vm, car, VehiclePhysicsInput(forward=0.0, brake=True), 120)
    speed_after = np.linalg.norm(chassis.linvel)
    assert speed_before > 3.0
    assert speed_after < speed_before * 0.3


def test_hovercar_hovers_and_moves():
    w = make_world()
    vm = VehicleManager(w)
    chassis = add_chassis(w, [0, 0, 1.5], density=100.0)
    hover = HoverCarPhysics(vm, chassis)
    hover.player_entered(0)
    drive(w, vm, hover, VehiclePhysicsInput(forward=1.0), 240)
    # Hover force ~ balances gravity; forward force moves it.
    assert chassis.pos[2] > 0.4, chassis.pos
    assert chassis.pos[1] > 4.0, chassis.pos


def test_boat_thrusts_in_water():
    w = make_world()
    w.set_water_buoyancy_enabled(True)
    w.water_z = 0.0
    w.set_ground_plane(-30.0)
    vm = VehicleManager(w)
    hull = w.add_object(PhysicsObject(
        shape=shapes.make_box([1.0, 2.5, 0.6], density=400.0),
        pos=np.array([0, 0, 0.0], np.float32),
        motion_type=int(MotionType.DYNAMIC)))
    boat = BoatPhysics(vm, hull, VehicleSettings(thrust_force=30000.0))
    boat.player_entered(0)
    # Let it settle afloat first.
    drive(w, vm, boat, VehiclePhysicsInput(), 120)
    assert -1.5 < hull.pos[2] < 1.0, hull.pos  # floating near surface
    drive(w, vm, boat, VehiclePhysicsInput(forward=1.0), 300)
    assert hull.pos[1] > 4.0, hull.pos
    assert hull.use_zero_linear_drag  # boats do custom drag


def test_bike_stays_upright_with_lean_controller():
    w = make_world()
    vm = VehicleManager(w)
    frame = w.add_object(PhysicsObject(
        shape=shapes.make_box([0.25, 1.0, 0.5], density=300.0),
        pos=np.array([0, 0, 1.0], np.float32),
        motion_type=int(MotionType.DYNAMIC)))
    settings = VehicleSettings(
        wheel_attach_os=np.array([[0, 0.9, -0.4], [0, -0.9, -0.4]], np.float32),
        wheel_radius=0.3)
    bike = BikePhysics(vm, frame, settings)
    bike.player_entered(0)
    # Settle, then CRUISE throttle: the reference bike engine (390 Nm
    # hardcoded, BikePhysics.cpp:211 "approximately the smallest value
    # that allows wheelies") will wheelie/loop this tall test frame at
    # full throttle from standstill — by design.  The lean controller
    # check wants steady riding, not a stoppie.
    drive(w, vm, bike, VehiclePhysicsInput(), 120)
    drive(w, vm, bike, VehiclePhysicsInput(forward=0.15), 300)
    from substrata_tpu.maths import quat as quatm
    import jax.numpy as jnp
    up = np.asarray(quatm.rotate_vec(jnp.asarray(frame.rot), jnp.array([0., 0., 1.])))
    assert up[2] > 0.8, up  # still upright
    assert frame.pos[1] > 3.0, frame.pos  # moving forward


def test_input_bitflags_roundtrip():
    inp = VehiclePhysicsInput(forward=1.0, right=-1.0, up=1.0, handbrake=True)
    bf = inp.to_bitflags()
    back = VehiclePhysicsInput.from_bitflags(bf)
    assert back.forward == 1.0
    assert back.right == -1.0
    assert back.up == 1.0
    assert back.handbrake


def test_doppler_factor():
    w = make_world()
    vm = VehicleManager(w)
    chassis = add_chassis(w, [0, 0, 0.8])
    car = CarPhysics(vm, chassis)
    chassis.linvel = np.array([0, 20.0, 0], np.float32)
    # Approaching listener ahead -> factor > 1.
    f = car.get_doppler_factor([0, 100, 0])
    assert f > 1.0
    # Receding listener behind -> factor < 1.
    f2 = car.get_doppler_factor([0, -100, 0])
    assert f2 < 1.0


@pytest.mark.slow
def test_car_accel_brake_speed_trace():
    """Car-on-flat acceleration/brake TRACE (VERDICT r2 item 4): record the
    speed profile through throttle -> coast -> brake phases and check the
    dynamics piecewise — monotone-ish spin-up, bounded top speed, brake
    decel much stronger than coast drag, terminal full stop, no lateral
    drift."""
    w = make_world()
    vm = VehicleManager(w)
    chassis = add_chassis(w, [0, 0, 0.8])
    car = CarPhysics(vm, chassis)
    car.player_entered(0)

    def run(inp, ticks):
        speeds = []
        car.update(inp)
        for _ in range(ticks):
            vm.update(DT)
            w.think(DT)
            w.sync_transforms()
            speeds.append(float(np.linalg.norm(chassis.linvel[:2])))
        return np.array(speeds)

    s_thr = run(VehiclePhysicsInput(forward=1.0), 240)    # 4 s throttle
    s_coast = run(VehiclePhysicsInput(), 60)              # 1 s coast
    s_brake = run(VehiclePhysicsInput(brake=True), 180)   # 3 s brake

    # Spin-up: accelerating through the phase (compare 1 s windows).
    assert s_thr[:60].mean() < s_thr[60:120].mean() < s_thr[-60:].mean()
    top = s_thr[-30:].mean()
    assert 5.0 < top < 60.0, top      # plausible road-car envelope
    # Coast: keeps most of its speed over 1 s (drag + engine braking slow
    # it, but it must not stop dead).
    assert s_coast[-1] > 0.6 * top, (s_coast[-1], top)
    # Brake: full stop within 3 s from road speed, and still slowing
    # through the first braking second.
    assert s_brake[-1] < 0.3, s_brake[-1]
    assert s_brake[59] < s_coast[-1], (s_brake[59], s_coast[-1])
    # Straight line: no lateral drift while driving +y.
    assert abs(chassis.pos[0]) < 2.0, chassis.pos


@pytest.mark.slow
def test_car_trajectory_matches_scripted_settings_oracle():
    """Drivetrain oracle (VERDICT r3 item 5): integrate an INDEPENDENT 1-D
    longitudinal model from the car's script constants — engine curve +
    auto gearbox + differential + tyre slip curves + front-axle weight
    transfer — and require the 3-D sim to match it, plus the exactly
    derivable 1st->2nd shift speed.

    Constants under test (manager.py module constants = Jolt 5.3 defaults
    the reference leaves in place, CarPhysics.cpp:188-216):
      gears [2.66 1.78 1.30 1.0 0.74], diff 3.42, shift up at 4000 RPM,
      switch time 0.5 s, engine curve (0,.8)(.66,1)(1,.8), tyre slip curve
      peak 1.2 / slide 1.0 scaled by the script friction factors.
    """
    from substrata_tpu.physics.vehicles.manager import (
        DIFF_RATIO, ENGINE_CURVE_X, ENGINE_CURVE_Y, GEAR_RATIOS,
        LONG_MU_PEAK, LONG_MU_SLIDE, RPM_PER_RAD_S, SHIFT_DOWN_RPM,
        SHIFT_SWITCH_TIME, SHIFT_UP_RPM)

    w = make_world()
    vm = VehicleManager(w)
    he = (0.9, 1.8, 0.4)
    density = 150.0
    chassis = add_chassis(w, [0, 0, 0.8], he=he, density=density)
    s = VehicleSettings()          # the "script settings"
    car = CarPhysics(vm, chassis)  # defaults == VehicleSettings()
    car.player_entered(0)

    # --- 1-D oracle from the script constants only ---
    m = density * (2 * he[0]) * (2 * he[1]) * (2 * he[2])   # 777.6 kg
    r = s.wheel_radius
    g = 9.81
    wheelbase = 2.4        # wheel_attach_os y: +-1.2
    h_cm = 0.8             # CoM height above contact (settled chassis)
    mu_pk = LONG_MU_PEAK * s.longitudinal_friction_factor
    mu_sl = LONG_MU_SLIDE * s.longitudinal_friction_factor

    def oracle(ticks, with_transfer=True):
        v, gear, timer = 0.0, 0, 0.0
        out = []
        for _ in range(ticks):
            ratio = GEAR_RATIOS[gear] * DIFF_RATIO
            rpm_raw = v / r * ratio * RPM_PER_RAD_S
            rpm = np.clip(rpm_raw, 1000.0, s.engine_max_rpm)
            if timer <= 0 and rpm_raw > SHIFT_UP_RPM and gear < 4:
                gear, timer = gear + 1, SHIFT_SWITCH_TIME
            elif timer <= 0 and rpm_raw < SHIFT_DOWN_RPM and gear > 0:
                gear, timer = gear - 1, SHIFT_SWITCH_TIME
            clutch = timer <= 0
            timer = max(timer - DT, 0.0)
            t_norm = np.interp(rpm / s.engine_max_rpm,
                               ENGINE_CURVE_X, ENGINE_CURVE_Y)
            if rpm_raw >= s.engine_max_rpm:
                t_norm = 0.0
            f_want = (s.engine_max_torque * t_norm * GEAR_RATIOS[gear]
                      * DIFF_RATIO / r) if clutch else 0.0
            # Front-axle load with longitudinal weight transfer:
            # F_front = m g/2 - m a h/L; traction-limited accel solves
            # a = mu (g/2 - a h/L)  =>  a = mu g/2 / (1 + mu h/L).
            if with_transfer:
                f_stat = m * g / 2
                a_slide = mu_sl * (g / 2) / (1 + mu_sl * h_cm / wheelbase)
                f_peak = mu_pk * (f_stat - m * a_slide * h_cm / wheelbase)
                f_slide = m * a_slide
            else:
                f_peak = mu_pk * m * g / 2
                f_slide = mu_sl * m * g / 2
            f = f_want if abs(f_want) <= f_peak else f_slide
            v += f / m * DT
            v *= (1.0 - 0.05 * DT)   # body linear damping (Jolt default
            #                          0.05/s, state.py BodyState default)
            out.append(v)
        return np.array(out)

    # --- 3-D sim trace (settle the suspension first so the oracle's t=0
    # aligns with throttle onset on loaded wheels, not the spawn drop) ---
    drive(w, vm, car, VehiclePhysicsInput(), 120)
    speeds = []
    car.update(VehiclePhysicsInput(forward=1.0))
    for _ in range(600):
        vm.update(DT)
        w.think(DT)
        w.sync_transforms()
        speeds.append(float(np.linalg.norm(chassis.linvel[:2])))
    speeds = np.array(speeds)

    o_transfer = oracle(600, with_transfer=True)
    o_upper = oracle(600, with_transfer=False)

    # 1) Speed profile tracks the weight-transfer oracle within 25% after
    #    the launch transient.
    for t in (120, 240, 360, 480, 599):
        rel = abs(speeds[t] - o_transfer[t]) / o_transfer[t]
        assert rel < 0.25, (t, speeds[t], o_transfer[t])
    # 2) Never faster than the no-weight-transfer bound (hard physics cap,
    #    +5% numerical slack).
    assert (speeds[60:] <= o_upper[60:] * 1.05).all(), \
        (speeds[60:] - o_upper[60:]).max()
    # 3) The 1st->2nd shift speed is exactly derivable:
    #    v = SHIFT_UP_RPM / (gear0 * diff * RPM_PER_RAD_S) * r.
    v_shift_pred = SHIFT_UP_RPM / (GEAR_RATIOS[0] * DIFF_RATIO
                                   * RPM_PER_RAD_S) * r
    gears = []
    # re-read gear history isn't recorded; detect the shift as the speed
    # where acceleration momentarily drops to ~0 (clutch out for 0.5 s).
    acc = np.diff(speeds) / DT
    stalls = np.where((acc[90:] < 0.3) & (speeds[90:-1] > 5.0))[0]
    assert len(stalls), "no clutch-out window found"
    v_at_shift = speeds[90 + stalls[0]]
    assert abs(v_at_shift - v_shift_pred) / v_shift_pred < 0.08, \
        (v_at_shift, v_shift_pred)
    # 4) 0-to-20 m/s time within 25% of the oracle's.
    t20_sim = int(np.argmax(speeds >= 20.0))
    t20_orc = int(np.argmax(o_transfer >= 20.0))
    assert t20_sim > 0 and t20_orc > 0, (t20_sim, t20_orc)
    assert abs(t20_sim - t20_orc) / t20_orc < 0.25, (t20_sim, t20_orc)

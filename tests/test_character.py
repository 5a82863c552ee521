"""PlayerPhysics behavioural tests (reference semantics from
gui_client/PlayerPhysics.cpp:251-469; scripted-input traces per SURVEY.md §7)."""

import numpy as np
import pytest

from substrata_tpu.physics import shapes
from substrata_tpu.physics.character import PlayerPhysics, EYE_HEIGHT
from substrata_tpu.physics.state import MotionType, SimConfig
from substrata_tpu.physics.world import PhysicsObject, PhysicsWorld

DT = 1.0 / 60.0


def make_world():
    cfg = SimConfig(capacity=64, max_pairs=256, grid_dim=16, cell_size=4.0,
                    solver_iters=8)
    w = PhysicsWorld(cfg)
    w.set_ground_plane(0.0)
    return w


def test_spawn_no_gravity_until_move():
    w = make_world()
    p = PlayerPhysics(w, eye_pos=(0, 0, 10.0))
    for _ in range(30):
        p.update(DT)
    # Gravity off at spawn (PlayerPhysics.cpp:165-167) -> hasn't fallen.
    assert abs(p.get_eye_position()[2] - 10.0) < 0.2


def test_walk_on_flat_ground():
    w = make_world()
    p = PlayerPhysics(w, eye_pos=(0, 0, EYE_HEIGHT))
    for i in range(120):
        p.process_move([1, 0, 0])
        p.update(DT, cur_time=i * DT)
        w.think(DT)
    eye = p.get_eye_position()
    # Walked ~3 m/s * 2 s = ~6 m; stays at eye height.
    assert eye[0] > 4.0, eye
    assert abs(eye[2] - EYE_HEIGHT) < 0.25, eye


def test_run_factor():
    w = make_world()
    p = PlayerPhysics(w, eye_pos=(0, 0, EYE_HEIGHT))
    for i in range(60):
        p.process_move([1, 0, 0], runpressed=True)
        p.update(DT, cur_time=i * DT)
    # 15 m/s * 1 s.
    assert p.get_eye_position()[0] > 10.0


def test_jump():
    w = make_world()
    p = PlayerPhysics(w, eye_pos=(0, 0, EYE_HEIGHT))
    # Settle on ground first (gravity enables on first move).
    for i in range(30):
        p.process_move([1, 0, 0])
        p.update(DT, cur_time=i * DT)
    max_z = 0.0
    p.process_jump(cur_time=1.0)
    jumped = False
    for i in range(90):
        _, j = p.update(DT, cur_time=1.0 + i * DT)
        jumped = jumped or j
        max_z = max(max_z, p.get_eye_position()[2])
    assert jumped
    # v0=4.5 -> apex ~ 1.03 m above start.
    assert max_z - EYE_HEIGHT > 0.6, max_z


def test_steps_up_stairs():
    w = make_world()
    # Three 0.25m steps.
    for i in range(3):
        w.add_object(PhysicsObject(
            shape=shapes.make_box([1.0, 2.0, 0.125 * (i + 1)]),
            pos=np.array([1.5 + i * 2.0, 0, 0.125 * (i + 1)], np.float32),
            motion_type=int(MotionType.STATIC)))
    p = PlayerPhysics(w, eye_pos=(0, 0, EYE_HEIGHT))
    max_z = 0.0
    for i in range(260):
        p.process_move([1, 0, 0])
        p.update(DT, cur_time=i * DT)
        max_z = max(max_z, p.get_eye_position()[2])
    eye = p.get_eye_position()
    # Climbed all three steps (top at z=0.75) while advancing.
    assert eye[0] > 4.5, eye
    assert max_z > EYE_HEIGHT + 0.7, (max_z, eye)


def test_steps_up_tall_single_step():
    """A single 0.35 m step — taller than the capsule-edge roll-over that
    masks low steps but inside Jolt's 0.4 mWalkStairsStepUp
    (PlayerPhysics.cpp:346).  The landing at min-step-forward is the steep
    step EDGE; Jolt validates it via the 0.15 m forward test probe and the
    climb converges over a few ticks.  This drove the r5 WalkStairs
    redesign: the previous flat-landing-only scan could not climb any step
    taller than ~0.25 m."""
    w = make_world()
    w.add_object(PhysicsObject(
        shape=shapes.make_box([1.0, 1.0, 0.175]),
        pos=np.array([1.5, 0, 0.175], np.float32),
        motion_type=int(MotionType.STATIC)))
    p = PlayerPhysics(w, eye_pos=(0, 0, EYE_HEIGHT))
    for i in range(180):
        p.process_move([1, 0, 0])
        p.update(DT, cur_time=i * DT)
    eye = p.get_eye_position()
    assert eye[0] > 2.6, eye          # walked up and across the step


def test_step_above_limit_blocks():
    """A 0.45 m step exceeds mWalkStairsStepUp = 0.4: the character must be
    BLOCKED (the forward-test cast starts inside the step face and cannot
    validate the steep landing)."""
    w = make_world()
    w.add_object(PhysicsObject(
        shape=shapes.make_box([1.0, 1.0, 0.225]),
        pos=np.array([1.5, 0, 0.225], np.float32),
        motion_type=int(MotionType.STATIC)))
    p = PlayerPhysics(w, eye_pos=(0, 0, EYE_HEIGHT))
    for i in range(180):
        p.process_move([1, 0, 0])
        p.update(DT, cur_time=i * DT)
    eye = p.get_eye_position()
    assert eye[0] < 0.5, eye
    assert eye[2] < EYE_HEIGHT + 0.2, eye


def test_blocked_by_wall():
    w = make_world()
    w.add_object(PhysicsObject(
        shape=shapes.make_box([0.25, 3.0, 2.0]),
        pos=np.array([2.0, 0, 2.0], np.float32),
        motion_type=int(MotionType.STATIC)))
    p = PlayerPhysics(w, eye_pos=(0, 0, EYE_HEIGHT))
    for i in range(240):
        p.process_move([1, 0, 0])
        p.update(DT, cur_time=i * DT)
    eye = p.get_eye_position()
    # Stopped at the wall (wall front face at x=1.75, capsule r=0.3).
    assert eye[0] < 1.8, eye
    assert eye[2] < EYE_HEIGHT + 0.45, eye  # didn't climb it


def test_fly_mode():
    w = make_world()
    p = PlayerPhysics(w, eye_pos=(0, 0, 5.0))
    p.set_fly_mode_enabled(True)
    for i in range(120):
        p.process_move([0, 0, 1])
        p.update(DT, cur_time=i * DT)
    assert p.get_eye_position()[2] > 5.5


def test_swim_up_in_water():
    w = make_world()
    w.set_water_buoyancy_enabled(True)
    w.water_z = 10.0
    w.set_ground_plane(0.0)
    p = PlayerPhysics(w, eye_pos=(0, 0, 3.0))  # deep underwater
    for i in range(120):
        p.process_move([0, 0, 1])  # swim up: vertical move allowed underwater
        p.update(DT, cur_time=i * DT)
    assert p.get_eye_position()[2] > 3.5


def test_pushes_dynamic_box():
    w = make_world()
    box = w.add_object(PhysicsObject(
        shape=shapes.make_box([0.3, 0.3, 0.3], density=100.0),
        pos=np.array([1.5, 0, 0.3], np.float32),
        motion_type=int(MotionType.DYNAMIC)))
    p = PlayerPhysics(w, eye_pos=(0, 0, EYE_HEIGHT))
    for i in range(240):
        p.process_move([1, 0, 0])
        p.update(DT, cur_time=i * DT)
        w.think(DT)
    w.sync_transforms()
    # Light box got shoved forward by the kinematic proxy.
    assert box.pos[0] > 2.0, box.pos


def test_scripted_input_trace_piecewise_kinematics():
    """Input-trace fidelity (VERDICT r2 item 4): a scripted
    walk/run/jump/stop timeline must reproduce PlayerPhysics.cpp:251-469
    constants piecewise — walk 3 m/s, run x5 = 15 m/s, jump speed 4.5
    (apex = v^2/2g ~ 1.03 m), and a full stop when input ends."""
    w = make_world()
    p = PlayerPhysics(w, eye_pos=(0, 0, EYE_HEIGHT))
    trace = []   # (eye_pos, t)
    t = 0.0

    def drive(n, move, run=False, jump=False):
        nonlocal t
        for k in range(n):
            p.process_move(move, runpressed=run)
            if jump and k == 0:
                p.process_jump(cur_time=t)
            p.update(DT, cur_time=t)
            w.think(DT)
            trace.append((p.get_eye_position().copy(), t))
            t += DT

    drive(120, [1, 0, 0])              # phase 1: walk +x for 2 s
    x_walk_end = trace[-1][0][0]
    drive(60, [0, 1, 0], run=True)     # phase 2: run +y for 1 s
    y_run_end = trace[-1][0][1]
    drive(90, [0, 0, 0], jump=True)    # phase 3: jump in place
    apex = max(e[2] for e, _ in trace[-90:])
    drive(60, [0, 0, 0])               # phase 4: idle
    end_eye = trace[-1][0]

    # Walk: ~3 m/s (acceleration transient eats a little).
    assert 4.5 < x_walk_end < 6.5, x_walk_end
    # Run: ~15 m/s for 1 s along y.
    assert 10.0 < y_run_end < 16.0, y_run_end
    # Jump apex above standing eye height by v^2/2g = 4.5^2/(2*9.81) ~ 1.03.
    assert 0.7 < apex - EYE_HEIGHT < 1.25, apex
    # Idle: came to rest on the ground at eye height, no drift.
    assert abs(end_eye[2] - EYE_HEIGHT) < 0.25, end_eye
    drift = np.linalg.norm(end_eye[:2] - trace[-60][0][:2])
    assert drift < 0.5, drift


def test_stick_to_floor_on_step_down():
    """Walking off a 0.4 m ledge keeps the player glued to the floor
    (stick-to-floor step-down 0.5, PlayerPhysics.cpp:347-350): no airborne
    phase, eye height tracks the lower floor within one step."""
    w = make_world()
    # Upper platform (box top at z=0.4) next to the ground plane.
    w.add_object(PhysicsObject(
        shape=shapes.make_box([2.0, 2.0, 0.2]),
        pos=np.array([-1.0, 0, 0.2], np.float32),
        motion_type=int(MotionType.STATIC)))
    p = PlayerPhysics(w, eye_pos=(-1.0, 0, 0.4 + EYE_HEIGHT))
    min_clearance = 1e9
    on_lower = False
    for i in range(240):
        p.process_move([1, 0, 0])
        p.update(DT, cur_time=i * DT)
        w.think(DT)
        eye = p.get_eye_position()
        floor_z = 0.4 if eye[0] < 1.0 else 0.0
        if eye[0] > 1.3:   # clearly past the ledge
            on_lower = True
            min_clearance = min(min_clearance, eye[2])
    assert on_lower, "never walked off the ledge"
    # Glued to the lower floor: eye settles at EYE_HEIGHT above z=0
    # without a prolonged fall (stick-to-floor snaps within the 0.5 budget)
    assert abs(p.get_eye_position()[2] - EYE_HEIGHT) < 0.25

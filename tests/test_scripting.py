"""Scripting tests: winter-equivalent evaluators, XML scripts, path
controllers, event handlers + timers."""

import numpy as np
import pytest

from substrata_tpu.physics import shapes
from substrata_tpu.physics.state import MotionType, SimConfig
from substrata_tpu.physics.vehicles import VEHICLE_CAR, VEHICLE_BOAT
from substrata_tpu.physics.world import PhysicsObject, PhysicsWorld
from substrata_tpu.scripting import (
    ObjectPathController, ObjectScriptsEvaluator, ScriptTimerQueue, ScriptVM,
    WinterScriptEvaluator, parse_xml_script,
)
from substrata_tpu.scripting.path_controller import ObjectMoveToController
from substrata_tpu.scripting.winter import WinterParseError


def test_winter_rotation_script():
    ev = WinterScriptEvaluator(
        "def evalRotation(float time, WinterEnv env) vec3 : vec3(0.0, 0.0, time * 0.5)")
    out = np.asarray(ev.eval_rotation(2.0))
    np.testing.assert_allclose(out, [0, 0, 1.0], atol=1e-6)


def test_winter_translation_script():
    ev = WinterScriptEvaluator(
        "def evalTranslation(float time, WinterEnv env) vec3 : "
        "vec3(0.0, 0.0, sin(time) * 2.0)")
    out = np.asarray(ev.eval_translation(np.pi / 2))
    np.testing.assert_allclose(out, [0, 0, 2.0], atol=1e-5)


def test_winter_bracket_vec_literal_and_env():
    ev = WinterScriptEvaluator(
        "def evalRotation(float time, WinterEnv env) vec3 : "
        "[0.0, 0.0, time + env.instance_index * 0.1]vec3")
    out = np.asarray(ev.eval_rotation(1.0, instance_index=3.0))
    np.testing.assert_allclose(out, [0, 0, 1.3], atol=1e-6)


def test_winter_let_block_and_user_defs():
    # Winter let/in + helper def, modelled on testfiles/instancing_test.win.
    ev = WinterScriptEvaluator("""
def wave(float x) float : sin(x * 3.0) * 4.0
def evalTranslation(float time, WinterEnv env) vec3 :
    let
        i = toFloat(env.instance_index)
        ifactor = i * 0.1
        timefactor = time * 0.3
    in
        vec3(wave(timefactor + ifactor), 0.0, sin((timefactor + ifactor) * 2.0) * 4.0)
""")
    out = np.asarray(ev.eval_translation(1.0, instance_index=2))
    tf = 1.0 * 0.3 + 2 * 0.1
    np.testing.assert_allclose(
        out, [np.sin(tf * 3) * 4, 0.0, np.sin(tf * 2) * 4], atol=1e-5)


def test_winter_if_conditional_and_comparisons():
    ev = WinterScriptEvaluator(
        "def evalRotation(float time, WinterEnv env) vec3 : "
        "vec3(if(time > 1.0 && time < 3.0, time * 2.0, 0.0 - 1.0), 0.0, 0.0)")
    assert np.asarray(ev.eval_rotation(2.0))[0] == 4.0
    assert np.asarray(ev.eval_rotation(5.0))[0] == -1.0


def test_winter_vector_ops_and_swizzles():
    ev = WinterScriptEvaluator("""
def evalTranslation(float time, WinterEnv env) vec3 :
    let
        p = vec3(3.0, 4.0, 0.0)
        n = normalise(p)
    in
        vec3(length(p), dot(n, n), cross(vec3(1.0, 0.0, 0.0), vec3(0.0, 1.0, 0.0)).z) * time
""")
    np.testing.assert_allclose(
        np.asarray(ev.eval_translation(2.0)), [10.0, 2.0, 2.0], atol=1e-5)


def test_winter_struct_def():
    ev = WinterScriptEvaluator("""
struct Params { real amp, real freq }
def mk() Params : Params(2.0, 3.0)
def evalRotation(float time, WinterEnv env) vec3 :
    let p = mk() in vec3(0.0, 0.0, sin(time * p.freq) * p.amp)
""")
    np.testing.assert_allclose(
        np.asarray(ev.eval_rotation(0.5))[2], np.sin(1.5) * 2.0, atol=1e-5)


def test_winter_parses_reference_fixture_scripts():
    # The actual scripts shipped in the reference's testfiles.
    import pathlib
    ref = pathlib.Path("/root/reference/testfiles")
    if not ref.exists():
        pytest.skip("reference not mounted")
    src = (ref / "instancing_test.win").read_text()
    ev = WinterScriptEvaluator(src)
    out = np.asarray(ev.eval_rotation(2.0, instance_index=4))
    np.testing.assert_allclose(out, [-0.6 * 2 + 4, 0, 0], atol=1e-5)


def test_batched_by_source_bucket_caching():
    src = "def evalRotation(float time, WinterEnv env) vec3 : vec3(0.0, 0.0, time)"
    ose = ObjectScriptsEvaluator()
    obs = [object() for _ in range(6)]
    for ob in obs[:4]:
        ose.add(ob, src)
    ose.evaluate(1.0)
    # 4 objects fit the min bucket of 8 -> one compiled program.
    assert list(ose._jitted) == [(src, 8)]
    for ob in obs[4:]:
        ose.add(ob, src)
    out = ose.evaluate(2.0)
    # Still within bucket 8: no new compile, all 6 evaluated.
    assert list(ose._jitted) == [(src, 8)]
    assert len(out) == 6
    np.testing.assert_allclose(out[5][1][0], [0, 0, 2.0], atol=1e-6)


def test_winter_rejects_unsafe():
    with pytest.raises(WinterParseError):
        WinterScriptEvaluator(
            "def evalRotation(float time, WinterEnv env) vec3 : __import__('os')")


def test_batched_scripts_evaluator():
    ose = ObjectScriptsEvaluator()
    ob1, ob2 = object(), object()
    ose.add(ob1, "def evalRotation(float time, WinterEnv env) vec3 : vec3(0.0, 0.0, time)")
    ose.add(ob2, "def evalTranslation(float time, WinterEnv env) vec3 : "
                 "vec3(time, 0.0, 0.0)", num_instances=3)
    out = ose.evaluate(2.0)
    assert len(out) == 2
    ob, rot, trans = out[0]
    np.testing.assert_allclose(rot[0], [0, 0, 2.0], atol=1e-5)
    ob, rot, trans = out[1]
    assert trans.shape == (3, 3)
    np.testing.assert_allclose(trans[:, 0], 2.0, atol=1e-5)


def test_parse_xml_follow_path_and_vehicle():
    src = """<?xml version="1.0"?>
    <script>
      <follow_path>
        <speed>5</speed>
        <orient_along_path/>
        <waypoint><pos>0 0 1</pos><type>Station</type><pause_time>2</pause_time></waypoint>
        <waypoint><pos>10 0 1</pos><type>Station</type></waypoint>
      </follow_path>
      <car>
        <front_wheel_radius>0.4</front_wheel_radius>
        <max_steering_angle>0.5</max_steering_angle>
        <seat><seat_position>0 0.2 0.5</seat_position></seat>
      </car>
    </script>"""
    out = parse_xml_script(src)
    fp = out["follow_path"]
    assert len(fp["waypoints"]) == 2
    assert fp["waypoints"][0]["pause_time"] == 2.0
    assert fp["waypoints"][1]["speed"] == 5.0
    assert fp["orient_along_path"]
    v = out["vehicle"]
    assert v.vehicle_type == VEHICLE_CAR
    assert v.wheel_radius == 0.4
    assert v.max_steering_angle == 0.5
    assert len(out["seats"]) == 1


def test_parse_xml_boat():
    out = parse_xml_script(
        "<script><boat><thrust_force>5000</thrust_force>"
        "<propellor_point_os>0 -2 -0.5</propellor_point_os></boat></script>")
    assert out["vehicle"].vehicle_type == VEHICLE_BOAT
    assert out["vehicle"].thrust_force == 5000.0
    np.testing.assert_allclose(out["vehicle"].propellor_point_os, [0, -2, -0.5])


def test_path_controller_drives_kinematic_object():
    w = PhysicsWorld(SimConfig(capacity=16, max_pairs=64, grid_dim=16, cell_size=8.0))
    w.set_ground_plane(0.0)
    ob = w.add_object(PhysicsObject(shape=shapes.make_box([0.5, 0.5, 0.5]),
                                    pos=np.array([0, 0, 1], np.float32),
                                    motion_type=int(MotionType.KINEMATIC)))
    pc = ObjectPathController(ob, [
        {"pos": [0, 0, 1], "type": 2, "pause_time": 0.0, "speed": 5.0},
        {"pos": [10, 0, 1], "type": 2, "pause_time": 0.0, "speed": 5.0},
    ])
    for _ in range(60):
        pc.update(w, 1 / 60)
        w.think(1 / 60)
    w.sync_transforms()
    # Moved ~5 m along +x in 1 s.
    assert 3.5 < ob.pos[0] < 6.5, ob.pos


def test_path_controller_station_pause_and_wrap():
    ob = type("Ob", (), {"pos": np.zeros(3), "rot": np.array([0, 0, 0, 1.0])})()
    pc = ObjectPathController(ob, [
        {"pos": [0, 0, 0], "type": 2, "pause_time": 1.0, "speed": 1.0},
        {"pos": [2, 0, 0], "type": 2, "pause_time": 0.0, "speed": 1.0},
    ])
    pc.walk(0.5)  # still paused at station
    pos, _ = pc.current_pos_dir()
    assert abs(pos[0]) < 1e-9
    pc.walk(1.0)  # 0.5s pause left + 0.5s travel = 0.5 m
    pos, _ = pc.current_pos_dir()
    assert abs(pos[0] - 0.5) < 1e-6
    pc.walk(10.0)  # wraps around the loop
    assert pc.cur_waypoint_index in (0, 1)


def test_path_controller_curve():
    ob = type("Ob", (), {"pos": np.zeros(3), "rot": np.array([0, 0, 0, 1.0])})()
    # Square corner smoothed by an arc: in +x, curve, out +y.
    pc = ObjectPathController(ob, [
        {"pos": [0, 0, 0], "type": 2, "pause_time": 0.0, "speed": 1.0},
        {"pos": [5, 0, 0], "type": 0, "speed": 1.0},    # CurveIn
        {"pos": [6, 1, 0], "type": 1, "speed": 1.0},    # CurveOut
        {"pos": [6, 5, 0], "type": 2, "pause_time": 0.0, "speed": 1.0},
    ])
    w = pc.waypoints[1]
    assert w.curve_r > 0
    assert abs(w.curve_angle - np.pi / 2) < 0.01
    # Arc midpoint lies between the corner points, off the straight lines.
    p, d = pc.eval_segment_pos(1, w.segment_len * 0.5)
    assert 5.0 < p[0] < 6.01 and -0.01 < p[1] < 1.01, p


def test_sort_path_controllers():
    class Ob:
        def __init__(self, uid):
            self.uid = uid
            self.pos = np.zeros(3)
            self.rot = np.array([0, 0, 0, 1.0])
    wp = [{"pos": [0, 0, 0], "type": 2, "pause_time": 0, "speed": 1},
          {"pos": [1, 0, 0], "type": 2, "pause_time": 0, "speed": 1}]
    lead = ObjectPathController(Ob(1), wp)
    follower = ObjectPathController(Ob(2), wp, follow_ob_uid=1, follow_dist=1.0)
    ordered = ObjectPathController.sort_path_controllers([follower, lead])
    assert ordered.index(lead) < ordered.index(follower)


def test_move_to_controller():
    w = PhysicsWorld(SimConfig(capacity=16, max_pairs=64, grid_dim=16, cell_size=8.0))
    w.set_ground_plane(0.0)
    ob = w.add_object(PhysicsObject(shape=shapes.make_box([0.5] * 3),
                                    pos=np.array([0, 0, 1], np.float32),
                                    motion_type=int(MotionType.KINEMATIC)))
    mc = ObjectMoveToController(ob, [4, 0, 1], [0, 0, 0, 1], duration=0.5)
    for _ in range(40):
        if not mc.done:
            mc.update(w, 1 / 60)
        w.think(1 / 60)
    w.sync_transforms()
    assert mc.done
    assert abs(ob.pos[0] - 4.0) < 0.05


def test_timer_queue():
    q = ScriptTimerQueue()
    fired = []
    tid = q.do_on_timer(lambda: fired.append("a"), delay=1.0, now=0.0)
    q.do_on_timer(lambda: fired.append("b"), delay=0.5, now=0.0)
    q.update(0.4)
    assert fired == []
    q.update(0.6)
    assert fired == ["b"]
    q.destroy_timer(tid)
    q.update(2.0)
    assert fired == ["b"]  # cancelled
    # Repeating timer.
    q.do_on_timer(lambda: fired.append("r"), delay=0.1, now=2.0, repeating=True)
    q.update(2.15)
    q.update(2.3)
    assert fired.count("r") == 2


def test_script_vm_events_and_timers():
    class FakeWorld:
        objects = {7: "the-object"}
    vm = ScriptVM(world_interface=FakeWorld(), clock=lambda: 0.0)
    src = """
touched = []
def on_touch(avatar_uid, ob_uid):
    touched.append((avatar_uid, ob_uid))
    showMessageToUser("touched!")
addEventListener("onUserTouchedObject", 7, on_touch)
assert getObjectForUID(7) == "the-object"
"""
    env = vm.run_script(src, this_object=None)
    vm.fire_user_touched_object(7, avatar_uid=42)
    assert env["touched"] == [(42, 7)]
    assert vm.messages_to_user == ["touched!"]


def test_script_vm_sandbox():
    vm = ScriptVM()
    from substrata_tpu.scripting.events import ScriptExecutionError
    with pytest.raises(ScriptExecutionError):
        vm.run_script("import os")
    with pytest.raises(ScriptExecutionError):
        vm.run_script("open('/etc/passwd')")

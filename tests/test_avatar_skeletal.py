"""AvatarGraphicsManager skeletal integration: batched pose_all, gestures,
sitting pose constraints, head look, two-bone arm IK.

Reference behaviour: AvatarGraphics::setOverallTransform
(gui_client/AvatarGraphics.cpp) per avatar per tick.
"""

import math

import numpy as np
import pytest

from substrata_tpu.avatar_graphics import (
    ANIM_IDLE, ANIM_RUN, ANIM_WALK, AvatarGraphicsManager, PoseConstraint,
)
from substrata_tpu.shared.avatar import Avatar


def _avatar(uid, pos=(0, 0, 0)):
    av = Avatar(uid=uid, name=f"a{uid}")
    av.pos = np.array(pos, np.float64)
    av.rotation = np.zeros(3)
    av.anim_state = 0
    av.entered_vehicle_uid = 0
    return av


@pytest.fixture(scope="module")
def mgr():
    return AvatarGraphicsManager()


def test_pose_all_batches_all_avatars(mgr):
    avs = [_avatar(i + 1, (i * 2.0, 0, 0)) for i in range(3)]
    dt = 1 / 60
    for step in range(10):
        for k, av in enumerate(avs):
            av.pos = np.array([k * 2.0 + step * 0.05 * k, 0, 0])
            mgr.update_avatar(av, dt)
    poses = mgr.pose_all()
    assert set(poses) == {1, 2, 3}
    for uid, jw in poses.items():
        assert jw.shape[1:] == (4, 4)
        assert np.isfinite(jw).all()
    # Root placement: hips world position tracks the avatar position.
    g = mgr.by_uid[3]
    hips = g.get_joint_world("Hips")
    assert abs(hips[0, 3] - avs[2].pos[0]) < 0.2
    # Model y-up mapped to world z-up: head is ABOVE hips in z.
    head = g.get_joint_world("Head")
    assert head[2, 3] > hips[2, 3] + 0.3
    for uid in (1, 2, 3):
        mgr.remove_avatar(uid)


def test_walk_changes_pose_over_time(mgr):
    av = _avatar(7)
    dt = 1 / 60
    feet = []
    for step in range(40):
        av.pos = np.array([step * 3.0 * dt, 0.0, 0.0])  # 3 m/s walk
        mgr.update_avatar(av, dt)
        if step > 20:
            mgr.pose_all()
            g = mgr.by_uid[7]
            feet.append(g.get_joint_world("LeftFoot")[:3, 3].copy())
    assert mgr.by_uid[7].cur_anim == ANIM_WALK
    feet = np.array(feet)
    assert feet[:, 2].max() - feet[:, 2].min() > 0.02  # foot lifts
    mgr.remove_avatar(7)


def test_gesture_plays_and_expires(mgr):
    av = _avatar(8)
    dt = 1 / 60
    mgr.update_avatar(av, dt)
    g = mgr.by_uid[8]
    assert g.perform_gesture("Wave")
    for _ in range(int(1.2 / dt)):   # mid-gesture (arm fully raised)
        mgr.update_avatar(av, dt)
    assert g.cur_anim == "Wave"
    mgr.pose_all()
    hand_up = g.get_joint_world("RightHand")[2, 3]

    for _ in range(int(3.0 / dt)):   # run past the 2.5 s gesture
        mgr.update_avatar(av, dt)
    assert g.gesture is None and g.cur_anim == ANIM_IDLE
    mgr.pose_all()
    hand_idle = g.get_joint_world("RightHand")[2, 3]
    # During the wave the right hand is raised well above its idle height.
    assert hand_up > hand_idle + 0.2
    mgr.remove_avatar(8)


def test_sitting_constraint_shapes_legs(mgr):
    av = _avatar(9)
    dt = 1 / 60
    seat = np.eye(4, dtype=np.float32)
    seat[:3, 3] = [5.0, 0.0, 1.0]
    pc = PoseConstraint(
        sitting=True, seat_to_world=seat,
        upper_body_rot_angle=0.2, upper_leg_rot_angle=1.3,
        lower_leg_rot_angle=-0.5, upper_leg_apart_angle=0.1)
    g = None
    for _ in range(30):
        av.entered_vehicle_uid = 42
        mgr.update_avatar(av, dt)
        g = mgr.by_uid[9]
        g.set_sitting(True, pc)
    mgr.pose_all()
    hips = g.get_joint_world("Hips")[:3, 3]
    np.testing.assert_allclose(hips[:2], [5.0, 0.0], atol=0.3)
    knee = g.get_joint_world("LeftLeg")[:3, 3]
    foot = g.get_joint_world("LeftFoot")[:3, 3]
    # Seat forwards is +y: the bent thigh puts the knee ahead of the hips.
    assert knee[1] > hips[1] + 0.15
    # Knee stays above the foot (shank hangs down-ish).
    assert knee[2] > foot[2]
    mgr.remove_avatar(9)


def test_head_look_rotates_head_not_hips(mgr):
    av = _avatar(10)
    dt = 1 / 60
    for _ in range(5):
        mgr.update_avatar(av, dt)
    mgr.pose_all()
    g = mgr.by_uid[10]
    head0 = g.get_joint_world("Head")[:3, :3].copy()
    hips0 = g.get_joint_world("Hips")[:3, :3].copy()

    # Turn the camera/heading sharply; body heading snaps in our model,
    # but cur_head_rot_z lags -> head yaw offset appears, decaying to 0.
    g2 = mgr.by_uid[10]
    g2.cur_head_rot_z = 0.0
    av.rotation = np.array([0.0, 0.0, 0.6])
    mgr.update_avatar(av, dt)
    mgr.pose_all()
    # Procedural yaw = clamp(cur_head_rot_z - heading) != 0 right after
    # the turn, so the head pose differs from the no-look pose.
    head1 = g2.get_joint_world("Head")[:3, :3]
    assert not np.allclose(head0, head1, atol=1e-4)
    mgr.remove_avatar(10)


def test_arm_ik_reaches_toward_hold_point(mgr):
    av = _avatar(11)
    dt = 1 / 60
    for _ in range(3):
        av.entered_vehicle_uid = 5
        mgr.update_avatar(av, dt)
    g = mgr.by_uid[11]
    seat = np.eye(4, dtype=np.float32)
    pc = PoseConstraint(sitting=True, seat_to_world=seat,
                        upper_leg_rot_angle=1.0, lower_leg_rot_angle=-0.9)
    g.set_sitting(True, pc)
    av.entered_vehicle_uid = 5
    mgr.update_avatar(av, dt)   # refresh root_transform for the seat
    mgr.pose_all()          # first pose: no hold yet (needs last joints)
    wrist_before = g.get_joint_world("RightHand")[:3, 3].copy()

    # Handlebar point out in front of the seat.
    hold = np.array([0.15, 0.45, 0.95])
    pc.right_hand_hold_point_ws = hold
    err = None
    for _ in range(8):      # IK converges over a few ticks (uses last pose)
        mgr.pose_all()
        wrist = g.get_joint_world("RightHand")[:3, 3]
        err = np.linalg.norm(wrist - hold)
    assert err < np.linalg.norm(wrist_before - hold)
    assert err < 0.25
    # Fingers curled on the gripping hand.
    tip = g.get_joint_world("RightHandIndex4")[:3, 3]
    hand = g.get_joint_world("RightHand")[:3, 3]
    assert np.linalg.norm(tip - hand) < 0.16
    mgr.remove_avatar(11)


def test_run_transition_uses_fast_blend(mgr):
    av = _avatar(12)
    dt = 1 / 60
    mgr.update_avatar(av, dt)
    for step in range(30):
        av.pos = np.array([(step + 1) * 8.0 * dt, 0.0, 0.0])  # 8 m/s
        mgr.update_avatar(av, dt)
    g = mgr.by_uid[12]
    assert g.cur_anim == ANIM_RUN
    assert g.blend_time in (0.1, 0.2)   # run/walk fast transitions
    mgr.remove_avatar(12)

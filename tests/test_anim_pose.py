"""Skeletal pose kernel: FK, sampling, blending, procedural overrides.

Oracle: a plain-numpy per-joint evaluation of the same data
(AvatarGraphics.cpp:324 composition order —
node_T = parent_T * TRS * procedural_transform).
"""

import numpy as np
import pytest

from substrata_tpu.anim import (
    ClipBank, PoseKernel, PROC_SLOTS, build_default_humanoid,
)
from substrata_tpu.anim.clips import CLIP_RATE, build_default_clips
from substrata_tpu.anim.pose import zero_pose_params
from substrata_tpu.anim.skeleton import trs_to_mat4_np


@pytest.fixture(scope="module")
def rig():
    skel = build_default_humanoid()
    bank = ClipBank(skel, build_default_clips(skel))
    return skel, bank, PoseKernel(skel, bank)


def test_default_humanoid_shape(rig):
    skel, bank, _ = rig
    assert skel.num_joints == 64
    assert skel.joint_index("Hips") == 0
    for name in ("Neck", "Head", "LeftFoot", "RightHandPinky4",
                 "LeftHandThumb1", "Spine2", "LeftEye"):
        assert skel.joint_index(name) >= 0, name
    # Hips is the root; everything else has a parent.
    assert skel.parents[0] == -1
    assert (skel.parents[1:] >= 0).all()
    # Rest head height ~ eye level (reference eye height 1.67 m,
    # AvatarGraphics.h:149).
    rest = skel.rest_world()
    head_y = rest[skel.joint_index("Head"), 1, 3]
    assert 1.4 < head_y < 1.8


def test_rest_pose_skin_is_identity(rig):
    skel, bank, kern = rig
    # A clip frame that equals the rest pose: build params sampling the
    # idle clip but fully overridden to rest via clip authored from rest.
    import jax.numpy as jnp
    from substrata_tpu.anim.clips import AnimationClip

    rest_clip = AnimationClip(
        "rest", rot=np.tile(skel.rest_rot[None], (2, 1, 1)),
        trans=np.tile(skel.rest_trans[None], (2, 1, 1)))
    bank2 = ClipBank(skel, [rest_clip])
    kern2 = PoseKernel(skel, bank2)
    p = zero_pose_params(3)
    obj, world, skin = kern2(p)
    np.testing.assert_allclose(np.asarray(skin),
                               np.tile(np.eye(4), (3, skel.num_joints, 1, 1)),
                               atol=2e-5)
    # Object-space joints match the numpy rest pose.
    np.testing.assert_allclose(np.asarray(obj)[0], skel.rest_world(),
                               atol=2e-5)


def test_fk_matches_numpy_oracle(rig):
    skel, bank, kern = rig
    import jax.numpy as jnp

    a = 4
    rng = np.random.default_rng(0)
    p = zero_pose_params(a)
    ci = bank.clip_index("walking")
    frames = rng.uniform(0, 20, a).astype(np.float32)
    p = p.replace(clip_a=jnp.full((a,), ci, jnp.int32),
                  clip_b=jnp.full((a,), ci, jnp.int32),
                  frame_a=jnp.asarray(frames), frame_b=jnp.asarray(frames))
    obj, world, skin = kern(p)

    # Numpy oracle: sample + FK for avatar 2.
    clip = build_default_clips(skel)[ci]
    f = frames[2]
    f0, frac = int(np.floor(f)) % clip.num_frames, f - np.floor(f)
    f1 = (f0 + 1) % clip.num_frames
    q0, q1 = clip.rot[f0], clip.rot[f1]
    dot = np.sum(q0 * q1, -1, keepdims=True)
    q1 = np.where(dot < 0, -q1, q1)
    q = q0 + (q1 - q0) * frac
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    t = clip.trans[f0] + (clip.trans[f1] - clip.trans[f0]) * frac
    local = trs_to_mat4_np(t, q, skel.rest_scale)
    ref = np.empty_like(local)
    for j in range(skel.num_joints):
        par = skel.parents[j]
        ref[j] = local[j] if par < 0 else ref[par] @ local[j]
    np.testing.assert_allclose(np.asarray(obj)[2], ref, atol=1e-4)


def test_blend_midpoint_between_clips(rig):
    skel, bank, kern = rig
    import jax.numpy as jnp

    p = zero_pose_params(3)
    ia, ib = bank.clip_index("idle"), bank.clip_index("sitting")
    p = p.replace(clip_a=jnp.full((3,), ia, jnp.int32),
                  clip_b=jnp.full((3,), ib, jnp.int32),
                  blend=jnp.asarray([0.0, 0.5, 1.0], jnp.float32))
    obj, _, _ = kern(p)
    knee = skel.joint_index("LeftLeg")
    # Knee swings forward (+z) monotonically as the seated pose blends in
    # (the thigh goes horizontal).
    z0, z05, z1 = (float(np.asarray(obj)[i, knee, 2, 3]) for i in range(3))
    assert z0 < z05 < z1 and z1 > z0 + 0.25
    foot = skel.joint_index("LeftFoot")
    fz0, fz1 = (float(np.asarray(obj)[i, foot, 2, 3]) for i in (0, 2))
    assert fz1 > fz0 + 0.2   # seated: foot swings forward (+z)


def test_override_rotation_turns_head_only(rig):
    skel, bank, kern = rig
    import jax.numpy as jnp

    p = zero_pose_params(2)
    s_head = PROC_SLOTS.index("Head")
    # Rotate avatar 1's head 90 deg about y (look left).
    q = np.array([0.0, np.sin(np.pi / 4), 0.0, np.cos(np.pi / 4)], np.float32)
    p = p.replace(
        override_rot=p.override_rot.at[1, s_head].set(jnp.asarray(q)),
        override_mask=p.override_mask.at[1, s_head].set(True))
    obj, _, _ = kern(p)
    o = np.asarray(obj)
    head = skel.joint_index("Head")
    leye = skel.joint_index("LeftEye")
    # avatar 0's eye stays forward (+z offset), avatar 1's rotates.
    eye_off0 = o[0, leye, :3, 3] - o[0, head, :3, 3]
    eye_off1 = o[1, leye, :3, 3] - o[1, head, :3, 3]
    assert eye_off0[2] > 0.05
    assert abs(eye_off1[2]) < 0.04 and abs(eye_off1[0]) > 0.05
    # Hips unaffected.
    np.testing.assert_allclose(o[0, 0], o[1, 0], atol=1e-6)


def test_post_transform_bends_leg_chain(rig):
    skel, bank, kern = rig
    import jax.numpy as jnp

    p = zero_pose_params(2)
    s = PROC_SLOTS.index("LeftUpLeg")
    # Bend left thigh forward 90 deg at the hip (sitting constraint shape,
    # AvatarGraphics.cpp:284-289; forward = NEGATIVE x-rot in this rig,
    # the manager maps the reference's positive-forward convention).
    q = np.array([-np.sin(np.pi / 4), 0.0, 0.0, np.cos(np.pi / 4)],
                 np.float32)
    p = p.replace(post_rot=p.post_rot.at[1, s].set(jnp.asarray(q)),
                  post_mask=p.post_mask.at[1, s].set(True))
    obj, _, _ = kern(p)
    o = np.asarray(obj)
    knee = skel.joint_index("LeftLeg")
    # Avatar 0's knee is below the hip; avatar 1's swings forward (+z).
    assert o[0, knee, 1, 3] < o[0, 0, 1, 3] - 0.3
    assert o[1, knee, 2, 3] > o[0, knee, 2, 3] + 0.3


def test_grab_curls_fingers(rig):
    skel, bank, kern = rig
    import jax.numpy as jnp

    p = zero_pose_params(2)
    p = p.replace(grab_r=jnp.asarray([0.0, 1.0], jnp.float32))
    obj, _, _ = kern(p)
    o = np.asarray(obj)
    tip = skel.joint_index("RightHandIndex4")
    hand = skel.joint_index("RightHand")
    d_open = np.linalg.norm(o[0, tip, :3, 3] - o[0, hand, :3, 3])
    d_curl = np.linalg.norm(o[1, tip, :3, 3] - o[1, hand, :3, 3])
    assert d_curl < d_open * 0.75
    # Left hand untouched.
    ltip = skel.joint_index("LeftHandIndex4")
    np.testing.assert_allclose(o[0, ltip], o[1, ltip], atol=1e-6)


def test_root_transform_applies_to_world(rig):
    skel, bank, kern = rig
    import jax.numpy as jnp

    p = zero_pose_params(1)
    root = np.eye(4, dtype=np.float32)
    root[:3, 3] = [10.0, 20.0, 30.0]
    p = p.replace(root=jnp.asarray(root)[None])
    obj, world, _ = kern(p)
    np.testing.assert_allclose(np.asarray(world)[0, 0, :3, 3],
                               np.asarray(obj)[0, 0, :3, 3] + [10, 20, 30],
                               atol=1e-5)


def test_nonlooping_clip_clamps_at_end(rig):
    skel, bank, kern = rig
    import jax.numpy as jnp

    ci = bank.clip_index("Wave")
    nf = float(np.asarray(bank.n_frames)[ci])
    p = zero_pose_params(2)
    p = p.replace(clip_a=jnp.full((2,), ci, jnp.int32),
                  clip_b=jnp.full((2,), ci, jnp.int32),
                  frame_a=jnp.asarray([nf - 1.0, nf + 50.0], jnp.float32),
                  frame_b=jnp.asarray([nf - 1.0, nf + 50.0], jnp.float32))
    obj, _, _ = kern(p)
    o = np.asarray(obj)
    np.testing.assert_allclose(o[0], o[1], atol=1e-5)


def test_walk_clip_is_periodic_and_antisymmetric(rig):
    skel, bank, kern = rig
    clips = {c.name: c for c in build_default_clips(skel)}
    walk = clips["walking"]
    # Duration ~= the reference's measured walk cycle (1.015 s).
    assert abs(walk.duration - 1.015) < 0.06
    lu, ru = skel.joint_index("LeftUpLeg"), skel.joint_index("RightUpLeg")
    half = walk.num_frames // 2
    # Legs swap roles half a cycle later.
    np.testing.assert_allclose(walk.rot[0, lu], walk.rot[half, ru], atol=0.05)

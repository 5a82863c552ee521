"""Batched skeletal pose evaluation — one jitted kernel for ALL avatars.

Pipeline per tick (mirrors the reference's per-avatar node evaluation,
restructured as one device program over every avatar at once):

1. sample clip A and clip B at their fractional frame (two flat row
   gathers into the uniform-rate clip bank + nlerp)
2. cross-fade A -> B by the transition weight
   (AvatarGraphics.cpp:225 transition blends, 0.3/0.2/0.1 s durations)
3. procedural rotation OVERRIDES on named slots (procedural_rot_mask
   semantics, AvatarGraphics.cpp:98-106: head/neck look, eye saccades,
   IK shoulder/elbow) and finger-curl grab poses driven by one scalar
   per hand (AvatarGraphics.cpp:512-568's fixed joint rotations)
4. local TRS matrices, then post-multiplied procedural transforms on
   named slots (procedural_transform semantics: sitting leg/arm bends,
   lean — node_transform = TRS * procedural_transform,
   AvatarGraphics.cpp:324-325)
5. level-order forward kinematics (static per-level joint index arrays;
   each level is one batched 4x4 matmul + scatter at static indices)
6. world = root @ fk;  skin = fk @ inverse_bind

Reference: gui_client/AvatarGraphics.cpp + glare-core AnimationData
(node_hierarchical_to_object / skinning matrix production).
"""

from __future__ import annotations

from functools import partial

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from substrata_tpu.anim.clips import ClipBank
from substrata_tpu.anim.skeleton import Skeleton, axis_angle_quat_np, _quat_mul_np

# Named joints that procedural overrides / post-transforms can target.
# Order is the slot index used in PoseParams.override_* / post_*.
PROC_SLOTS = (
    "Hips", "Spine2", "Neck", "Head", "LeftEye", "RightEye",
    "LeftUpLeg", "RightUpLeg", "LeftLeg", "RightLeg", "LeftFoot",
    "RightFoot", "LeftArm", "RightArm", "LeftForeArm", "RightForeArm",
    "LeftHand", "RightHand",
)
NUM_SLOTS = len(PROC_SLOTS)


@flax.struct.dataclass
class PoseParams:
    """Per-avatar pose inputs, batched on a leading avatar axis."""

    clip_a: jnp.ndarray        # [A] i32 — outgoing clip
    clip_b: jnp.ndarray        # [A] i32 — incoming/current clip
    frame_a: jnp.ndarray       # [A] f32 fractional frame into clip_a
    frame_b: jnp.ndarray       # [A] f32
    blend: jnp.ndarray         # [A] f32 weight of clip_b (1 = fully b)
    override_rot: jnp.ndarray  # [A, S, 4] replaces sampled local rotation
    override_mask: jnp.ndarray  # [A, S] bool
    post_rot: jnp.ndarray      # [A, S, 4] post-multiplied rotation
    post_mask: jnp.ndarray     # [A, S] bool
    grab_l: jnp.ndarray        # [A] f32 0..1 left-hand finger curl
    grab_r: jnp.ndarray        # [A] f32
    root: jnp.ndarray          # [A, 4, 4] object -> world


def zero_pose_params(n: int) -> PoseParams:
    ident = jnp.tile(jnp.asarray([0, 0, 0, 1], jnp.float32), (n, NUM_SLOTS, 1))
    return PoseParams(
        clip_a=jnp.zeros((n,), jnp.int32),
        clip_b=jnp.zeros((n,), jnp.int32),
        frame_a=jnp.zeros((n,), jnp.float32),
        frame_b=jnp.zeros((n,), jnp.float32),
        blend=jnp.ones((n,), jnp.float32),
        override_rot=ident, override_mask=jnp.zeros((n, NUM_SLOTS), bool),
        post_rot=ident, post_mask=jnp.zeros((n, NUM_SLOTS), bool),
        grab_l=jnp.zeros((n,), jnp.float32),
        grab_r=jnp.zeros((n,), jnp.float32),
        root=jnp.tile(jnp.eye(4, dtype=jnp.float32), (n, 1, 1)),
    )


def _nlerp(qa, qb, w):
    """Normalised lerp with hemisphere fix; w broadcasts on the last axis."""
    dot = jnp.sum(qa * qb, axis=-1, keepdims=True)
    qb = jnp.where(dot < 0.0, -qb, qb)
    q = qa + (qb - qa) * w
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)


def _quat_mat3(q):
    """[.., 4] xyzw -> [.., 3, 3]."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                    2 * (x * z + w * y)], -1)
    r1 = jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                    2 * (y * z - w * x)], -1)
    r2 = jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                    1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([r0, r1, r2], -2)


# Grab finger poses (AvatarGraphics.cpp:512-568): absolute local rotations
# that REPLACE the animation rotation while gripping.  Finger segments 1-3
# bend around local X by 1.0/0.7/1.2 rad; thumbs get bespoke rotations
# (mirrored z for the right hand).
def _grab_quats(side_sign: float) -> np.ndarray:
    def q(*aas):
        out = np.array([0, 0, 0, 1], np.float32)
        for axis, ang in aas:
            out = _quat_mul_np(out, axis_angle_quat_np(axis, ang))
        return out

    s = side_sign
    j1, j2, j3 = 1.0, 0.7, 1.2
    rows = [q(((0, 0, 1), 0.5 * s), ((1, 0, 0), 0.9)),       # Thumb1
            q(((0, 0, 1), -0.2 * s)),                         # Thumb2
            q(((1, 0, 0), 0.9), ((0, 0, 1), -1.1 * s))]       # Thumb3
    for _f in ("Index", "Middle", "Ring", "Pinky"):
        rows += [q(((1, 0, 0), j1)), q(((1, 0, 0), j2)), q(((1, 0, 0), j3))]
    return np.stack(rows)


def _finger_joint_indices(skel: Skeleton, side: str) -> np.ndarray:
    names = []
    for f in ("Thumb", "Index", "Middle", "Ring", "Pinky"):
        names += [f"{side}Hand{f}{k}" for k in (1, 2, 3)]
    return np.array([skel.joint_index(n) for n in names], np.int32)


class PoseKernel:
    """Compiled pose evaluator for one (skeleton, clip bank) pair.

    __call__(params) -> (joints_obj [A,J,4,4] object-space hierarchical
    transforms, joints_world [A,J,4,4] with the root applied, skin
    [A,J,4,4] skinning matrices = joints_obj @ inverse_bind)."""

    def __init__(self, skeleton: Skeleton, bank: ClipBank):
        self.skeleton = skeleton
        self.bank = bank
        self.num_joints = skeleton.num_joints

        levels = skeleton.levels()
        self._levels = [(jnp.asarray(lvl),
                         jnp.asarray(skeleton.parents[lvl]))
                        for lvl in levels[1:] if len(lvl)]
        self._rest_scale = jnp.asarray(skeleton.rest_scale)
        self._inverse_bind = jnp.asarray(skeleton.inverse_bind)
        self._slot_idx = jnp.asarray(np.array(
            [max(skeleton.joint_index(n), 0) for n in PROC_SLOTS], np.int32))
        self._slot_ok = jnp.asarray(np.array(
            [skeleton.joint_index(n) >= 0 for n in PROC_SLOTS]))
        fl = _finger_joint_indices(skeleton, "Left")
        fr = _finger_joint_indices(skeleton, "Right")
        self._fingers_ok = bool((fl >= 0).all() and (fr >= 0).all())
        self._f_idx_l = jnp.asarray(np.maximum(fl, 0))
        self._f_idx_r = jnp.asarray(np.maximum(fr, 0))
        self._grab_l = jnp.asarray(_grab_quats(+1.0))
        self._grab_r = jnp.asarray(_grab_quats(-1.0))
        self._jit = jax.jit(self._pose, static_argnames=())

    # ------------------------------------------------------------------
    def _sample(self, rot_bank, trans_bank, n_frames, looping, clip, frame):
        a = clip.shape[0]
        j = self.num_joints
        nf = n_frames[clip]                       # [A]
        loop = looping[clip]
        f0 = jnp.floor(frame)
        frac = (frame - f0)[:, None, None]

        def wrap(f):
            return jnp.where(loop, jnp.mod(f, nf),
                             jnp.clip(f, 0.0, nf - 1.0)).astype(jnp.int32)

        base = clip * self.bank.f_cap
        r0 = rot_bank[base + wrap(f0)].reshape(a, j, 4)
        r1 = rot_bank[base + wrap(f0 + 1.0)].reshape(a, j, 4)
        t0 = trans_bank[base + wrap(f0)].reshape(a, j, 3)
        t1 = trans_bank[base + wrap(f0 + 1.0)].reshape(a, j, 3)
        return _nlerp(r0, r1, frac), t0 + (t1 - t0) * frac

    def _pose(self, rot_bank, trans_bank, n_frames, looping, p: PoseParams):
        a = p.clip_a.shape[0]
        j = self.num_joints
        qa, ta = self._sample(rot_bank, trans_bank, n_frames, looping,
                              p.clip_a, p.frame_a)
        qb, tb = self._sample(rot_bank, trans_bank, n_frames, looping,
                              p.clip_b, p.frame_b)
        w = p.blend[:, None, None]
        q = _nlerp(qa, qb, w)
        t = ta + (tb - ta) * w

        # Procedural rotation overrides at the named slots.
        sidx = self._slot_idx
        mask = (p.override_mask & self._slot_ok[None, :])[..., None]
        q = q.at[:, sidx].set(jnp.where(mask, p.override_rot, q[:, sidx]))

        # Finger grab curls (replace sampled rotation, scaled by grab).
        if self._fingers_ok:
            for f_idx, const_q, grab in ((self._f_idx_l, self._grab_l,
                                          p.grab_l),
                                         (self._f_idx_r, self._grab_r,
                                          p.grab_r)):
                ident = jnp.zeros((a, f_idx.shape[0], 4),
                                  jnp.float32).at[..., 3].set(1.0)
                curled = _nlerp(ident, jnp.broadcast_to(
                    const_q[None], (a,) + const_q.shape),
                    grab[:, None, None])
                use = (grab > 1e-3)[:, None, None]
                q = q.at[:, f_idx].set(
                    jnp.where(use, curled, q[:, f_idx]))

        # Local TRS matrices (scale comes from the rest pose; clips do not
        # animate scale).
        m3 = _quat_mat3(q) * self._rest_scale[None, :, None, :]
        local = jnp.zeros((a, j, 4, 4), jnp.float32)
        local = local.at[..., :3, :3].set(m3)
        local = local.at[..., :3, 3].set(t)
        local = local.at[..., 3, 3].set(1.0)

        # Post-multiplied procedural transforms at the named slots.
        pm3 = _quat_mat3(p.post_rot)
        pmat = jnp.zeros((a, NUM_SLOTS, 4, 4), jnp.float32)
        pmat = pmat.at[..., :3, :3].set(pm3)
        pmat = pmat.at[..., 3, 3].set(1.0)
        pmask = (p.post_mask & self._slot_ok[None, :])[..., None, None]
        cur = local[:, sidx]
        local = local.at[:, sidx].set(
            jnp.where(pmask, jnp.einsum("asij,asjk->asik", cur, pmat), cur))

        # Level-order FK (static index arrays: each level is one batched
        # matmul + scatter at compile-time-constant rows).
        world = local
        for idx, par in self._levels:
            pw = world[:, par]
            world = world.at[:, idx].set(
                jnp.einsum("alij,aljk->alik", pw, local[:, idx]))

        world_ws = jnp.einsum("aij,aljk->alik", p.root, world)
        skin = jnp.einsum("aljk,lkm->aljm", world, self._inverse_bind)
        return world, world_ws, skin

    def __call__(self, params: PoseParams):
        return self._jit(self.bank.rot, self.bank.trans, self.bank.n_frames,
                         self.bank.looping, params)

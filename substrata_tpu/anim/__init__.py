"""Skeletal animation: skeletons, clip banks, batched pose evaluation.

TPU-native equivalent of the reference's AvatarGraphics.cpp +
AnimationManager.cpp + glare-core AnimationData runtime: animation clips
are resampled to a uniform frame rate at load (sampling = two row gathers
+ nlerp instead of per-channel keyframe search), and ALL avatars' skeletons
are posed by one batched jitted kernel per tick (sample -> blend ->
procedural overrides -> level-order forward kinematics -> skinning
matrices).
"""

from substrata_tpu.anim.skeleton import Skeleton, build_default_humanoid
from substrata_tpu.anim.clips import AnimationClip, ClipBank, CLIP_RATE
from substrata_tpu.anim.pose import PoseKernel, PROC_SLOTS

__all__ = [
    "Skeleton", "build_default_humanoid",
    "AnimationClip", "ClipBank", "CLIP_RATE",
    "PoseKernel", "PROC_SLOTS",
]

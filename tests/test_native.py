"""Native C++ runtime library tests (native/substrata_native.cpp via
runtime/native.py ctypes bindings).  Skipped when the library isn't built
(CI builds it with `make -C native`)."""

import numpy as np
import pytest

from substrata_tpu.runtime import native


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native library not built")


def test_snapshot_codec_roundtrip():
    n = 17
    rng = np.random.default_rng(0)
    uids = np.arange(100, 100 + n).astype(np.uint64)
    pos = rng.normal(size=(n, 3)).astype(np.float32)
    quat = rng.normal(size=(n, 4)).astype(np.float32)
    lv = rng.normal(size=(n, 3)).astype(np.float32)
    av = rng.normal(size=(n, 3)).astype(np.float32)
    t = rng.uniform(0, 100, n)
    data = native.pack_physics_snapshots(uids, pos, quat, lv, av, t)
    u2, p2, q2, l2, a2, t2 = native.unpack_physics_snapshots(data)
    np.testing.assert_array_equal(u2, uids)
    np.testing.assert_allclose(p2, pos)
    np.testing.assert_allclose(q2, quat)
    np.testing.assert_allclose(t2, t)


@needs_native
def test_native_audio_ring():
    ring = native.NativeAudioRing(capacity_frames=1024)
    frames = np.stack([np.linspace(-2, 2, 300, dtype=np.float32)] * 2, axis=1)
    wrote = ring.write(frames)
    assert wrote == 300
    assert ring.queued_frames == 300
    out = ring.read(200)
    assert out.shape == (200, 2)
    # Clamped to [-1, 1] like the device callback.
    assert out.min() >= -1.0 and out.max() <= 1.0
    assert ring.queued_frames == 100
    # Underflow zero-pads.
    out2 = ring.read(500)
    assert np.all(out2[100:] == 0.0)
    assert ring.queued_frames == 0


@needs_native
def test_native_ring_wraps():
    ring = native.NativeAudioRing(capacity_frames=256)
    chunk = np.ones((200, 2), np.float32) * 0.5
    for _ in range(5):
        ring.write(chunk)
        out = ring.read(200)
        assert np.allclose(out[:ring_written(out)], 0.5)


def ring_written(out):
    nz = np.nonzero(out[:, 0])[0]
    return (nz[-1] + 1) if len(nz) else 0


@needs_native
def test_native_greedy_mesher_matches_python():
    from substrata_tpu.shared.voxel import make_greedy_mesh
    rng = np.random.default_rng(1)
    coords = np.unique(rng.integers(0, 6, size=(300, 3)), axis=0)
    mats = (coords[:, 0] % 2).astype(np.int32)
    nat = native.greedy_mesh_voxels_native(coords, mats, 1.0)
    assert nat is not None
    py = make_greedy_mesh(coords, mats, 1.0, use_native=False)
    # Same triangle count and same total surface area.
    def area(verts, tris):
        v = verts[tris]
        return float(np.abs(np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])).sum())
    assert len(nat[1]) == len(py[1])
    assert area(*nat[:2]) == pytest.approx(area(*py[:2]), rel=1e-5)


@needs_native
def test_native_mesher_single_voxel():
    nat = native.greedy_mesh_voxels_native(np.array([[0, 0, 0]], np.int32),
                                           np.array([3], np.int32), 2.0)
    verts, tris, tmats = nat
    assert len(verts) == 8
    assert len(tris) == 12
    assert (tmats == 3).all()
    assert verts.max() == 2.0

"""OBJ / STL / MagicaVoxel VOX decoders (shared/model_formats.py) — the
remaining entries of ModelLoading.cpp's format dispatch (487-948)."""

import struct

import numpy as np
import pytest

from substrata_tpu.shared.model_formats import (UnsupportedModelFormat,
                                                decode_model, load_igmesh,
                                                load_obj, load_stl, load_vox)

CUBE_OBJ = b"""
# unit cube
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
v 0 0 1
v 1 0 1
v 1 1 1
v 0 1 1
usemtl red
f 1 2 3 4
f 5 8 7 6
usemtl blue
f 1/1 5/2/3 6//4 2
f 2 6 7 3
f 3 7 8 4
f 4 8 5 1
"""


def test_obj_cube():
    v, t, m = load_obj(CUBE_OBJ)
    assert v.shape == (8, 3)
    # 6 quads fan-triangulated -> 12 triangles.
    assert t.shape == (12, 3)
    assert m.shape == (12,)
    assert set(np.unique(m)) == {0, 1}           # usemtl red / blue
    assert v.min() == 0.0 and v.max() == 1.0


def test_obj_negative_indices():
    data = b"v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n"
    v, t, m = load_obj(data)
    assert t.tolist() == [[0, 1, 2]]


def _binary_stl(tri_pts):
    n = len(tri_pts)
    out = [b"\0" * 80, struct.pack("<I", n)]
    for tri in tri_pts:
        rec = struct.pack("<3f", 0, 0, 1)
        for p in tri:
            rec += struct.pack("<3f", *p)
        rec += b"\0\0"
        out.append(rec)
    return b"".join(out)


def test_stl_binary_and_ascii():
    tris = [[(0, 0, 0), (1, 0, 0), (0, 1, 0)],
            [(1, 0, 0), (1, 1, 0), (0, 1, 0)]]
    v, t, m = load_stl(_binary_stl(tris))
    assert len(t) == 2 and len(v) == 4          # shared corners deduped
    ascii_stl = b"solid x\n"
    for tri in tris:
        ascii_stl += b"facet normal 0 0 1\nouter loop\n"
        for p in tri:
            ascii_stl += ("vertex %g %g %g\n" % p).encode()
        ascii_stl += b"endloop\nendfacet\n"
    ascii_stl += b"endsolid x\n"
    v2, t2, m2 = load_stl(ascii_stl)
    assert len(t2) == 2 and len(v2) == 4
    assert np.allclose(np.sort(v.ravel()), np.sort(v2.ravel()))


def _vox_file(voxels):
    xyzi = struct.pack("<I", len(voxels))
    for (x, y, z, c) in voxels:
        xyzi += struct.pack("<4B", x, y, z, c)
    size = struct.pack("<3I", 8, 8, 8)

    def chunk(cid, body, children=b""):
        return (cid + struct.pack("<II", len(body), len(children))
                + body + children)

    children = chunk(b"SIZE", size) + chunk(b"XYZI", xyzi)
    return b"VOX " + struct.pack("<I", 150) + chunk(b"MAIN", b"", children)


def test_vox_two_voxels():
    v, t, m = load_vox(_vox_file([(0, 0, 0, 1), (1, 0, 0, 7)]))
    # Two voxels of different materials: no interior face culling between
    # them, both palette colours present as compact ids.
    assert v.shape[1] == 3 and t.shape[1] == 3
    assert set(np.unique(m)) == {0, 1}
    assert v[:, 0].max() == 2.0                  # spans two 1 m voxels in x


def test_decode_model_dispatch():
    v, t, m = decode_model("thing.OBJ", CUBE_OBJ)
    assert len(t) == 12
    with pytest.raises(UnsupportedModelFormat):
        decode_model("mesh.igmesh", b"xx")   # truncated header
    with pytest.raises(UnsupportedModelFormat):
        decode_model("mesh.wat", b"xx")


def make_igmesh(verts, tris, quads, version=4, mats=(b"",),
                compression=0, trailing=b""):
    """Serialise an uncompressed v3/v4 igmesh (layout verified against
    resources/models/{cone,wedge}.igmesh — see load_igmesh docstring)."""
    out = [struct.pack("<II", 5456751, version)]
    if version >= 4:
        out.append(struct.pack("<I", compression))
    out.append(struct.pack("<I", 1))              # num_uv_mappings
    out.append(struct.pack("<I", len(mats)))
    for mname in mats:
        pad = (-len(mname)) % 4
        out.append(struct.pack("<I", len(mname)) + mname + b"\0" * pad)
    out.append(struct.pack("<I", 0))              # uv-set expositions
    out.append(struct.pack("<I", len(verts)))
    out.append(np.asarray(verts, "<f4").tobytes())
    out.append(struct.pack("<III", 0, 0, 0))      # normals, colours, uvs
    out.append(struct.pack("<I", len(tris)))
    for t in tris:
        out.append(struct.pack("<7I", t[0], t[1], t[2], 0, 0, 0, t[3]))
    out.append(struct.pack("<I", len(quads)))
    for q in quads:
        out.append(struct.pack("<9I", q[0], q[1], q[2], q[3],
                               0, 0, 0, 0, q[4]))
    return b"".join(out) + trailing


def test_igmesh_roundtrip_tris_and_quads():
    verts = [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0), (0, 0, 1)]
    data = make_igmesh(verts, tris=[(0, 1, 4, 2)],
                       quads=[(0, 1, 2, 3, 5)], mats=(b"brick", b""))
    v, t, m = decode_model("wedge.igmesh", data)
    assert v.shape == (5, 3) and v.dtype == np.float32
    # 1 triangle + quad fanned into 2, with the quad's material on both.
    assert t.tolist() == [[0, 1, 4], [0, 1, 2], [0, 2, 3]]
    assert m.tolist() == [2, 5, 5]


def test_igmesh_rejects_bad_input():
    verts = [(0, 0, 0), (1, 0, 0), (1, 1, 0)]
    good = make_igmesh(verts, tris=[(0, 1, 2, 0)], quads=[])
    with pytest.raises(UnsupportedModelFormat):   # flag=1 but not zstd data
        load_igmesh(make_igmesh(verts, [(0, 1, 2, 0)], [], compression=1))
    with pytest.raises(UnsupportedModelFormat):   # truncated mid-array
        load_igmesh(good[:-8])
    with pytest.raises(UnsupportedModelFormat):   # trailing garbage
        load_igmesh(good + b"\0\0\0\0")
    with pytest.raises(UnsupportedModelFormat):   # out-of-range index
        load_igmesh(make_igmesh(verts, tris=[(0, 1, 9, 0)], quads=[]))
    with pytest.raises(UnsupportedModelFormat):   # unknown compression flag
        load_igmesh(make_igmesh(verts, [(0, 1, 2, 0)], [], compression=7))


def test_igmesh_compressed_roundtrip():
    """Compressed igmesh path (ModelLoading.cpp:862 reads any igmesh via
    the Indigo SDK; live Indigo assets are typically written compressed):
    write_igmesh(compressed=True) -> load_igmesh round-trips exactly, and
    the compressed file is smaller than the uncompressed one."""
    from substrata_tpu.shared.model_formats import write_igmesh
    rng = np.random.default_rng(0)
    verts = rng.uniform(-1, 1, (256, 3)).astype(np.float32)
    tris = rng.integers(0, 256, (300, 3)).astype(np.int32)
    mats = rng.integers(0, 4, 300).astype(np.int32)
    plain = write_igmesh(verts, tris, mats, compressed=False)
    comp = write_igmesh(verts, tris, mats, compressed=True)
    assert len(comp) < len(plain)
    for blob in (plain, comp):
        v, t, m = load_igmesh(blob)
        np.testing.assert_array_equal(v, verts)
        np.testing.assert_array_equal(t, tris)
        np.testing.assert_array_equal(m, mats)
    # Corrupted zstd frame fails loudly.
    with pytest.raises(UnsupportedModelFormat):
        load_igmesh(comp[:-4])


def test_igmesh_material_name_layouts():
    """Non-empty material names parse under BOTH the 4-byte-padded and the
    unpadded length-prefixed layout (the sample assets can't arbitrate —
    their names are empty; the strict EOF check picks the right variant)."""
    from substrata_tpu.shared.model_formats import write_igmesh
    verts = np.eye(3, dtype=np.float32)
    tris = np.array([[0, 1, 2]], np.int32)
    for pad in (True, False):
        blob = write_igmesh(verts, tris, material_names=("brick", "x", ""),
                            pad_names=pad)
        v, t, m = load_igmesh(blob)
        np.testing.assert_array_equal(t, tris)


@pytest.mark.skipif(not __import__("os").path.exists(
    "/root/reference/resources/models/cone.igmesh"),
    reason="reference assets not present")
def test_igmesh_decodes_reference_samples():
    """The reference's own generated primitives decode with the expected
    topology (MeshBuilding.cpp:755 writes these via the Indigo SDK)."""
    for name, nv, ntris in (("cone", 1440, 720), ("wedge", 6, 8)):
        raw = open(f"/root/reference/resources/models/{name}.igmesh",
                   "rb").read()
        v, t, m = decode_model(f"{name}.igmesh", raw)
        assert v.shape == (nv, 3)
        assert t.shape == (ntris, 3)
        assert t.max() < nv and t.min() >= 0
        assert (m == 0).all()
        # Sanity: wedge spans the unit cube around the origin.
        if name == "wedge":
            assert np.allclose(abs(v).max(), 0.5)


@pytest.mark.slow
def test_client_loads_obj_object():
    """End-to-end: an OBJ-model dynamic object becomes a convex hull that
    rests at the right height (same flow as the glTF test)."""
    from tests.test_client_app import DT, make_app
    from substrata_tpu.shared.world_object import DYNAMIC_FLAG, WorldObject
    app = make_app()
    app.provide_resource("cube.obj", CUBE_OBJ)
    ob = WorldObject(model_url="cube.obj", mass=10.0, flags=DYNAMIC_FLAG | 1,
                     pos=np.array([0.0, 3.0, 2.0]))
    app.create_object(ob)
    assert ob.physics_object.shape.shape_type == 3  # HULL, not placeholder
    for _ in range(180):
        app.timer_event(DT)
    assert abs(ob.physics_object.pos[2] - 0.5) < 0.1, ob.physics_object.pos

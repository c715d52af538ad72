"""Scene I/O coverage (VERDICT r3 weak #6: load_obj/load_ply had zero test
coverage — the only file-format boundary in L0)."""

import io

import numpy as np
import pytest

from tpurt.core.scene import load_obj, load_ply, make_bunny_scene, save_obj


def test_obj_round_trip(tmp_path):
    scene, _ = make_bunny_scene(num_tris=300)
    p = tmp_path / "knot.obj"
    save_obj(p, scene.tris)
    tris = load_obj(str(p))
    np.testing.assert_allclose(
        np.asarray(tris.verts), np.asarray(scene.tris.verts), rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(tris.faces), np.asarray(scene.tris.faces)
    )


def test_obj_polygons_negative_indices_and_slashes():
    obj = io.StringIO(
        "# comment\n"
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "f 1/1/1 2/2/2 3/3/3 4/4/4\n"   # quad with vt/vn -> fan = 2 tris
        "f -4 -3 -2\n"                   # negative (relative) indices
    )
    tris = load_obj(obj)
    f = np.asarray(tris.faces)
    assert f.shape == (3, 3)
    np.testing.assert_array_equal(f[0], [0, 1, 2])
    np.testing.assert_array_equal(f[1], [0, 2, 3])
    np.testing.assert_array_equal(f[2], [0, 1, 2])


def test_obj_malformed_raises():
    with pytest.raises((ValueError, IndexError)):
        load_obj(io.StringIO("v 0 0\nf 1 2 3\n"))  # 2-component vertex


def test_ply_ascii_round_trip(tmp_path):
    p = tmp_path / "tri.ply"
    p.write_bytes(
        b"ply\nformat ascii 1.0\n"
        b"element vertex 4\n"
        b"property float x\nproperty float y\nproperty float z\n"
        b"element face 2\n"
        b"property list uchar int vertex_indices\n"
        b"end_header\n"
        b"0 0 0\n1 0 0\n1 1 0\n0 1 0\n"
        b"3 0 1 2\n4 0 1 2 3\n"  # tri + quad (fanned)
    )
    tris = load_ply(str(p))
    assert np.asarray(tris.verts).shape == (4, 3)
    assert np.asarray(tris.faces).shape == (3, 3)  # 1 + fan(2)


def test_ply_binary_le(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], "<f4")
    p = tmp_path / "b.ply"
    body = verts.tobytes() + bytes([3]) + np.array([0, 1, 2], "<i4").tobytes()
    p.write_bytes(
        b"ply\nformat binary_little_endian 1.0\n"
        b"element vertex 3\n"
        b"property float x\nproperty float y\nproperty float z\n"
        b"element face 1\n"
        b"property list uchar int vertex_indices\n"
        b"end_header\n" + body
    )
    tris = load_ply(str(p))
    np.testing.assert_allclose(np.asarray(tris.verts), verts)
    np.testing.assert_array_equal(np.asarray(tris.faces), [[0, 1, 2]])


def test_ply_unknown_format_raises(tmp_path):
    p = tmp_path / "bad.ply"
    p.write_bytes(
        b"ply\nformat binary_big_endian 1.0\nelement vertex 0\n"
        b"element face 0\nproperty list uchar int vertex_indices\n"
        b"end_header\n"
    )
    with pytest.raises(ValueError, match="unsupported"):
        load_ply(str(p))

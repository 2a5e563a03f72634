"""Native C++ runtime layer: OBJ parser, diameter, frame ring."""

import numpy as np
import pytest

from foundationpose_cpp_tpu import native
from foundationpose_cpp_tpu.meshio import mesh_loader as ml
from foundationpose_cpp_tpu.meshio import procedural

HAVE_NATIVE = native.load_library() is not None

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="no C++ toolchain")


def test_native_obj_matches_python_parser(tmp_path):
    cube = procedural.textured_cube()
    obj = tmp_path / "cube.obj"
    tex = tmp_path / "cube_tex.png"
    procedural.write_obj(cube, str(obj), str(tex))

    got = native.parse_obj_native(str(obj))
    assert got is not None
    pos, uv, nrm, faces, texpath = got
    ppos, puv, pnrm, pfaces, ptex = ml._parse_obj(obj)
    np.testing.assert_allclose(pos, ppos, atol=1e-6)
    np.testing.assert_allclose(uv, puv, atol=1e-6)
    np.testing.assert_allclose(nrm, pnrm, atol=1e-6)
    np.testing.assert_array_equal(faces, pfaces)
    assert texpath and texpath.endswith("cube_tex.png")


def test_native_obj_quads_and_negative_indices(tmp_path):
    obj = tmp_path / "quad.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "f -4/-4 -3/-3 -2/-2 -1/-1\n"
    )
    got = native.parse_obj_native(str(obj))
    assert got is not None
    pos, uv, nrm, faces, _ = got
    assert pos.shape == (4, 3) and faces.shape == (2, 3)
    assert nrm is None
    np.testing.assert_allclose(uv, [[0, 0], [1, 0], [1, 1], [0, 1]])


def test_native_diameter_matches_python():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    got = native.mesh_diameter_native(pts)
    want = ml.mesh_diameter(pts)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_native_diameter_large_cloud():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(50_000, 3)).astype(np.float32) * [1.0, 0.3, 2.0]
    got = native.mesh_diameter_native(pts)
    want = ml.mesh_diameter(pts)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_native_diameter_exact_matches_bruteforce():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(700, 3)).astype(np.float32)
    diff = pts[:, None, :].astype(np.float64) - pts[None, :, :]
    want = float(np.sqrt((diff**2).sum(-1).max()))
    got = native.diameter_exact_native(pts)
    assert got == pytest.approx(want, rel=1e-12)  # same f64-over-f32 math
    assert native.diameter_exact_native(pts[:1]) == 0.0
    # the production path: mesh_diameter routes f32 input through the hull
    # + native exact sweep and must agree with the brute force
    np.testing.assert_allclose(ml.mesh_diameter(pts), want, rtol=1e-7)


def test_frame_ring_push_pop_latest():
    ring = native.FrameRing((4, 4, 3), np.uint8, capacity=3)
    assert ring.pop_latest() is None
    frames = [np.full((4, 4, 3), i, np.uint8) for i in range(5)]
    for f in frames:
        ring.push(f)
    out, skipped = ring.pop_latest()
    np.testing.assert_array_equal(out, frames[-1])
    assert skipped >= 1  # stale frames were skipped
    assert ring.dropped >= 1  # capacity-3 ring saw 5 pushes
    assert len(ring) == 0
    ring.close()


def test_frame_ring_threaded():
    import threading

    ring = native.FrameRing((8, 8), np.float32, capacity=8)
    n = 200

    def producer():
        for i in range(n):
            ring.push(np.full((8, 8), float(i), np.float32))

    t = threading.Thread(target=producer)
    t.start()
    seen_last = False
    for _ in range(100000):
        got = ring.pop_latest()
        if got is not None and float(got[0][0, 0]) == float(n - 1):
            seen_last = True
            break
        if not t.is_alive() and got is None:
            got2 = ring.pop_latest()
            if got2 is not None and float(got2[0][0, 0]) == float(n - 1):
                seen_last = True
            break
    t.join()
    if not seen_last:
        final = ring.pop_latest()
        seen_last = final is not None and float(final[0][0, 0]) == float(n - 1)
    assert seen_last


def test_native_partial_normals_match_python_rule(tmp_path):
    """A mesh where only SOME faces carry vn indices must report normals
    absent (the Python rule: all-or-nothing), so the loader recomputes them
    instead of shading the bare vertices black with zero normals."""
    obj = tmp_path / "partial.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 0 0 1\n"
        "vn 0 0 1\nvn 0 0 1\nvn 0 0 1\n"
        "f 1//1 2//2 3//3\n"
        "f 1 2 4\n"  # no normals on this face
    )
    got = native.parse_obj_native(str(obj))
    assert got is not None
    _, _, nrm, _, _ = got
    assert nrm is None  # matches ml._parse_obj's all() rule
    _, _, pnrm, _, _ = ml._parse_obj(obj)
    assert pnrm is None


def test_native_mtllib_tab_separated(tmp_path):
    """OBJ whitespace includes tabs; 'mtllib\\tfile.mtl' must still resolve
    the texture (the Python fallback's line.split() accepts it)."""
    (tmp_path / "m.mtl").write_text("newmtl m\nmap_Kd tex.png\n")
    obj = tmp_path / "tabbed.obj"
    obj.write_text(
        "mtllib\tm.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n"
    )
    got = native.parse_obj_native(str(obj))
    assert got is not None
    *_, texpath = got
    assert texpath and texpath.endswith("tex.png")


def test_native_parse_rejects_directory(tmp_path):
    """A directory named foo.obj opens via fopen but must fail cleanly
    (ftell returns -1), not crash the process."""
    d = tmp_path / "dir.obj"
    d.mkdir()
    assert native.parse_obj_native(str(d)) is None


def test_frame_ring_rejects_zero_capacity():
    """capacity=0 would be modulo-by-zero (SIGFPE) on the first push."""
    with pytest.raises(ValueError, match="capacity"):
        native.FrameRing((16,), np.uint8, capacity=0)


def _cube_with_tex(tmp_path):
    cube = procedural.textured_cube(size=0.1)
    return cube, str(tmp_path / "m.ply"), str(tmp_path / "m_tex.png")


@pytest.mark.parametrize("binary", [True, False], ids=["binary", "ascii"])
def test_native_ply_matches_python_parser(tmp_path, binary):
    from foundationpose_cpp_tpu.meshio.mesh_loader import _parse_ply
    import pathlib

    cube, ply, tex = _cube_with_tex(tmp_path)
    procedural.write_ply(cube, ply, tex, binary=binary)
    got = native.parse_ply_native(ply)
    assert got is not None, "native PLY parser unavailable/failed"
    pos, uv, nrm, faces, texpath = got
    p_pos, p_uv, p_nrm, p_faces, p_tex = _parse_ply(pathlib.Path(ply))
    np.testing.assert_allclose(pos, p_pos, rtol=1e-6)
    np.testing.assert_allclose(nrm, p_nrm, rtol=1e-6)
    np.testing.assert_allclose(uv, p_uv, rtol=1e-6)
    np.testing.assert_array_equal(faces, p_faces)
    assert texpath == p_tex  # both resolve the TextureFile comment


def test_native_ply_bare_positions(tmp_path):
    """No normals/uvs: has_* flags off, loader computes/falls back."""
    cube, ply, _ = _cube_with_tex(tmp_path)
    procedural.write_ply(cube, ply, binary=True, with_normals=False,
                         with_uvs=False)
    pos, uv, nrm, faces, texpath = native.parse_ply_native(ply)
    assert uv is None and nrm is None and texpath is None
    assert pos.shape[0] == cube.vertices.shape[0]
    assert faces.shape == tuple(np.asarray(cube.faces).shape)


def test_native_ply_quads_fan_triangulated(tmp_path):
    """Quad faces fan-triangulate exactly like the Python parser."""
    ply = str(tmp_path / "quad.ply")
    body = (
        "ply\nformat ascii 1.0\nelement vertex 4\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 1\nproperty list uchar int vertex_indices\n"
        "end_header\n"
        "0 0 0\n1 0 0\n1 1 0\n0 1 0\n"
        "4 0 1 2 3\n"
    )
    with open(ply, "w") as fh:
        fh.write(body)
    pos, uv, nrm, faces, _ = native.parse_ply_native(ply)
    np.testing.assert_array_equal(faces, [[0, 1, 2], [0, 2, 3]])


def test_native_ply_rejects_big_endian(tmp_path):
    ply = str(tmp_path / "be.ply")
    with open(ply, "w") as fh:
        fh.write(
            "ply\nformat binary_big_endian 1.0\nelement vertex 0\n"
            "property float x\nproperty float y\nproperty float z\n"
            "element face 0\nproperty list uchar int vertex_indices\n"
            "end_header\n"
        )
    assert native.parse_ply_native(ply) is None  # falls back to Python


def test_load_mesh_ply_uses_native_and_matches_obj(tmp_path):
    """load_mesh on a PLY goes through the native fast path and produces
    the same asset as the OBJ route (modulo OBJ's (v,vt,vn) dedup)."""
    from foundationpose_cpp_tpu.meshio.mesh_loader import load_mesh

    cube, ply, tex = _cube_with_tex(tmp_path)
    procedural.write_ply(cube, ply, tex, binary=True)
    asset = load_mesh("cube", ply)
    np.testing.assert_allclose(asset.vertices, cube.vertices, rtol=1e-6)
    np.testing.assert_array_equal(asset.faces, cube.faces)
    assert asset.texture.shape == cube.texture.shape
    np.testing.assert_allclose(asset.diameter, cube.diameter, rtol=1e-5)

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

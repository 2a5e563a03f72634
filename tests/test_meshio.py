"""Mesh loader: OBJ/PLY roundtrips, diameter, OBB, texture fallback."""

import numpy as np
import pytest

from foundationpose_cpp_tpu.meshio import mesh_loader as ml
from foundationpose_cpp_tpu.meshio import procedural


def test_cube_asset_properties():
    cube = procedural.textured_cube(size=0.1)
    assert cube.num_vertices == 24
    assert cube.num_faces == 12
    np.testing.assert_allclose(cube.diameter, np.sqrt(3) * 0.1, rtol=1e-6)
    np.testing.assert_allclose(cube.model_center, 0.0, atol=1e-7)
    np.testing.assert_allclose(np.sort(cube.dimensions), [0.1, 0.1, 0.1], rtol=1e-5)


def test_diameter_matches_bruteforce():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    diff = pts[:, None, :] - pts[None, :, :]
    want = np.sqrt((diff**2).sum(-1).max())
    np.testing.assert_allclose(ml.mesh_diameter(pts), want, rtol=1e-6)


def test_obb_matches_reference_pca():
    rng = np.random.default_rng(1)
    # anisotropic blob with a known principal direction
    pts = rng.normal(size=(500, 3)) * np.array([0.02, 0.1, 0.5])
    obb, dims = ml.compute_obb(pts.astype(np.float32))
    mean = pts.mean(axis=0)
    np.testing.assert_allclose(obb[:3, 3], mean, atol=1e-5)
    r = obb[:3, :3]
    np.testing.assert_allclose(r.T @ r, np.eye(3), atol=1e-5)
    # eigen order ascending: last column is the largest-variance axis (z here)
    assert abs(r[2, 2]) > 0.99
    assert dims[2] > dims[1] > dims[0]


def test_obj_roundtrip(tmp_path):
    cube = procedural.textured_cube()
    obj = tmp_path / "cube.obj"
    tex = tmp_path / "cube_tex.png"
    procedural.write_obj(cube, str(obj), str(tex))
    loaded = ml.load_mesh("cube2", str(obj))
    assert loaded.num_vertices == cube.num_vertices
    assert loaded.num_faces == cube.num_faces
    # the parser re-orders vertices by first appearance in faces (like
    # assimp); compare the face-corner expansion, which is order-invariant
    def corners(a):
        attrs = np.concatenate([a.vertices, a.texcoords, a.vertex_normals], axis=1)
        expanded = attrs[a.faces].reshape(-1, attrs.shape[1])
        return expanded[np.lexsort(expanded.T[::-1])]

    np.testing.assert_allclose(corners(loaded), corners(cube), atol=1e-4)
    np.testing.assert_allclose(loaded.diameter, cube.diameter, rtol=1e-5)
    # texture read back through the MTL chain
    assert loaded.texture.shape == cube.texture.shape
    np.testing.assert_allclose(loaded.texture, cube.texture, atol=2 / 255)


def test_obj_missing_texture_falls_back_to_gray(tmp_path):
    cube = procedural.textured_cube()
    obj = tmp_path / "cube.obj"
    procedural.write_obj(cube, str(obj))  # no mtl/texture written
    loaded = ml.load_mesh("cube3", str(obj))
    assert loaded.texture.shape == (2, 2, 3)
    np.testing.assert_allclose(loaded.texture, 100.0 / 255.0, atol=1e-6)


def test_obj_missing_uv_raises_unless_allowed(tmp_path):
    obj = tmp_path / "plain.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    with pytest.raises(ValueError, match="texture coordinates"):
        ml.load_mesh("plain", str(obj))
    loaded = ml.load_mesh("plain", str(obj), allow_missing_uv=True)
    assert loaded.texcoords.shape == (3, 2)
    # normals synthesized
    np.testing.assert_allclose(np.abs(loaded.vertex_normals[:, 2]), 1.0, atol=1e-6)


def test_obj_quad_triangulation(tmp_path):
    obj = tmp_path / "quad.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "f 1/1 2/2 3/3 4/4\n"
    )
    loaded = ml.load_mesh("quad", str(obj))
    assert loaded.num_faces == 2  # fan triangulated


def test_ply_ascii_and_binary(tmp_path):
    header = (
        "ply\nformat ascii 1.0\nelement vertex 3\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property float u\nproperty float v\n"
        "element face 1\nproperty list uchar int vertex_indices\nend_header\n"
    )
    body = "0 0 0 0 0\n1 0 0 1 0\n0 1 0 0 1\n3 0 1 2\n"
    ply = tmp_path / "tri.ply"
    ply.write_text(header + body)
    loaded = ml.load_mesh("tri", str(ply))
    assert loaded.num_vertices == 3 and loaded.num_faces == 1
    np.testing.assert_allclose(loaded.texcoords, [[0, 0], [1, 0], [0, 1]])

    import struct

    bheader = header.replace("format ascii 1.0", "format binary_little_endian 1.0")
    bbody = b""
    for row in [(0, 0, 0, 0, 0), (1, 0, 0, 1, 0), (0, 1, 0, 0, 1)]:
        bbody += struct.pack("<5f", *row)
    bbody += struct.pack("<B3i", 3, 0, 1, 2)
    bply = tmp_path / "tri_bin.ply"
    bply.write_bytes(bheader.encode() + bbody)
    loaded_b = ml.load_mesh("tri_bin", str(bply))
    np.testing.assert_allclose(loaded_b.vertices, loaded.vertices)
    np.testing.assert_allclose(loaded_b.texcoords, loaded.texcoords)


def test_sphere_asset_well_formed():
    sph = procedural.textured_uv_sphere(radius=0.05)
    assert sph.num_faces > 300
    np.testing.assert_allclose(sph.diameter, 0.1, rtol=1e-5)
    # normals point outward
    dots = (sph.vertex_normals * sph.vertices).sum(-1)
    assert (dots >= 0).all()


def test_ply_texture_file_comment(tmp_path):
    """PLY TextureFile comment discovery (MeshLab/Assimp convention)."""
    from PIL import Image

    tex = np.zeros((4, 4, 3), np.uint8)
    tex[..., 0] = 200  # red-ish
    Image.fromarray(tex).save(tmp_path / "skin.png")
    header = (
        "ply\nformat ascii 1.0\ncomment TextureFile skin.png\n"
        "element vertex 3\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property float u\nproperty float v\n"
        "element face 1\nproperty list uchar int vertex_indices\nend_header\n"
    )
    body = "0 0 0 0 0\n1 0 0 1 0\n0 1 0 0 1\n3 0 1 2\n"
    (tmp_path / "tex.ply").write_text(header + body)
    loaded = ml.load_mesh("tex", str(tmp_path / "tex.ply"))
    assert loaded.texture.shape == (4, 4, 3)
    np.testing.assert_allclose(loaded.texture[..., 0], 200 / 255.0, atol=1e-3)

    # missing referenced file -> gray fallback, no crash
    header2 = header.replace("skin.png", "missing.png")
    (tmp_path / "tex2.ply").write_text(header2 + body)
    loaded2 = ml.load_mesh("tex2", str(tmp_path / "tex2.ply"))
    assert loaded2.texture.shape == (2, 2, 3)


def test_procedural_house_asset():
    """House mesh: closed orientable surface, exact diameter, atlas UVs."""
    h = procedural.textured_house(size=0.1)
    assert h.faces.shape == (16, 3)
    # exact analytic diameter: apex (+-a, 0, d) to opposite bottom corner
    a, b, c, d = 0.05, 0.04, 0.03, 0.07
    expect = np.sqrt((2 * a) ** 2 + b**2 + (d + c) ** 2)
    assert abs(h.diameter - expect) < 1e-5
    # unit normals, valid indices, UVs inside the atlas
    n = np.linalg.norm(h.vertex_normals, axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-5)
    assert h.faces.min() >= 0 and h.faces.max() < h.num_vertices
    assert (h.texcoords >= 0).all() and (h.texcoords <= 1).all()
    # consistent outward winding: signed volume from face fans is positive
    v = h.vertices[h.faces]  # (F, 3, 3)
    vol = np.sum(np.einsum("fi,fi->f", v[:, 0], np.cross(v[:, 1], v[:, 2]))) / 6
    assert vol > 0, vol
    # and flat-face normals agree with the cross-product orientation
    geo = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    geo /= np.linalg.norm(geo, axis=-1, keepdims=True)
    stored = h.vertex_normals[h.faces[:, 0]]
    np.testing.assert_allclose((geo * stored).sum(-1), 1.0, atol=1e-5)


def test_procedural_face_colored_cube_unique_colors():
    """cube6: each face samples a distinct atlas color."""
    c6 = procedural.face_colored_cube()
    tex = c6.texture
    face_colors = []
    for f in range(6):
        uv = c6.texcoords[4 * f : 4 * f + 4].mean(0)
        ty = int(uv[1] * (tex.shape[0] - 1))
        tx = int(uv[0] * (tex.shape[1] - 1))
        face_colors.append(tuple(np.round(tex[ty, tx] / tex[ty, tx].max(), 1)))
    assert len(set(face_colors)) == 6, face_colors


def test_procedural_cubes_wound_outward():
    """Both cube variants pass the watertight/consistent-winding proof.

    The y-axis faces were wound backwards (handedness of the ordered
    remaining axes flips for +-y), which silently disabled backface
    culling in the fused renderer (cull_ok=False) and made the signed
    volume 1/3 of the true value.
    """
    from foundationpose_cpp_tpu.ops import render_fused as rf

    for asset in (procedural.textured_cube(size=0.1),
                  procedural.face_colored_cube(size=0.1)):
        c = asset.vertices - asset.vertices.mean(0)
        assert rf.winding_consistent_closed(c, asset.faces)
        assert abs(rf.signed_volume(c, asset.faces) - 0.001) < 1e-6

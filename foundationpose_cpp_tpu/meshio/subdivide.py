"""Texture-driven face subdivision: per-pixel texturing as a mesh preprocess.

The fused TPU render megakernel (ops/render_fused.py) samples the texture at
face corners and interpolates barycentrically -- zero per-pixel gathers. The
reference instead does a true bilinear texel fetch per pixel
(/root/reference/.../nvdiffrast/common/texture.cu:131-179). The two agree
when every face spans at most ~a texel; on a mesh whose faces cover many
texels of a high-frequency texture, vertex sampling low-passes the texture
and the scorer loses discrimination.

The TPU-native fix is geometric, not a gather: midpoint-subdivide exactly
those faces whose UV extent exceeds a texel budget until corner sampling IS
texel sampling. This trades a one-time mesh-build cost + a larger face table
(the megakernel scales with F) for reference-grade texture fidelity with
unchanged kernel structure. tests/test_texture_fidelity.py pins the
resulting error against the reference-semantics per-pixel texture path.
"""

from __future__ import annotations

import numpy as np

from foundationpose_cpp_tpu.meshio.mesh_loader import MeshAsset, make_mesh_asset


def _face_uv_texels(uvs: np.ndarray, faces: np.ndarray, th: int, tw: int) -> np.ndarray:
    """(F,) max UV extent of each face in texels."""
    fuv = uvs[faces]  # (F, 3, 2)
    span = fuv.max(axis=1) - fuv.min(axis=1)  # (F, 2)
    return np.maximum(span[:, 0] * tw, span[:, 1] * th)


def subdivide_for_texture(
    asset: MeshAsset,
    max_texels_per_face: float = 2.0,
    max_rounds: int = 6,
    max_faces: int = 200_000,
) -> MeshAsset:
    """Midpoint-subdivide faces until each spans <= max_texels_per_face.

    Vertices/normals/UVs are midpoint-interpolated (normals renormalized);
    edge midpoints are shared between neighbor faces via an edge cache, so
    the surface stays watertight. Faces already within budget are untouched.

    Note: midpoint UV interpolation assumes faces do not straddle a texture
    wrap seam internally (true for meshes with duplicated seam vertices,
    the standard layout).
    """
    verts = np.asarray(asset.vertices, np.float64)
    normals = np.asarray(asset.vertex_normals, np.float64)
    uvs = np.asarray(asset.texcoords, np.float64)
    faces = np.asarray(asset.faces, np.int64)
    th, tw = asset.texture.shape[:2]

    for _ in range(max_rounds):
        ext = _face_uv_texels(uvs, faces, th, tw)
        split = ext > max_texels_per_face
        if not split.any() or faces.shape[0] >= max_faces:
            break
        vlist = [verts]
        nlist = [normals]
        ulist = [uvs]
        next_idx = verts.shape[0]
        edge_mid: dict[tuple[int, int], int] = {}
        new_faces = []

        def midpoint(a: int, b: int) -> int:
            nonlocal next_idx
            key = (a, b) if a < b else (b, a)
            found = edge_mid.get(key)
            if found is not None:
                return found
            vlist.append((vlist[0][a] + vlist[0][b])[None] / 2.0)
            n = (nlist[0][a] + nlist[0][b]) / 2.0
            n /= max(np.linalg.norm(n), 1e-12)
            nlist.append(n[None])
            ulist.append((ulist[0][a] + ulist[0][b])[None] / 2.0)
            edge_mid[key] = next_idx
            next_idx += 1
            return next_idx - 1

        # midpoint() reads only vlist[0] (face corners index the CURRENT
        # round's mesh; midpoints are created, never re-read, in one round)
        for fi, f in enumerate(faces):
            if not split[fi]:
                new_faces.append(f)
                continue
            a, b, c = (int(x) for x in f)
            ab = midpoint(a, b)
            bc = midpoint(b, c)
            ca = midpoint(c, a)
            new_faces += [
                np.array([a, ab, ca]),
                np.array([ab, b, bc]),
                np.array([ca, bc, c]),
                np.array([ab, bc, ca]),
            ]
        verts = np.concatenate(vlist, axis=0)
        normals = np.concatenate(nlist, axis=0)
        uvs = np.concatenate(ulist, axis=0)
        faces = np.stack(new_faces).astype(np.int64)

    return make_mesh_asset(
        asset.name,
        verts.astype(np.float32),
        faces.astype(np.int32),
        uvs.astype(np.float32),
        normals.astype(np.float32),
        asset.texture,
    )

"""Render-and-compare front end: the reference FoundationPoseRenderer as one
pure function.

Reference: detection_6d_foundationpose/src/foundationpose_render.cpp (859 LoC
host orchestration + 522 LoC CUDA kernels + vendored nvdiffrast). What the
reference spreads over two CUDA streams, ~15 kernel launches, a 252-iteration
host warp loop and 4 stream syncs per call (RenderAndTransform, :814-857) is
here a single traced function -- XLA schedules the render branch and the
observed-crop branch concurrently inside one program, and nothing touches the
host.

Pipeline order matches NvdiffrastRender (:611-683) + RenderProcess (:685-729)
+ TransfProcess (:731-812) exactly; see ops/* for the per-kernel semantics.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from foundationpose_cpp_tpu.config import FoundationPoseConfig
from foundationpose_cpp_tpu.geometry import transforms
from foundationpose_cpp_tpu.meshio.mesh_loader import MeshAsset
from foundationpose_cpp_tpu.ops import pointcloud, warp
from foundationpose_cpp_tpu.ops import rasterize as ras


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "vertices", "normals", "texcoords", "faces", "face_valid", "texture",
        "model_center", "orient_bounds", "fused",
    ],
    meta_fields=["diameter"],
)
@dataclasses.dataclass(frozen=True)
class MeshConstants:
    """Device-resident mesh tensors, preprocessed once per mesh.

    Mirrors FoundationPoseRenderer::LoadTexturedMesh (:381-509): vertices are
    centered on the model center, the V texture coordinate is flipped, and the
    texture is float [0,1]. Faces are padded to a multiple of `face_pad` with
    a validity mask so every downstream shape is static.
    """

    vertices: jnp.ndarray  # (V, 3) centered
    normals: jnp.ndarray  # (V, 3)
    texcoords: jnp.ndarray  # (V, 2) v-flipped
    faces: jnp.ndarray  # (Fp, 3) int32, padded
    face_valid: jnp.ndarray  # (Fp,) bool
    texture: jnp.ndarray  # (Th, Tw, 3) f32
    diameter: float
    model_center: jnp.ndarray  # (3,)
    orient_bounds: jnp.ndarray  # (4, 4)
    fused: "FusedMeshTables"  # face-expanded tables for the megakernel

    @staticmethod
    def from_asset(
        asset: MeshAsset,
        face_pad: int = 128,
        fused_face_pad: int | None = None,
        auto_subdivide: bool = False,
        subdivide_tol: float = 0.05,
        subdivide_max_faces: int = 65_536,
        texture_patch_k: int | str = "auto",
    ) -> "MeshConstants":
        """texture_patch_k: fused-path texturing mode. >0 gives the
        megakernel per-face texel patches -- per-pixel texture fidelity
        evaluated arithmetically in-kernel (ops.render_fused
        face_texel_patches); 0 is corner-color interpolation. "auto"
        (default) measures the corner-sampling error and enables patches
        (k=4) only when any face would actually render differently
        (error > subdivide_tol): smooth/flat-per-face textures keep the
        corner path's ~10% faster phase 2, sharp textures get per-pixel
        fidelity at their ORIGINAL face count -- measured on a 13k-face
        speckled scan: render error 0.054 -> 0.031 for +14% render time,
        where the old subdivision-only policy paid 4x the faces and 1.6x
        the render time for LESS fidelity."""
        if texture_patch_k == "auto":
            from foundationpose_cpp_tpu.meshio.subdivide import (
                face_sampling_error,
            )

            err = face_sampling_error(
                asset.texture, np.asarray(asset.texcoords),
                np.asarray(asset.faces),
            )
            if float(err.max(initial=0.0)) > subdivide_tol:
                # corner sampling misses texture detail somewhere: pick the
                # CHEAPEST patch size within tolerance. pk drives the
                # phase-2 extraction-dot height (27 rows at pk2 vs 75 at
                # pk4, swept ~9% of render time on a v5e), so a smooth-
                # but-not-flat texture gets pk2 and only genuinely sharp
                # content pays for pk4.
                from foundationpose_cpp_tpu.ops.render_fused import (
                    face_patch_error,
                )

                # reduce="max" keeps this gate commensurable with the
                # worst-case face_sampling_error trigger above: pk2 is
                # chosen only when its worst probe passes the SAME
                # tolerance that demanded patches (mean would admit pk2
                # with above-tolerance local error; failing the gate just
                # pays pk4, the conservative choice)
                err2 = face_patch_error(
                    asset.texture, np.asarray(asset.texcoords),
                    np.asarray(asset.faces), pk=2, reduce="max",
                )
                texture_patch_k = (
                    2 if float(err2.max(initial=0.0)) <= subdivide_tol else 4
                )
            else:
                # corner sampling is already within tolerance on every
                # face; corner-mode subdivision uses the SAME metric and
                # threshold, so it would provably split nothing -- skip
                # the recomputation (it is the expensive half of scan-mesh
                # load time)
                texture_patch_k = 0
                auto_subdivide = False
        if auto_subdivide:
            # content-aware texture-fidelity policy: subdivide exactly the
            # faces whose sampling (patch or corner, matching the kernel
            # mode) deviates from per-pixel texturing (the reference
            # fetches per pixel, texture.cu:131-179). Meshes under
            # tolerance pass through untouched; the policy logs what it
            # did.
            from foundationpose_cpp_tpu.meshio.subdivide import (
                subdivide_adaptive,
            )

            asset, _ = subdivide_adaptive(
                asset, tol=subdivide_tol, max_faces=subdivide_max_faces,
                patch_k=texture_patch_k,
            )
        verts = asset.vertices - asset.model_center[None, :]
        uv = np.stack(
            [asset.texcoords[:, 0], 1.0 - asset.texcoords[:, 1]], axis=-1
        )
        f = asset.faces
        pad = (-f.shape[0]) % face_pad
        valid = np.ones((f.shape[0],), dtype=bool)
        if pad:
            f = np.concatenate([f, np.zeros((pad, 3), dtype=np.int32)], axis=0)
            valid = np.concatenate([valid, np.zeros((pad,), dtype=bool)])
        from foundationpose_cpp_tpu.ops.render_fused import FusedMeshTables

        return MeshConstants(
            vertices=jnp.asarray(verts, dtype=jnp.float32),
            normals=jnp.asarray(asset.vertex_normals, dtype=jnp.float32),
            texcoords=jnp.asarray(uv, dtype=jnp.float32),
            faces=jnp.asarray(f, dtype=jnp.int32),
            face_valid=jnp.asarray(valid),
            texture=jnp.asarray(asset.texture, dtype=jnp.float32),
            diameter=float(asset.diameter),
            model_center=jnp.asarray(asset.model_center, dtype=jnp.float32),
            orient_bounds=jnp.asarray(asset.orient_bounds, dtype=jnp.float32),
            fused=FusedMeshTables.from_asset(
                asset, face_pad=fused_face_pad,
                texture_patch_k=texture_patch_k,
            ),
        )


def render_and_transform(
    mesh: MeshConstants,
    poses: jnp.ndarray,
    rgb: jnp.ndarray,
    xyz_map: jnp.ndarray,
    K: jnp.ndarray,
    crop_ratio: float,
    cfg: FoundationPoseConfig,
    rasterize_fn: Any = None,
    use_fused: bool = False,
    image_hw: tuple | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Produce the two 6-channel model input crops for N poses.

    Args:
      poses: (N, 4, 4) object-in-camera hypotheses.
      rgb: (H, W, 3) uint8 observed image.
      xyz_map: (H, W, 3) f32 camera-frame points from the RAW depth
        (UploadDataToDevice computes it before any filtering,
        foundationpose.cpp:297-301).
      crop_ratio: 1.2 refine / 1.1 score.
      rasterize_fn: override for the rasterizer (Pallas kernel on TPU);
        defaults to the pure-XLA ops.rasterize.rasterize.
      image_hw: REAL (h, w) extents (possibly traced scalars) when rgb/xyz
        are zero-padded to a size bucket; None = use the array shape.

    Returns:
      (render_input, transf_input), each (N, crop_h, crop_w, 6) f32.
    """
    ch, cw = cfg.crop_window_h, cfg.crop_window_w
    h, w = image_hw if image_hw is not None else rgb.shape[:2]

    tfs = transforms.compute_crop_window_tf(
        poses, K, (ch, cw), crop_ratio, mesh.diameter
    )
    bbox2d = transforms.construct_bbox2d(tfs, ch, cw)
    clip_mat = transforms.pose_clip_matrix(
        poses, bbox2d, K, h, w, cfg.znear, cfg.zfar
    )

    render_input = render_branch(
        mesh, poses, clip_mat, ch, cw, cfg, rasterize_fn, use_fused
    )

    # ---- observed branch (TransfProcess) ----
    if use_fused:
        rgb_crop = warp.warp_crop_linear_u8_mxu(rgb, tfs, ch, cw)
        xyz_crop = warp.warp_crop_nearest_f32_mxu(xyz_map, tfs, ch, cw)
    else:
        rgb_crop = warp.warp_crop_linear_u8(rgb, tfs, ch, cw)
        xyz_crop = warp.warp_crop_nearest_f32(xyz_map, tfs, ch, cw)
    xyz_crop = pointcloud.threshold_and_downscale_pointcloud(
        xyz_crop, poses, mesh.diameter / 2.0, cfg.min_depth, cfg.max_depth
    )
    transf_input = pointcloud.concat_channels(rgb_crop, xyz_crop)
    return render_input, transf_input


def render_branch(
    mesh: MeshConstants,
    poses: jnp.ndarray,
    clip_mat: jnp.ndarray,
    ch: int,
    cw: int,
    cfg: FoundationPoseConfig,
    rasterize_fn: Any = None,
    use_fused: bool = False,
) -> jnp.ndarray:
    """Render branch only: N poses through clip matrices -> (N, ch, cw, 6).

    The RenderProcess half of RenderAndTransform (NvdiffrastRender,
    foundationpose_render.cpp:611-683 + threshold/concat :685-729): raster,
    barycentric attributes, texture, Lambert shade, v-flip, xyz
    threshold/diameter-downscale. Shared by the inference pipeline and the
    synthetic trainer (which renders observed frames with a full-image
    bbox, like utils.synthetic but traced).
    """
    rasterizer = rasterize_fn if rasterize_fn is not None else ras.rasterize
    if use_fused:
        # TPU production path: one megakernel, zero per-pixel gathers.
        # use_fused="interpret" runs the same kernel in Pallas interpret
        # mode (CPU tests of fused-only paths, e.g. the mesh-bank trainer).
        from foundationpose_cpp_tpu.ops.render_fused import render_views_fused

        knobs = {}
        if mesh.fused.kernel_chunk is not None:
            knobs["chunk"] = mesh.fused.kernel_chunk
        if mesh.fused.kernel_p2_window is not None:
            knobs["p2_window"] = mesh.fused.kernel_p2_window
        if mesh.fused.kernel_p2_anchor:
            knobs["p2_anchor"] = True
        if mesh.fused.kernel_views_pp is not None:
            knobs["views_pp"] = mesh.fused.kernel_views_pp
        return render_views_fused(
            mesh.fused, poses, clip_mat, ch, cw,
            w_ambient=cfg.w_ambient, w_diffuse=cfg.w_diffuse,
            min_depth=cfg.min_depth, max_depth=cfg.max_depth,
            interpret=use_fused == "interpret", **knobs,
        )

    clip = transforms.transform_points_homogeneous(clip_mat, mesh.vertices)
    rast = rasterizer(clip, mesh.faces, ch, cw, face_valid=mesh.face_valid)

    # pack all per-vertex attributes -- camera-frame xyz (3), diffuse (1),
    # texcoords (2) -- into ONE instanced array so the per-pixel barycentric
    # stage costs a single gather instead of three
    pts_cam = transforms.transform_points(poses, mesh.vertices)  # (N, V, 3)
    diffuse = transforms.diffuse_intensity(poses, mesh.normals)  # (N, V)
    n = poses.shape[0]
    packed = jnp.concatenate(
        [
            pts_cam,
            diffuse[..., None],
            jnp.broadcast_to(mesh.texcoords[None], (n, *mesh.texcoords.shape)),
        ],
        axis=-1,
    )  # (N, V, 6)
    interp = ras.interpolate_attributes(packed, rast, mesh.faces)
    xyz_render = interp[..., 0:3]
    diffuse_map = interp[..., 3:4]
    uv = interp[..., 4:6]
    color = ras.texture_bilinear_wrap(mesh.texture, uv)
    color = ras.shade_color(color, diffuse_map, rast, cfg.w_ambient, cfg.w_diffuse)
    color = ras.flip_vertical(color)
    xyz_render = ras.flip_vertical(xyz_render)
    xyz_render = pointcloud.threshold_and_downscale_pointcloud(
        xyz_render, poses, mesh.diameter / 2.0, cfg.min_depth, cfg.max_depth
    )
    return pointcloud.concat_channels(color, xyz_render)

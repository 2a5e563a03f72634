"""Fused render megakernel (interpret mode) vs the unfused op composition."""

import numpy as np
import jax.numpy as jnp
import pytest

from foundationpose_cpp_tpu.config import FoundationPoseConfig
from foundationpose_cpp_tpu.geometry import transforms
from foundationpose_cpp_tpu.meshio import procedural
from foundationpose_cpp_tpu.ops import pointcloud
from foundationpose_cpp_tpu.ops import rasterize as ras
from foundationpose_cpp_tpu.ops.render_fused import (
    FusedMeshTables,
    render_views_fused,
    sample_texture_at_uv,
    vertex_colors_seam_robust,
)
from foundationpose_cpp_tpu.pipeline.renderer import MeshConstants
from foundationpose_cpp_tpu.utils import synthetic

CFG = FoundationPoseConfig()
K = np.array([[300.0, 0, 64], [0, 300.0, 64], [0, 0, 1]], dtype=np.float32)
IMG_H, IMG_W = 128, 128
CROP = 32  # multiple of both tile dims


def _unfused_reference(asset, mesh, poses, clipm):
    """Unfused pipeline with vertex-sampled texture colors (the fused
    kernel's texturing mode) -- everything else identical to the render
    branch of render_and_transform."""
    clip = transforms.transform_points_homogeneous(clipm, mesh.vertices)
    rast = ras.rasterize(clip, mesh.faces, CROP, CROP, face_valid=mesh.face_valid)
    vcol = jnp.asarray(vertex_colors_seam_robust(asset.texture, asset.texcoords))
    pts_cam = transforms.transform_points(poses, mesh.vertices)
    diffuse = transforms.diffuse_intensity(poses, mesh.normals)
    n = poses.shape[0]
    packed = jnp.concatenate(
        [
            jnp.broadcast_to(vcol[None], (n, *vcol.shape)),
            pts_cam,
            diffuse[..., None],
        ],
        axis=-1,
    )
    interp = ras.interpolate_attributes(packed, rast, mesh.faces)
    color = ras.shade_color(interp[..., 0:3], interp[..., 6:7], rast)
    xyz = interp[..., 3:6]
    color = ras.flip_vertical(color)
    xyz = ras.flip_vertical(xyz)
    xyz = pointcloud.threshold_and_downscale_pointcloud(
        xyz, poses, mesh.diameter / 2.0, CFG.min_depth, CFG.max_depth
    )
    return np.asarray(pointcloud.concat_channels(color, xyz))


def _setup(n_lat=10, n_lon=14, n_poses=3, tz=0.45):
    asset = procedural.textured_uv_sphere(radius=0.05, n_lat=n_lat, n_lon=n_lon)
    mesh = MeshConstants.from_asset(asset)
    tables = FusedMeshTables.from_asset(asset)
    rng = np.random.default_rng(0)
    poses = np.tile(synthetic.default_pose(tz)[None], (n_poses, 1, 1))
    from scipy.spatial.transform import Rotation

    poses[:, :3, :3] = Rotation.random(n_poses, rng).as_matrix()
    poses = jnp.asarray(poses.astype(np.float32))
    Kj = jnp.asarray(K)
    tfs = transforms.compute_crop_window_tf(poses, Kj, (CROP, CROP), 1.2, mesh.diameter)
    bbox = transforms.construct_bbox2d(tfs, CROP, CROP)
    clipm = transforms.pose_clip_matrix(poses, bbox, Kj, IMG_H, IMG_W)
    return asset, mesh, tables, poses, clipm


def _agree(got, want, tol=2e-3):
    diff = np.abs(got - want).max(axis=-1)
    frac_bad = (diff > tol).mean()
    return frac_bad


def test_fused_matches_unfused_sphere():
    asset, mesh, tables, poses, clipm = _setup()
    got = np.asarray(
        render_views_fused(tables, poses, clipm, CROP, CROP, interpret=True)
    )
    want = _unfused_reference(asset, mesh, poses, clipm)
    assert got.shape == want.shape == (3, CROP, CROP, 6)
    frac_bad = _agree(got, want)
    # differences only at razor-edge pixels (tie order / zw-plane epsilon)
    assert frac_bad < 0.01, f"{frac_bad:.4f} of pixels differ"
    # substantial foreground must exist for this to be meaningful
    assert (np.abs(got[..., 3:]).sum(-1) > 0).mean() > 0.2


def test_fused_cube_has_big_faces():
    """Cube faces span many tiles -> exercises the 'big' segment path."""
    asset = procedural.textured_cube(size=0.1)
    mesh = MeshConstants.from_asset(asset)
    tables = FusedMeshTables.from_asset(asset)
    pose = jnp.asarray(synthetic.default_pose(0.4)[None])
    Kj = jnp.asarray(K)
    tfs = transforms.compute_crop_window_tf(pose, Kj, (CROP, CROP), 1.2, mesh.diameter)
    bbox = transforms.construct_bbox2d(tfs, CROP, CROP)
    clipm = transforms.pose_clip_matrix(pose, bbox, Kj, IMG_H, IMG_W)
    got = np.asarray(
        render_views_fused(tables, pose, clipm, CROP, CROP, interpret=True)
    )
    want = _unfused_reference(asset, mesh, pose, clipm)
    assert _agree(got, want) < 0.01
    assert (np.abs(got[..., :3]).sum(-1) > 0).mean() > 0.2


def test_fused_background_is_zero():
    asset, mesh, tables, poses, clipm = _setup(n_poses=1)
    got = np.asarray(
        render_views_fused(tables, poses, clipm, CROP, CROP, interpret=True)
    )
    want = _unfused_reference(asset, mesh, poses, clipm)
    bg = np.abs(want).sum(-1) == 0
    assert bg.any()
    # background must be exactly zero in the fused output too (up to edges)
    assert (np.abs(got[bg]).sum(-1) == 0).mean() > 0.99


def test_sample_texture_matches_texture_op():
    rng = np.random.default_rng(1)
    tex = rng.uniform(size=(16, 16, 3)).astype(np.float32)
    uv = rng.uniform(-0.2, 1.2, size=(50, 2)).astype(np.float32)
    got = sample_texture_at_uv(tex, uv)
    flipped = np.stack([uv[:, 0], 1.0 - uv[:, 1]], axis=-1)
    want = np.asarray(
        ras.texture_bilinear_wrap(
            jnp.asarray(tex), jnp.asarray(flipped[None, None])
        )
    )[0, 0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_backface_cull_auto_detection():
    """Culling only engages with the watertight + consistent-winding proof."""
    import dataclasses

    sphere = procedural.textured_uv_sphere(radius=0.05, n_lat=10, n_lon=14)
    cube = procedural.textured_cube(size=0.1)
    assert FusedMeshTables.from_asset(sphere).backface_cull_ok
    assert FusedMeshTables.from_asset(cube).backface_cull_ok  # fixed winding
    # flip one face -> directed edge appears twice -> proof must fail
    bad_faces = np.asarray(cube.faces).copy()
    bad_faces[0] = bad_faces[0, ::-1]
    bad = dataclasses.replace(cube, faces=bad_faces)
    assert not FusedMeshTables.from_asset(bad).backface_cull_ok
    # open surface (missing face) must also fail even if wound consistently
    open_mesh = dataclasses.replace(cube, faces=np.asarray(cube.faces)[1:])
    assert not FusedMeshTables.from_asset(open_mesh).backface_cull_ok


def test_backface_cull_output_identical():
    """Culled and uncculled renders of a closed mesh match exactly."""
    asset, mesh, tables, poses, clipm = _setup(n_poses=2)
    assert tables.backface_cull_ok
    culled = np.asarray(
        render_views_fused(tables, poses, clipm, CROP, CROP, interpret=True)
    )
    unculled = np.asarray(
        render_views_fused(
            tables, poses, clipm, CROP, CROP, interpret=True,
            cull_backfaces=False,
        )
    )
    np.testing.assert_array_equal(culled, unculled)


def test_inward_winding_normalized():
    """A consistently INWARD-wound closed mesh is flipped at build time and
    renders identically to the outward-wound original."""
    import jax.numpy as jnp
    from foundationpose_cpp_tpu.meshio.mesh_loader import make_mesh_asset

    sphere = procedural.textured_uv_sphere(radius=0.05, n_lat=10, n_lon=14)
    inward = make_mesh_asset(
        sphere.name, sphere.vertices, sphere.faces[:, ::-1].copy(),
        sphere.texcoords, sphere.vertex_normals, sphere.texture,
    )
    t_out = FusedMeshTables.from_asset(sphere)
    t_in = FusedMeshTables.from_asset(inward)
    assert t_in.backface_cull_ok
    _, mesh, _, poses, clipm = _setup(n_poses=1)
    a = np.asarray(render_views_fused(t_out, poses, clipm, CROP, CROP, interpret=True))
    b = np.asarray(render_views_fused(t_in, poses, clipm, CROP, CROP, interpret=True))
    np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.slow
def test_kernel_knobs_are_output_invariant():
    """chunk size and quadrant_split are pure scheduling knobs: every
    combination must produce bit-identical images (the packed depth key's
    pos field changes width with chunk, but the winner it selects does not
    for non-coplanar geometry)."""
    _, mesh, tables, poses, clipm = _setup(n_poses=2)
    base = np.asarray(
        render_views_fused(tables, poses, clipm, CROP, CROP, interpret=True)
    )
    for chunk in (64, 128, 256):
        for split in (True, False):
            got = np.asarray(
                render_views_fused(
                    tables, poses, clipm, CROP, CROP, interpret=True,
                    chunk=chunk, quadrant_split=split,
                )
            )
            np.testing.assert_array_equal(
                got, base, err_msg=f"chunk={chunk} split={split}"
            )
    # the phase-1 superchunk gate (one scalar test skips a group of dead
    # chunk bodies) must also be a pure scheduling knob; it is the static
    # alternative to the (default) livelist, so that knob goes off here
    for p1_group in (4, 8):
        got = np.asarray(
            render_views_fused(
                tables, poses, clipm, CROP, CROP, interpret=True,
                chunk=64, p1_group=p1_group, p1_livelist=False,
            )
        )
        np.testing.assert_array_equal(
            got, base, err_msg=f"p1_group={p1_group}"
        )
    # dynamic-trip-count variants: the prefetched phase-1 live-chunk list
    # and the phase-2 winner-range loop visit exactly the chunks the static
    # predicates accept, so both must be pure scheduling knobs too
    for kw in (
        {"p1_livelist": True},
        {"p2_dynamic": True},
        {"p1_livelist": True, "p2_dynamic": True},
        {"p1_livelist": True, "p2_dynamic": True, "chunk": 64},
        {"p1_livelist": True, "quadrant_split": False},
        # the unrolled livelist loop (pairs + predicated tail) must visit
        # the same entries; odd/even live counts both occur across tiles
        {"p1_livelist": True, "p1_unroll": 2},
        {"p1_livelist": True, "p1_unroll": 4, "chunk": 64},
        {"p1_livelist": True, "p1_unroll": 2, "quadrant_split": False},
        # anchored phase-2 windows: base = the winner range's 128-aligned
        # floor instead of the fixed window grid; disjoint-by-construction
        # windows must visit every winner exactly once
        {"p1_livelist": True, "p2_dynamic": True, "p2_anchor": True},
        {"p1_livelist": True, "p2_dynamic": True, "p2_anchor": True,
         "chunk": 64, "p2_window": 256},
        {"p1_livelist": True, "p2_dynamic": True, "p2_anchor": True,
         "chunk": 32, "p2_window": 128},
    ):
        got = np.asarray(
            render_views_fused(
                tables, poses, clipm, CROP, CROP, interpret=True, **kw
            )
        )
        np.testing.assert_array_equal(got, base, err_msg=str(kw))
    # multi-tile grid: CROP=32 is a single 32x32 tile, which never
    # exercises the livelist's per-tile SMEM indexing (t_lin = ty*n_tx+tx)
    # -- force a 2x3 tile grid and a pose whose silhouette straddles tiles
    _, _, tables_mt, poses_mt, clipm_mt = _setup(n_poses=2, tz=0.28)
    base_mt = np.asarray(
        render_views_fused(tables_mt, poses_mt, clipm_mt, 64, 96, interpret=True)
    )
    assert (base_mt[..., 3:] != 0).any(), "silhouette left the 64x96 window"
    for kw in (
        {"p1_livelist": True},
        {"p1_livelist": True, "p2_dynamic": True, "chunk": 64},
        # anchored windows on a multi-tile grid: per-tile winner ranges
        # give each tile a DIFFERENT anchor base, including tiles whose
        # range straddles what would be a fixed-grid window boundary
        {"p1_livelist": True, "p2_dynamic": True, "p2_anchor": True,
         "chunk": 64, "p2_window": 128},
        {"p1_livelist": True, "p2_dynamic": True, "p2_anchor": True,
         "chunk": 64, "p2_window": 256},
    ):
        got = np.asarray(
            render_views_fused(
                tables_mt, poses_mt, clipm_mt, 64, 96, interpret=True, **kw
            )
        )
        np.testing.assert_array_equal(got, base_mt, err_msg=f"64x96 {kw}")
    # patch-texturing tables add a THIRD positional ref (patch_ref precedes
    # live_ref in the kernel's variadic unpacking) -- the combination must
    # stay a pure scheduling knob against a patch-mode baseline
    asset_p, _, _, _, _ = _setup(n_poses=2)
    tables_p = FusedMeshTables.from_asset(asset_p, texture_patch_k=4)
    assert tables_p.patch_k, "patch tables expected for this case"
    base_p = np.asarray(
        render_views_fused(tables_p, poses, clipm, CROP, CROP, interpret=True)
    )
    for kw in (
        {"p1_livelist": True},
        {"p1_livelist": True, "p2_dynamic": True},
        {"p1_livelist": True, "p2_dynamic": True, "p2_anchor": True,
         "chunk": 64, "p2_window": 256},
    ):
        got = np.asarray(
            render_views_fused(
                tables_p, poses, clipm, CROP, CROP, interpret=True, **kw
            )
        )
        np.testing.assert_array_equal(got, base_p, err_msg=f"patch {kw}")


def test_tiled_uvs_wrap_not_clamp():
    """UVs outside [0,1] (tiled/repeated textures) must sample wrap-
    periodically on the fused path, not clamp to the border color."""
    from foundationpose_cpp_tpu.ops.render_fused import face_texel_patches

    rng = np.random.default_rng(0)
    tex = rng.uniform(0.0, 1.0, (16, 16, 3)).astype(np.float32)
    uv_in = rng.uniform(0.05, 0.95, (12, 2))
    for shift in ([1.0, 0.0], [2.0, -1.0], [-3.0, 4.0]):
        got = vertex_colors_seam_robust(tex, uv_in + np.array(shift))
        want = vertex_colors_seam_robust(tex, uv_in)
        np.testing.assert_allclose(got, want, atol=1e-6)

    # per-face patches: a face translated by whole tiles carries the same
    # patch and the same corner coords
    faces = np.array([[0, 1, 2], [3, 4, 5]], dtype=np.int32)
    base_uv = rng.uniform(0.1, 0.6, (6, 2))
    p0, st0 = face_texel_patches(tex, base_uv, faces)
    p1, st1 = face_texel_patches(tex, base_uv + np.array([2.0, 3.0]), faces)
    np.testing.assert_allclose(p1, p0, atol=1e-6)
    np.testing.assert_allclose(st1, st0, atol=1e-5)


def test_bad_kernel_knobs_raise():
    sphere = procedural.textured_uv_sphere(radius=0.05, n_lat=4, n_lon=6)
    tables = FusedMeshTables.from_asset(sphere)
    gt = synthetic.default_pose(tz=0.5)
    poses = jnp.asarray(gt, jnp.float32)[None]
    crop_tfs = transforms.compute_crop_window_tf(
        poses, jnp.asarray(K), (CROP, CROP), CFG.refine_crop_ratio,
        tables.diameter,
    )
    bbox2d = transforms.construct_bbox2d(crop_tfs, CROP, CROP)
    clipm = transforms.pose_clip_matrix(
        poses, bbox2d, jnp.asarray(K), IMG_H, IMG_W, CFG.znear, CFG.zfar
    )
    with pytest.raises(ValueError, match="p2_window"):
        render_views_fused(
            tables, poses, clipm, CROP, CROP, interpret=True,
            chunk=64, p2_window=48,
        )
    with pytest.raises(ValueError, match="p1_group"):
        render_views_fused(
            tables, poses, clipm, CROP, CROP, interpret=True, p1_group=5,
        )
    with pytest.raises(ValueError, match="p2_anchor"):
        render_views_fused(
            tables, poses, clipm, CROP, CROP, interpret=True,
            p2_anchor=True, p2_dynamic=False,
        )


def test_auto_kernel_knobs_policy():
    """The per-mesh production schedule: chunk 64 always; the phase-2
    superwindow scales with face count up to 1024 and floors at 128 so
    tiny meshes don't pad their tables to max(chunk, p2_window)."""
    from foundationpose_cpp_tpu.ops.render_fused import auto_kernel_knobs

    assert auto_kernel_knobs(12) == {"chunk": 64, "p2_window": 128}
    assert auto_kernel_knobs(128) == {"chunk": 64, "p2_window": 128}
    assert auto_kernel_knobs(129) == {"chunk": 64, "p2_window": 256}
    assert auto_kernel_knobs(6016) == {"chunk": 64, "p2_window": 1024}
    assert auto_kernel_knobs(100_000) == {"chunk": 64, "p2_window": 1024}
    # from_asset bakes the policy into the tables the renderer consumes
    sphere = procedural.textured_uv_sphere(radius=0.05, n_lat=4, n_lon=6)
    tables = FusedMeshTables.from_asset(sphere)
    assert tables.kernel_chunk == 64
    assert tables.kernel_p2_window == auto_kernel_knobs(
        tables.num_faces
    )["p2_window"]


def test_views_pp_output_invariant():
    """views_pp (several views per Pallas program, amortizing the
    tile-constant MXU-basis/iota setup) is a SCHEDULING knob: the image
    must be bit-identical, including when views_pp does not divide the
    view count."""
    asset, mesh, tables, poses, clipm = _setup(n_poses=3)
    ref = np.asarray(render_views_fused(
        tables, poses, clipm, CROP, CROP, interpret=True,
    ))
    for vpp in (2, 3):
        got = np.asarray(render_views_fused(
            tables, poses, clipm, CROP, CROP, interpret=True, views_pp=vpp,
        ))
        np.testing.assert_array_equal(got, ref)

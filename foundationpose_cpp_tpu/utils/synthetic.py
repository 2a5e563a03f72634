"""Synthetic RGB-D scene generation for tests and benchmarks.

Renders a mesh at a known ground-truth pose into a full-frame RGB, metric
depth, and mask using the framework's own rasterizer -- the stand-in for the
gated mustard0 dataset (reference test_data/download.md) that keeps the test
suite and benchmarks self-contained and deterministic.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from foundationpose_cpp_tpu.config import FoundationPoseConfig
from foundationpose_cpp_tpu.geometry import transforms
from foundationpose_cpp_tpu.ops import rasterize as ras
from foundationpose_cpp_tpu.pipeline.renderer import MeshConstants


def render_scene(
    mesh: MeshConstants,
    pose: np.ndarray,
    K: np.ndarray,
    h: int,
    w: int,
    cfg: FoundationPoseConfig = FoundationPoseConfig(),
    background_depth: float = 0.0,
    rasterize_fn=None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Render (rgb u8, depth f32, mask u8) of `mesh` at `pose` (full frame).

    The full frame is treated as the crop window (bbox = whole image), so the
    same clip-matrix + rasterizer machinery applies.
    """
    poses = jnp.asarray(pose[None].astype(np.float32))
    Kj = jnp.asarray(K.astype(np.float32))
    bbox2d = jnp.asarray([[0.0, 0.0, float(w), float(h)]], dtype=jnp.float32)
    clip_mat = transforms.pose_clip_matrix(poses, bbox2d, Kj, h, w, cfg.znear, cfg.zfar)
    clip = transforms.transform_points_homogeneous(clip_mat, mesh.vertices)
    import jax

    # full-frame XLA scan path is slow on TPU -> use the Pallas kernel, but
    # only when the frame is tile-aligned (16 rows); odd sizes (e.g. the
    # driver entry's 120x160) fall back to the exact XLA path
    if rasterize_fn is None and jax.default_backend() == "tpu" and h % 16 == 0:
        from foundationpose_cpp_tpu.ops.rasterize_pallas import rasterize_tpu

        rasterize_fn = rasterize_tpu
    rasterizer = rasterize_fn if rasterize_fn is not None else ras.rasterize
    rast = rasterizer(clip, mesh.faces, h, w, face_valid=mesh.face_valid)

    pts_cam = transforms.transform_points(poses, mesh.vertices)
    xyz = ras.interpolate_attributes(pts_cam, rast, mesh.faces)
    uv = ras.interpolate_attributes(mesh.texcoords, rast, mesh.faces)
    color = ras.texture_bilinear_wrap(mesh.texture, uv)
    diffuse = transforms.diffuse_intensity(poses, mesh.normals)
    dmap = ras.interpolate_attributes(diffuse[..., None], rast, mesh.faces)
    color = ras.shade_color(color, dmap, rast, cfg.w_ambient, cfg.w_diffuse)

    color = np.asarray(ras.flip_vertical(color))[0]
    xyz = np.asarray(ras.flip_vertical(xyz))[0]
    fg = np.asarray(ras.flip_vertical(rast[..., 3:4]))[0, ..., 0] > 0

    rgb = (np.clip(color, 0, 1) * 255).astype(np.uint8)
    depth = np.where(fg, xyz[..., 2], background_depth).astype(np.float32)
    mask = fg.astype(np.uint8) * 255
    return rgb, depth, mask


def default_pose(tz: float = 0.6) -> np.ndarray:
    """A mildly rotated pose in front of the camera."""
    from scipy.spatial.transform import Rotation

    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = Rotation.from_euler("xyz", [25, -15, 40], degrees=True).as_matrix()
    pose[:3, 3] = [0.02, -0.01, tz]
    return pose


def write_mini_dataset(
    root: str,
    n_frames: int = 3,
    h: int = 120,
    w: int = 160,
    cfg: FoundationPoseConfig | None = None,
) -> np.ndarray:
    """Write a tiny mustard0-layout dataset (reference test_data/download.md).

    Renders a moving textured cube with the framework's own rasterizer and
    writes rgb/, depth/ (16-bit mm), masks/, mesh/, cam_K.txt and
    annotated_poses/. Returns the (3,3) intrinsics.
    """
    import pathlib

    from foundationpose_cpp_tpu.meshio import procedural

    cfg = cfg or FoundationPoseConfig(crop_window_h=32, crop_window_w=32)
    root_p = pathlib.Path(root)
    for sub in ("rgb", "depth", "masks", "mesh", "annotated_poses"):
        (root_p / sub).mkdir(parents=True, exist_ok=True)

    K = np.array([[300.0, 0, w / 2], [0, 300.0, h / 2], [0, 0, 1]], np.float32)
    np.savetxt(root_p / "cam_K.txt", K, fmt="%.6f")
    cube = procedural.textured_cube(size=0.1)
    procedural.write_obj(cube, str(root_p / "mesh" / "cube.obj"))
    mesh = MeshConstants.from_asset(cube)

    def _write_png(path, arr):
        try:
            import cv2

            img = arr[..., ::-1] if arr.ndim == 3 else arr
            assert cv2.imwrite(str(path), img)
        except ImportError:
            from PIL import Image

            Image.fromarray(arr).save(path)

    for i in range(n_frames):
        pose = default_pose(tz=0.5 + 0.004 * i)
        pose[0, 3] += 0.003 * i
        fid = f"{i:06d}"
        rgb, depth, mask = render_scene(mesh, pose, K, h, w, cfg)
        _write_png(root_p / "rgb" / f"{fid}.png", rgb)
        _write_png(
            root_p / "depth" / f"{fid}.png",
            np.round(depth * 1000.0).astype(np.uint16),
        )
        _write_png(root_p / "masks" / f"{fid}.png", mask)
        np.savetxt(root_p / "annotated_poses" / f"{fid}.txt", pose, fmt="%.8f")
    return K

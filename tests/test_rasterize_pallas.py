"""Pallas rasterizer (interpret mode on CPU) vs. the XLA reference path."""

import numpy as np
import jax.numpy as jnp
import pytest

from foundationpose_cpp_tpu.ops import rasterize as ras
from foundationpose_cpp_tpu.ops.rasterize_pallas import rasterize_tpu
from tests.test_rasterize import _random_scene


def _compare(clip, faces, h, w, face_valid=None, **kw):
    got = np.asarray(
        rasterize_tpu(
            jnp.asarray(clip), jnp.asarray(faces), h, w,
            face_valid=None if face_valid is None else jnp.asarray(face_valid),
            interpret=True, **kw,
        )
    )
    want = np.asarray(
        ras.rasterize(
            jnp.asarray(clip), jnp.asarray(faces), h, w,
            face_valid=None if face_valid is None else jnp.asarray(face_valid),
        )
    )
    # ids must agree except on razor-thin depth ties (different tie order)
    agree = (got[..., 3] == want[..., 3]).mean()
    assert agree > 0.995, f"id agreement {agree}"
    m = got[..., 3] == want[..., 3]
    np.testing.assert_allclose(got[m], want[m], rtol=1e-4, atol=1e-4)


def test_matches_xla_random_triangles():
    clip, faces = _random_scene(n=2, v=12, f=16, seed=0)
    _compare(clip, faces, 16, 128, chunk=8, tile_rows=8)


def test_matches_xla_more_faces_and_chunks():
    clip, faces = _random_scene(n=1, v=32, f=100, seed=1)
    _compare(clip, faces, 32, 128, chunk=16, tile_rows=8)


def test_face_valid_mask_respected():
    clip, faces = _random_scene(n=1, seed=3)
    valid = np.ones((faces.shape[0],), dtype=bool)
    valid[:4] = False
    got = np.asarray(
        rasterize_tpu(jnp.asarray(clip), jnp.asarray(faces), 16, 128,
                      face_valid=jnp.asarray(valid), interpret=True,
                      chunk=8, tile_rows=8)
    )
    for k in range(4):
        assert not (got[..., 3] == float(k + 1)).any()


def test_background_zero_and_behind_camera_cull():
    clip, faces = _random_scene(n=1, seed=2)
    clip[0, faces[0, 0], 3] = -0.5
    got = np.asarray(
        rasterize_tpu(jnp.asarray(clip), jnp.asarray(faces), 16, 128,
                      interpret=True, chunk=8, tile_rows=8)
    )
    assert not (got[..., 3] == 1.0).any()
    bg = got[..., 3] == 0
    assert (got[bg] == 0).all()


def test_realistic_object_render_matches_xla():
    """A posed sphere through the real clip-matrix path."""
    from foundationpose_cpp_tpu.geometry import transforms
    from foundationpose_cpp_tpu.meshio import procedural
    from foundationpose_cpp_tpu.pipeline.renderer import MeshConstants
    from foundationpose_cpp_tpu.utils import synthetic

    sphere = procedural.textured_uv_sphere(radius=0.05, n_lat=8, n_lon=12)
    mesh = MeshConstants.from_asset(sphere)
    K = jnp.asarray([[300.0, 0, 64], [0, 300.0, 64], [0, 0, 1]])
    pose = synthetic.default_pose(0.4)
    poses = jnp.asarray(pose[None])
    tfs = transforms.compute_crop_window_tf(poses, K, (32, 128), 1.2, mesh.diameter)
    bbox = transforms.construct_bbox2d(tfs, 32, 128)
    clipm = transforms.pose_clip_matrix(poses, bbox, K, 128, 128)
    clip = transforms.transform_points_homogeneous(clipm, mesh.vertices)
    _compare(np.asarray(clip), np.asarray(mesh.faces), 32, 128,
             face_valid=np.asarray(mesh.face_valid), chunk=32, tile_rows=8)

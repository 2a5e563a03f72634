"""Crop warps and pointcloud normalization vs. oracles."""

import numpy as np
import jax.numpy as jnp

from foundationpose_cpp_tpu.ops import pointcloud, warp
from tests import oracle


def _tfs(n=3, seed=0):
    rng = np.random.default_rng(seed)
    tfs = np.zeros((n, 3, 3), dtype=np.float32)
    for i in range(n):
        s = rng.uniform(0.3, 0.8)
        tfs[i] = [[s, 0, -rng.uniform(0, 30)], [0, s, -rng.uniform(0, 20)], [0, 0, 1]]
    return tfs


def test_warp_linear_u8_matches_opencv_semantics():
    rng = np.random.default_rng(1)
    src = rng.integers(0, 256, size=(40, 48, 3)).astype(np.uint8)
    tfs = _tfs()
    got = np.asarray(warp.warp_crop_linear_u8(jnp.asarray(src), jnp.asarray(tfs), 16, 20))
    for i in range(tfs.shape[0]):
        want = oracle.warp_perspective_oracle(src.astype(np.float64), tfs[i], 16, 20, "linear")
        want = np.round(want) / 255.0
        np.testing.assert_allclose(got[i], want, atol=1.5 / 255.0)


def test_warp_nearest_f32_matches_oracle():
    rng = np.random.default_rng(2)
    src = rng.normal(size=(40, 48, 3)).astype(np.float32)
    tfs = _tfs(seed=3)
    got = np.asarray(warp.warp_crop_nearest_f32(jnp.asarray(src), jnp.asarray(tfs), 16, 20))
    for i in range(tfs.shape[0]):
        want = oracle.warp_perspective_oracle(src, tfs[i], 16, 20, "nearest")
        np.testing.assert_allclose(got[i], want, atol=1e-6)


def test_warp_border_constant_zero():
    src = np.full((10, 10, 3), 200, dtype=np.uint8)
    tf = np.array([[[1.0, 0, -100.0], [0, 1.0, -100.0], [0, 0, 1]]], dtype=np.float32)
    got = np.asarray(warp.warp_crop_linear_u8(jnp.asarray(src), jnp.asarray(tf), 8, 8))
    assert (got == 0).all()


def test_threshold_downscale_matches_oracle():
    rng = np.random.default_rng(4)
    n = 4
    xyz = rng.normal(0, 0.4, size=(n, 6, 8, 3)).astype(np.float32)
    xyz[..., 2] = np.abs(xyz[..., 2]) + 0.2
    xyz[0, 0, 0, 2] = 0.0  # invalid point
    xyz[1, 2, 3] = [5.0, 0.1, 0.5]  # out-of-range x after downscale
    poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    poses[:, :3, 3] = rng.normal(0, 0.2, size=(n, 3)).astype(np.float32)
    poses[:, 2, 3] += 0.5
    got = np.asarray(
        pointcloud.threshold_and_downscale_pointcloud(
            jnp.asarray(xyz), jnp.asarray(poses), 0.1, 0.001, 4.0
        )
    )
    want = oracle.threshold_downscale_oracle(xyz.copy(), poses, 0.1, 0.001, 4.0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_concat_channels():
    a = np.ones((2, 3, 3, 3), dtype=np.float32)
    b = np.zeros((2, 3, 3, 3), dtype=np.float32)
    out = np.asarray(pointcloud.concat_channels(jnp.asarray(a), jnp.asarray(b)))
    assert out.shape == (2, 3, 3, 6)
    assert (out[..., :3] == 1).all() and (out[..., 3:] == 0).all()


def test_mxu_warps_match_gather_warps():
    """The separable-matmul warps must equal the gather formulation exactly."""
    rng = np.random.default_rng(7)
    src_u8 = rng.integers(0, 256, size=(40, 48, 3)).astype(np.uint8)
    src_f32 = rng.normal(size=(40, 48, 3)).astype(np.float32)
    # rotation-free crop-style tfs, including ones partially out of range
    tfs = np.zeros((4, 3, 3), dtype=np.float32)
    for i, (s, ox, oy) in enumerate([(0.5, -4, -2), (0.31, -10, -1),
                                     (1.7, -30, -25), (0.9, 5, 5)]):
        tfs[i] = [[s, 0, ox], [0, s, oy], [0, 0, 1]]
    tfs_j = jnp.asarray(tfs)

    lin_g = np.asarray(warp.warp_crop_linear_u8(jnp.asarray(src_u8), tfs_j, 16, 24))
    lin_m = np.asarray(warp.warp_crop_linear_u8_mxu(jnp.asarray(src_u8), tfs_j, 16, 24))
    np.testing.assert_allclose(lin_m, lin_g, atol=1e-6)

    nn_g = np.asarray(warp.warp_crop_nearest_f32(jnp.asarray(src_f32), tfs_j, 16, 24))
    nn_m = np.asarray(warp.warp_crop_nearest_f32_mxu(jnp.asarray(src_f32), tfs_j, 16, 24))
    np.testing.assert_allclose(nn_m, nn_g, atol=1e-6)

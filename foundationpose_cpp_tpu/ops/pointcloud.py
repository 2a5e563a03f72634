"""Pointcloud normalization + channel concat for the model input crops.

TPU-native equivalents of:
- threshold_and_downscale_pointcloud_kernel: foundationpose_render.cu:61-118
- concat_kernel: foundationpose_render.cu:121-140
"""

from __future__ import annotations

import jax.numpy as jnp


def threshold_and_downscale_pointcloud(
    xyz: jnp.ndarray,
    poses: jnp.ndarray,
    downscale_factor: float,
    min_depth: float,
    max_depth: float,
) -> jnp.ndarray:
    """Center xyz crops on their pose translation and normalize by diameter/2.

    Per point: invalid if z < min_depth (checked BEFORE centering); subtract
    pose translation; divide by downscale_factor; then zero each coordinate
    whose |value| > max_depth, and all coordinates of invalid points. The
    per-coordinate zeroing (rather than per-point) mirrors the reference
    kernel exactly (foundationpose_render.cu:99-116).

    Args:
      xyz: (N, H, W, 3) camera-frame points.
      poses: (N, 4, 4) poses whose translation column is subtracted.
      downscale_factor: mesh_diameter / 2.
    """
    t = poses[:, :3, 3][:, None, None, :]  # (N,1,1,3)
    invalid = xyz[..., 2:3] < min_depth  # (N,H,W,1)
    scaled = (xyz - t) / downscale_factor
    drop = (jnp.abs(scaled) > max_depth) | invalid
    return jnp.where(drop, 0.0, scaled)


def concat_channels(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """NHWC channel concat (concat_kernel, foundationpose_render.cu:121-140)."""
    return jnp.concatenate([a, b], axis=-1)

"""Batched pose-conditioned crop warps of the observed RGB / xyz images.

TPU-native replacement for the reference's observed branch (TransfProcess,
foundationpose_render.cpp:731-812): a 252-iteration host loop of per-pose
cvcuda::WarpPerspective calls becomes one batched inverse-affine gather that
XLA compiles into a single fused program over the (pose, y, x) grid.

Matches OpenCV/cvcuda warpPerspective semantics: for each destination pixel
(x, y), sample the source at M^-1 (x, y, 1) -- integer pixel coordinates, no
half-pixel offset -- with INTERP_LINEAR for RGB (computed on u8 and rounded,
as cvcuda does, before the 1/255 ConvertTo) and INTERP_NEAREST for xyz, and
BORDER_CONSTANT 0 outside.

Layout note (learned the hard way): all gathers here are PLANAR -- one
(H*W,) source plane per channel, or the three RGB bytes packed into one u32
plane -- producing (N, ch, cw) intermediates whose minor dim is the 128-wide
crop axis. Gathering (H*W, 3)-shaped sources lets XLA materialize
channel-minor temporaries that TPU tiling pads 3 -> 128 lanes (a measured
19.8 GB allocation at production sizes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from foundationpose_cpp_tpu.geometry.transforms import invert_affine3


def _source_coords(tfs: jnp.ndarray, crop_h: int, crop_w: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Source-image sampling coordinates for every (pose, crop pixel)."""
    inv = invert_affine3(tfs)  # (N, 3, 3)
    xs = jax.lax.broadcasted_iota(jnp.float32, (crop_h, crop_w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (crop_h, crop_w), 0)
    # affine: src = inv @ (x, y, 1)
    sx = (
        inv[:, 0, 0][:, None, None] * xs
        + inv[:, 0, 1][:, None, None] * ys
        + inv[:, 0, 2][:, None, None]
    )
    sy = (
        inv[:, 1, 0][:, None, None] * xs
        + inv[:, 1, 1][:, None, None] * ys
        + inv[:, 1, 2][:, None, None]
    )
    return sx, sy


def warp_crop_linear_u8(
    rgb: jnp.ndarray, tfs: jnp.ndarray, crop_h: int, crop_w: int
) -> jnp.ndarray:
    """Bilinear warp of a (H, W, 3) u8 image into (N, crop_h, crop_w, 3) f32 in [0,1].

    The three bytes are packed into one u32 plane so each bilinear corner is
    a single gather (4 total instead of 12). Interpolation happens in float
    but the result is rounded to the nearest integer before scaling by 1/255,
    reproducing cvcuda's u8 warp output followed by ConvertTo
    (foundationpose_render.cpp:762-797).
    """
    h, w, c = rgb.shape
    assert c == 3
    sx, sy = _source_coords(tfs, crop_h, crop_w)  # (N, ch, cw)

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0

    r32 = rgb.astype(jnp.uint32)
    packed = (r32[..., 0] | (r32[..., 1] << 8) | (r32[..., 2] << 16)).reshape(h * w)

    def corner(xc, yc):
        inb = (xc >= 0) & (xc < w) & (yc >= 0) & (yc < h)
        xi = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
        vals = jnp.take(packed, yi * w + xi, axis=0)  # (N, ch, cw) u32
        vals = jnp.where(inb, vals, jnp.uint32(0))
        return (
            (vals & 0xFF).astype(jnp.float32),
            ((vals >> 8) & 0xFF).astype(jnp.float32),
            ((vals >> 16) & 0xFF).astype(jnp.float32),
        )

    v00 = corner(x0, y0)
    v10 = corner(x0 + 1, y0)
    v01 = corner(x0, y0 + 1)
    v11 = corner(x0 + 1, y0 + 1)

    w00 = (1 - fx) * (1 - fy)
    w10 = fx * (1 - fy)
    w01 = (1 - fx) * fy
    w11 = fx * fy

    planes = [
        jnp.round(v00[k] * w00 + v10[k] * w10 + v01[k] * w01 + v11[k] * w11)
        * (1.0 / 255.0)
        for k in range(3)
    ]
    return jnp.stack(planes, axis=-1)


def warp_crop_nearest_f32(
    img: jnp.ndarray, tfs: jnp.ndarray, crop_h: int, crop_w: int
) -> jnp.ndarray:
    """Nearest-neighbor warp of a (H, W, C) f32 image into (N, ch, cw, C)."""
    h, w, c = img.shape
    sx, sy = _source_coords(tfs, crop_h, crop_w)
    xr = jnp.round(sx)
    yr = jnp.round(sy)
    inb = (xr >= 0) & (xr < w) & (yr >= 0) & (yr < h)
    xi = jnp.clip(xr, 0, w - 1).astype(jnp.int32)
    yi = jnp.clip(yr, 0, h - 1).astype(jnp.int32)
    idx = yi * w + xi
    planes = [
        jnp.where(inb, jnp.take(img[..., k].reshape(h * w), idx, axis=0), 0.0)
        for k in range(c)
    ]
    return jnp.stack(planes, axis=-1)


# ---------------------------------------------------------------------------
# MXU formulation
#
# The crop transforms produced by ComputeTF are PURE scale+translate (zero
# off-diagonals, foundationpose_render.cpp:25-42), so the warp is separable:
# out[y, x] = img[sy(y), sx(x)]. Bilinear (or nearest) resampling along each
# axis is a banded weight matrix, and the whole 252-pose warp becomes two
# batched matmuls -- out = Wy @ img @ Wx^T -- that run on the MXU instead of
# 10^8 serialized gathers (XLA:TPU gathers measured at ~23 M fetches/s, which
# made the gather formulation the pipeline bottleneck).


def _axis_sources(tfs: jnp.ndarray, crop: int, axis: int) -> jnp.ndarray:
    """Per-pose source coordinate of each crop pixel along one axis: (N, crop)."""
    inv = invert_affine3(tfs)
    out_coords = jnp.arange(crop, dtype=jnp.float32)
    scale = inv[:, axis, axis][:, None]
    off = inv[:, axis, 2][:, None]
    return scale * out_coords[None, :] + off


def _linear_weights(src: jnp.ndarray, size: int) -> jnp.ndarray:
    """(N, crop, size) bilinear hat weights; zero outside [0, size-1].

    Equals the gather formulation exactly: the hat max(0, 1-|src-s|) summed
    over in-range s reproduces corner weights with BORDER_CONSTANT 0.
    """
    s = jnp.arange(size, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[..., None] - s[None, None, :]))


def _nearest_weights(src: jnp.ndarray, size: int) -> jnp.ndarray:
    """(N, crop, size) one-hot selection at round(src); zero out of range."""
    s = jnp.arange(size, dtype=jnp.float32)
    return (jnp.round(src)[..., None] == s[None, None, :]).astype(jnp.float32)


def _separable_warp(
    planes: jnp.ndarray, wy: jnp.ndarray, wx: jnp.ndarray
) -> jnp.ndarray:
    """planes (C, H, W) x wy (N, ch, H) x wx (N, cw, W) -> (N, ch, cw, C)."""
    f32 = jax.lax.Precision.HIGHEST
    tmp = jnp.einsum("noh,chw->ncow", wy, planes, precision=f32)
    return jnp.einsum("ncow,npw->nopc", tmp, wx, precision=f32)


def warp_crop_linear_u8_mxu(
    rgb: jnp.ndarray, tfs: jnp.ndarray, crop_h: int, crop_w: int
) -> jnp.ndarray:
    """MXU bilinear u8 warp; numerically identical to warp_crop_linear_u8.

    Requires rotation-free tfs (true for all crop-window transforms)."""
    h, w, _ = rgb.shape
    # tf rows: row 0 acts on x, row 1 on y
    sx = _axis_sources(tfs, crop_w, 0)
    sy = _axis_sources(tfs, crop_h, 1)
    wy = _linear_weights(sy, h)
    wx = _linear_weights(sx, w)
    planes = rgb.astype(jnp.float32).transpose(2, 0, 1)  # (3, H, W)
    out = _separable_warp(planes, wy, wx)
    return jnp.round(out) * (1.0 / 255.0)


def warp_crop_nearest_f32_mxu(
    img: jnp.ndarray, tfs: jnp.ndarray, crop_h: int, crop_w: int
) -> jnp.ndarray:
    """MXU nearest warp; numerically identical to warp_crop_nearest_f32."""
    h, w, _ = img.shape
    sx = _axis_sources(tfs, crop_w, 0)
    sy = _axis_sources(tfs, crop_h, 1)
    wy = _nearest_weights(sy, h)
    wx = _nearest_weights(sx, w)
    planes = img.transpose(2, 0, 1)
    return _separable_warp(planes, wy, wx)

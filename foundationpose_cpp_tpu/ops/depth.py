"""Depth-image preprocessing ops: erode, bilateral filter, xyz back-projection.

TPU-native (pure XLA) equivalents of the reference CUDA kernels:
- erode_depth_kernel: foundationpose_sampling.cu:21-82
- bilateral_filter_depth_kernel: foundationpose_sampling.cu:84-164
- convert_depth_to_xyz_map_kernel: foundationpose_utils.cu:3-75

Each CUDA kernel is one thread per pixel with a small neighborhood loop; the
TPU formulation unrolls the (2r+1)^2 static neighborhood into shifted-image
vector ops, which XLA fuses into a handful of VPU passes -- no gathers, no
data-dependent control flow.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _shifted(img: jnp.ndarray, dy: int, dx: int, fill: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Image shifted by (dy, dx) plus an in-bounds mask; fill outside."""
    h, w = img.shape
    shifted = jnp.full_like(img, fill)
    ys_src = slice(max(dy, 0), h + min(dy, 0))
    ys_dst = slice(max(-dy, 0), h + min(-dy, 0))
    xs_src = slice(max(dx, 0), w + min(dx, 0))
    xs_dst = slice(max(-dx, 0), w + min(-dx, 0))
    shifted = shifted.at[ys_dst, xs_dst].set(img[ys_src, xs_src])
    mask = jnp.zeros(img.shape, dtype=jnp.bool_)
    mask = mask.at[ys_dst, xs_dst].set(True)
    return shifted, mask


@functools.partial(
    jax.jit, static_argnames=("radius", "depth_diff_thres", "ratio_thres", "zfar")
)
def erode_depth(
    depth: jnp.ndarray,
    radius: int = 2,
    depth_diff_thres: float = 0.001,
    ratio_thres: float = 0.8,
    zfar: float = 100.0,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Zero out pixels whose neighborhood disagrees (sampling.cu:21-82).

    A pixel survives iff its own depth is in [0.1, zfar) and at most
    ratio_thres of its in-bounds (2r+1)^2 neighbors (including itself) are
    invalid or differ by more than depth_diff_thres.

    `valid` (bool (H, W), optional) marks the REAL image extent when the
    array is padded to a size bucket; out-of-extent pixels are treated as
    out-of-bounds (excluded from the neighbor count), keeping bucketed
    results identical to unpadded ones.
    """
    d = depth
    bad = jnp.zeros_like(d)
    total = jnp.zeros_like(d)
    vf = None if valid is None else valid.astype(d.dtype)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            nb, inb = _shifted(d, dy, dx, 0.0)
            if vf is not None:
                nb_v, _ = _shifted(vf, dy, dx, 0.0)
                inb = inb & (nb_v > 0)
            inbf = inb.astype(d.dtype)
            is_bad = (nb < 0.1) | (nb >= zfar) | (jnp.abs(nb - d) > depth_diff_thres)
            bad = bad + jnp.where(inb & is_bad, 1.0, 0.0)
            total = total + inbf
    keep = (bad / jnp.maximum(total, 1.0)) <= ratio_thres
    valid_center = (d >= 0.1) & (d < zfar)
    if valid is not None:
        valid_center = valid_center & valid
    return jnp.where(valid_center & keep, d, 0.0)


@functools.partial(
    jax.jit, static_argnames=("radius", "sigma_d", "sigma_r", "zfar", "mean_band")
)
def bilateral_filter_depth(
    depth: jnp.ndarray,
    radius: int = 2,
    sigma_d: float = 2.0,
    sigma_r: float = 100000.0,
    zfar: float = 100.0,
    mean_band: float = 0.01,
) -> jnp.ndarray:
    """Mean-banded bilateral depth filter (sampling.cu:84-164).

    Neighbors participate only if valid ([0.1, zfar)) and within mean_band of
    the local valid-neighborhood mean. Output 0 where no valid neighbor exists
    or all weights vanish.
    """
    d = depth
    valid_sum = jnp.zeros_like(d)
    valid_cnt = jnp.zeros_like(d)
    shifts = []
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            nb, inb = _shifted(d, dy, dx, 0.0)
            nb_valid = inb & (nb >= 0.1) & (nb < zfar)
            valid_sum = valid_sum + jnp.where(nb_valid, nb, 0.0)
            valid_cnt = valid_cnt + nb_valid.astype(d.dtype)
            shifts.append((dy, dx, nb, nb_valid))

    mean_depth = valid_sum / jnp.maximum(valid_cnt, 1.0)

    sum_w = jnp.zeros_like(d)
    sum_wd = jnp.zeros_like(d)
    inv_2sd2 = 1.0 / (2.0 * sigma_d * sigma_d)
    inv_2sr2 = 1.0 / (2.0 * sigma_r * sigma_r)
    for dy, dx, nb, nb_valid in shifts:
        use = nb_valid & (jnp.abs(nb - mean_depth) < mean_band)
        spatial = float(dx * dx + dy * dy) * inv_2sd2
        w = jnp.exp(-(spatial + (d - nb) * (d - nb) * inv_2sr2))
        w = jnp.where(use, w, 0.0)
        sum_w = sum_w + w
        sum_wd = sum_wd + w * nb
    out = jnp.where((valid_cnt > 0) & (sum_w > 0.0), sum_wd / jnp.maximum(sum_w, 1e-30), 0.0)
    return out


@jax.jit
def depth_to_xyz(depth: jnp.ndarray, K: jnp.ndarray, min_depth: float = 0.001) -> jnp.ndarray:
    """Pinhole back-projection depth -> (H, W, 3) camera-frame xyz map.

    Mirrors convert_depth_to_xyz_map_kernel (foundationpose_utils.cu:3-75),
    except pixels with depth < min_depth are written as exact zeros; the CUDA
    kernel skips the write and relies on fresh cudaMalloc'd memory, so zeros
    are its de-facto value there too.
    """
    h, w = depth.shape
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    cols = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    rows = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    x = (cols - cx) * depth / fx
    y = (rows - cy) * depth / fy
    xyz = jnp.stack([x, y, depth], axis=-1)
    return jnp.where(depth[..., None] >= min_depth, xyz, 0.0)


@jax.jit
def guess_translation(
    depth: jnp.ndarray,
    mask: jnp.ndarray,
    K: jnp.ndarray,
    min_depth: float = 0.001,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """On-device object-center guess (GuessTranslation, sampling.cpp:250-298).

    Center pixel = mask-bbox center; z = median of depths where mask>0 and
    depth>=min_depth; center = K^-1 (uc, vc, 1) * z. The reference does this
    on host over a D2H copy of the filtered depth (sampling.cpp:365-383); here
    it stays inside the compiled program (SURVEY.md SS7 hard part #5).

    Returns:
      (center (3,), ok scalar bool). ok is False when the mask is empty or no
      valid depth exists (reference returns failure there).
    """
    h, w = depth.shape
    maskp = mask > 0
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)

    big = jnp.int32(1 << 30)
    any_mask = jnp.any(maskp)
    u_min = jnp.min(jnp.where(maskp, cols, big))
    u_max = jnp.max(jnp.where(maskp, cols, -big))
    v_min = jnp.min(jnp.where(maskp, rows, big))
    v_max = jnp.max(jnp.where(maskp, rows, -big))
    uc = (u_min + u_max).astype(jnp.float32) / 2.0
    vc = (v_min + v_max).astype(jnp.float32) / 2.0

    valid = maskp & (depth >= min_depth)
    n_valid = jnp.sum(valid.astype(jnp.int32))
    flat = jnp.where(valid, depth, jnp.inf).reshape(-1)
    sorted_d = jnp.sort(flat)
    # even n: (d[n/2-1]+d[n/2])/2 ; odd n: d[n/2] -- both via the pair below
    i1 = jnp.maximum((n_valid - 1) // 2, 0)
    i2 = jnp.maximum(n_valid // 2, 0)
    zc = (sorted_d[i1] + sorted_d[i2]) / 2.0

    uv1 = jnp.stack([uc, vc, jnp.float32(1.0)])
    center = jnp.linalg.solve(K, uv1) * zc
    ok = any_mask & (n_valid > 0)
    return jnp.where(ok, center, 0.0), ok

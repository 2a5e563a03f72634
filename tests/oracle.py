"""Slow, obviously-correct numpy oracles mirroring the reference CUDA kernels.

Each function is a direct per-pixel / per-element transcription of the
corresponding reference kernel's semantics (file:line cited per function),
written for clarity, not speed. Unit tests compare the JAX/XLA (and later
Pallas) implementations against these.
"""

from __future__ import annotations

import numpy as np


def erode_depth_oracle(depth, radius=2, depth_diff_thres=0.001, ratio_thres=0.8, zfar=100.0):
    """foundationpose_sampling.cu:21-82, one pixel at a time."""
    h, w = depth.shape
    out = np.zeros_like(depth)
    for y in range(h):
        for x in range(w):
            d = depth[y, x]
            if d < 0.1 or d >= zfar:
                out[y, x] = 0.0
                continue
            bad = 0.0
            total = 0.0
            for u in range(x - radius, x + radius + 1):
                if u < 0 or u >= w:
                    continue
                for v in range(y - radius, y + radius + 1):
                    if v < 0 or v >= h:
                        continue
                    cur = depth[v, u]
                    total += 1.0
                    if cur < 0.1 or cur >= zfar or abs(cur - d) > depth_diff_thres:
                        bad += 1.0
            out[y, x] = 0.0 if (bad / total) > ratio_thres else d
    return out


def bilateral_filter_depth_oracle(
    depth, radius=2, sigma_d=2.0, sigma_r=100000.0, zfar=100.0, mean_band=0.01
):
    """foundationpose_sampling.cu:84-164."""
    h, w = depth.shape
    out = np.zeros_like(depth)
    for y in range(h):
        for x in range(w):
            mean = 0.0
            nvalid = 0
            for u in range(x - radius, x + radius + 1):
                if u < 0 or u >= w:
                    continue
                for v in range(y - radius, y + radius + 1):
                    if v < 0 or v >= h:
                        continue
                    cur = depth[v, u]
                    if cur >= 0.1 and cur < zfar:
                        nvalid += 1
                        mean += cur
            if nvalid == 0:
                continue
            mean /= nvalid
            center = depth[y, x]
            sw = 0.0
            s = 0.0
            for u in range(x - radius, x + radius + 1):
                if u < 0 or u >= w:
                    continue
                for v in range(y - radius, y + radius + 1):
                    if v < 0 or v >= h:
                        continue
                    cur = depth[v, u]
                    if cur >= 0.1 and cur < zfar and abs(cur - mean) < mean_band:
                        wgt = np.exp(
                            -((u - x) ** 2 + (v - y) ** 2) / (2.0 * sigma_d**2)
                            - (center - cur) ** 2 / (2.0 * sigma_r**2)
                        )
                        sw += wgt
                        s += wgt * cur
            if sw > 0.0 and nvalid > 0:
                out[y, x] = s / sw
    return out


def depth_to_xyz_oracle(depth, K, min_depth=0.001):
    """foundationpose_utils.cu:3-75 (zeros where skipped)."""
    h, w = depth.shape
    out = np.zeros((h, w, 3), dtype=np.float32)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    for y in range(h):
        for x in range(w):
            d = depth[y, x]
            if d < min_depth:
                continue
            out[y, x, 0] = (x - cx) * d / fx
            out[y, x, 1] = (y - cy) * d / fy
            out[y, x, 2] = d
    return out


def guess_translation_oracle(depth, mask, K, min_depth=0.001):
    """foundationpose_sampling.cpp:250-298."""
    vs, us = np.nonzero(mask > 0)
    assert len(us) > 0
    uc = (us.min() + us.max()) / 2.0
    vc = (vs.min() + vs.max()) / 2.0
    valid = (mask > 0) & (depth >= min_depth)
    assert valid.any()
    vd = np.sort(depth[valid])
    n = len(vd)
    zc = (vd[n // 2 - 1] + vd[n // 2]) / 2.0 if n % 2 == 0 else vd[n // 2]
    return np.linalg.inv(K) @ np.array([uc, vc, 1.0]) * zc


def rasterize_oracle(clip, faces, h, w):
    """Per-pixel re-evaluation of RasterizeCudaFwdShaderKernel semantics
    (common/rasterize.cu:15-90) with brute-force nearest-depth visibility
    (the CudaRaster pipeline's observable contract). Near-plane faces
    (any vertex w <= 0) are culled whole.
    """
    n, v, _ = clip.shape
    f = faces.shape[0]
    out = np.zeros((n, h, w, 4), dtype=np.float32)
    for ni in range(n):
        for py in range(h):
            fy = (2.0 * py + 1.0) / h - 1.0
            for px in range(w):
                fx = (2.0 * px + 1.0) / w - 1.0
                best_zw = np.inf
                best = None
                for ti in range(f):
                    p0, p1, p2 = (clip[ni, faces[ti, k]] for k in range(3))
                    if p0[3] <= 0 or p1[3] <= 0 or p2[3] <= 0:
                        continue
                    p0x = p0[0] - fx * p0[3]
                    p0y = p0[1] - fy * p0[3]
                    p1x = p1[0] - fx * p1[3]
                    p1y = p1[1] - fy * p1[3]
                    p2x = p2[0] - fx * p2[3]
                    p2y = p2[1] - fy * p2[3]
                    a0 = p1x * p2y - p1y * p2x
                    a1 = p2x * p0y - p2y * p0x
                    a2 = p0x * p1y - p0y * p1x
                    inside = (a0 >= 0 and a1 >= 0 and a2 >= 0) or (
                        a0 <= 0 and a1 <= 0 and a2 <= 0
                    )
                    asum = a0 + a1 + a2
                    if not inside or asum == 0.0:
                        continue
                    z = p0[2] * a0 + p1[2] * a1 + p2[2] * a2
                    ww = p0[3] * a0 + p1[3] * a1 + p2[3] * a2
                    zw = z / ww
                    if zw < -1.0 or zw > 1.0:
                        continue
                    if zw < best_zw:
                        best_zw = zw
                        iw = 1.0 / asum
                        b0 = min(max(a0 * iw, 0.0), 1.0)
                        b1 = min(max(a1 * iw, 0.0), 1.0)
                        best = (b0, b1, min(max(zw, -1.0), 1.0), float(ti + 1))
                if best is not None:
                    out[ni, py, px] = best
    return out


def interpolate_oracle(attr, rast, faces):
    """common/interpolate.cu:15-85."""
    n, h, w, _ = rast.shape
    c = attr.shape[-1]
    instanced = attr.ndim == 3
    out = np.zeros((n, h, w, c), dtype=np.float32)
    for ni in range(n):
        for py in range(h):
            for px in range(w):
                tri = int(rast[ni, py, px, 3]) - 1
                if tri < 0:
                    continue
                b0 = rast[ni, py, px, 0]
                b1 = rast[ni, py, px, 1]
                b2 = 1.0 - b0 - b1
                vi = faces[tri]
                a = attr[ni] if instanced else attr
                out[ni, py, px] = b0 * a[vi[0]] + b1 * a[vi[1]] + b2 * a[vi[2]]
    return out


def texture_oracle(tex, uv):
    """common/texture.cu TextureFwdKernelLinear1, wrap boundary."""
    th, tw, c = tex.shape
    n, h, w, _ = uv.shape
    out = np.zeros((n, h, w, c), dtype=np.float32)
    for ni in range(n):
        for py in range(h):
            for px in range(w):
                mu = uv[ni, py, px, 0] * tw - 0.5
                mv = uv[ni, py, px, 1] * th - 0.5
                iu0 = int(np.floor(mu))
                iv0 = int(np.floor(mv))
                fu = mu - iu0
                fv = mv - iv0
                u0, u1 = iu0 % tw, (iu0 + 1) % tw
                v0, v1 = iv0 % th, (iv0 + 1) % th
                out[ni, py, px] = (
                    tex[v0, u0] * (1 - fu) * (1 - fv)
                    + tex[v0, u1] * fu * (1 - fv)
                    + tex[v1, u0] * (1 - fu) * fv
                    + tex[v1, u1] * fu * fv
                )
    return out


def warp_perspective_oracle(src, tf, out_h, out_w, interp, border=0.0):
    """OpenCV-convention warpPerspective: dst(x,y) = src(inv(tf) @ (x,y,1))."""
    inv = np.linalg.inv(tf)
    c = src.shape[2]
    out = np.zeros((out_h, out_w, c), dtype=np.float64)
    h, w = src.shape[:2]
    for y in range(out_h):
        for x in range(out_w):
            sx, sy, sw = inv @ np.array([x, y, 1.0])
            sx, sy = sx / sw, sy / sw
            if interp == "nearest":
                xi, yi = int(round(sx)), int(round(sy))
                if 0 <= xi < w and 0 <= yi < h:
                    out[y, x] = src[yi, xi]
            else:
                x0, y0 = int(np.floor(sx)), int(np.floor(sy))
                fx, fy = sx - x0, sy - y0
                acc = np.zeros(c)
                for (dy, dx, wgt) in [
                    (0, 0, (1 - fx) * (1 - fy)),
                    (0, 1, fx * (1 - fy)),
                    (1, 0, (1 - fx) * fy),
                    (1, 1, fx * fy),
                ]:
                    yy, xx = y0 + dy, x0 + dx
                    val = src[yy, xx] if (0 <= xx < w and 0 <= yy < h) else border
                    acc = acc + wgt * np.asarray(val, dtype=np.float64)
                out[y, x] = acc
    return out


def threshold_downscale_oracle(xyz, poses, downscale, min_depth, max_depth):
    """foundationpose_render.cu:61-118."""
    out = xyz.copy()
    n = xyz.shape[0]
    for ni in range(n):
        t = poses[ni, :3, 3]
        pts = out[ni].reshape(-1, 3)
        for i in range(pts.shape[0]):
            invalid = pts[i, 2] < min_depth
            pts[i] -= t
            pts[i] /= downscale
            for k in range(3):
                if abs(pts[i, k]) > max_depth or invalid:
                    pts[i, k] = 0.0
    return out

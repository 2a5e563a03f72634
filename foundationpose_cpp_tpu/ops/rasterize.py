"""Batched triangle rasterization + attribute interpolation + texturing.

TPU-native redesign of the reference's render stack: the vendored
nvdiffrast/CudaRaster 4-stage binning rasterizer (src/nvdiffrast/common/,
~4.1k LoC of GPU-SM-specific machinery) plus its forward shader
(RasterizeCudaFwdShaderKernel, common/rasterize.cu:15-90), interpolation
(common/interpolate.cu:15-85) and bilinear-wrap texturing
(common/texture.cu:131-179).

Behavioral contract reproduced (SURVEY.md SS2.5): given N instance-mode
clip-space vertex batches (N, V, 4) and a shared (F, 3) index buffer, emit per
pixel (b0, b1, z/w, triangle_id + 1) with nearest-depth visibility and 0 for
background.

Key observation driving the TPU design: with the pixel-center NDC coordinates
fx = (2*px+1)/W - 1, fy = (2*py+1)/H - 1, every per-pixel quantity the shader
evaluates is AFFINE in (fx, fy):

    a_k(fx, fy)       edge functions; their coefficient triples are cross
                      products of vertex (x, y, w) pairs
    z(fx, fy) = sum_k p_k.z * a_k     and likewise w(fx, fy)

so rasterization reduces to: precompute 15 affine coefficients per (pose,
face) with batched einsums (MXU), then evaluate + depth-reduce over a face
axis per pixel (VPU). No bin/coarse/fine queues, no atomics, no
overflow-retry -- that design is CUDA-SM-specific and does not map to TPU.

This module holds the pure-XLA formulation (runs everywhere, used as the
test oracle path and CPU fallback); ops/rasterize_pallas.py carries the
tiled Pallas kernel used on TPU.

Deviation from CudaRaster noted for the record: triangles crossing the near
plane (any vertex w <= znear-ish) are culled whole instead of clipped into
sub-triangles (impl/TriangleSetup.inl). For this pipeline's scenes the object
sits >= 0.1 m in front of the camera, so no rendered triangle is ever
near-clipped; a unit test asserts the cull matches the oracle on such scenes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

import functools as _functools
import jax as _jax

# Geometry math must be exact float32: JAX's default matmul precision lowers
# f32 einsum operands to bf16 on the TPU MXU, which is fine for the neural
# nets but corrupts crop-window rounding and clip-space vertex positions.
_einsum = _functools.partial(jnp.einsum, precision=_jax.lax.Precision.HIGHEST)


BACKGROUND_ID = 0  # rast.w == 0 marks background, ids are tri_idx + 1


def edge_coefficients(clip: jnp.ndarray, faces: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(pose, face) affine coefficients for edges, z and w.

    Args:
      clip: (N, V, 4) clip-space vertices.
      faces: (F, 3) int32 vertex indices.

    Returns:
      coeffs: (N, F, 5, 3) where [..., k, :] are (c_fx, c_fy, c_1) for
        quantity k in (a0, a1, a2, z, w) -- value = c_fx*fx + c_fy*fy + c_1.
      valid: (N, F) bool; False for faces with any vertex at w <= 0
        (near-plane cull) or a degenerate zero edge system.
    """
    tri = jnp.take(clip, faces, axis=1)  # (N, F, 3, 4)
    p0, p1, p2 = tri[:, :, 0], tri[:, :, 1], tri[:, :, 2]

    def xyw(p):
        return jnp.stack([p[..., 0], p[..., 1], p[..., 3]], axis=-1)

    # cross((qx,qy,qw),(rx,ry,rw)) = (qy*rw - qw*ry, qw*rx - qx*rw, qx*ry - qy*rx)
    # which is exactly (c_fx, c_fy, c_1) of the shader's edge function
    # a(fx,fy) = (qx - fx*qw)(ry - fy*rw) - (qy - fy*qw)(rx - fx*rw)
    # (the fx*fy terms cancel; see RasterizeCudaFwdShaderKernel edge eval).
    c_a0 = jnp.cross(xyw(p1), xyw(p2))
    c_a1 = jnp.cross(xyw(p2), xyw(p0))
    c_a2 = jnp.cross(xyw(p0), xyw(p1))
    c_z = p0[..., 2:3] * c_a0 + p1[..., 2:3] * c_a1 + p2[..., 2:3] * c_a2
    c_w = p0[..., 3:4] * c_a0 + p1[..., 3:4] * c_a1 + p2[..., 3:4] * c_a2
    coeffs = jnp.stack([c_a0, c_a1, c_a2, c_z, c_w], axis=2)  # (N, F, 5, 3)

    w_pos = jnp.all(tri[..., 3] > 0.0, axis=-1)  # (N, F)
    nondegenerate = (
        jnp.max(jnp.abs(jnp.stack([c_a0, c_a1, c_a2], axis=2)), axis=(2, 3)) > 0.0
    )
    return coeffs, w_pos & nondegenerate


def pixel_basis(h: int, w: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """NDC pixel-center coordinate maps fx (w,), fy (h,)."""
    fx = (2.0 * jnp.arange(w, dtype=jnp.float32) + 1.0) / w - 1.0
    fy = (2.0 * jnp.arange(h, dtype=jnp.float32) + 1.0) / h - 1.0
    return fx, fy


def _flat_basis(h: int, w: int) -> jnp.ndarray:
    """(3, h*w) rows (fx, fy, 1) at every pixel center."""
    fx, fy = pixel_basis(h, w)
    hw = h * w
    return jnp.stack(
        [
            jnp.tile(fx[None, :], (h, 1)).reshape(hw),
            jnp.repeat(fy, w),
            jnp.ones((hw,), dtype=jnp.float32),
        ],
        axis=0,
    )


def winner_edge_values(
    coeffs_flat: jnp.ndarray, face_idx: jnp.ndarray, basis: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Evaluate the 3 edge functions of each pixel's winning face.

    coeffs_flat: (N, F, 15); face_idx: (N, hw); basis: (3, hw).
    Planar gathers (one per coefficient) -- see interpolate_attributes for
    why gathering (.., 15)-minor blocks is catastrophic on TPU.
    """
    n, f, _ = coeffs_flat.shape
    base = (jnp.arange(n, dtype=jnp.int32) * f)[:, None]
    gidx = face_idx + base  # (N, hw)

    def edge(q):
        acc = None
        for k in range(3):
            plane = coeffs_flat[:, :, 3 * q + k].reshape(-1)
            term = jnp.take(plane, gidx, axis=0) * basis[k][None, :]
            acc = term if acc is None else acc + term
        return acc

    return edge(0), edge(1), edge(2)


def _depth_pass(
    coeffs: jnp.ndarray,
    valid: jnp.ndarray,
    basis: jnp.ndarray,
    chunk: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest-depth visibility over all faces for one pose group.

    coeffs: (G, F, 5, 3), valid: (G, F), basis: (3, hw)
    Returns best_zw, best_id (G, hw); id 0 = background.
    """
    g, f = valid.shape
    hw = basis.shape[1]
    n_chunks = f // chunk
    coeffs_c = coeffs.reshape(g, n_chunks, chunk, 5, 3).transpose(1, 0, 2, 3, 4)
    valid_c = valid.reshape(g, n_chunks, chunk).transpose(1, 0, 2)

    init_zw = jnp.full((g, hw), jnp.inf, dtype=jnp.float32)
    init_id = jnp.full((g, hw), jnp.int32(0))

    def step(carry, inputs):
        best_zw, best_id = carry
        cf, vl, base_idx = inputs  # cf: (G, chunk, 5, 3), vl: (G, chunk)
        vals = _einsum("gcqk,kp->gcqp", cf, basis)  # (G, chunk, 5, hw)
        a0, a1, a2, zf, wf = (vals[:, :, i] for i in range(5))
        covered = ((a0 >= 0) & (a1 >= 0) & (a2 >= 0)) | (
            (a0 <= 0) & (a1 <= 0) & (a2 <= 0)
        )
        covered &= (a0 + a1 + a2) != 0.0
        covered &= vl[:, :, None]
        zw = zf / wf
        covered &= (zw >= -1.0) & (zw <= 1.0)
        zw = jnp.where(covered, zw, jnp.inf)
        # nearest depth within the chunk (first face on ties: argmin picks it)
        local_best = jnp.argmin(zw, axis=1)  # (G, hw)
        local_zw = jnp.min(zw, axis=1)
        local_id = base_idx + local_best.astype(jnp.int32) + 1
        take = local_zw < best_zw
        best_zw = jnp.where(take, local_zw, best_zw)
        best_id = jnp.where(take, local_id, best_id)
        return (best_zw, best_id), None

    base_idxs = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (best_zw, best_id), _ = jax.lax.scan(
        step, (init_zw, init_id), (coeffs_c, valid_c, base_idxs)
    )
    return best_zw, best_id


@functools.partial(jax.jit, static_argnames=("h", "w", "chunk", "pose_group"))
def rasterize(
    clip: jnp.ndarray,
    faces: jnp.ndarray,
    h: int,
    w: int,
    face_valid: jnp.ndarray | None = None,
    chunk: int = 64,
    pose_group: int = 4,
) -> jnp.ndarray:
    """Rasterize N instance batches -> (N, h, w, 4) of (b0, b1, z/w, id+1).

    Pure-XLA path: poses processed in groups of `pose_group` (lax.map), each
    group scanning face chunks with a running nearest-depth (then lowest-id)
    reduction per pixel; per-step live memory is pose_group*chunk*5*h*w
    floats. A final gather pass re-evaluates barycentrics for the winning
    face only. The Pallas kernel (ops/rasterize_pallas.py) replaces the scan
    on TPU for large meshes.
    """
    n, v, _ = clip.shape
    f = faces.shape[0]
    coeffs, valid = edge_coefficients(clip, faces)
    if face_valid is not None:
        valid = valid & face_valid[None, :]

    pad_f = (-f) % chunk
    if pad_f:
        coeffs = jnp.pad(coeffs, ((0, 0), (0, pad_f), (0, 0), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, pad_f)))
    f_pad = coeffs.shape[1]

    pad_n = (-n) % pose_group
    if pad_n:
        coeffs = jnp.pad(coeffs, ((0, pad_n), (0, 0), (0, 0), (0, 0)))
        valid = jnp.pad(valid, ((0, pad_n), (0, 0)))
    n_pad = coeffs.shape[0]
    n_groups = n_pad // pose_group

    basis = _flat_basis(h, w)
    hw = h * w

    grouped_c = coeffs.reshape(n_groups, pose_group, f_pad, 5, 3)
    grouped_v = valid.reshape(n_groups, pose_group, f_pad)
    best_zw, best_id = jax.lax.map(
        lambda cv: _depth_pass(cv[0], cv[1], basis, chunk), (grouped_c, grouped_v)
    )
    best_zw = best_zw.reshape(n_pad, hw)[:n]
    best_id = best_id.reshape(n_pad, hw)[:n]
    coeffs = coeffs[:n]

    # final pass: gather winning-face coefficients, emit (b0, b1, zw, id)
    fg = best_id > 0
    face_idx = jnp.maximum(best_id - 1, 0)  # (N, hw)
    a0, a1, a2 = winner_edge_values(coeffs.reshape(n, f_pad, 15), face_idx, basis)
    iw = 1.0 / (a0 + a1 + a2)
    b0 = jnp.clip(a0 * iw, 0.0, 1.0)
    b1 = jnp.clip(a1 * iw, 0.0, 1.0)
    zw = jnp.clip(best_zw, -1.0, 1.0)
    out = jnp.stack([b0, b1, zw, best_id.astype(jnp.float32)], axis=-1)
    out = jnp.where(fg[..., None], out, 0.0)
    return out.reshape(n, h, w, 4)


def interpolate_attributes(
    attr: jnp.ndarray, rast: jnp.ndarray, faces: jnp.ndarray
) -> jnp.ndarray:
    """Barycentric vertex-attribute interpolation (interpolate.cu:15-85).

    Args:
      attr: (N, V, C) per-instance or (V, C) broadcast attributes.
      rast: (N, H, W, 4) rasterizer output.
      faces: (F, 3) indices.

    Returns:
      (N, H, W, C); zero where rast.w == 0 (background).

    Implementation note: every gather here is PLANAR -- a (X,) source plane
    fetched with (N,H,W) indices, so each temporary's minor dim is the
    128-friendly image width. Gathering from (F,3)/(V,C)-shaped sources
    produces channel-minor temporaries that TPU tiling pads 3 -> 128 lanes
    (measured: a 19.8 GB allocation at 252x160x160), and batched
    take_along_axis additionally triggers a sort-based gather rewrite.
    """
    n, h, w, _ = rast.shape
    tri_id = rast[..., 3].astype(jnp.int32) - 1  # (N,H,W), -1 = background
    fg = tri_id >= 0
    face_idx = jnp.maximum(tri_id, 0)

    b = (
        rast[..., 0],
        rast[..., 1],
        1.0 - rast[..., 0] - rast[..., 1],
    )

    instanced = attr.ndim == 3
    c = attr.shape[-1]
    v = attr.shape[-2]
    if instanced:
        base = (jnp.arange(n, dtype=jnp.int32) * v)[:, None, None]
    planes = [attr[..., k].reshape(-1) for k in range(c)]

    chans = []
    for ci in range(c):
        acc = None
        for k in range(3):
            vidx_k = jnp.take(faces[:, k], face_idx, axis=0)  # (N,H,W)
            if instanced:
                vidx_k = vidx_k + base
            term = b[k] * jnp.take(planes[ci], vidx_k, axis=0)
            acc = term if acc is None else acc + term
        chans.append(jnp.where(fg, acc, 0.0))
    return jnp.stack(chans, axis=-1)


def texture_bilinear_wrap(tex: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear texture fetch with wrap boundary (texture.cu:131-179).

    Args:
      tex: (Th, Tw, C) float texture.
      uv: (N, H, W, 2) texture coordinates in [0, 1] (wrapping applied).

    Returns:
      (N, H, W, C).
    """
    th, tw, c = tex.shape
    mu = uv[..., 0] * tw - 0.5
    mv = uv[..., 1] * th - 0.5
    iu0 = jnp.floor(mu)
    iv0 = jnp.floor(mv)
    fu = mu - iu0
    fv = mv - iv0
    iu0 = iu0.astype(jnp.int32)
    iv0 = iv0.astype(jnp.int32)

    def wrap(i, size):
        return jnp.mod(i, size)

    u0 = wrap(iu0, tw)
    u1 = wrap(iu0 + 1, tw)
    v0 = wrap(iv0, th)
    v1 = wrap(iv0 + 1, th)

    # planar per-channel fetches (see interpolate_attributes layout note)
    w00 = (1 - fu) * (1 - fv)
    w10 = fu * (1 - fv)
    w01 = (1 - fu) * fv
    w11 = fu * fv
    i00 = v0 * tw + u0
    i10 = v0 * tw + u1
    i01 = v1 * tw + u0
    i11 = v1 * tw + u1
    chans = []
    for ci in range(c):
        plane = tex[..., ci].reshape(th * tw)
        chans.append(
            jnp.take(plane, i00, axis=0) * w00
            + jnp.take(plane, i10, axis=0) * w10
            + jnp.take(plane, i01, axis=0) * w01
            + jnp.take(plane, i11, axis=0) * w11
        )
    return jnp.stack(chans, axis=-1)


def shade_color(
    color: jnp.ndarray,
    diffuse_map: jnp.ndarray,
    rast: jnp.ndarray,
    w_ambient: float = 0.8,
    w_diffuse: float = 0.5,
) -> jnp.ndarray:
    """Lambert shading + clamp (renfine_color_kernel + clamp_kernel [sic],
    foundationpose_render.cu:459-520 and :30-39)."""
    is_foreground = jnp.clip(rast[..., 3:4], 0.0, 1.0)
    out = color * (w_ambient + diffuse_map * w_diffuse) * is_foreground
    return jnp.clip(out, 0.0, 1.0)


def flip_vertical(img: jnp.ndarray) -> jnp.ndarray:
    """GL y-up -> image y-down vertical flip (cvcuda::Flip axis 0 usage,
    foundationpose_render.cpp:676-681)."""
    return img[:, ::-1, :, :]

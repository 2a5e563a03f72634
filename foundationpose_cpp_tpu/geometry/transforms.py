"""Batched pose / projection / crop-window math (jnp, jit-traceable).

TPU-native reimplementation of the reference's host-side Eigen geometry:

- GL<->CV camera flip: foundationpose_render.cpp:22-23
- ComputeTF / ComputeCropWindowTF: foundationpose_render.cpp:25-75
- ConstructBBox2D (crop bbox back-projection): foundationpose_render.cpp:123-149
- ProjectMatrixFromIntrinsics: foundationpose_render.cpp:151-186
- generate_pose_clip crop->NDC remap: foundationpose_render.cu:363-416
- refine-delta pose composition: foundationpose.cpp:360-406

Everything here is shape-static and batched over the leading hypothesis axis N
so XLA folds it into the single compiled Register/Track program; none of the
per-pose host loops of the reference survive.
"""

from __future__ import annotations

import jax.numpy as jnp

import functools as _functools
import jax as _jax
from jax.nn import one_hot as jax_nn_one_hot

# Geometry math must be exact float32: JAX's default matmul precision lowers
# f32 einsum operands to bf16 on the TPU MXU, which is fine for the neural
# nets but corrupts crop-window rounding and clip-space vertex positions.
_einsum = _functools.partial(jnp.einsum, precision=_jax.lax.Precision.HIGHEST)


# CV camera -> GL camera: flips y and z (foundationpose_render.cpp:22-23).
GL_CAM_IN_CV_CAM = jnp.diag(jnp.asarray([1.0, -1.0, -1.0, 1.0], dtype=jnp.float32))


def projection_from_intrinsics(
    K: jnp.ndarray,
    height: int,
    width: int,
    znear: float = 0.1,
    zfar: float = 100.0,
) -> jnp.ndarray:
    """OpenGL projection matrix from a pinhole K, y_down window coords.

    Mirrors ProjectMatrixFromIntrinsics (foundationpose_render.cpp:151-186).
    height/width may be python ints or traced scalars (bucketed-size mode
    passes the REAL extents dynamically while shapes stay at the bucket).
    """
    w = jnp.asarray(width, jnp.float32)
    h = jnp.asarray(height, jnp.float32)
    depth = zfar - znear
    q = -(zfar + znear) / depth
    qn = -2.0 * zfar * znear / depth
    z = jnp.zeros((), dtype=jnp.float32)
    row0 = jnp.stack([2 * K[0, 0] / w, -2 * K[0, 1] / w, (-2 * K[0, 2] + w) / w, z])
    row1 = jnp.stack([z, 2 * K[1, 1] / h, (2 * K[1, 2] - h) / h, z])
    row2 = jnp.asarray([0.0, 0.0, q, qn], dtype=jnp.float32)
    row3 = jnp.asarray([0.0, 0.0, -1.0, 0.0], dtype=jnp.float32)
    return jnp.stack([row0, row1, row2, row3])


def compute_crop_window_tf(
    poses: jnp.ndarray,
    K: jnp.ndarray,
    out_hw: tuple[int, int],
    crop_ratio: float,
    mesh_diameter: float,
) -> jnp.ndarray:
    """Per-pose 3x3 affine mapping original-image pixels -> crop-window pixels.

    Mirrors ComputeCropWindowTF + ComputeTF (foundationpose_render.cpp:25-75),
    including its quirks: the window radius is the |max signed delta| of the
    *v* coordinate only across the five probe points, and the window bounds
    are rounded to integer pixels before the scale is computed.

    Args:
      poses: (N, 4, 4) object-in-camera poses.
      K: (3, 3) intrinsics.
      out_hw: (crop_H, crop_W).
      crop_ratio: 1.2 for refine, 1.1 for score.
      mesh_diameter: mesh diameter in meters.

    Returns:
      (N, 3, 3) affine transforms (last row [0, 0, 1]).
    """
    out_h, out_w = out_hw
    r = mesh_diameter * crop_ratio / 2.0
    offsets = jnp.asarray(
        [[0, 0, 0], [r, 0, 0], [-r, 0, 0], [0, r, 0], [0, -r, 0]], dtype=jnp.float32
    )  # (5, 3)
    centers = poses[:, :3, 3]  # (N, 3)
    pts = centers[:, None, :] + offsets[None, :, :]  # (N, 5, 3)
    projected = _einsum("ij,npj->npi", K, pts)  # (N, 5, 3)
    uvs = projected[..., :2] / projected[..., 2:3]  # (N, 5, 2)
    center_uv = uvs[:, 0, :]  # (N, 2)
    # reference: abs(maxCoeff of the signed v-deltas) -- v only, max then abs
    dv = uvs[..., 1] - center_uv[:, None, 1]  # (N, 5)
    radius = jnp.abs(jnp.max(dv, axis=1))  # (N,)

    # std::round semantics: halfway cases away from zero (jnp.round is
    # half-to-even, which would disagree on exact .5 boundaries)
    def _round_away(x):
        return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)

    left = _round_away(center_uv[:, 0] - radius)
    right = _round_away(center_uv[:, 0] + radius)
    top = _round_away(center_uv[:, 1] - radius)
    bottom = _round_away(center_uv[:, 1] + radius)

    # ComputeTF: scale(out/(r-l), out/(b-t)) @ translate(-l, -t). The reference
    # indexes out_size(0)=crop_H for the x scale and out_size(1)=crop_W for y
    # (foundationpose_render.cpp:37-39); both are 160 by default.
    sx = out_h / (right - left)
    sy = out_w / (bottom - top)
    zeros = jnp.zeros_like(sx)
    ones = jnp.ones_like(sx)
    tf = jnp.stack(
        [
            jnp.stack([sx, zeros, -sx * left], axis=-1),
            jnp.stack([zeros, sy, -sy * top], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    return tf


def invert_affine3(tfs: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of (N, 3, 3) affines with last row [0,0,1]."""
    a = tfs[:, 0, 0]
    b = tfs[:, 0, 1]
    c = tfs[:, 0, 2]
    d = tfs[:, 1, 0]
    e = tfs[:, 1, 1]
    f = tfs[:, 1, 2]
    det = a * e - b * d
    ia = e / det
    ib = -b / det
    id_ = -d / det
    ie = a / det
    ic = -(ia * c + ib * f)
    if_ = -(id_ * c + ie * f)
    zeros = jnp.zeros_like(a)
    ones = jnp.ones_like(a)
    return jnp.stack(
        [
            jnp.stack([ia, ib, ic], axis=-1),
            jnp.stack([id_, ie, if_], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )


def construct_bbox2d(tfs: jnp.ndarray, crop_h: int, crop_w: int) -> jnp.ndarray:
    """Map crop-window corners back to original-image coords.

    Mirrors ConstructBBox2D (foundationpose_render.cpp:123-149): rows are
    [left, top, right, bottom] per pose, from corners (0,0) and (W-1,H-1).
    """
    inv = invert_affine3(tfs)  # (N, 3, 3)
    corners = jnp.asarray(
        [[0.0, 0.0, 1.0], [crop_w - 1.0, crop_h - 1.0, 1.0]], dtype=jnp.float32
    )  # (2, 3)
    mapped = _einsum("nij,cj->nci", inv, corners)  # (N, 2, 3)
    return jnp.concatenate([mapped[:, 0, :2], mapped[:, 1, :2]], axis=-1)  # (N, 4)


def pose_clip_matrix(
    poses: jnp.ndarray,
    bbox2d: jnp.ndarray,
    K: jnp.ndarray,
    rgb_h: int,
    rgb_w: int,
    znear: float = 0.1,
    zfar: float = 100.0,
) -> jnp.ndarray:
    """Per-pose 4x4 matrix taking mesh-frame points to crop-NDC clip space.

    Fuses GeneratePoseClipOnCUDA's host mvp (proj @ glcam @ pose,
    foundationpose_render.cpp:570-609) with generate_pose_clip_kernel's
    on-the-fly crop-bbox remap (foundationpose_render.cu:363-416) into a
    single matrix, so vertex transformation becomes one batched einsum on the
    MXU instead of a kernel with per-point scalar math.
    """
    proj = projection_from_intrinsics(K, rgb_h, rgb_w, znear, zfar)
    mvp = _einsum("ij,jk,nkl->nil", proj, GL_CAM_IN_CV_CAM, poses)  # (N,4,4)

    rgb_h = jnp.asarray(rgb_h, jnp.float32)
    rgb_w = jnp.asarray(rgb_w, jnp.float32)
    l = bbox2d[:, 0]
    t = rgb_h - bbox2d[:, 1]
    r = bbox2d[:, 2]
    b = rgb_h - bbox2d[:, 3]
    a00 = rgb_w / (r - l)
    a11 = rgb_h / (t - b)
    a30 = (rgb_w - r - l) / (r - l)
    a31 = (rgb_h - t - b) / (t - b)

    row0 = a00[:, None] * mvp[:, 0, :] + a30[:, None] * mvp[:, 3, :]
    row1 = a11[:, None] * mvp[:, 1, :] + a31[:, None] * mvp[:, 3, :]
    return jnp.stack([row0, row1, mvp[:, 2, :], mvp[:, 3, :]], axis=1)


def transform_points(poses: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """(N,4,4) poses x (V,3) points -> (N,V,3) (transform_points_kernel)."""
    return _einsum("nij,vj->nvi", poses[:, :3, :3], pts) + poses[:, None, :3, 3]


def transform_points_homogeneous(mats: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """(N,4,4) x (V,3) -> (N,V,4) full homogeneous transform."""
    return _einsum("nij,vj->nvi", mats[:, :, :3], pts) + mats[:, None, :, 3]


def diffuse_intensity(poses: jnp.ndarray, normals: jnp.ndarray) -> jnp.ndarray:
    """Per-pose, per-vertex Lambert diffuse term.

    Mirrors transform_normals_kernel (foundationpose_render.cu:418-457):
    rotate the normal into camera frame, return clamp(-z/||n||, 0, 1).
    """
    tn = _einsum("nij,vj->nvi", poses[:, :3, :3], normals)  # (N, V, 3)
    norm = jnp.linalg.norm(tn, axis=-1)
    value = jnp.where(norm == 0.0, 0.0, -tn[..., 2] / jnp.maximum(norm, 1e-30))
    return jnp.clip(value, 0.0, 1.0)


def axis_angle_to_matrix(rotvec: jnp.ndarray) -> jnp.ndarray:
    """Batched Rodrigues: (N,3) rotation vectors -> (N,3,3) matrices.

    Safe at angle=0 (returns identity), matching Eigen AngleAxis semantics.
    """
    angle = jnp.linalg.norm(rotvec, axis=-1, keepdims=True)  # (N,1)
    safe = jnp.maximum(angle, 1e-12)
    axis = rotvec / safe
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    c = jnp.cos(angle[..., 0])
    s = jnp.sin(angle[..., 0])
    C = 1.0 - c
    mat = jnp.stack(
        [
            jnp.stack([c + x * x * C, x * y * C - z * s, x * z * C + y * s], axis=-1),
            jnp.stack([y * x * C + z * s, c + y * y * C, y * z * C - x * s], axis=-1),
            jnp.stack([z * x * C - y * s, z * y * C + x * s, c + z * z * C], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rotvec.dtype), mat.shape)
    return jnp.where(angle[..., None] < 1e-12, eye, mat)


def matrix_to_axis_angle(mat: jnp.ndarray) -> jnp.ndarray:
    """Batched rotation log map: (N,3,3) matrices -> (N,3) rotation vectors.

    Inverse of axis_angle_to_matrix for angles in [0, pi). Used by the
    synthetic trainer to derive refiner rotation targets (the delta the net
    must output so apply_refine_delta lands on the ground truth); the
    reference has no equivalent because its nets arrive pre-trained.
    Safe at angle=0; numerically stable near 0 via the sinc expansion.
    """
    trace = mat[..., 0, 0] + mat[..., 1, 1] + mat[..., 2, 2]
    cos_a = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    angle = jnp.arccos(cos_a)  # (N,)
    # skew part: (R - R^T)/2 = sin(angle) * [axis]_x
    sx = (mat[..., 2, 1] - mat[..., 1, 2]) * 0.5
    sy = (mat[..., 0, 2] - mat[..., 2, 0]) * 0.5
    sz = (mat[..., 1, 0] - mat[..., 0, 1]) * 0.5
    s = jnp.stack([sx, sy, sz], axis=-1)  # sin(angle) * axis
    # rotvec = angle * axis = s * angle / sin(angle); series for small angle
    sin_a = jnp.sin(angle)
    factor = jnp.where(
        angle < 1e-4,
        1.0 + angle**2 / 6.0,  # angle/sin(angle) ~ 1 + a^2/6
        angle / jnp.maximum(sin_a, 1e-12),
    )
    rv = s * factor[..., None]
    # near pi, sin(angle)->0 and the skew part degenerates; recover the axis
    # from the symmetric part via Shepperd's largest-diagonal pivot: with
    # S = (R + R^T)/2, diag(S) = c + axis^2 (1-c) and S_ij = axis_i axis_j (1-c)
    # for i != j, so the row of S at the LARGEST diagonal entry k fixes every
    # relative sign (anchoring on a fixed axis -- e.g. always x -- loses the
    # y-vs-z relative sign whenever axis_k ~ 0).
    one_minus_c = jnp.maximum(1.0 - cos_a[..., None], 1e-12)  # (N,1)
    sym = (mat + jnp.swapaxes(mat, -1, -2)) * 0.5  # (N,3,3)
    diag = jnp.stack([mat[..., 0, 0], mat[..., 1, 1], mat[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)  # (N,)
    onehot = jax_nn_one_hot(k, 3, dtype=mat.dtype)  # (N,3)
    pivot_row = _einsum("...k,...kj->...j", onehot, sym)  # (N,3) = S[k,:]
    a_k2 = jnp.clip(
        (jnp.sum(onehot * diag, axis=-1, keepdims=True) - cos_a[..., None])
        / one_minus_c,
        0.0,
        1.0,
    )
    a_k = jnp.sqrt(a_k2)  # (N,1), pivot component taken positive
    axis_pi = pivot_row / jnp.maximum(a_k * one_minus_c, 1e-12)
    axis_pi = jnp.where(onehot > 0, a_k, axis_pi)
    axis_pi = axis_pi / jnp.maximum(
        jnp.linalg.norm(axis_pi, axis=-1, keepdims=True), 1e-12
    )
    # rotvec ~ -rotvec only at exactly pi; just below pi the skew part still
    # carries the true sign -- align with it (at exactly pi s=0, sign is free).
    flip = jnp.where(jnp.sum(s * axis_pi, axis=-1, keepdims=True) < 0.0, -1.0, 1.0)
    rv_pi = axis_pi * flip * angle[..., None]
    return jnp.where((jnp.pi - angle[..., None]) < 1e-3, rv_pi, rv)


def apply_refine_delta(
    poses: jnp.ndarray,
    trans_out: jnp.ndarray,
    rot_out: jnp.ndarray,
    mesh_diameter: float,
    rot_normalizer: float = 0.349065850398865,
) -> jnp.ndarray:
    """Compose refiner deltas onto hypothesis poses, all on device.

    Mirrors RefinePostProcess (foundationpose.cpp:360-406):
      t' = t + trans_out * diameter/2
      rv = tanh(rot_out) * rot_normalizer
      R' = axis_angle(rv).T @ R
    """
    trans_delta = trans_out * (mesh_diameter / 2.0)  # (N,3)
    rv = jnp.tanh(rot_out) * rot_normalizer  # (N,3)
    rot_delta_t = jnp.swapaxes(axis_angle_to_matrix(rv), -1, -2)  # (N,3,3)

    new_r = _einsum("nij,njk->nik", rot_delta_t, poses[:, :3, :3])
    new_t = poses[:, :3, 3] + trans_delta
    out = poses.at[:, :3, :3].set(new_r)
    out = out.at[:, :3, 3].set(new_t)
    return out


def convert_pose_mesh2bbox(
    pose_in_mesh: jnp.ndarray, model_center: jnp.ndarray, orient_bounds: jnp.ndarray
) -> jnp.ndarray:
    """Pose frame change mesh -> oriented bbox (mesh_loader.hpp:75-81)."""
    tf_to_center = jnp.eye(4, dtype=pose_in_mesh.dtype)
    tf_to_center = tf_to_center.at[:3, 3].set(-model_center)
    return pose_in_mesh @ tf_to_center @ orient_bounds

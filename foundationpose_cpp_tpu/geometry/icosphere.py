"""Icosphere viewpoint sampling and the 252-pose rotation grid.

Host-side (numpy) precompute, run once at pipeline construction, mirroring the
reference's sampler init (foundationpose_sampling.cpp:56-237 in
/root/reference). The grid is a constant that gets baked into the jitted
Register program, so there is no reason to express it in JAX.

Semantics reproduced exactly:
- 12-vertex golden-ratio icosahedron, midpoint subdivision with an edge cache
  until ``len(vertices) >= n_views`` (every vertex normalized onto the unit
  sphere as it is added) -- GenerateIcosphere, foundationpose_sampling.cpp:56-121.
- Per-vertex camera-in-object look-at frame with up=(0,0,1) and the degenerate
  fallback x_axis=(1,0,0) -- SampleViewsIcosphere, :178-203.
- 6 in-plane rotations about camera z (60 deg step), composed on the right,
  then inverted to object-in-camera -- MakeRotationGrid, :212-237. The
  reference calls ClusterPoses but discards its result, so the grid stays at
  len(vertices) * (360/inplane_step) poses; we do not cluster either.
"""

from __future__ import annotations

import functools
import math

import numpy as np


def generate_icosphere_vertices(n_views: int) -> np.ndarray:
    """Unit-sphere vertices of an icosphere subdivided until >= n_views."""
    t = (1.0 + math.sqrt(5.0)) / 2.0
    raw = [
        (-1, t, 0), (1, t, 0), (-1, -t, 0), (1, -t, 0),
        (0, -1, t), (0, 1, t), (0, -1, -t), (0, 1, -t),
        (t, 0, -1), (t, 0, 1), (-t, 0, -1), (-t, 0, 1),
    ]
    vertices = [np.asarray(v, dtype=np.float64) / np.linalg.norm(v) for v in raw]
    faces = [
        (0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
        (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
        (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
        (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1),
    ]

    cache: dict[tuple[int, int], int] = {}

    def midpoint(i: int, j: int) -> int:
        key = (i, j) if i < j else (j, i)
        if key in cache:
            return cache[key]
        pm = (vertices[i] + vertices[j]) / 2.0
        vertices.append(pm / np.linalg.norm(pm))
        cache[key] = len(vertices) - 1
        return cache[key]

    while len(vertices) < n_views:
        new_faces = []
        for a, b, c in faces:
            ab = midpoint(a, b)
            bc = midpoint(b, c)
            ca = midpoint(c, a)
            new_faces += [(a, ab, ca), (b, bc, ab), (c, ca, bc), (ab, bc, ca)]
        faces = new_faces

    return np.stack(vertices).astype(np.float32)


def sample_views_icosphere(n_views: int) -> np.ndarray:
    """Camera-in-object 4x4 frames looking at the origin from each vertex."""
    vertices = generate_icosphere_vertices(n_views)
    n = vertices.shape[0]
    cam_in_obs = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    up = np.array([0.0, 0.0, 1.0], dtype=np.float32)
    for i in range(n):
        pos = vertices[i]
        z_axis = -pos / np.linalg.norm(pos)
        x_axis = np.cross(up, z_axis)
        if np.allclose(x_axis, 0.0):
            x_axis = np.array([1.0, 0.0, 0.0], dtype=np.float32)
        x_axis = x_axis / np.linalg.norm(x_axis)
        y_axis = np.cross(z_axis, x_axis)
        y_axis = y_axis / np.linalg.norm(y_axis)
        cam_in_obs[i, :3, 0] = x_axis
        cam_in_obs[i, :3, 1] = y_axis
        cam_in_obs[i, :3, 2] = z_axis
        cam_in_obs[i, :3, 3] = pos
    return cam_in_obs


@functools.lru_cache(maxsize=8)
def _make_rotation_grid_cached(n_views: int, inplane_step_deg: int) -> np.ndarray:
    cam_in_obs = sample_views_icosphere(n_views)
    inplane_degs = np.arange(0.0, 360.0, float(inplane_step_deg))
    grid = []
    for cam_in_ob in cam_in_obs:
        for deg in inplane_degs:
            rad = math.radians(deg)
            rz = np.eye(4, dtype=np.float32)
            c, s = math.cos(rad), math.sin(rad)
            rz[0, 0], rz[0, 1] = c, -s
            rz[1, 0], rz[1, 1] = s, c
            composed = cam_in_ob @ rz
            grid.append(np.linalg.inv(composed))
    return np.stack(grid).astype(np.float32)


def make_rotation_grid(n_views: int = 40, inplane_step_deg: int = 60) -> np.ndarray:
    """(M, 4, 4) object-in-camera rotation hypotheses; M=252 for defaults.

    Rotation-only: translation columns are zero until the sampler writes the
    guessed object center into every pose (foundationpose_sampling.cpp:388-391).
    """
    return _make_rotation_grid_cached(n_views, inplane_step_deg).copy()


def rotation_grid_size(n_views: int = 40, inplane_step_deg: int = 60) -> int:
    n_vertices = len(generate_icosphere_vertices(n_views))
    return n_vertices * (360 // inplane_step_deg)


def rotation_geodesic_distance(r1: np.ndarray, r2: np.ndarray) -> float:
    """Geodesic angle between two rotation matrices (sampling.cpp:123-128)."""
    cos = (np.trace(r1 @ r2.T) - 1.0) / 2.0
    return float(np.arccos(np.clip(cos, -1.0, 1.0)))


def cluster_poses(
    angle_diff_deg: float,
    dist_diff: float,
    poses_in: np.ndarray,
    symmetry_tfs: np.ndarray | None = None,
) -> np.ndarray:
    """Greedy symmetry-aware pose clustering (sampling.cpp:130-176).

    Kept for API parity: the reference computes this during grid construction
    and then discards the result (foundationpose_sampling.cpp:235), so the
    pipeline itself never consumes it.
    """
    if symmetry_tfs is None:
        symmetry_tfs = np.eye(4, dtype=np.float32)[None]
    radian_thres = math.radians(angle_diff_deg)
    out = [poses_in[0]]
    for pose in poses_in[1:]:
        is_new = True
        for cluster in out:
            if np.linalg.norm(cluster[:3, 3] - pose[:3, 3]) >= dist_diff:
                continue
            for tf in symmetry_tfs:
                cand = pose @ tf
                if rotation_geodesic_distance(cand[:3, :3], cluster[:3, :3]) < radian_thres:
                    is_new = False
                    break
            if not is_new:
                break
        if is_new:
            out.append(pose)
    return np.stack(out)

"""Microbenchmark for the fused render megakernel (perf experiments).

Times render_views_fused alone at production scale (252 views, 160x160,
~6k-face mesh) with the same in-scan methodology as bench.py: iterations ride
a lax.scan with optimization-barriered pose inputs so XLA cannot hoist or
overlap them, and one host readback is the barrier.

Usage: python tools/bench_fused.py [--iters 16] [--faces-lat 48]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--n", type=int, default=252)
    ap.add_argument("--lat", type=int, default=48)
    ap.add_argument("--lon", type=int, default=64)
    ap.add_argument("--phase1-only", action="store_true")
    ap.add_argument("--prepass-only", action="store_true")
    ap.add_argument("--patch-k", type=int, default=0,
                    help="per-face texel patch edge (0 = corner colors)")
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--p2-window", type=int, default=None)
    ap.add_argument("--views-pp", type=int, default=1,
                    help="views per Pallas program (amortizes tile-constant "
                         "setup)")
    ap.add_argument("--p2-anchor", action="store_true")
    ap.add_argument("--auto", action="store_true",
                    help="use the mesh's production auto_kernel_knobs "
                         "(overrides --chunk/--p2-window)")
    ap.add_argument("--p1-group", type=int, default=1,
                    help="superchunk gate width for phase 1 (1 = off)")
    ap.add_argument("--no-quadrant-split", action="store_true")
    ap.add_argument("--tz", type=float, default=0.6,
                    help="object distance; large values cull ~everything, "
                         "isolating fixed loop overhead from live visits")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from foundationpose_cpp_tpu import FoundationPoseConfig
    from foundationpose_cpp_tpu.geometry import icosphere, transforms
    from foundationpose_cpp_tpu.meshio import procedural
    from foundationpose_cpp_tpu.ops import render_fused
    from foundationpose_cpp_tpu.utils import synthetic

    cfg = FoundationPoseConfig()
    n = args.n
    K = np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1]], np.float32)
    Kj = jnp.asarray(K)
    sphere = procedural.textured_uv_sphere(
        radius=0.05, n_lat=args.lat, n_lon=args.lon
    )
    tables = render_fused.FusedMeshTables.from_asset(
        sphere, texture_patch_k=args.patch_k
    )
    print(f"mesh: {tables.num_faces} faces, cull_ok={tables.backface_cull_ok}")

    chunk, p2_window = args.chunk, args.p2_window
    if args.auto:
        chunk = tables.kernel_chunk or chunk
        p2_window = tables.kernel_p2_window
    print(f"knobs: chunk={chunk} p2_window={p2_window} "
          f"views_pp={args.views_pp} p2_anchor={args.p2_anchor}")

    gt = synthetic.default_pose(tz=args.tz)
    rot_grid = jnp.asarray(icosphere.make_rotation_grid())[:n]
    poses = rot_grid.at[:, :3, 3].set(jnp.asarray(gt[:3, 3])[None])
    hw = cfg.crop_window_h

    img_h, img_w = 480, 640

    def one_render(poses):
        crop_tfs = transforms.compute_crop_window_tf(
            poses, Kj, (hw, hw), cfg.refine_crop_ratio, tables.diameter
        )
        bbox2d = transforms.construct_bbox2d(crop_tfs, hw, hw)
        clip = transforms.pose_clip_matrix(
            poses, bbox2d, Kj, img_h, img_w, cfg.znear, cfg.zfar
        )
        return render_fused.render_views_fused(
            tables, poses, clip, hw, hw,
            w_ambient=cfg.w_ambient, w_diffuse=cfg.w_diffuse,
            min_depth=cfg.min_depth, max_depth=cfg.max_depth,
            debug_phase1_only=args.phase1_only, chunk=chunk,
            quadrant_split=not args.no_quadrant_split,
            debug_prepass_only=args.prepass_only,
            p1_group=args.p1_group,
            p2_window=p2_window,
            views_pp=args.views_pp,
            p2_anchor=args.p2_anchor,
        )

    @jax.jit
    def loop(poses):
        def body(carry, _):
            p = jax.lax.optimization_barrier(poses + carry * 1e-9)
            out = one_render(p)
            return jnp.float32(out[0, 0, 0, 0]), out[:1, :1, :1, 0]

        carry, outs = jax.lax.scan(
            body, jnp.float32(0.0), None, length=args.iters
        )
        return carry, outs

    carry, _ = loop(poses)
    _ = np.asarray(carry)  # compile + settle
    t0 = time.perf_counter()
    carry, _ = loop(poses)
    _ = np.asarray(carry)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"render_views_fused {n} views: {dt * 1e3:.2f} ms/iter")


if __name__ == "__main__":
    main()

"""Stage-level TPU timing of the Register program (perf work harness).

Times each stage with the same in-scan methodology as bench.py (stacked
distinct inputs as scan xs so nothing hoists; one host readback as the
barrier -- block_until_ready is a no-op over the axon tunnel).

Usage: python tools/profile_register.py [--iters 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

# allow running as `python tools/profile_register.py` from a source checkout
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from foundationpose_cpp_tpu import FoundationPoseConfig, networks
    from foundationpose_cpp_tpu.geometry import icosphere
    from foundationpose_cpp_tpu.meshio import procedural
    from foundationpose_cpp_tpu.ops import depth as depth_ops
    from foundationpose_cpp_tpu.pipeline.foundationpose import register_step
    from foundationpose_cpp_tpu.pipeline.renderer import (
        MeshConstants,
        render_and_transform,
    )
    from foundationpose_cpp_tpu.utils import synthetic

    it = args.iters
    cfg = FoundationPoseConfig()
    net_cfg = networks.NetConfig()
    h, w = 480, 640
    K = np.array([[600.0, 0, w / 2], [0, 600.0, h / 2], [0, 0, 1]], np.float32)
    Kj = jnp.asarray(K)
    sphere = procedural.textured_uv_sphere(radius=0.05, n_lat=48, n_lon=64)
    mesh = MeshConstants.from_asset(sphere)
    gt = synthetic.default_pose(tz=0.6)
    rgb, depth, mask = synthetic.render_scene(mesh, gt, K, h, w, cfg)
    rgb, depth, mask = jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(mask)
    rot_grid = jnp.asarray(icosphere.make_rotation_grid())
    poses = rot_grid.at[:, :3, 3].set(jnp.asarray(gt[:3, 3])[None])
    use_fused = jax.devices()[0].platform == "tpu"

    rng = np.random.default_rng(0)

    def timed(name, fn, *xs_stacked):
        f = jax.jit(fn)
        out = f(*xs_stacked)
        _ = jax.tree.map(np.asarray, out)  # compile + settle
        t0 = time.perf_counter()
        out = f(*xs_stacked)
        _ = jax.tree.map(np.asarray, out)
        dt = (time.perf_counter() - t0) / it * 1e3
        print(f"{name:28s} {dt:8.2f} ms/iter")
        return dt

    # stacked per-iter variants so the scan body cannot hoist
    poses_stack = jnp.stack([poses + 1e-6 * i for i in range(it)])
    crops_a = jnp.asarray(
        rng.uniform(size=(it, 252, 160, 160, 6)).astype(np.float32)
    )
    crops_b = jnp.asarray(
        rng.uniform(size=(it, 252, 160, 160, 6)).astype(np.float32)
    )
    depths = jnp.stack([depth + 1e-7 * i for i in range(it)])
    rgbs = jnp.stack([rgb] * it)
    masks = jnp.stack([mask] * it)

    params_r = networks.init_refiner(0, net_cfg)
    params_s = networks.init_scorer(1, net_cfg)

    xyz_map = depth_ops.depth_to_xyz(depth, K, cfg.min_depth)

    def scan_over(body):
        def outer(*stacks):
            def step(c, xs):
                return c + body(*xs), None

            c, _ = jax.lax.scan(step, jnp.float32(0.0), stacks)
            return c

        return outer

    # 1. pre: depth filters + translation guess + xyz map
    df = cfg.depth_filter
    def pre(depth_t):
        e = depth_ops.erode_depth(
            depth_t, df.erode_radius, df.erode_depth_diff_thres,
            df.erode_ratio_thres, df.zfar)
        f = depth_ops.bilateral_filter_depth(
            e, df.bilateral_radius, df.bilateral_sigma_d,
            df.bilateral_sigma_r, df.zfar, df.bilateral_mean_band)
        c, ok = depth_ops.guess_translation(f, mask, Kj, cfg.min_depth)
        xm = depth_ops.depth_to_xyz(depth_t, Kj, cfg.min_depth)
        return c.sum() + xm.sum() * 0 + jnp.float32(ok)

    timed("pre (filters+guess+xyz)", scan_over(pre), depths)

    # 2. render+transform at refine ratio (the 252-view megakernel + warps)
    def rat(poses_t):
        ri, ti = render_and_transform(
            mesh, poses_t, rgb, xyz_map, Kj, cfg.refine_crop_ratio, cfg,
            None, use_fused)
        return ri.sum().astype(jnp.float32) + ti.sum().astype(jnp.float32)

    timed("render_and_transform x252", scan_over(rat), poses_stack)

    # 2b. fused render decomposition
    from foundationpose_cpp_tpu.geometry import transforms
    from foundationpose_cpp_tpu.ops import warp as warp_ops
    from foundationpose_cpp_tpu.ops.render_fused import render_views_fused

    ch, cw = cfg.crop_window_h, cfg.crop_window_w

    def fused_full(poses_t):
        tfs = transforms.compute_crop_window_tf(
            poses_t, Kj, (ch, cw), cfg.refine_crop_ratio, mesh.diameter)
        bbox = transforms.construct_bbox2d(tfs, ch, cw)
        clipm = transforms.pose_clip_matrix(poses_t, bbox, Kj, h, w, cfg.znear, cfg.zfar)
        out = render_views_fused(mesh.fused, poses_t, clipm, ch, cw,
                                 min_depth=cfg.min_depth, max_depth=cfg.max_depth)
        return out.sum().astype(jnp.float32)

    timed("fused render (all)", scan_over(fused_full), poses_stack)

    def fused_p1(poses_t):
        tfs = transforms.compute_crop_window_tf(
            poses_t, Kj, (ch, cw), cfg.refine_crop_ratio, mesh.diameter)
        bbox = transforms.construct_bbox2d(tfs, ch, cw)
        clipm = transforms.pose_clip_matrix(poses_t, bbox, Kj, h, w, cfg.znear, cfg.zfar)
        out = render_views_fused(mesh.fused, poses_t, clipm, ch, cw,
                                 min_depth=cfg.min_depth, max_depth=cfg.max_depth,
                                 debug_phase1_only=True)
        return out.sum().astype(jnp.float32)

    timed("fused prepass+phase1", scan_over(fused_p1), poses_stack)

    def fused_pre(poses_t):
        tfs = transforms.compute_crop_window_tf(
            poses_t, Kj, (ch, cw), cfg.refine_crop_ratio, mesh.diameter)
        bbox = transforms.construct_bbox2d(tfs, ch, cw)
        clipm = transforms.pose_clip_matrix(poses_t, bbox, Kj, h, w, cfg.znear, cfg.zfar)
        out = render_views_fused(mesh.fused, poses_t, clipm, ch, cw,
                                 min_depth=cfg.min_depth, max_depth=cfg.max_depth,
                                 debug_prepass_only=True)
        return out.sum().astype(jnp.float32)

    timed("fused prepass only", scan_over(fused_pre), poses_stack)

    def warps_only(poses_t):
        tfs = transforms.compute_crop_window_tf(
            poses_t, Kj, (ch, cw), cfg.refine_crop_ratio, mesh.diameter)
        a = warp_ops.warp_crop_linear_u8_mxu(rgb, tfs, ch, cw)
        b = warp_ops.warp_crop_nearest_f32_mxu(xyz_map, tfs, ch, cw)
        return a.sum().astype(jnp.float32) + b.sum().astype(jnp.float32)

    timed("observed warps x252", scan_over(warps_only), poses_stack)

    # 3. refiner / scorer forward at N=252
    def refn(a, b):
        o = networks.apply_refiner(params_r, a, b, net_cfg)
        return o["trans"].sum() + o["rot"].sum()

    timed("refiner fwd 252", scan_over(refn), crops_a, crops_b)

    def scor(a, b):
        return networks.apply_scorer(params_s, a, b, net_cfg)["scores"].sum()

    timed("scorer fwd 252", scan_over(scor), crops_a, crops_b)

    # 4. full register
    def full(rgb_t, depth_t, mask_t):
        best, _, scores, ok = register_step(
            mesh, params_r, params_s, rgb_t, depth_t, mask_t, rot_grid, Kj,
            1, cfg, net_cfg, use_fused=use_fused)
        return best.sum() + scores.sum()

    timed("FULL register", scan_over(full), rgbs, depths, masks)


if __name__ == "__main__":
    main()

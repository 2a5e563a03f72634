"""One-process sweep of fused-kernel variants (perf experiment harness).

Runs render_views_fused at production scale (252 views, 160x160 crops,
6016-face sphere) across a list of kernel variants in ONE process -- one
tunnel connection, one persistent-compile-cache session -- and appends each
result to a JSONL log as it lands, so a background run reports progress
live.

Usage: python -u tools/sweep_fused.py [--iters 16] [--out /tmp/sweep.jsonl]
"""

from __future__ import annotations

import argparse
import json
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
    ap.add_argument("--out", default="/tmp/sweep_fused.jsonl")
    ap.add_argument("--only", default=None,
                    help="comma-separated variant names to run")
    ap.add_argument("--lat", type=int, default=48)
    ap.add_argument("--lon", type=int, default=64,
                    help="sphere tessellation; 104/139 gives a ~28k-face "
                         "mesh in the fori (past-unroll) regime like the "
                         "scan pipeline's subdivided meshes")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU smoke mode: force the CPU backend, run the "
                         "kernel interpreted at toy scale to validate the "
                         "sweep's plumbing without a TPU")
    args = ap.parse_args()
    if args.interpret:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from foundationpose_cpp_tpu import FoundationPoseConfig
    from foundationpose_cpp_tpu.geometry import icosphere, transforms
    from foundationpose_cpp_tpu.meshio import procedural
    from foundationpose_cpp_tpu.ops import render_fused
    from foundationpose_cpp_tpu.utils import synthetic
    from foundationpose_cpp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = FoundationPoseConfig()
    n = args.n
    K = np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1]], np.float32)
    Kj = jnp.asarray(K)
    if args.interpret:
        sphere = procedural.textured_uv_sphere(radius=0.05, n_lat=6, n_lon=8)
    else:
        sphere = procedural.textured_uv_sphere(
            radius=0.05, n_lat=args.lat, n_lon=args.lon
        )
    tbl_corner = render_fused.FusedMeshTables.from_asset(sphere)
    tbl_patch = render_fused.FusedMeshTables.from_asset(
        sphere, texture_patch_k=4
    )
    tbl_patch2 = render_fused.FusedMeshTables.from_asset(
        sphere, texture_patch_k=2
    )
    tbl_patch3 = render_fused.FusedMeshTables.from_asset(
        sphere, texture_patch_k=3
    )
    print(f"mesh: {tbl_corner.num_faces} faces", flush=True)

    gt = synthetic.default_pose(tz=0.6)
    rot_grid = jnp.asarray(icosphere.make_rotation_grid())[:n]
    poses = rot_grid.at[:, :3, 3].set(jnp.asarray(gt[:3, 3])[None])
    hw = 32 if args.interpret else cfg.crop_window_h

    def make_loop(tables, **kw):
        def one_render(p):
            crop_tfs = transforms.compute_crop_window_tf(
                p, Kj, (hw, hw), cfg.refine_crop_ratio, tables.diameter
            )
            bbox2d = transforms.construct_bbox2d(crop_tfs, hw, hw)
            clip = transforms.pose_clip_matrix(
                p, bbox2d, Kj, 480, 640, cfg.znear, cfg.zfar
            )
            return render_fused.render_views_fused(
                tables, p, clip, hw, hw,
                w_ambient=cfg.w_ambient, w_diffuse=cfg.w_diffuse,
                min_depth=cfg.min_depth, max_depth=cfg.max_depth,
                interpret=args.interpret, **kw,
            )

        @jax.jit
        def loop(poses):
            def body(carry, _):
                p = jax.lax.optimization_barrier(poses + carry * 1e-9)
                out = one_render(p)
                return jnp.float32(out[0, 0, 0, 0]), None

            carry, _ = jax.lax.scan(
                body, jnp.float32(0.0), None, length=args.iters
            )
            return carry

        return loop

    # (name, tables, kwargs); chunk default of render_views_fused is 256
    variants = [
        ("corner_base", tbl_corner, {}),
        ("patch_base", tbl_patch, {}),
        ("corner_prepass", tbl_corner, {"debug_prepass_only": True}),
        ("patch_prepass", tbl_patch, {"debug_prepass_only": True}),
        ("corner_phase1", tbl_corner, {"debug_phase1_only": True}),
        ("patch_phase1", tbl_patch, {"debug_phase1_only": True}),
        ("corner_p1group4", tbl_corner, {"p1_group": 4}),
        ("corner_p1group8", tbl_corner, {"p1_group": 8}),
        ("corner_p1group16", tbl_corner, {"p1_group": 16}),
        ("patch_p1group8", tbl_patch, {"p1_group": 8}),
        ("corner_noquad", tbl_corner, {"quadrant_split": False}),
        ("corner_chunk128", tbl_corner, {"chunk": 128}),
        ("patch_chunk128", tbl_patch, {"chunk": 128}),
        ("corner_c128_g8", tbl_corner, {"chunk": 128, "p1_group": 8}),
        ("patch_c128_g8", tbl_patch, {"chunk": 128, "p1_group": 8}),
        ("corner_chunk64", tbl_corner, {"chunk": 64}),
        ("corner_c128_p1", tbl_corner, {"chunk": 128,
                                        "debug_phase1_only": True}),
        # no-quadrant-split x chunk matrix: after the block-diagonal merge
        # every live (chunk, tile) visit is ONE dot, and the chunk-128 ~= 256
        # tie implies per-visit FIXED cost ~= 2x the variable cost; counted
        # overlaps (252 views, 6016-face sphere) give 349 quadrant visits vs
        # 126.5 live pairs per view at chunk 256, so one fat dot per pair
        # should beat ~2.76 thin ones. (The round-2 "quadrant predication
        # wins" predates the merge, when each visit was 4 dots.)
        ("patch_nq", tbl_patch, {"quadrant_split": False}),
        ("corner_c128_nq", tbl_corner, {"chunk": 128,
                                        "quadrant_split": False}),
        ("patch_c128_nq", tbl_patch, {"chunk": 128,
                                      "quadrant_split": False}),
        ("corner_c512_nq", tbl_corner, {"chunk": 512,
                                        "quadrant_split": False}),
        ("corner_c128_nq_p1", tbl_corner, {"chunk": 128,
                                           "quadrant_split": False,
                                           "debug_phase1_only": True}),
        ("patch_c128_nq_g8", tbl_patch, {"chunk": 128,
                                         "quadrant_split": False,
                                         "p1_group": 8}),
        # dynamic-trip-count variants (p1 live-chunk list / p2 winner-range
        # loop): zero dead iterations, at the cost of dynamic-bound loops
        # whose Mosaic lowering has historically compiled slowly
        ("patch_p2dyn", tbl_patch, {"p2_dynamic": True}),
        ("patch_livelist", tbl_patch, {"p1_livelist": True}),
        ("patch_dyn_both", tbl_patch, {"p1_livelist": True,
                                       "p2_dynamic": True}),
        ("patch_c128_dyn_both", tbl_patch, {"chunk": 128,
                                            "p1_livelist": True,
                                            "p2_dynamic": True}),
        ("patch_c128_nq_dyn", tbl_patch, {"chunk": 128,
                                          "quadrant_split": False,
                                          "p1_livelist": True,
                                          "p2_dynamic": True}),
        ("corner_dyn_both", tbl_corner, {"p1_livelist": True,
                                         "p2_dynamic": True}),
        ("corner_livelist", tbl_corner, {"p1_livelist": True}),
        ("corner_p2dyn", tbl_corner, {"p2_dynamic": True}),
        ("corner_livelist_p1", tbl_corner, {"p1_livelist": True,
                                            "debug_phase1_only": True}),
        ("corner_c128_dyn_both", tbl_corner, {"chunk": 128,
                                              "p1_livelist": True,
                                              "p2_dynamic": True}),
        # phase-2 SUPERWINDOW (p2_window a multiple of chunk): chunk-128
        # phase 1 (tighter culling, measured 41.6 vs 49.7 ms) + fat
        # 256-wide phase-2 visits (fewer fixed costs than 128-wide)
        ("corner_c128_w256", tbl_corner, {"chunk": 128, "p2_window": 256}),
        ("corner_c128_w256_p2dyn", tbl_corner, {"chunk": 128,
                                                "p2_window": 256,
                                                "p2_dynamic": True}),
        ("corner_c128_w512_p2dyn", tbl_corner, {"chunk": 128,
                                                "p2_window": 512,
                                                "p2_dynamic": True}),
        ("patch_c128_w256", tbl_patch, {"chunk": 128, "p2_window": 256}),
        ("patch_c128_w256_p2dyn", tbl_patch, {"chunk": 128,
                                              "p2_window": 256,
                                              "p2_dynamic": True}),
        # round-4 frontier: sub-128 phase-1 chunks (tighter culling; phase 2
        # runs a >=128 superwindow for Mosaic lane alignment) x livelist x
        # wide phase-2 windows, and SMALLER TEXEL PATCHES (pk drives the
        # phase-2 extraction-dot height: 75 rows at pk4, 39 at pk3, 27 at
        # pk2 vs 33 corner) -- fidelity-gated per mesh by the auto policy
        ("patch_c128_w512_dyn", tbl_patch, {"chunk": 128, "p2_window": 512,
                                            "p1_livelist": True,
                                            "p2_dynamic": True}),
        ("patch_c128_w256_dynboth", tbl_patch, {"chunk": 128,
                                                "p2_window": 256,
                                                "p1_livelist": True,
                                                "p2_dynamic": True}),
        ("patch_c64_w256_dyn", tbl_patch, {"chunk": 64, "p2_window": 256,
                                           "p1_livelist": True,
                                           "p2_dynamic": True}),
        ("patch_c64_w512_dyn", tbl_patch, {"chunk": 64, "p2_window": 512,
                                           "p1_livelist": True,
                                           "p2_dynamic": True}),
        ("patch_c32_w256_dyn", tbl_patch, {"chunk": 32, "p2_window": 256,
                                           "p1_livelist": True,
                                           "p2_dynamic": True}),
        ("corner_c64_w512_dyn", tbl_corner, {"chunk": 64, "p2_window": 512,
                                             "p1_livelist": True,
                                             "p2_dynamic": True}),
        ("corner_c128_w512_dyn", tbl_corner, {"chunk": 128, "p2_window": 512,
                                              "p1_livelist": True,
                                              "p2_dynamic": True}),
        ("corner_c64_p1_live", tbl_corner, {"chunk": 64,
                                            "p1_livelist": True,
                                            "debug_phase1_only": True}),
        ("corner_c128_p1_live", tbl_corner, {"chunk": 128,
                                             "p1_livelist": True,
                                             "debug_phase1_only": True}),
        ("patch2_c128_w512_dyn", tbl_patch2, {"chunk": 128, "p2_window": 512,
                                              "p1_livelist": True,
                                              "p2_dynamic": True}),
        ("patch3_c128_w512_dyn", tbl_patch3, {"chunk": 128, "p2_window": 512,
                                              "p1_livelist": True,
                                              "p2_dynamic": True}),
        ("patch2_c64_w512_dyn", tbl_patch2, {"chunk": 64, "p2_window": 512,
                                             "p1_livelist": True,
                                             "p2_dynamic": True}),
        ("corner_c64_w1024_dyn", tbl_corner, {"chunk": 64, "p2_window": 1024,
                                              "p1_livelist": True,
                                              "p2_dynamic": True}),
        ("patch2_c64_w1024_dyn", tbl_patch2, {"chunk": 64, "p2_window": 1024,
                                              "p1_livelist": True,
                                              "p2_dynamic": True}),
        ("patch4_c64_w1024_dyn", tbl_patch, {"chunk": 64, "p2_window": 1024,
                                             "p1_livelist": True,
                                             "p2_dynamic": True}),
        ("corner_c32_w512_dyn", tbl_corner, {"chunk": 32, "p2_window": 512,
                                             "p1_livelist": True,
                                             "p2_dynamic": True}),
        # bf16 phase-1 plane eval (PRECISION knob: ~2x MXU rate for
        # sub-1/16-px silhouette jitter)
        ("patch4_c64_w512_bf16", tbl_patch, {"chunk": 64, "p2_window": 512,
                                             "p1_livelist": True,
                                             "p2_dynamic": True,
                                             "p1_bf16": True}),
        ("corner_c64_w512_bf16", tbl_corner, {"chunk": 64, "p2_window": 512,
                                              "p1_livelist": True,
                                              "p2_dynamic": True,
                                              "p1_bf16": True}),
        ("corner_c64_p1_bf16", tbl_corner, {"chunk": 64, "p1_livelist": True,
                                            "p1_bf16": True,
                                            "debug_phase1_only": True}),
        ("patch4_c128_w512_bf16", tbl_patch, {"chunk": 128, "p2_window": 512,
                                              "p1_livelist": True,
                                              "p2_dynamic": True,
                                              "p1_bf16": True}),
        # no-quadrant-split at the production livelist point: one fat
        # (chunk, 12)@(12, 512) dot per visit vs up to 4 predicated
        # quadrant dots -- wins if the average live-quadrant count and the
        # hit-test machinery outweigh the 4x-wider VPU ops
        ("patch4_c64_w1024_nq", tbl_patch, {"chunk": 64, "p2_window": 1024,
                                            "p1_livelist": True,
                                            "p2_dynamic": True,
                                            "quadrant_split": False}),
        ("corner_c64_nq_p1", tbl_corner, {"chunk": 64, "p1_livelist": True,
                                          "quadrant_split": False,
                                          "debug_phase1_only": True}),
        ("corner_c64_w1024_p1", tbl_corner, {"chunk": 64,
                                             "p1_livelist": True,
                                             "debug_phase1_only": True}),
        # round-4b: livelist-loop unrolling (pairs/quads overlap entry k+1's
        # scalar decode with entry k's vector work; the per-visit chain is
        # serial scalar->vector). u1 re-baselines the qmask-entry +
        # prepass-folded-depth-bias changes against the earlier records.
        ("patch4_c64_w1024_u2", tbl_patch, {"chunk": 64, "p2_window": 1024,
                                            "p1_livelist": True,
                                            "p2_dynamic": True,
                                            "p1_unroll": 2}),
        ("patch4_c64_w1024_u4", tbl_patch, {"chunk": 64, "p2_window": 1024,
                                            "p1_livelist": True,
                                            "p2_dynamic": True,
                                            "p1_unroll": 4}),
        ("corner_c64_w1024_u2", tbl_corner, {"chunk": 64, "p2_window": 1024,
                                             "p1_livelist": True,
                                             "p2_dynamic": True,
                                             "p1_unroll": 2}),
        ("corner_c64_p1_u2", tbl_corner, {"chunk": 64, "p1_livelist": True,
                                          "p1_unroll": 2,
                                          "debug_phase1_only": True}),
        ("corner_c64_p1_u4", tbl_corner, {"chunk": 64, "p1_livelist": True,
                                          "p1_unroll": 4,
                                          "debug_phase1_only": True}),
        ("corner_c128_p1_u2", tbl_corner, {"chunk": 128, "p1_livelist": True,
                                           "p1_unroll": 2,
                                           "debug_phase1_only": True}),
        # round-4c: ANCHORED dynamic phase-2 window (base = winner range's
        # 128-aligned floor instead of a fixed window grid): same visit
        # count at a fraction of the window width -- the extraction dot's
        # contraction dim and the one-hot build shrink 4-8x vs w1024.
        # u1-style re-baselines ride the auto-knob defaults above.
        ("patch4_c64_wa128", tbl_patch, {"chunk": 64, "p2_window": 128,
                                         "p1_livelist": True,
                                         "p2_dynamic": True,
                                         "p2_anchor": True}),
        ("patch4_c64_wa256", tbl_patch, {"chunk": 64, "p2_window": 256,
                                         "p1_livelist": True,
                                         "p2_dynamic": True,
                                         "p2_anchor": True}),
        ("patch4_c64_wa512", tbl_patch, {"chunk": 64, "p2_window": 512,
                                         "p1_livelist": True,
                                         "p2_dynamic": True,
                                         "p2_anchor": True}),
        ("patch2_c64_wa256", tbl_patch2, {"chunk": 64, "p2_window": 256,
                                          "p1_livelist": True,
                                          "p2_dynamic": True,
                                          "p2_anchor": True}),
        ("corner_c64_wa128", tbl_corner, {"chunk": 64, "p2_window": 128,
                                          "p1_livelist": True,
                                          "p2_dynamic": True,
                                          "p2_anchor": True}),
        ("corner_c64_wa256", tbl_corner, {"chunk": 64, "p2_window": 256,
                                          "p1_livelist": True,
                                          "p2_dynamic": True,
                                          "p2_anchor": True}),
        ("corner_c32_wa256", tbl_corner, {"chunk": 32, "p2_window": 256,
                                          "p1_livelist": True,
                                          "p2_dynamic": True,
                                          "p2_anchor": True}),
        ("patch4_c32_wa256", tbl_patch, {"chunk": 32, "p2_window": 256,
                                         "p1_livelist": True,
                                         "p2_dynamic": True,
                                         "p2_anchor": True}),
        # round-5: views-per-program (amortize the ~1 MB tile-constant
        # VMEM setup -- lane geometry, plane-eval bases, phase-1/2 iotas
        # -- across a static unroll over views of the same tile). Swept
        # at the production point (auto knobs: c64 + pow2 window +
        # livelist/dyn defaults) plus phase-1-only isolation and the
        # anchored-window alternative.
        ("patch4_c64_w1024_vpp2", tbl_patch, {"chunk": 64,
                                              "p2_window": 1024,
                                              "p1_livelist": True,
                                              "p2_dynamic": True,
                                              "views_pp": 2}),
        ("patch4_c64_w1024_vpp4", tbl_patch, {"chunk": 64,
                                              "p2_window": 1024,
                                              "p1_livelist": True,
                                              "p2_dynamic": True,
                                              "views_pp": 4}),
        ("patch4_c64_w1024_vpp7", tbl_patch, {"chunk": 64,
                                              "p2_window": 1024,
                                              "p1_livelist": True,
                                              "p2_dynamic": True,
                                              "views_pp": 7}),
        ("corner_c64_w1024_vpp2", tbl_corner, {"chunk": 64,
                                               "p2_window": 1024,
                                               "p1_livelist": True,
                                               "p2_dynamic": True,
                                               "views_pp": 2}),
        ("corner_c64_w1024_vpp4", tbl_corner, {"chunk": 64,
                                               "p2_window": 1024,
                                               "p1_livelist": True,
                                               "p2_dynamic": True,
                                               "views_pp": 4}),
        ("corner_c64_p1_vpp2", tbl_corner, {"chunk": 64,
                                            "p1_livelist": True,
                                            "views_pp": 2,
                                            "debug_phase1_only": True}),
        ("corner_c64_p1_vpp4", tbl_corner, {"chunk": 64,
                                            "p1_livelist": True,
                                            "views_pp": 4,
                                            "debug_phase1_only": True}),
        ("patch4_c64_wa256_vpp2", tbl_patch, {"chunk": 64,
                                              "p2_window": 256,
                                              "p1_livelist": True,
                                              "p2_dynamic": True,
                                              "p2_anchor": True,
                                              "views_pp": 2}),
        ("patch4_c64_wa256_vpp4", tbl_patch, {"chunk": 64,
                                              "p2_window": 256,
                                              "p1_livelist": True,
                                              "p2_dynamic": True,
                                              "p2_anchor": True,
                                              "views_pp": 4}),
    ]
    if args.only:
        names = set(args.only.split(","))
        variants = [v for v in variants if v[0] in names]

    for name, tables, kw in variants:
        # the module defaults now enable the dynamic-trip knobs; the sweep
        # compares variants, so every run pins both knobs explicitly (legacy
        # variant names measure the STATIC scheduling they were written for)
        kw = {"p1_livelist": False, "p2_dynamic": False, **kw}
        try:
            t_c0 = time.perf_counter()
            loop = make_loop(tables, **kw)
            carry = loop(poses)
            _ = np.asarray(carry)  # compile + settle
            compile_s = time.perf_counter() - t_c0
            t0 = time.perf_counter()
            _ = np.asarray(loop(poses))
            ms = (time.perf_counter() - t0) / args.iters * 1e3
            rec = {"variant": name, "ms": round(ms, 2),
                   "compile_s": round(compile_s, 1),
                   "faces": int(tables.num_faces), **kw}
        except Exception as e:  # record the failure, keep sweeping
            rec = {"variant": name, "error": f"{type(e).__name__}: {e}",
                   "faces": int(tables.num_faces), **kw}
        print(json.dumps(rec), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()

"""Train the refiner/scorer on synthetic render pairs and evaluate them.

The reference consumes NVIDIA's pre-trained checkpoints (out-of-band
download, reference README.md:72). This tool is the in-repo alternative:
it trains the same published topology with this framework's own renderer
(foundationpose_cpp_tpu.training) and reports end-to-end Register/Track
accuracy on held-out synthetic scenes, so the pipeline is functionally
accurate without any external file.

Usage (TPU, ~10-20 min with defaults):
  python tools/train_synthetic.py --out weights/
  python tools/train_synthetic.py --net small --refiner-steps 800 \
      --scorer-steps 600 --eval-scenes 4      # quick run

Then:
  python examples/demo_synthetic.py --weights weights/
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


def build_mesh(name: str):
    from foundationpose_cpp_tpu.meshio import mesh_loader, procedural

    if name == "cube":
        return procedural.textured_cube(size=0.1)
    if name == "cube6":
        # face-colored, pose-unique: the default training target (the
        # checkerboard cube is symmetric under 90-degree rotations, which
        # caps what any scorer/refiner can learn)
        return procedural.face_colored_cube(name="cube")
    if name == "house":
        # box + roof prism: NO rotational symmetry, so rotation metrics
        # are meaningful without any symmetry caveat
        return procedural.textured_house(name="house")
    if name == "sphere":
        return procedural.textured_uv_sphere(radius=0.05, n_lat=24, n_lon=32)
    return mesh_loader.load_mesh(name)


def evaluate(
    asset, params_r, params_s, cfg, net_cfg, tcfg, n_scenes, seed, use_fused,
    refine_itr: int = 1, fused_face_pad: int | None = None,
):
    """Register + short Track on held-out scenes; returns metric dict.

    fused_face_pad: pad the fused tables to a multiple of this so several
    eval meshes share one compiled kernel signature (tools/train_multi.py
    evaluates ~8 different meshes; without padding each face count would
    trigger its own Mosaic compile).
    """
    import jax.numpy as jnp

    from foundationpose_cpp_tpu.geometry import icosphere
    from foundationpose_cpp_tpu.pipeline.foundationpose import (
        register_step,
        track_step,
    )
    from foundationpose_cpp_tpu.pipeline.renderer import MeshConstants
    from foundationpose_cpp_tpu.training import synthetic as tr
    from foundationpose_cpp_tpu.utils import metrics

    mesh = MeshConstants.from_asset(asset, fused_face_pad=fused_face_pad)
    K = tr.default_intrinsics(tcfg)
    Kj = jnp.asarray(K)
    rot_grid = jnp.asarray(icosphere.make_rotation_grid())
    import jax

    root = jax.random.PRNGKey(seed + 777)
    rows = []
    failures = 0
    for i in range(n_scenes):
        key = jax.random.fold_in(root, i)
        gt = np.asarray(tr.sample_scene_poses(key, 1, tcfg))[0]
        rgb_j, depth_j = tr.render_observed(
            mesh, jnp.asarray(gt[None]), Kj, tcfg.frame_hw, tcfg.frame_hw,
            cfg, use_fused=use_fused,
        )
        rgb = np.asarray(rgb_j)[0]
        depth = np.asarray(depth_j)[0]
        mask = (depth > 0).astype(np.uint8) * 255
        best, poses, scores, ok = register_step(
            mesh, params_r, params_s, jnp.asarray(rgb), jnp.asarray(depth),
            jnp.asarray(mask), rot_grid, Kj, refine_itr, cfg, net_cfg,
            use_fused=use_fused,
        )
        best = np.asarray(best)
        if not bool(np.asarray(ok)) or not np.isfinite(best).all():
            # register_step poisons the pose with NaN on failure (empty
            # mask / translation guess); without this skip one failed scene
            # would NaN every mean metric below
            failures += 1
            continue
        # track from the registered pose on the same frame (refine_itr=3
        # emulates 3 tracked frames of a static scene)
        tracked = np.asarray(
            track_step(
                mesh, params_r, jnp.asarray(rgb), jnp.asarray(depth),
                jnp.asarray(best[None]), Kj, 3, cfg, net_cfg,
                use_fused=use_fused,
            )
        )[0]
        pts = np.asarray(asset.vertices)
        row = {
            "register_rot_deg": metrics.rotation_error_deg(best, gt),
            "register_t_err": metrics.translation_error(best, gt),
            "register_adds": metrics.adds_error(best, gt, pts),
            "tracked_rot_deg": metrics.rotation_error_deg(tracked, gt),
            "tracked_t_err": metrics.translation_error(tracked, gt),
            "tracked_adds": metrics.adds_error(tracked, gt, pts),
        }
        if getattr(asset, "symmetries", None) is not None:
            # symmetry-aware geodesic (reference ClusterPoses convention):
            # a declared-symmetry flip is not an error for this object
            row["register_rot_deg_sym"] = metrics.rotation_error_deg_sym(
                best, gt, asset.symmetries
            )
            row["tracked_rot_deg_sym"] = metrics.rotation_error_deg_sym(
                tracked, gt, asset.symmetries
            )
        rows.append(row)
    if not rows:
        # n_scenes == 0 or every scene failed: report that instead of
        # IndexError-ing on rows[0] after a long training run
        return {
            "n_scenes": n_scenes,
            "register_failures": failures,
            "diameter": float(asset.diameter),
        }
    out = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
    for k in ("register_rot_deg", "tracked_rot_deg"):
        out[k + "_median"] = float(np.median([r[k] for r in rows]))
    # geometric-symmetry flips the scorer failed to reject (cube: 90 deg).
    # For assets with DECLARED symmetries a symmetry-equivalent pose is
    # not a flip -- count on the symmetry-aware geodesic there.
    out["register_flips"] = int(
        sum(
            r.get("register_rot_deg_sym", r["register_rot_deg"]) > 45.0
            for r in rows
        )
    )
    out["n_scenes"] = n_scenes
    out["register_failures"] = failures
    out["diameter"] = float(asset.diameter)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default="cube", help="cube | sphere | path.obj")
    ap.add_argument("--net", default="full", choices=["full", "small"])
    ap.add_argument("--refiner-steps", type=int, default=4000)
    ap.add_argument("--scorer-steps", type=int, default=2500)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--scorer-lr", type=float, default=1e-4,
                    help="scorer learning rate; the listwise CE diverged "
                         "once at 2e-4 (loss rose after step ~6k), 1e-4 "
                         "reaches the same eval reliably")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="weights")
    ap.add_argument("--eval-scenes", type=int, default=8)
    ap.add_argument("--eval-refine-itr", type=int, default=1,
                    help="Register refine iterations in the eval "
                         "(reference refine_itr knob, default 1)")
    ap.add_argument("--skip-refiner", action="store_true")
    ap.add_argument("--skip-scorer", action="store_true")
    ap.add_argument("--cross-attention", action="store_true",
                    help="train the scorer as ScoreNetMultiPair (one "
                         "encoder layer attending across each scene's "
                         "hypotheses); inference auto-detects it from "
                         "the checkpoint")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from foundationpose_cpp_tpu.utils.cache import enable_compilation_cache

    # first-ever Mosaic compile of the fused render at a new (mesh, batch)
    # signature can take minutes; the persistent cache makes it one-time
    enable_compilation_cache()

    from foundationpose_cpp_tpu import FoundationPoseConfig, networks
    from foundationpose_cpp_tpu.models import checkpoint
    from foundationpose_cpp_tpu.pipeline.renderer import MeshConstants
    from foundationpose_cpp_tpu.training import synthetic as tr

    use_fused = jax.default_backend() == "tpu"
    cfg = FoundationPoseConfig()
    if args.net == "full":
        net_cfg = networks.NetConfig()
    else:
        net_cfg = networks.NetConfig(
            width1=32, width2=64, embed_dim=256, ffn_dim=256
        )
    tcfg = tr.SyntheticTrainConfig(batch=args.batch, lr=args.lr)
    asset = build_mesh(args.mesh)
    mesh = MeshConstants.from_asset(asset)
    os.makedirs(args.out, exist_ok=True)
    tag = f"{os.path.splitext(os.path.basename(args.mesh))[0]}_{args.net}"

    def log(msg):
        print(msg, flush=True)

    def to_bf16(tree):
        # heads/bias/norm params stay f32 (matching init); conv/linear
        # weights go bf16 like init_* emits
        def cast(a):
            return a.astype(jnp.bfloat16) if a.ndim >= 2 else a

        return jax.tree.map(cast, tree)

    t0 = time.perf_counter()
    if not args.skip_refiner:
        log(f"training refiner ({args.refiner_steps} steps, "
            f"batch {tcfg.batch}, mesh {args.mesh}, net {args.net})...")
        params_r = tr.train_refiner(
            mesh, cfg, net_cfg, tcfg, steps=args.refiner_steps,
            seed=args.seed, use_fused=use_fused, log=log,
        )
        params_r = to_bf16(params_r)
        path_r = os.path.join(args.out, f"refiner_{tag}.npz")
        checkpoint.save_params(params_r, path_r)
        log(f"saved {path_r}")
    else:
        # reuse previously trained weights for the eval when present
        path_r = os.path.join(args.out, f"refiner_{tag}.npz")
        if os.path.exists(path_r):
            log(f"loading existing {path_r} for eval")
            params_r = checkpoint.load_params(path_r)
        else:
            params_r = networks.init_refiner(args.seed, net_cfg)

    if not args.skip_scorer:
        log(f"training scorer ({args.scorer_steps} steps, "
            f"lr {args.scorer_lr})...")
        tcfg_s = tr.SyntheticTrainConfig(batch=args.batch, lr=args.scorer_lr)
        import dataclasses as _dc

        net_cfg_s = _dc.replace(net_cfg, cross_attention=args.cross_attention)
        params_s = tr.train_scorer(
            mesh, cfg, net_cfg_s, tcfg_s, steps=args.scorer_steps,
            seed=args.seed + 1, use_fused=use_fused, log=log,
        )
        params_s = to_bf16(params_s)
        path_s = os.path.join(args.out, f"scorer_{tag}.npz")
        checkpoint.save_params(params_s, path_s)
        log(f"saved {path_s}")
    else:
        path_s = os.path.join(args.out, f"scorer_{tag}.npz")
        if os.path.exists(path_s):
            log(f"loading existing {path_s} for eval")
            params_s = checkpoint.load_params(path_s)
        else:
            params_s = networks.init_scorer(args.seed + 1, net_cfg)

    if args.eval_scenes <= 0:
        log(f"training done in {time.perf_counter() - t0:.0f}s (eval skipped)")
        return
    log(f"training done in {time.perf_counter() - t0:.0f}s; evaluating on "
        f"{args.eval_scenes} held-out scenes...")
    report = evaluate(
        asset, params_r, params_s, cfg, net_cfg, tcfg, args.eval_scenes,
        args.seed, use_fused, refine_itr=args.eval_refine_itr,
    )
    report["net"] = args.net
    report["mesh"] = args.mesh
    report["refine_itr"] = args.eval_refine_itr
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()

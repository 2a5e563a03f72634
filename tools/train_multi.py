"""Train ONE object-generalizable refiner/scorer across a randomized mesh
family and evaluate on objects the trainer never saw.

This is the in-repo analogue of the reference's object-agnostic engines
(reference README.md:72: one download of pre-trained checkpoints serves any
mesh; simple_tests/src/test_foundationpose.cpp:22-46). Where
tools/train_synthetic.py bakes one mesh into the weights, this tool trains a
single (refiner, scorer) pair over meshio.family's randomized generators
(training/multi.py mesh-bank trainer: one executable, random object per
optimizer step) and reports end-to-end Register accuracy on:

  - UNSEEN SEEDS of the training generators,
  - the HELD-OUT generator family ("wedge", never drawn in training),
  - the fixed house / cube6 assets (round-2's per-object baselines).

Usage (TPU, ~40-60 min with defaults):
  python tools/train_multi.py --out weights/
  python tools/train_multi.py --objects 8 --refiner-steps 400 \
      --scorer-steps 300 --eval-scenes 2        # quick smoke
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


def eval_assets(n_unseen_seeds: int, n_wedge: int):
    """(label, asset) eval set; all objects unseen by the trainer."""
    from foundationpose_cpp_tpu.meshio import family, procedural

    out = []
    for i in range(n_unseen_seeds):
        # seeds far outside the training range; generator drawn as in training
        out.append(("unseen_seed", family.random_family_asset(20_000 + 17 * i)))
    for i in range(n_wedge):
        out.append(
            ("heldout_wedge",
             family.random_family_asset(30_000 + 13 * i, generator="wedge",
                                        diameter=family.FAMILY_DIAMETER))
        )
    out.append(("fixed_house", procedural.textured_house(name="house")))
    out.append(("fixed_cube6", procedural.face_colored_cube(name="cube6")))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--objects", type=int, default=32,
                    help="training objects (family seeds 0..N-1)")
    ap.add_argument("--net", default="full", choices=["full", "small"])
    ap.add_argument("--refiner-steps", type=int, default=8000)
    ap.add_argument("--scorer-steps", type=int, default=5000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--scorer-lr", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="weights")
    ap.add_argument("--tag", default="multi")
    ap.add_argument("--eval-scenes", type=int, default=12)
    ap.add_argument("--eval-unseen", type=int, default=4)
    ap.add_argument("--eval-wedge", type=int, default=2)
    ap.add_argument("--eval-refine-itr", type=int, default=1)
    ap.add_argument("--skip-refiner", action="store_true")
    ap.add_argument("--skip-scorer", action="store_true")
    ap.add_argument("--skip-eval", action="store_true")
    ap.add_argument("--no-cross-attention", action="store_true",
                    help="train a plain ScoreNet instead of MultiPair")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from foundationpose_cpp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import dataclasses as _dc

    from foundationpose_cpp_tpu import FoundationPoseConfig, networks
    from foundationpose_cpp_tpu.meshio import family
    from foundationpose_cpp_tpu.models import checkpoint
    from foundationpose_cpp_tpu.training import multi, synthetic as tr

    use_fused = jax.default_backend() == "tpu"
    cfg = FoundationPoseConfig()
    if args.net == "full":
        net_cfg = networks.NetConfig()
    else:
        net_cfg = networks.NetConfig(
            width1=32, width2=64, embed_dim=256, ffn_dim=256
        )
    tcfg = tr.SyntheticTrainConfig(batch=args.batch, lr=args.lr)

    def log(msg):
        print(msg, flush=True)

    log(f"building mesh bank: {args.objects} objects ...")
    assets = [family.random_family_asset(s) for s in range(args.objects)]
    bank = multi.build_mesh_bank(assets)
    gens = sorted({n.split("_")[0] for n in bank.names})
    log(f"bank: {bank.n_objects} objects, {bank.num_faces} padded faces, "
        f"generators {gens}")

    os.makedirs(args.out, exist_ok=True)
    tag = f"{args.tag}_{args.net}"

    def to_bf16(tree):
        def cast(a):
            return a.astype(jnp.bfloat16) if a.ndim >= 2 else a

        return jax.tree.map(cast, tree)

    t0 = time.perf_counter()
    path_r = os.path.join(args.out, f"refiner_{tag}.npz")
    if not args.skip_refiner:
        log(f"training refiner_{tag} ({args.refiner_steps} steps, "
            f"batch {tcfg.batch})...")
        params_r = multi.train_refiner_multi(
            bank, cfg, net_cfg, tcfg, steps=args.refiner_steps,
            seed=args.seed, use_fused=use_fused, log=log,
        )
        params_r = to_bf16(params_r)
        checkpoint.save_params(params_r, path_r)
        log(f"saved {path_r}")
    elif os.path.exists(path_r):
        log(f"loading existing {path_r}")
        params_r = checkpoint.load_params(path_r)
    else:
        params_r = networks.init_refiner(args.seed, net_cfg)

    path_s = os.path.join(args.out, f"scorer_{tag}.npz")
    if not args.skip_scorer:
        tcfg_s = tr.SyntheticTrainConfig(batch=args.batch, lr=args.scorer_lr)
        net_cfg_s = _dc.replace(
            net_cfg, cross_attention=not args.no_cross_attention
        )
        log(f"training scorer_{tag} ({args.scorer_steps} steps, "
            f"lr {args.scorer_lr}, cross_attention="
            f"{net_cfg_s.cross_attention})...")
        params_s = multi.train_scorer_multi(
            bank, cfg, net_cfg_s, tcfg_s, steps=args.scorer_steps,
            seed=args.seed + 1, use_fused=use_fused, log=log,
        )
        params_s = to_bf16(params_s)
        checkpoint.save_params(params_s, path_s)
        log(f"saved {path_s}")
    elif os.path.exists(path_s):
        log(f"loading existing {path_s}")
        params_s = checkpoint.load_params(path_s)
    else:
        params_s = networks.init_scorer(args.seed + 1, net_cfg)

    log(f"training done in {time.perf_counter() - t0:.0f}s")
    if args.skip_eval:
        return

    # --- eval on objects the trainer never saw -------------------------
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from train_synthetic import evaluate

    report = {}
    for label, asset in eval_assets(args.eval_unseen, args.eval_wedge):
        name = f"{label}:{asset.name}"
        log(f"evaluating {name} ({args.eval_scenes} scenes)...")
        r = evaluate(
            asset, params_r, params_s, cfg, net_cfg, tcfg,
            args.eval_scenes, args.seed, use_fused,
            refine_itr=args.eval_refine_itr,
            fused_face_pad=bank.num_faces,
        )
        log(f"  {name}: rot {r['register_rot_deg']:.2f} deg "
            f"(median {r['register_rot_deg_median']:.2f}), "
            f"ADD-S {r['register_adds'] * 1000:.2f} mm, "
            f"flips {r['register_flips']}/{r['n_scenes']}")
        report[name] = r
    report["_meta"] = {
        "objects": args.objects, "refiner_steps": args.refiner_steps,
        "scorer_steps": args.scorer_steps, "net": args.net,
        "refine_itr": args.eval_refine_itr, "tag": tag,
    }
    out_json = os.path.join(args.out, f"eval_{tag}.json")
    with open(out_json, "w") as fh:
        json.dump(report, fh, indent=2)
    log(f"wrote {out_json}")
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()

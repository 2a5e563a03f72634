"""Convert published FoundationPose refiner/scorer weights to a JAX pytree.

The reference consumes ONNX models exported from NVIDIA's FoundationPose
training repo and distributed out-of-band (reference README.md:72, Google
Drive), converted to TensorRT engines by tools/cvt_onnx2trt.bash. This tool
is the TPU-side equivalent: it ingests those weight files (torch .pth or a
name-preserving ONNX export), maps every tensor BY NAME onto the
models/networks.py pytree (BatchNorm folded into convs, OIHW->HWIO,
in_proj->packed qkv -- see models/convert.py), and writes an npz checkpoint
loadable with foundationpose_cpp_tpu.models.checkpoint.

The mapping is strict: any unknown/missing/mis-shaped tensor aborts with the
offending names -- it never writes a partially- or shape-guessed checkpoint.

Usage:
  python tools/convert_onnx.py --torch model_best.pth --net refiner --out r.npz
  python tools/convert_onnx.py --onnx refiner_hwc.onnx --net refiner --out r.npz
  python tools/convert_onnx.py --init refiner --out refiner.npz   # random init
  python tools/convert_onnx.py --torch f.pth --net scorer --list  # inspect
"""

from __future__ import annotations

import argparse
import os
import sys

# allow running as `python tools/convert_onnx.py` from a source checkout
# without installing the package
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# weight conversion is host-side work: force the CPU backend BEFORE any jax
# import so the tool never dials a device tunnel (the axon TPU plugin ignores
# the JAX_PLATFORMS env var and can hang client creation when the remote pool
# is unavailable -- config.update is the only reliable override)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--onnx", help="path to refiner_hwc.onnx / scorer_hwc.onnx")
    src.add_argument("--torch", dest="torch_path", help="training-repo .pth")
    src.add_argument(
        "--init", choices=["refiner", "scorer"],
        help="write a seeded random checkpoint with the published structure",
    )
    ap.add_argument("--net", choices=["refiner", "scorer"], default="refiner")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out")
    ap.add_argument("--list", action="store_true", help="only list tensors")
    ap.add_argument(
        "--allow-pickle", action="store_true",
        help="permit torch.load(weights_only=False) for legacy checkpoints "
             "(pickle executes arbitrary code; only for trusted files)",
    )
    ap.add_argument("--crop-hw", type=int, default=160)
    args = ap.parse_args()

    from foundationpose_cpp_tpu.models import checkpoint, convert, networks

    if args.init:
        if not args.out:
            ap.error("--out is required with --init")
        cfg = networks.NetConfig()
        params = (
            networks.init_refiner(args.seed, cfg) if args.init == "refiner"
            else networks.init_scorer(args.seed, cfg)
        )
        checkpoint.save_params(params, args.out)
        print(
            f"[convert_onnx] wrote RANDOM-init {args.init} checkpoint "
            f"({networks.count_params(params):,} params) to {args.out}"
        )
        return

    path = args.onnx or args.torch_path
    try:
        if args.list:
            sd = (
                convert.load_onnx_initializers(path) if args.onnx
                else convert.load_torch_checkpoint(path, args.allow_pickle)
            )
            print(f"extracted {len(sd)} tensors:")
            for name, arr in sorted(sd.items()):
                print(f"  {name:60s} {arr.shape} {arr.dtype}")
            return
        if not args.out:
            ap.error("--out is required unless --list")
        params, cfg = convert.convert_file(
            path, args.net, out_path=args.out,
            allow_pickle=args.allow_pickle, crop_hw=args.crop_hw,
        )
        print(
            f"[convert_onnx] converted {path} -> {args.out} "
            f"({networks.count_params(params):,} params, cfg={cfg})"
        )
    except convert.ConversionError as e:
        raise SystemExit(f"[convert_onnx] {e}")


if __name__ == "__main__":
    main()

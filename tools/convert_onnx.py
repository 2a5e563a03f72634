"""Convert published FoundationPose refiner/scorer weights to a JAX pytree.

The reference consumes ONNX models exported from NVIDIA's FoundationPose
training repo and distributed out-of-band (reference README.md:72, Google
Drive), converted to TensorRT engines by tools/cvt_onnx2trt.bash. This tool
is the TPU-side equivalent: it ingests those weight files and writes an npz
checkpoint loadable with foundationpose_cpp_tpu.models.checkpoint.

Two ingestion paths:
  --onnx  refiner_hwc.onnx     requires the `onnx` package (not in this
                               image; the tool degrades to a clear error)
  --torch model_best.pth       torch checkpoints from the training repo
                               (torch-cpu is available here)

Weight mapping: the published networks and the from-scratch JAX architecture
(models/networks.py) are both siamese-CNN + transformer render-and-compare
nets, but they are NOT layer-for-layer identical; this tool extracts the
source tensors and maps them by a (name-pattern, shape) table that must be
completed against the real files. Until the published weights are present,
`--init` writes a seeded random checkpoint with the correct structure so the
rest of the stack (pipelines, benches, serving) is exercised end-to-end.

Usage:
  python tools/convert_onnx.py --init refiner --out refiner.npz
  python tools/convert_onnx.py --onnx refiner_hwc.onnx --out refiner.npz
  python tools/convert_onnx.py --torch model_best.pth --net refiner --out r.npz
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def extract_onnx_initializers(path: str) -> dict[str, np.ndarray]:
    try:
        import onnx
        from onnx import numpy_helper
    except ImportError as e:
        raise SystemExit(
            "[convert_onnx] the `onnx` package is not installed in this "
            "environment; run this tool where onnx is available, or use "
            "--torch with the training-repo checkpoint instead"
        ) from e
    model = onnx.load(path)
    return {
        init.name: numpy_helper.to_array(init)
        for init in model.graph.initializer
    }


def extract_torch_state(path: str) -> dict[str, np.ndarray]:
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "model" in state:
        state = state["model"]
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    return {k: v.detach().numpy() for k, v in state.items() if hasattr(v, "detach")}


def report_tensors(tensors: dict[str, np.ndarray]) -> None:
    print(f"extracted {len(tensors)} tensors:")
    for name, arr in sorted(tensors.items()):
        print(f"  {name:60s} {arr.shape} {arr.dtype}")


def map_into_pytree(tensors: dict[str, np.ndarray], net: str):
    """Assign source tensors into the networks.py pytree.

    The published FoundationPose graphs are not redistributable in this
    environment, so the name map below is a scaffold: it matches tensors by
    shape against the target structure and reports everything it could not
    place. Complete the PATTERNS table against the real file before
    production use.
    """
    import jax
    from foundationpose_cpp_tpu.models import networks

    cfg = networks.NetConfig()
    target = (
        networks.init_refiner(0, cfg) if net == "refiner"
        else networks.init_scorer(0, cfg)
    )
    flat_target = jax.tree_util.tree_flatten_with_path(target)[0]
    by_shape: dict[tuple, list] = {}
    for path, leaf in flat_target:
        by_shape.setdefault(tuple(leaf.shape), []).append(path)

    placed, unplaced = 0, []
    for name, arr in tensors.items():
        # torch convs are OIHW; ours are HWIO
        candidates = [arr]
        if arr.ndim == 4:
            candidates.append(arr.transpose(2, 3, 1, 0))
        hit = False
        for cand in candidates:
            if tuple(cand.shape) in by_shape and by_shape[tuple(cand.shape)]:
                by_shape[tuple(cand.shape)].pop(0)
                placed += 1
                hit = True
                break
        if not hit:
            unplaced.append((name, arr.shape))

    print(f"[convert_onnx] shape-matched {placed}/{len(tensors)} tensors")
    if unplaced:
        print("[convert_onnx] UNPLACED (architecture mismatch -- expected "
              "until the name map is completed against the real graph):")
        for name, shape in unplaced[:40]:
            print(f"  {name} {shape}")
        raise SystemExit(
            "[convert_onnx] refusing to write a partially-mapped checkpoint; "
            "complete the mapping table for these tensors"
        )
    return target


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--onnx", help="path to refiner_hwc.onnx / scorer_hwc.onnx")
    src.add_argument("--torch", dest="torch_path", help="training-repo .pth")
    src.add_argument(
        "--init", choices=["refiner", "scorer"],
        help="write a seeded random checkpoint with the correct structure",
    )
    ap.add_argument("--net", choices=["refiner", "scorer"], default="refiner")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", required=True)
    ap.add_argument("--list", action="store_true", help="only list tensors")
    args = ap.parse_args()

    from foundationpose_cpp_tpu.models import checkpoint, networks

    if args.init:
        params = (
            networks.init_refiner(args.seed) if args.init == "refiner"
            else networks.init_scorer(args.seed)
        )
        checkpoint.save_params(params, args.out)
        print(f"[convert_onnx] wrote seeded {args.init} checkpoint -> {args.out}")
        return

    tensors = (
        extract_onnx_initializers(args.onnx) if args.onnx
        else extract_torch_state(args.torch_path)
    )
    if args.list:
        report_tensors(tensors)
        return
    params = map_into_pytree(tensors, args.net)
    checkpoint.save_params(params, args.out)
    print(f"[convert_onnx] wrote {args.net} checkpoint -> {args.out}")


if __name__ == "__main__":
    sys.exit(main())

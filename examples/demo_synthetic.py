"""Demo: Register + Track on a synthetic textured-cube scene.

The JAX-native analogue of the reference's foundationpose_test.test
(simple_tests/src/test_foundationpose.cpp:48-104): register on a first frame,
draw the oriented 3-D bounding box, then track across frames feeding each
output pose into the next.

Usage: python examples/demo_synthetic.py [--frames N] [--out DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

# allow running from a source checkout without installing the package
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
import pathlib
import time

import numpy as np

from foundationpose_cpp_tpu import create_foundationpose_model, networks
from foundationpose_cpp_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()  # reuse compiled programs across demo runs
from foundationpose_cpp_tpu.config import FoundationPoseConfig
from foundationpose_cpp_tpu.meshio import procedural
from foundationpose_cpp_tpu.pipeline.renderer import MeshConstants
from foundationpose_cpp_tpu.utils import synthetic


def draw_3d_bbox(rgb, K, pose_bbox, dimension):
    """Project the 8 OBB corners and draw the 12 edges (help_func.hpp:54-106)."""
    from foundationpose_cpp_tpu.utils.viz import draw_3d_bbox as _draw

    return _draw(rgb, K, pose_bbox, dimension)


def _load_or_init(weights_dir: str | None, kind: str, mesh_name: str,
                  net: str, net_cfg, seed: int):
    """Load trained npz weights when available, else seeded random init."""
    from foundationpose_cpp_tpu.models import checkpoint

    if weights_dir:
        for cand in (
            f"{kind}_{mesh_name}_{net}.npz",
            f"{kind}_cube_{net}.npz",
            # object-generalizable family-trained weights (training/multi.py)
            f"{kind}_multi_{net}.npz",
            f"{kind}.npz",
        ):
            p = pathlib.Path(weights_dir) / cand
            if p.exists():
                print(f"  loading {kind} weights: {p}")
                return checkpoint.load_params(str(p))
        print(f"  (no {kind} weights under {weights_dir}; using random init)")
    init = networks.init_refiner if kind == "refiner" else networks.init_scorer
    return init(seed, net_cfg)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--out", type=str, default="/tmp/fp_demo")
    ap.add_argument("--hw", type=int, nargs=2, default=(480, 640))
    ap.add_argument("--mesh", default="cube6",
                    choices=["cube", "cube6", "house"],
                    help="cube6 = face-colored cube (committed trained "
                         "weights); house = fully asymmetric box+roof; "
                         "cube = checkerboard texture (exercises the "
                         "auto-subdivision texture-fidelity policy on TPU)")
    ap.add_argument("--weights",
                    default=os.path.join(_REPO_ROOT, "weights"),
                    help="directory of trained npz weights "
                         "(tools/train_synthetic.py --out); pass '' to "
                         "run with random-init nets")
    ap.add_argument("--net", default="full", choices=["full", "small"])
    args = ap.parse_args()
    out_dir = pathlib.Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    h, w = args.hw
    K = np.array([[600.0, 0, w / 2], [0, 600.0, h / 2], [0, 0, 1]], np.float32)
    cfg = FoundationPoseConfig()
    if args.net == "full":
        net_cfg = networks.NetConfig()
    else:
        net_cfg = networks.NetConfig(
            width1=32, width2=64, embed_dim=256, ffn_dim=256
        )
    if args.mesh == "cube6":
        cube = procedural.face_colored_cube(name="cube")
    elif args.mesh == "house":
        cube = procedural.textured_house(name="cube")
    else:
        cube = procedural.textured_cube(size=0.1)
    mesh = MeshConstants.from_asset(cube)

    model = create_foundationpose_model(
        _load_or_init(args.weights, "refiner", args.mesh, args.net, net_cfg, 0),
        _load_or_init(args.weights, "scorer", args.mesh, args.net, net_cfg, 1),
        [cube], K, h, w, config=cfg, net_config=net_cfg,
    )

    # ground-truth trajectory: slow rotation + drift
    from scipy.spatial.transform import Rotation

    def gt_pose(i):
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = Rotation.from_euler(
            "xyz", [25 + 3 * i, -15 + 2 * i, 40 + 5 * i], degrees=True
        ).as_matrix()
        pose[:3, 3] = [0.02 + 0.002 * i, -0.01, 0.5 + 0.005 * i]
        return pose

    print("rendering synthetic frames...")
    frames = [synthetic.render_scene(mesh, gt_pose(i), K, h, w, cfg)
              for i in range(args.frames)]

    rgb, depth, mask = frames[0]
    print("Register on frame 0...")
    t0 = time.perf_counter()
    pose = model.register(rgb, depth, mask, "cube")
    print(f"  first call (incl. compile): {time.perf_counter() - t0:.1f}s")
    print("  pose:\n", np.round(pose, 4))

    bbox_pose = model.convert_pose_mesh2bbox(pose, "cube")
    img = draw_3d_bbox(rgb, K, bbox_pose, model.object_dimension("cube"))
    import cv2

    cv2.imwrite(str(out_dir / "register_bbox.png"), img[..., ::-1])
    print(f"  wrote {out_dir / 'register_bbox.png'}")

    from foundationpose_cpp_tpu.utils import metrics

    gt0 = gt_pose(0)
    print(f"  register err: rot {metrics.rotation_error_deg(pose, gt0):.1f} deg, "
          f"t {metrics.translation_error(pose, gt0):.4f} m, "
          f"ADD-S {metrics.adds_error(pose, gt0, cube.vertices):.4f} m")

    print("Track over frames...")
    for i, (rgb, depth, _) in enumerate(frames[1:], start=1):
        t0 = time.perf_counter()
        pose = model.track(rgb, depth, pose, "cube")
        dt = time.perf_counter() - t0
        gt_i = gt_pose(i)
        err = np.linalg.norm(pose[:3, 3] - gt_i[:3, 3])
        rerr = metrics.rotation_error_deg(pose, gt_i)
        print(f"  frame {i}: {dt * 1e3:7.1f} ms  |t err| = {err:.4f} m  "
              f"rot err = {rerr:5.1f} deg")
        img = draw_3d_bbox(rgb, K, model.convert_pose_mesh2bbox(pose, "cube"),
                           model.object_dimension("cube"))
        cv2.imwrite(str(out_dir / f"track_{i:03d}.png"), img[..., ::-1])
    print("done.")


if __name__ == "__main__":
    main()

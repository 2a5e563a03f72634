"""Demo: track multiple object instances in one compiled program.

The reference tracks one hypothesis per Track call; here N instances of a
mesh ride the same leading batch axis the 252-hypothesis Register uses
(`FoundationPose.track_batch`), so N objects cost one device program per
frame. The multi-chip variant (`parallel.sharding.make_sharded_track_batch`)
shards the instance axis over a device mesh.

Usage: python examples/demo_multi_object.py [--instances N] [--frames M]
"""

from __future__ import annotations

import argparse
import os
import sys

# allow running from a source checkout without installing the package
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
import time

import numpy as np

from foundationpose_cpp_tpu import create_foundationpose_model, networks
from foundationpose_cpp_tpu.config import FoundationPoseConfig
from foundationpose_cpp_tpu.meshio import procedural
from foundationpose_cpp_tpu.pipeline.renderer import MeshConstants
from foundationpose_cpp_tpu.utils import synthetic


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--instances", type=int, default=8)
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--hw", type=int, nargs=2, default=(480, 640))
    args = ap.parse_args()

    h, w = args.hw
    K = np.array([[600.0, 0, w / 2], [0, 600.0, h / 2], [0, 0, 1]], np.float32)
    cfg = FoundationPoseConfig()
    cube = procedural.textured_cube(size=0.08)
    mesh = MeshConstants.from_asset(cube)

    model = create_foundationpose_model(
        networks.init_refiner(0), networks.init_scorer(1), [cube], K, h, w,
        config=cfg,
    )

    rng = np.random.default_rng(0)
    poses = np.tile(synthetic.default_pose(0.6)[None], (args.instances, 1, 1))
    poses[:, :3, 3] += rng.uniform(-0.05, 0.05, (args.instances, 3)).astype(
        np.float32
    )

    # one shared synthetic frame (each instance would have its own crop)
    rgb, depth, _ = synthetic.render_scene(mesh, poses[0], K, h, w, cfg)

    print(f"tracking {args.instances} instances over {args.frames} frames...")
    t0 = time.perf_counter()
    poses_t = poses
    for i in range(args.frames):
        t1 = time.perf_counter()
        poses_t = model.track_batch(rgb, depth, poses_t, "cube")
        dt = time.perf_counter() - t1
        label = " (incl. compile)" if i == 0 else ""
        print(
            f"  frame {i}: {dt * 1e3:8.1f} ms for {args.instances} instances"
            f" = {dt / args.instances * 1e3:6.2f} ms/object{label}"
        )
    total = time.perf_counter() - t0
    print(
        f"done: {args.frames * args.instances / total:.1f} object-updates/s "
        f"(incl. compile + per-call host round trips)"
    )


if __name__ == "__main__":
    main()

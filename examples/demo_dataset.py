"""Demo: Register + Track an RGB-D sequence in the reference mustard0 layout.

The JAX-native analogue of the reference's flagship test
(simple_tests/src/test_foundationpose.cpp:48-104): load cam_K.txt + the
textured mesh, Register on the first frame using its mask, draw the oriented
3-D bounding box, Track every following frame feeding each output pose into
the next, write per-frame overlays + poses, and (when ground-truth poses are
present) report ADD / ADD-S.

Expected layout (reference test_data/download.md:5-16):

    <root>/cam_K.txt      3x3 intrinsics, whitespace separated
    <root>/rgb/*.png      8-bit color
    <root>/depth/*.png    16-bit depth in millimeters
    <root>/masks/*.png    binary mask (only the first frame's is required)
    <root>/mesh/*.obj     textured mesh
    <root>/annotated_poses/*.txt   optional 4x4 GT poses (ADD/ADD-S report)

Usage:
    python examples/demo_dataset.py /path/to/mustard0 [--out DIR]
        [--max-frames N] [--refiner r.npz --scorer s.npz] [--video out.mp4]
"""

from __future__ import annotations

import argparse
import os
import sys

# allow running from a source checkout without installing the package
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
import json
import pathlib
import time

import numpy as np


def _load_pose_dir(root: pathlib.Path, frame_ids: list[str]) -> dict[str, np.ndarray]:
    """Optional per-frame GT poses: <root>/annotated_poses/<frame_id>.txt."""
    gt = {}
    for sub in ("annotated_poses", "ob_in_cam", "gt_poses"):
        d = root / sub
        if d.is_dir():
            for fid in frame_ids:
                p = d / f"{fid}.txt"
                if p.exists():
                    gt[fid] = np.loadtxt(p, dtype=np.float64).reshape(4, 4)
            break
    return gt


def _draw_bbox(rgb, K, pose_bbox, dimension):
    from foundationpose_cpp_tpu.utils.viz import draw_3d_bbox

    return draw_3d_bbox(rgb, K, pose_bbox, dimension)


def run_dataset(
    root: str,
    out_dir: str = "/tmp/fp_dataset",
    max_frames: int | None = None,
    refiner_npz: str | None = None,
    scorer_npz: str | None = None,
    video_path: str | None = None,
    refine_itr: int = 1,
    write_overlays: bool = True,
    config=None,
    net_config=None,
) -> dict:
    """Drive a mustard0-layout directory end-to-end; returns a summary dict."""
    from foundationpose_cpp_tpu import create_foundationpose_model, networks
    from foundationpose_cpp_tpu.meshio import mesh_loader
    from foundationpose_cpp_tpu.models import checkpoint
    from foundationpose_cpp_tpu.utils import io, metrics

    root_p = pathlib.Path(root)
    out_p = pathlib.Path(out_dir)
    out_p.mkdir(parents=True, exist_ok=True)

    K = io.read_cam_k(str(root_p / "cam_K.txt"))
    meshes = sorted((root_p / "mesh").glob("*.obj")) + sorted(
        (root_p / "mesh").glob("*.ply")
    )
    if not meshes:
        raise FileNotFoundError(f"no mesh under {root_p / 'mesh'}")
    asset = mesh_loader.load_mesh("target", str(meshes[0]))

    frame_ids = io.list_frame_ids(str(root_p))
    if not frame_ids:
        raise FileNotFoundError(f"no frames under {root_p / 'rgb'}")
    if max_frames is not None:
        frame_ids = frame_ids[:max_frames]
    rgb0, depth0, mask0 = io.read_frame(str(root_p), frame_ids[0], with_mask=True)
    h, w = rgb0.shape[:2]

    net_config = net_config or networks.NetConfig()
    params_r = (
        checkpoint.load_params(refiner_npz) if refiner_npz
        else networks.init_refiner(0, net_config)
    )
    params_s = (
        checkpoint.load_params(scorer_npz) if scorer_npz
        else networks.init_scorer(1, net_config)
    )
    if not refiner_npz:
        print(
            "[demo_dataset] WARNING: no --refiner checkpoint; running with "
            "RANDOM weights -- poses will not be accurate (convert the "
            "published weights with tools/convert_onnx.py)."
        )
    kwargs = {"net_config": net_config}
    if config is not None:
        kwargs["config"] = config
    model = create_foundationpose_model(
        params_r, params_s, [asset], K, h, w, **kwargs
    )

    gt_poses = _load_pose_dir(root_p, frame_ids)
    dim = model.object_dimension("target")
    poses: dict[str, np.ndarray] = {}
    overlays = []

    print(f"[demo_dataset] Register on frame {frame_ids[0]} ({h}x{w})...")
    t0 = time.perf_counter()
    pose = model.register(rgb0, depth0, mask0, "target", refine_itr=refine_itr)
    print(f"  register: {time.perf_counter() - t0:.1f}s (incl. compile)")
    poses[frame_ids[0]] = pose

    def _emit(fid, rgb, pose):
        np.savetxt(out_p / f"pose_{fid}.txt", pose, fmt="%.8f")
        if write_overlays:
            img = _draw_bbox(
                rgb, K, model.convert_pose_mesh2bbox(pose, "target"), dim
            )
            overlays.append(img)
            try:
                import cv2

                cv2.imwrite(str(out_p / f"bbox_{fid}.png"), img[..., ::-1])
            except ImportError:
                from PIL import Image

                Image.fromarray(img).save(out_p / f"bbox_{fid}.png")

    _emit(frame_ids[0], rgb0, pose)

    print(f"[demo_dataset] Track over {len(frame_ids) - 1} frames...")
    dts = []
    for fid in frame_ids[1:]:
        rgb, depth = io.read_frame(str(root_p), fid)
        t0 = time.perf_counter()
        pose = model.track(rgb, depth, pose, "target", refine_itr=refine_itr)
        dts.append(time.perf_counter() - t0)
        poses[fid] = pose
        _emit(fid, rgb, pose)

    if video_path and overlays:
        try:
            import cv2

            vw = cv2.VideoWriter(
                video_path, cv2.VideoWriter_fourcc(*"mp4v"), 15, (w, h)
            )
            for img in overlays:
                vw.write(img[..., ::-1])
            vw.release()
            print(f"[demo_dataset] wrote {video_path}")
        except ImportError:
            print("[demo_dataset] cv2 unavailable; skipping video")

    summary: dict = {
        "frames": len(frame_ids),
        "register_frame": frame_ids[0],
        "track_ms_mean": float(np.mean(dts) * 1e3) if dts else None,
        "out_dir": str(out_p),
    }
    if gt_poses:
        pts = asset.vertices
        add = [
            metrics.add_error(poses[f], gt_poses[f], pts)
            for f in frame_ids if f in gt_poses
        ]
        adds = [
            metrics.adds_error(poses[f], gt_poses[f], pts)
            for f in frame_ids if f in gt_poses
        ]
        summary.update(
            gt_frames=len(add),
            add_mean=float(np.mean(add)),
            adds_mean=float(np.mean(adds)),
            add_auc=metrics.add_auc(np.asarray(add)),
            adds_auc=metrics.add_auc(np.asarray(adds)),
        )
        print(
            f"[demo_dataset] ADD {summary['add_mean']:.4f} m | "
            f"ADD-S {summary['adds_mean']:.4f} m | "
            f"AUC(ADD-S) {summary['adds_auc']:.3f} over {len(add)} GT frames"
        )
    (out_p / "summary.json").write_text(json.dumps(summary, indent=2))
    print(f"[demo_dataset] summary -> {out_p / 'summary.json'}")
    return summary


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("root", help="dataset root (mustard0 layout)")
    ap.add_argument("--out", default="/tmp/fp_dataset")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--refiner", help="converted refiner .npz")
    ap.add_argument("--scorer", help="converted scorer .npz")
    ap.add_argument("--video", help="write an overlay MP4 to this path")
    ap.add_argument("--refine-itr", type=int, default=1)
    args = ap.parse_args()
    run_dataset(
        args.root, args.out, args.max_frames, args.refiner, args.scorer,
        args.video, args.refine_itr,
    )


if __name__ == "__main__":
    main()

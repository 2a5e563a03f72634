"""End-to-end dataset demo on a synthetic mustard0-layout mini dataset.

Mirrors the reference's flagship test flow (simple_tests/src/
test_foundationpose.cpp:48-104): Register frame 0, Track the sequence,
write bbox overlays + per-frame poses, report ADD/ADD-S vs the GT poses.
"""

import json

import numpy as np

from examples.demo_dataset import run_dataset
from foundationpose_cpp_tpu.config import FoundationPoseConfig
from foundationpose_cpp_tpu.models import networks
from foundationpose_cpp_tpu.utils import synthetic

CFG = FoundationPoseConfig(crop_window_h=32, crop_window_w=32)
NET_CFG = networks.NetConfig(
    width1=8, width2=16, embed_dim=64, num_heads=4, crop_hw=32,
)


def test_demo_dataset_end_to_end(tmp_path):
    root = tmp_path / "data"
    out = tmp_path / "out"
    synthetic.write_mini_dataset(str(root), n_frames=3, cfg=CFG)

    summary = run_dataset(
        str(root), str(out), config=CFG, net_config=NET_CFG,
    )

    assert summary["frames"] == 3
    assert summary["track_ms_mean"] is not None
    # per-frame outputs: pose text + bbox overlay for every frame
    for i in range(3):
        fid = f"{i:06d}"
        pose = np.loadtxt(out / f"pose_{fid}.txt")
        assert pose.shape == (4, 4) and np.isfinite(pose).all()
        r = pose[:3, :3]
        assert np.allclose(r @ r.T, np.eye(3), atol=1e-3)
        assert (out / f"bbox_{fid}.png").exists()
    # GT poses were present -> ADD/ADD-S reported
    assert summary["gt_frames"] == 3
    assert summary["add_mean"] >= 0 and summary["adds_mean"] >= 0
    assert summary["adds_mean"] <= summary["add_mean"] + 1e-9
    on_disk = json.loads((out / "summary.json").read_text())
    assert on_disk["frames"] == 3


def test_demo_dataset_missing_mesh_raises(tmp_path):
    root = tmp_path / "empty"
    (root / "rgb").mkdir(parents=True)
    (root / "mesh").mkdir(parents=True)
    np.savetxt(root / "cam_K.txt", np.eye(3), fmt="%.4f")
    try:
        run_dataset(str(root), str(tmp_path / "o"))
        assert False, "expected FileNotFoundError"
    except FileNotFoundError:
        pass

"""Aux subsystems: metrics, checkpointing, profiling, async tracker, tools."""

import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from foundationpose_cpp_tpu.models import checkpoint, networks
from foundationpose_cpp_tpu.utils import metrics, profiling

CFG = networks.NetConfig(
    width1=8, width2=16, embed_dim=32, num_heads=2, crop_hw=16,
)


def test_add_and_adds_metrics():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(100, 3)) * 0.05
    gt = np.eye(4)
    est = np.eye(4)
    est[:3, 3] = [0.01, 0, 0]
    np.testing.assert_allclose(metrics.add_error(est, gt, pts), 0.01, rtol=1e-6)
    assert metrics.adds_error(est, gt, pts) <= 0.01 + 1e-9
    assert metrics.translation_error(est, gt) == pytest.approx(0.01)
    assert metrics.rotation_error_deg(est, gt) == pytest.approx(0.0, abs=1e-4)

    from scipy.spatial.transform import Rotation

    est2 = np.eye(4)
    est2[:3, :3] = Rotation.from_euler("z", 10, degrees=True).as_matrix()
    assert metrics.rotation_error_deg(est2, gt) == pytest.approx(10.0, abs=1e-3)

    # symmetric object: rotation about symmetry axis leaves ADD-S ~0
    theta = np.linspace(0, 2 * np.pi, 512, endpoint=False)
    ring = 0.05 * np.stack([np.cos(theta), np.sin(theta), np.zeros_like(theta)], -1)
    assert metrics.adds_error(est2, gt, ring) < 1e-3
    assert metrics.add_error(est2, gt, ring) > 5e-3

    auc = metrics.add_auc(np.array([0.005, 0.02, 0.2]))
    assert 0.3 < auc < 0.7


def test_checkpoint_roundtrip(tmp_path):
    params = networks.init_refiner(3, CFG)
    path = tmp_path / "refiner.npz"
    checkpoint.save_params(params, str(path))
    loaded = checkpoint.load_params(str(path))

    import jax

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(loaded)
    assert len(flat_a) == len(flat_b)
    keyfn = lambda item: jax.tree_util.keystr(item[0])
    for (pa, va), (pb, vb) in zip(sorted(flat_a, key=keyfn),
                                  sorted(flat_b, key=keyfn)):
        assert str(va.dtype) == str(vb.dtype), (pa, va.dtype, vb.dtype)
        np.testing.assert_array_equal(np.asarray(va, np.float32),
                                      np.asarray(vb, np.float32))
    # outputs identical
    x = jnp.ones((1, CFG.crop_hw, CFG.crop_hw, 6))
    a = networks.apply_refiner(params, x, x, CFG)
    b = networks.apply_refiner(loaded, x, x, CFG)
    np.testing.assert_array_equal(np.asarray(a["trans"]), np.asarray(b["trans"]))
    assert checkpoint.params_fingerprint(params) == checkpoint.params_fingerprint(loaded)


def test_stage_timer_and_fps_counter():
    timer = profiling.StageTimer()
    with timer.stage("work") as h:
        h["result"] = jnp.ones((4,)) * 2
    assert timer.counts["work"] == 1
    assert timer.mean_ms("work") >= 0
    assert "work" in timer.report()

    fps = profiling.FPSCounter()
    fps.start()
    fps.count(10)
    assert fps.fps > 0


def test_convert_tool_init_mode(tmp_path):
    out = tmp_path / "r.npz"
    res = subprocess.run(
        [sys.executable, "tools/convert_onnx.py", "--init", "refiner",
         "--out", str(out)],
        capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stderr
    loaded = checkpoint.load_params(str(out))
    assert "encoder" in loaded and "encodeA" in loaded and "encodeAB" in loaded


def test_convert_tool_onnx_gated(tmp_path):
    res = subprocess.run(
        [sys.executable, "tools/convert_onnx.py", "--onnx", "missing.onnx",
         "--out", str(tmp_path / "x.npz")],
        capture_output=True, text=True, timeout=600,
    )
    assert res.returncode != 0
    assert "onnx" in (res.stderr + res.stdout)


def test_async_tracker_dataset_helper():
    from foundationpose_cpp_tpu import create_foundationpose_model
    from foundationpose_cpp_tpu.config import FoundationPoseConfig
    from foundationpose_cpp_tpu.meshio import procedural
    from foundationpose_cpp_tpu.pipeline.async_tracker import track_dataset
    from foundationpose_cpp_tpu.pipeline.renderer import MeshConstants
    from foundationpose_cpp_tpu.utils import synthetic

    cfg = FoundationPoseConfig(crop_window_h=32, crop_window_w=32)
    net_cfg = networks.NetConfig(
        width1=8, width2=16, embed_dim=64, num_heads=4, crop_hw=32,
    )
    K = np.array([[300.0, 0, 80], [0, 300.0, 60], [0, 0, 1]], np.float32)
    cube = procedural.textured_cube(size=0.1)
    mesh = MeshConstants.from_asset(cube)
    pose = synthetic.default_pose(0.5)
    rgb, depth, _ = synthetic.render_scene(mesh, pose, K, 120, 160, cfg)
    model = create_foundationpose_model(
        networks.init_refiner(0, net_cfg), networks.init_scorer(1, net_cfg),
        [cube], K, 120, 160, config=cfg, net_config=net_cfg,
    )
    poses = track_dataset(model, "cube", [(rgb, depth)] * 3, pose)
    assert len(poses) == 3
    assert all(p.shape == (4, 4) for p in poses)


@pytest.mark.skipif(
    __import__("foundationpose_cpp_tpu.native", fromlist=["load_library"]).load_library() is None,
    reason="no C++ toolchain",
)
def test_async_tracker_ring_loop():
    from foundationpose_cpp_tpu import create_foundationpose_model
    from foundationpose_cpp_tpu.config import FoundationPoseConfig
    from foundationpose_cpp_tpu.meshio import procedural
    from foundationpose_cpp_tpu.pipeline.async_tracker import AsyncTracker
    from foundationpose_cpp_tpu.pipeline.renderer import MeshConstants
    from foundationpose_cpp_tpu.utils import synthetic

    cfg = FoundationPoseConfig(crop_window_h=32, crop_window_w=32)
    net_cfg = networks.NetConfig(
        width1=8, width2=16, embed_dim=64, num_heads=4, crop_hw=32,
    )
    K = np.array([[300.0, 0, 80], [0, 300.0, 60], [0, 0, 1]], np.float32)
    cube = procedural.textured_cube(size=0.1)
    mesh = MeshConstants.from_asset(cube)
    pose = synthetic.default_pose(0.5)
    rgb, depth, _ = synthetic.render_scene(mesh, pose, K, 120, 160, cfg)
    model = create_foundationpose_model(
        networks.init_refiner(0, net_cfg), networks.init_scorer(1, net_cfg),
        [cube], K, 120, 160, config=cfg, net_config=net_cfg,
    )
    tracker = AsyncTracker(model, "cube", (120, 160), capacity=2)
    for _ in range(4):
        tracker.push_frame(rgb, depth)
    records = tracker.run(pose, max_frames=1)
    assert len(records) == 1
    assert records[0].pose.shape == (4, 4)
    assert records[0].skipped_frames >= 1  # newest-frame policy skipped stale
    tracker.close()


def test_dataset_io_helpers(tmp_path):
    """utils.io reads the reference mustard0 layout (u16 mm depth, BGR->RGB)."""
    from PIL import Image

    from foundationpose_cpp_tpu.utils import io as fio

    (tmp_path / "rgb").mkdir()
    (tmp_path / "depth").mkdir()
    (tmp_path / "masks").mkdir()
    np.savetxt(tmp_path / "cam_K.txt",
               np.array([[600, 0, 320], [0, 600, 240], [0, 0, 1.0]]))
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, (48, 64, 3)).astype(np.uint8)
    Image.fromarray(rgb).save(tmp_path / "rgb" / "000001.png")
    depth_mm = rng.uniform(400, 800, (48, 64)).astype(np.uint16)
    Image.fromarray(depth_mm).save(tmp_path / "depth" / "000001.png")
    mask = (rng.uniform(size=(48, 64)) > 0.5).astype(np.uint8) * 255
    Image.fromarray(mask).save(tmp_path / "masks" / "000001.png")

    K = fio.read_cam_k(str(tmp_path / "cam_K.txt"))
    assert K.shape == (3, 3) and K[0, 0] == 600
    r, d, m = fio.read_frame(str(tmp_path), "000001", with_mask=True)
    np.testing.assert_array_equal(r, rgb)
    np.testing.assert_allclose(d, depth_mm.astype(np.float32) / 1000, atol=1e-6)
    assert set(np.unique(m)) <= {0, 255}
    assert fio.list_frame_ids(str(tmp_path)) == ["000001"]

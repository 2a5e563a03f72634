"""End-to-end dataset demo on a synthetic mustard0-layout mini dataset.

Mirrors the reference's flagship test flow (simple_tests/src/
test_foundationpose.cpp:48-104): Register frame 0, Track the sequence,
write bbox overlays + per-frame poses, report ADD/ADD-S vs the GT poses.
Also the real-data drill for utils/io.py: every branch the reference's
ReadRgbDepthMask helpers cover (help_func.hpp:10-52) -- BGR-on-disk color
through the cv2 path, 16-bit millimeter depth with sensor holes, 1-vs-255
mask conventions, the PIL fallback -- is exercised here against files
written the way real capture pipelines write them.
"""

import json
import sys

import numpy as np
import pytest

from examples.demo_dataset import run_dataset
from foundationpose_cpp_tpu.config import FoundationPoseConfig
from foundationpose_cpp_tpu.models import networks
from foundationpose_cpp_tpu.utils import io as fio
from foundationpose_cpp_tpu.utils import synthetic

CFG = FoundationPoseConfig(crop_window_h=32, crop_window_w=32)
NET_CFG = networks.NetConfig(
    width1=8, width2=16, embed_dim=64, num_heads=4, crop_hw=32,
)


def test_demo_dataset_end_to_end(tmp_path):
    root = tmp_path / "data"
    out = tmp_path / "out"
    video = tmp_path / "track.mp4"
    synthetic.write_mini_dataset(str(root), n_frames=3, cfg=CFG)

    summary = run_dataset(
        str(root), str(out), config=CFG, net_config=NET_CFG,
        video_path=str(video),
    )

    assert summary["frames"] == 3
    # --video: the overlay MP4 the reference's saveVideo writes
    # (help_func.hpp:131-176); cv2 is present in CI so this must exist
    assert video.exists() and video.stat().st_size > 0
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


# --- utils/io.py branch drill (VERDICT r4 #7) ------------------------------
#
# Real capture pipelines write BGR via cv2.imwrite, u16-millimeter depth
# PNGs with 0-valued sensor holes, and masks in both the 0/255 and 0/1
# conventions; the reference reads all of these (help_func.hpp:10-52).


def _have_cv2() -> bool:
    try:
        import cv2  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _have_cv2(), reason="cv2 not installed")
def test_read_rgb_bgr_on_disk_cv2_path(tmp_path):
    """A file written by cv2.imwrite stores BGR; read_rgb must hand back
    the original RGB (the cv2 branch flips channels, help_func.hpp:21)."""
    import cv2

    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
    p = tmp_path / "bgr.png"
    cv2.imwrite(str(p), rgb[..., ::-1])  # to-disk exactly as OpenCV apps do
    np.testing.assert_array_equal(fio.read_rgb(str(p)), rgb)


@pytest.mark.skipif(not _have_cv2(), reason="cv2 not installed")
def test_read_rgb_bgra_alpha_dropped(tmp_path):
    import cv2

    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    bgra = np.dstack([rgb[..., ::-1], np.full((16, 16), 200, np.uint8)])
    p = tmp_path / "bgra.png"
    cv2.imwrite(str(p), bgra)
    np.testing.assert_array_equal(fio.read_rgb(str(p)), rgb)


def test_read_rgb_grayscale_stacks_channels(tmp_path):
    from PIL import Image

    gray = np.arange(64, dtype=np.uint8).reshape(8, 8)
    p = tmp_path / "gray.png"
    Image.fromarray(gray).save(p)
    out = fio.read_rgb(str(p))
    assert out.shape == (8, 8, 3)
    for c in range(3):
        np.testing.assert_array_equal(out[..., c], gray)


def test_read_depth_u16mm_with_holes(tmp_path):
    """16-bit PNG, millimeter units, 0 = sensor hole (help_func.hpp:30-38:
    the reference divides by 1000; holes stay 0 and are culled later by
    erode_depth's [0.1, zfar) gate)."""
    from PIL import Image

    depth_mm = np.full((20, 30), 1234, np.uint16)
    depth_mm[3:7, 4:9] = 0  # holes
    depth_mm[0, 0] = 65535  # saturated far pixel
    p = tmp_path / "d.png"
    Image.fromarray(depth_mm).save(p)
    d = fio.read_depth(str(p))
    assert d.dtype == np.float32
    np.testing.assert_allclose(d[10, 10], 1.234, atol=1e-6)
    assert (d[3:7, 4:9] == 0).all()
    np.testing.assert_allclose(d[0, 0], 65.535, atol=1e-4)


def test_read_depth_3channel_takes_first(tmp_path):
    from PIL import Image

    rgbish = np.zeros((6, 6, 3), np.uint8)
    rgbish[..., 0] = 200  # depth encoded in the first channel
    rgbish[..., 1] = 99
    p = tmp_path / "d3.png"
    Image.fromarray(rgbish).save(p)
    d = fio.read_depth(str(p), scale_to_meters=1e-3)
    # NOTE read_* flips BGR->RGB on 3-channel loads through cv2, so "first
    # channel" means the first channel of the RGB view, same as the
    # reference's split-after-cvtColor order
    np.testing.assert_allclose(d, 0.2, atol=1e-6)


@pytest.mark.parametrize("fg_value", [255, 1, 37])
def test_read_mask_value_conventions(tmp_path, fg_value):
    """Mask PNGs arrive as 0/255, 0/1 (labelers), or arbitrary nonzero;
    read_mask must binarize all to {0, 255}."""
    from PIL import Image

    m = np.zeros((10, 10), np.uint8)
    m[2:6, 3:8] = fg_value
    p = tmp_path / "m.png"
    Image.fromarray(m).save(p)
    out = fio.read_mask(str(p))
    assert set(np.unique(out)) == {0, 255}
    np.testing.assert_array_equal(out > 0, m > 0)


def test_read_mask_3channel_first_channel(tmp_path):
    from PIL import Image

    m3 = np.zeros((10, 10, 3), np.uint8)
    m3[1:4, 1:4, :] = 255
    p = tmp_path / "m3.png"
    Image.fromarray(m3).save(p)
    out = fio.read_mask(str(p))
    np.testing.assert_array_equal(out[1:4, 1:4], 255)
    assert out.sum() == 9 * 255


def test_imread_missing_file_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        fio.read_rgb(str(tmp_path / "nope.png"))


def test_io_pil_fallback_without_cv2(tmp_path, monkeypatch):
    """The PIL branch (deployments without OpenCV): same rgb/depth/mask
    results as the cv2 path for PIL-written (RGB-on-disk) files."""
    from PIL import Image

    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 255, (12, 14, 3), dtype=np.uint8)
    depth_mm = rng.integers(100, 2000, (12, 14)).astype(np.uint16)
    Image.fromarray(rgb).save(tmp_path / "rgb.png")
    Image.fromarray(depth_mm).save(tmp_path / "d.png")

    monkeypatch.setitem(sys.modules, "cv2", None)  # import cv2 -> ImportError
    np.testing.assert_array_equal(fio.read_rgb(str(tmp_path / "rgb.png")), rgb)
    np.testing.assert_allclose(
        fio.read_depth(str(tmp_path / "d.png")),
        depth_mm.astype(np.float32) / 1000, atol=1e-6,
    )


def test_read_frame_and_sorted_ids(tmp_path):
    from PIL import Image

    (tmp_path / "rgb").mkdir()
    (tmp_path / "depth").mkdir()
    (tmp_path / "masks").mkdir()
    rng = np.random.default_rng(4)
    for fid in ("000010", "000002"):  # written out of order
        Image.fromarray(
            rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
        ).save(tmp_path / "rgb" / f"{fid}.png")
        Image.fromarray(
            np.full((8, 8), 500, np.uint16)
        ).save(tmp_path / "depth" / f"{fid}.png")
        Image.fromarray(
            np.full((8, 8), 255, np.uint8)
        ).save(tmp_path / "masks" / f"{fid}.png")
    assert fio.list_frame_ids(str(tmp_path)) == ["000002", "000010"]
    rgb, depth = fio.read_frame(str(tmp_path), "000002")
    assert rgb.shape == (8, 8, 3) and depth.shape == (8, 8)
    rgb, depth, mask = fio.read_frame(str(tmp_path), "000010", with_mask=True)
    assert mask.shape == (8, 8) and mask.max() == 255

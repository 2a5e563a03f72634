"""End-to-end Register/Track on a synthetic scene (mustard stand-in).

Mirrors the reference's test strategy (SURVEY.md SS4) with stronger
assertions: the reference's gtest only CHECKs success booleans; here we pin
exact sampler behavior via zeroed refiner heads, validate rigid-transform
structure, determinism, and the full input-validation surface.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from foundationpose_cpp_tpu import (
    FoundationPose,
    FoundationPoseConfig,
    create_foundationpose_model,
    networks,
)
from foundationpose_cpp_tpu.config import DepthFilterConfig
from foundationpose_cpp_tpu.meshio import procedural
from foundationpose_cpp_tpu.pipeline.renderer import MeshConstants
from foundationpose_cpp_tpu.utils import synthetic

# small-everything configuration so the 252-hypothesis register runs fast on CPU
NET_CFG = networks.NetConfig(
    width1=8, width2=16, embed_dim=64, num_heads=4, crop_hw=32,
)
CFG = FoundationPoseConfig(crop_window_h=32, crop_window_w=32)
K = np.array([[300.0, 0, 80], [0, 300.0, 60], [0, 0, 1]], dtype=np.float32)
H, W = 120, 160


def _zero_heads(params):
    """Zero the head projections so refine deltas are exactly identity."""
    out = jax.tree.map(lambda x: x, params)  # copy structure
    for name, p in out.items():
        if name.startswith("head_"):
            p["w"] = jnp.zeros_like(p["w"])
            p["b"] = jnp.zeros_like(p["b"])
    return out


@pytest.fixture(scope="module")
def scene():
    cube = procedural.textured_cube(size=0.1)
    mesh = MeshConstants.from_asset(cube)
    pose = synthetic.default_pose(tz=0.5)
    rgb, depth, mask = synthetic.render_scene(mesh, pose, K, H, W, CFG)
    return cube, mesh, pose, rgb, depth, mask


@pytest.fixture(scope="module")
def model(scene):
    cube = scene[0]
    return create_foundationpose_model(
        networks.init_refiner(0, NET_CFG),
        networks.init_scorer(1, NET_CFG),
        [cube],
        K,
        max_input_image_h=H,
        max_input_image_w=W,
        config=CFG,
        net_config=NET_CFG,
    )


def test_scene_is_sane(scene):
    _, _, pose, rgb, depth, mask = scene
    assert mask.any() and not mask.all()
    vis = depth[mask > 0]
    assert 0.4 < vis.min() < vis.max() < 0.6
    assert rgb[mask > 0].max() > 40


def test_register_runs_and_returns_rigid_pose(scene, model):
    _, _, gt_pose, rgb, depth, mask = scene
    out = model.register(rgb, depth, mask, "cube")
    assert out.shape == (4, 4)
    r = out[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-3)
    np.testing.assert_allclose(out[3], [0, 0, 0, 1], atol=1e-6)
    # translation from the on-device guess must land near the true object
    # (front-surface median bias + random-weight refine delta bounded by
    # tanh(.)*diameter/2 and 20deg)
    assert np.linalg.norm(out[:3, 3] - gt_pose[:3, 3]) < 0.2


def test_register_zero_delta_matches_sampler_exactly(scene):
    """With zeroed refiner heads the best pose must be an unmodified grid
    hypothesis translated to the guessed center -- pins the full sampler+
    renderer+scorer loop numerically."""
    cube, mesh, gt_pose, rgb, depth, mask = scene
    model = create_foundationpose_model(
        _zero_heads(networks.init_refiner(0, NET_CFG)),
        networks.init_scorer(1, NET_CFG),
        [cube], K, H, W, config=CFG, net_config=NET_CFG,
    )
    best, poses, scores = model.register_with_scores(rgb, depth, mask, "cube")
    assert poses.shape == (252, 4, 4)
    assert scores.shape == (252,)

    # reproduce the expected translation with the oracle chain
    from tests import oracle

    ref_depth = oracle.bilateral_filter_depth_oracle(oracle.erode_depth_oracle(depth))
    want_center = oracle.guess_translation_oracle(ref_depth, mask, K)
    np.testing.assert_allclose(poses[0, :3, 3], want_center, rtol=1e-3, atol=1e-4)

    # rotations unchanged from the precomputed grid
    from foundationpose_cpp_tpu.geometry import icosphere

    grid = icosphere.make_rotation_grid()
    np.testing.assert_allclose(poses[:, :3, :3], grid[:, :3, :3], atol=1e-5)
    # best = argmax of scores
    np.testing.assert_allclose(best, poses[np.argmax(scores)], atol=0)


def test_register_deterministic(scene, model):
    _, _, _, rgb, depth, mask = scene
    a = model.register(rgb, depth, mask, "cube")
    b = model.register(rgb, depth, mask, "cube")
    np.testing.assert_array_equal(a, b)


def test_track_runs_and_is_rigid(scene, model):
    _, _, gt_pose, rgb, depth, _ = scene
    out = model.track(rgb, depth, gt_pose, "cube")
    assert out.shape == (4, 4)
    r = out[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-3)
    # refine delta is bounded: trans <= sqrt(3)*diameter/2, rot <= 20 deg
    assert np.linalg.norm(out[:3, 3] - gt_pose[:3, 3]) < 0.18


def test_track_zero_delta_is_identity(scene):
    cube, _, gt_pose, rgb, depth, _ = scene
    model = create_foundationpose_model(
        _zero_heads(networks.init_refiner(0, NET_CFG)),
        networks.init_scorer(1, NET_CFG),
        [cube], K, H, W, config=CFG, net_config=NET_CFG,
    )
    out = model.track(rgb, depth, gt_pose, "cube", refine_itr=3)
    np.testing.assert_allclose(out, gt_pose, atol=1e-5)


def test_input_validation(scene, model):
    _, _, gt_pose, rgb, depth, mask = scene
    with pytest.raises(ValueError, match="size mismatch"):
        model.register(rgb[:-2], depth, mask, "cube")
    with pytest.raises(KeyError, match="unknown target"):
        model.register(rgb, depth, mask, "mustard")
    with pytest.raises(TypeError, match="uint8"):
        model.register(rgb.astype(np.float32), depth, mask, "cube")
    with pytest.raises(TypeError, match="float32"):
        model.register(rgb, depth.astype(np.float64), mask, "cube")
    big = np.zeros((H + 8, W + 8, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="exceeds construction max"):
        model.register(big, np.zeros(big.shape[:2], np.float32),
                       np.zeros(big.shape[:2], np.uint8), "cube")


def test_register_empty_mask_raises(scene, model):
    _, _, _, rgb, depth, _ = scene
    empty = np.zeros_like(depth, dtype=np.uint8)
    with pytest.raises(RuntimeError, match="translation guess failed"):
        model.register(rgb, depth, empty, "cube")


def test_multi_mesh_registry(scene):
    cube, _, gt_pose, rgb, depth, mask = scene
    sphere = procedural.textured_uv_sphere(name="sphere", radius=0.05, n_lat=6, n_lon=8)
    model = create_foundationpose_model(
        networks.init_refiner(0, NET_CFG),
        networks.init_scorer(1, NET_CFG),
        [cube, sphere], K, H, W, config=CFG, net_config=NET_CFG,
    )
    p1 = model.track(rgb, depth, gt_pose, "cube")
    p2 = model.track(rgb, depth, gt_pose, "sphere")
    assert p1.shape == p2.shape == (4, 4)
    assert not np.allclose(p1, p2)  # different mesh geometry -> different crops


def test_convert_pose_mesh2bbox_api(scene, model):
    _, _, gt_pose, _, _, _ = scene
    out = model.convert_pose_mesh2bbox(gt_pose, "cube")
    assert out.shape == (4, 4)
    dims = model.object_dimension("cube")
    np.testing.assert_allclose(np.sort(dims), [0.1, 0.1, 0.1], rtol=1e-4)


@pytest.mark.parametrize("depth_format", ["f32", "u16mm"])
def test_packed_tracker_matches_track(scene, model, depth_format):
    """make_packed_tracker (the AsyncTracker fast path: one u8 buffer of
    rgb bytes + depth bytes, one H2D, zero D2H) must refine identically
    to the public track() API on the same frame. The u16mm wire format
    (depth as sensor-native uint16 millimeters, H*W*5 bytes) quantizes
    depth to 1 mm, so its oracle is track() on the same quantized depth."""
    from foundationpose_cpp_tpu.pipeline.foundationpose import FoundationPose

    _, _, pose, rgb, depth, mask = scene
    step = model.make_packed_tracker("cube", (H, W), depth_format=depth_format)
    packed = FoundationPose.pack_frame(rgb, depth, depth_format)
    assert packed.nbytes == FoundationPose.packed_frame_bytes(
        (H, W), depth_format
    ) == H * W * (5 if depth_format == "u16mm" else 7)
    got = np.asarray(
        step(jnp.asarray(packed), jnp.asarray(pose, jnp.float32))
    )
    if depth_format == "u16mm":
        depth = (
            np.round(depth.astype(np.float64) * 1000).astype(np.uint16)
            .astype(np.float32) * 1e-3
        )
    want = np.asarray(model.track(rgb, depth, pose, "cube"))
    assert got.shape == (4, 4)
    np.testing.assert_allclose(got, want.reshape(4, 4), atol=1e-6)


@pytest.mark.parametrize("depth_format", ["f32", "u16mm"])
def test_packed_tracker_odd_dims_bitcast(depth_format):
    """Odd HxW: the depth byte region starts at a non-word-aligned offset
    of the packed buffer (h*w*3 odd), exercising the u8->f32 / u8->u16
    bitcast paths on unaligned geometry. Parity vs track() on the same
    random frame (quantized to mm for the u16 wire format)."""
    from foundationpose_cpp_tpu.pipeline.foundationpose import FoundationPose

    h, w = 37, 53  # h*w*3 = 5883, not a multiple of 4 (nor of 2)
    cube = procedural.textured_cube(size=0.1)
    k_odd = np.array(
        [[120.0, 0, w / 2], [0, 120.0, h / 2], [0, 0, 1]], np.float32
    )
    m = create_foundationpose_model(
        networks.init_refiner(0, NET_CFG),
        networks.init_scorer(1, NET_CFG),
        [cube],
        k_odd,
        max_input_image_h=h,
        max_input_image_w=w,
        config=CFG,
        net_config=NET_CFG,
    )
    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
    depth = rng.uniform(0.3, 0.7, size=(h, w)).astype(np.float32)
    pose = synthetic.default_pose(tz=0.5)
    step = m.make_packed_tracker("cube", (h, w), depth_format=depth_format)
    packed = FoundationPose.pack_frame(rgb, depth, depth_format)
    assert packed.nbytes == h * w * (5 if depth_format == "u16mm" else 7)
    got = np.asarray(
        step(jnp.asarray(packed), jnp.asarray(pose, jnp.float32))
    )
    if depth_format == "u16mm":
        depth = (
            np.round(depth.astype(np.float64) * 1000).astype(np.uint16)
            .astype(np.float32) * 1e-3
        )
    want = np.asarray(m.track(rgb, depth, pose, "cube")).reshape(4, 4)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert np.isfinite(got).all()


def test_pack_frame_u16_edge_cases():
    """mm quantization clips to the u16 range and flushes NaN holes to 0;
    a u16 sensor frame passes through byte-identical."""
    from foundationpose_cpp_tpu.pipeline.foundationpose import FoundationPose

    rgb = np.zeros((2, 3, 3), np.uint8)
    depth = np.array(
        [[0.0, np.nan, 1.2345], [70.0, -0.5, 0.0004]], np.float32
    )
    packed = FoundationPose.pack_frame(rgb, depth, "u16mm")
    mm = packed[rgb.size:].view(np.uint16).reshape(2, 3)
    assert mm[0, 0] == 0 and mm[0, 1] == 0          # zero + NaN hole
    assert mm[0, 2] in (1234, 1235)                 # 1.2345 m -> ~1234.5 mm
    assert mm[1, 0] == 65535                        # clipped far
    assert mm[1, 1] == 0                            # negative clamped
    assert mm[1, 2] == 0                            # sub-mm rounds to 0

    sensor = np.arange(6, dtype=np.uint16).reshape(2, 3) * 300
    packed2 = FoundationPose.pack_frame(rgb, sensor, "u16mm")
    np.testing.assert_array_equal(
        packed2[rgb.size:].view(np.uint16).reshape(2, 3), sensor
    )
    with pytest.raises(ValueError):
        FoundationPose.pack_frame(rgb, depth, "f16mm")


def test_packed_tracker_rgb_half_parity(scene, model):
    """rgb_half ships the color plane at half resolution (H*W*2.75 bytes
    with u16mm); parity oracle = track() fed the same on-device-style
    box-down + bilinear-up color (depth is untouched, so only color
    detail differs from the full-res path)."""
    import jax.image

    from foundationpose_cpp_tpu.pipeline.foundationpose import FoundationPose

    _, _, pose, rgb, depth, mask = scene
    step = model.make_packed_tracker(
        "cube", (H, W), depth_format="u16mm", rgb_half=True
    )
    packed = FoundationPose.pack_frame(rgb, depth, "u16mm", rgb_half=True)
    assert packed.nbytes == FoundationPose.packed_frame_bytes(
        (H, W), "u16mm", rgb_half=True
    ) == (H // 2) * (W // 2) * 3 + H * W * 2
    got = np.asarray(
        step(jnp.asarray(packed), jnp.asarray(pose, jnp.float32))
    )
    # oracle: identical wire processing on the host side
    small = packed[: (H // 2) * (W // 2) * 3].reshape(H // 2, W // 2, 3)
    rgb_up = np.asarray(jax.image.resize(
        jnp.asarray(small, jnp.float32), (H, W, 3), method="linear"
    ))
    depth_q = (
        np.round(depth.astype(np.float64) * 1000).astype(np.uint16)
        .astype(np.float32) * 1e-3
    )
    want = np.asarray(model.track(
        np.clip(np.round(rgb_up), 0, 255).astype(np.uint8), depth_q,
        pose, "cube",
    ))
    assert got.shape == (4, 4)
    # the wire path feeds the UNROUNDED bilinear rgb into the model while
    # track() takes u8 -- compare against the rounded-oracle track with a
    # tolerance bounding the 0.5-LSB color difference's effect
    np.testing.assert_allclose(got, want.reshape(4, 4), atol=5e-3)
    # and the refined pose stays a rigid transform near the input
    r = got[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-3)


def test_packed_tracker_rgb_half_odd_dims_rejected():
    cube = procedural.textured_cube(size=0.1)
    m = create_foundationpose_model(
        networks.init_refiner(0, NET_CFG), networks.init_scorer(1, NET_CFG),
        [cube],
        np.array([[120.0, 0, 26], [0, 120.0, 18], [0, 0, 1]], np.float32),
        max_input_image_h=37, max_input_image_w=53,
        config=CFG, net_config=NET_CFG,
    )
    with pytest.raises(ValueError, match="even frame dims"):
        m.make_packed_tracker("cube", (37, 53), rgb_half=True)

"""Bucketed dynamic input sizes: one executable serves many sizes.

Reference behavior (README.md:20 + foundationpose_render.cpp:265-379): any
input size <= the construction max is served from pre-sized buffers without
rebuilding. Here that means: sizes within a configured (H, W) bucket are
zero-padded up and the real extents ride through the program as dynamic
scalars -- so different camera sizes share ONE compiled executable, and the
results match the exact-size (unbucketed) program.
"""

import numpy as np
import pytest

from foundationpose_cpp_tpu import create_foundationpose_model
from foundationpose_cpp_tpu.config import FoundationPoseConfig
from foundationpose_cpp_tpu.meshio import procedural
from foundationpose_cpp_tpu.models import networks
from foundationpose_cpp_tpu.pipeline.renderer import MeshConstants
from foundationpose_cpp_tpu.utils import synthetic

NET_CFG = networks.NetConfig(
    width1=8, width2=16, embed_dim=64, num_heads=4, crop_hw=32,
)
K = np.array([[300.0, 0, 80], [0, 300.0, 60], [0, 0, 1]], dtype=np.float32)


def _scene(h, w, cfg):
    cube = procedural.textured_cube(size=0.1)
    mesh = MeshConstants.from_asset(cube)
    pose = synthetic.default_pose(tz=0.5)
    rgb, depth, mask = synthetic.render_scene(mesh, pose, K, h, w, cfg)
    return cube, rgb, depth, mask


def _model(cube, cfg):
    return create_foundationpose_model(
        networks.init_refiner(0, NET_CFG), networks.init_scorer(1, NET_CFG),
        [cube], K, 256, 256, config=cfg, net_config=NET_CFG,
    )


def test_two_sizes_share_one_executable():
    cfg = FoundationPoseConfig(
        crop_window_h=32, crop_window_w=32, size_buckets=((128, 192),),
    )
    cube, rgb1, depth1, mask1 = _scene(120, 160, cfg)
    _, rgb2, depth2, mask2 = _scene(96, 128, cfg)
    model = _model(cube, cfg)

    p1 = model.register(rgb1, depth1, mask1, "cube")
    p2 = model.register(rgb2, depth2, mask2, "cube")
    assert len(model._register_cache) == 1, "sizes must share one executable"
    for p in (p1, p2):
        assert p.shape == (4, 4) and np.isfinite(p).all()
        r = p[:3, :3]
        assert np.allclose(r @ r.T, np.eye(3), atol=1e-3)

    t1 = model.track(rgb1, depth1, p1, "cube")
    t2 = model.track(rgb2, depth2, p2, "cube")
    assert len(model._track_cache) == 1
    assert np.isfinite(t1).all() and np.isfinite(t2).all()


@pytest.mark.slow
def test_bucketed_matches_exact():
    """Padding + dynamic extents must not change the estimate.

    Zero padding is exactly neutral through every op (verified op-by-op),
    but making (h, w) DYNAMIC changes XLA's constant folding (div-by-const
    becomes mul-by-reciprocal etc.), which flips razor-edge rasterization
    ties by ~1 ulp; the bf16 nets amplify those to ~1e-3-level pose deltas.
    So the contract is estimate-level agreement, not bit equality.
    """
    cfg_off = FoundationPoseConfig(crop_window_h=32, crop_window_w=32)
    cfg_on = FoundationPoseConfig(
        crop_window_h=32, crop_window_w=32, size_buckets=((160, 192),),
    )
    cube, rgb, depth, mask = _scene(120, 160, cfg_off)

    best_off, poses_off, scores_off = _model(cube, cfg_off).register_with_scores(
        rgb, depth, mask, "cube"
    )
    best_on, poses_on, scores_on = _model(cube, cfg_on).register_with_scores(
        rgb, depth, mask, "cube"
    )
    # most hypotheses are bit-identical; every score agrees closely
    frac_exact = (np.abs(scores_on - scores_off) < 1e-4).mean()
    assert frac_exact > 0.5, f"only {frac_exact:.2f} of scores match exactly"
    np.testing.assert_allclose(scores_on, scores_off, atol=0.2)
    # the refined pose at any fixed hypothesis agrees to mm/sub-degree level
    np.testing.assert_allclose(poses_on, poses_off, atol=0.02)

    t_off = _model(cube, cfg_off).track(rgb, depth, best_off, "cube")
    t_on = _model(cube, cfg_on).track(rgb, depth, best_off, "cube")
    np.testing.assert_allclose(t_on, t_off, atol=0.02)


def test_oversized_input_rejected():
    cfg = FoundationPoseConfig(
        crop_window_h=32, crop_window_w=32, size_buckets=((64, 64),),
    )
    cube, rgb, depth, mask = _scene(120, 160, cfg)
    model = _model(cube, cfg)
    with pytest.raises(ValueError, match="bucket"):
        model.register(rgb, depth, mask, "cube")

"""Multi-chip sharding on the virtual 8-device CPU mesh.

Asserts the sharded Register/Track programs compile, execute, and agree
numerically with the single-device path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from foundationpose_cpp_tpu import FoundationPoseConfig, networks
from foundationpose_cpp_tpu.geometry import icosphere
from foundationpose_cpp_tpu.meshio import procedural
from foundationpose_cpp_tpu.parallel import sharding
from foundationpose_cpp_tpu.pipeline.foundationpose import register_step, track_step
from foundationpose_cpp_tpu.pipeline.renderer import MeshConstants
from foundationpose_cpp_tpu.utils import synthetic

NET_CFG = networks.NetConfig(
    width1=8, width2=16, embed_dim=64, num_heads=4, crop_hw=32,
)
CFG = FoundationPoseConfig(crop_window_h=32, crop_window_w=32)
K = np.array([[300.0, 0, 80], [0, 300.0, 60], [0, 0, 1]], dtype=np.float32)
H, W = 120, 160


@pytest.fixture(scope="module")
def setup():
    cube = procedural.textured_cube(size=0.1)
    mesh = MeshConstants.from_asset(cube)
    pose = synthetic.default_pose(tz=0.5)
    rgb, depth, mask = synthetic.render_scene(mesh, pose, K, H, W, CFG)
    params_r = networks.init_refiner(0, NET_CFG)
    params_s = networks.init_scorer(1, NET_CFG)
    return mesh, rgb, depth, mask, params_r, params_s


def test_eight_virtual_devices_available():
    assert len(jax.devices()) == 8


def test_pad_grid():
    grid = icosphere.make_rotation_grid()
    padded, valid = sharding.pad_grid(grid, 8)
    assert padded.shape[0] == 256 and valid.sum() == 252
    padded1, valid1 = sharding.pad_grid(grid, 4)
    assert padded1.shape[0] == 252 and valid1.all()


def test_sharded_register_matches_single_device(setup):
    mesh, rgb, depth, mask, params_r, params_s = setup
    grid = icosphere.make_rotation_grid()
    dev_mesh = sharding.make_hyp_mesh()
    padded, valid = sharding.pad_grid(grid, len(jax.devices()))

    fn = sharding.make_sharded_register(
        mesh, dev_mesh, jnp.asarray(K), 1, CFG, NET_CFG
    )
    best_s, poses_s, scores_s, ok_s = fn(
        params_r, params_s, jnp.asarray(rgb), jnp.asarray(depth),
        jnp.asarray(mask), jnp.asarray(padded), jnp.asarray(valid),
    )
    assert bool(ok_s)

    # single-device reference on the same padded grid
    best_1, poses_1, scores_1, ok_1 = jax.jit(
        lambda pr, ps, a, b, c, g, v: register_step(
            mesh, pr, ps, a, b, c, g, jnp.asarray(K), 1, CFG, NET_CFG,
            hyp_valid=v,
        )
    )(params_r, params_s, jnp.asarray(rgb), jnp.asarray(depth),
      jnp.asarray(mask), jnp.asarray(padded), jnp.asarray(valid))

    # the pjit path is partitioned by XLA from sharding annotations alone;
    # measured BIT-IDENTICAL to single-device (scores/poses max_abs = 0)
    np.testing.assert_allclose(np.asarray(scores_s), np.asarray(scores_1),
                               rtol=0, atol=1e-6)
    # padded rows masked out of the argmax
    assert not np.isfinite(np.asarray(scores_s)[252:]).any()
    np.testing.assert_allclose(np.asarray(best_s), np.asarray(best_1),
                               rtol=0, atol=1e-6)


def test_sharded_track_batch_matches_single_device(setup):
    mesh, rgb, depth, _, params_r, _ = setup
    dev_mesh = sharding.make_hyp_mesh()
    n = 16
    rng = np.random.default_rng(0)
    poses = np.tile(synthetic.default_pose(0.5)[None], (n, 1, 1))
    poses[:, :3, 3] += rng.normal(0, 0.01, (n, 3)).astype(np.float32)

    fn = sharding.make_sharded_track_batch(
        mesh, dev_mesh, jnp.asarray(K), 1, CFG, NET_CFG
    )
    out_s = np.asarray(fn(params_r, jnp.asarray(rgb), jnp.asarray(depth),
                          jnp.asarray(poses)))

    out_1 = np.asarray(jax.jit(
        lambda pr, a, b, p: track_step(
            mesh, pr, a, b, p, jnp.asarray(K), 1, CFG, NET_CFG
        )
    )(params_r, jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(poses)))

    # bf16 conv reductions associate differently under SPMD partitioning;
    # measured max_abs 1.0e-3 on the refine deltas (2x margin below)
    np.testing.assert_allclose(out_s, out_1, rtol=1e-3, atol=2e-3)


def test_sharded_register_fused_matches_single_device(setup):
    """The PRODUCTION fused Pallas renderer under multi-chip SPMD.

    shard_map over the hypothesis axis (Pallas custom calls have no SPMD
    partitioning rules); interpret mode runs the same kernel on the CPU
    mesh. Must agree with the single-device fused path.
    """
    mesh, rgb, depth, mask, params_r, params_s = setup
    grid = icosphere.make_rotation_grid()
    dev_mesh = sharding.make_hyp_mesh()
    padded, valid = sharding.pad_grid(grid, len(jax.devices()))

    fn = sharding.make_sharded_register(
        mesh, dev_mesh, jnp.asarray(K), 1, CFG, NET_CFG,
        use_fused="interpret",
    )
    best_s, poses_s, scores_s, ok_s = fn(
        params_r, params_s, jnp.asarray(rgb), jnp.asarray(depth),
        jnp.asarray(mask), jnp.asarray(padded), jnp.asarray(valid),
    )
    assert bool(ok_s)

    best_1, poses_1, scores_1, ok_1 = jax.jit(
        lambda pr, ps, a, b, c, g, v: register_step(
            mesh, pr, ps, a, b, c, g, jnp.asarray(K), 1, CFG, NET_CFG,
            hyp_valid=v, use_fused="interpret",
        )
    )(params_r, params_s, jnp.asarray(rgb), jnp.asarray(depth),
      jnp.asarray(mask), jnp.asarray(padded), jnp.asarray(valid))

    # per-shard conv batch shapes (252 vs 32) round bf16 casts differently
    # in the scorer; measured scores max_abs 1.1e-2 / max_rel 6.5e-3
    # (~one bf16 ulp). Poses measured bit-identical through the refiner.
    np.testing.assert_allclose(np.asarray(scores_s), np.asarray(scores_1),
                               rtol=2e-2, atol=2e-3)
    assert not np.isfinite(np.asarray(scores_s)[252:]).any()
    np.testing.assert_allclose(np.asarray(best_s), np.asarray(best_1),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(poses_s), np.asarray(poses_1),
                               rtol=0, atol=1e-6)


def test_sharded_register_fused_cross_attention_gathers(setup):
    """MultiPair cross-attention must see ALL hypotheses under sharding.

    A scorer with att_cross attends across the full hypothesis set on one
    chip; the sharded path all-gathers pooled embeddings (apply_scorer
    axis_name) so the scores match the single-device MultiPair scorer --
    NOT a per-shard-group approximation.
    """
    mesh, rgb, depth, mask, params_r, _ = setup
    net_cfg_x = networks.NetConfig(
        width1=8, width2=16, embed_dim=64, num_heads=4, crop_hw=32,
        cross_attention=True,
    )
    params_sx = networks.init_scorer(7, net_cfg_x)
    assert "att_cross" in params_sx
    grid = icosphere.make_rotation_grid()
    dev_mesh = sharding.make_hyp_mesh()
    padded, valid = sharding.pad_grid(grid, len(jax.devices()))

    fn = sharding.make_sharded_register(
        mesh, dev_mesh, jnp.asarray(K), 1, CFG, net_cfg_x,
        use_fused="interpret",
    )
    _, _, scores_s, ok_s = fn(
        params_r, params_sx, jnp.asarray(rgb), jnp.asarray(depth),
        jnp.asarray(mask), jnp.asarray(padded), jnp.asarray(valid),
    )
    assert bool(ok_s)

    _, _, scores_1, _ = jax.jit(
        lambda pr, ps, a, b, c, g, v: register_step(
            mesh, pr, ps, a, b, c, g, jnp.asarray(K), 1, CFG, net_cfg_x,
            hyp_valid=v, use_fused="interpret",
        )
    )(params_r, params_sx, jnp.asarray(rgb), jnp.asarray(depth),
      jnp.asarray(mask), jnp.asarray(padded), jnp.asarray(valid))

    # measured max_abs 8.2e-3 / max_rel 7.4e-3 (bf16 conv-batch rounding;
    # the pooled all-gather itself is exact)
    np.testing.assert_allclose(np.asarray(scores_s), np.asarray(scores_1),
                               rtol=2e-2, atol=2e-3)


def test_sharded_track_batch_fused_matches_single_device(setup):
    mesh, rgb, depth, _, params_r, _ = setup
    dev_mesh = sharding.make_hyp_mesh()
    n = 16
    rng = np.random.default_rng(0)
    poses = np.tile(synthetic.default_pose(0.5)[None], (n, 1, 1))
    poses[:, :3, 3] += rng.normal(0, 0.01, (n, 3)).astype(np.float32)

    fn = sharding.make_sharded_track_batch(
        mesh, dev_mesh, jnp.asarray(K), 1, CFG, NET_CFG,
        use_fused="interpret",
    )
    out_s = np.asarray(fn(params_r, jnp.asarray(rgb), jnp.asarray(depth),
                          jnp.asarray(poses)))

    out_1 = np.asarray(jax.jit(
        lambda pr, a, b, p: track_step(
            mesh, pr, a, b, p, jnp.asarray(K), 1, CFG, NET_CFG,
            use_fused="interpret",
        )
    )(params_r, jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(poses)))

    # measured max_abs 6e-8: per-shard batch 2 vs 16 through the fused
    # interpret-mode renderer + refiner changes nothing but f32 noise
    np.testing.assert_allclose(out_s, out_1, rtol=0, atol=1e-6)


def _collective_census(jitted, *args):
    """Collective-op counts in the compiled (post-GSPMD) executable."""
    import re

    txt = jitted.lower(*args).compile().as_text()
    kinds = ("all-gather", "all-reduce", "reduce-scatter", "all-to-all",
             "collective-permute")
    return {
        k: len(re.findall(rf"\b{k}(?:-start)?\(", txt)) for k in kinds
    }


def _jitted_of(checked_fn):
    """The jax.jit object inside make_sharded_register's checked() wrapper."""
    cells = {v: c.cell_contents for v, c in
             zip(checked_fn.__code__.co_freevars, checked_fn.__closure__)}
    return cells["jitted"]


def test_sharded_register_fused_collective_schedule(setup):
    """Pin the PRODUCTION path's cross-chip traffic at the HLO level.

    The fused (shard_map) Register must compile to all-gathers ONLY --
    the hypothesis-shard result assembly plus the score gather feeding
    the argmax -- with no all-to-all / collective-permute / reduce-scatter
    resharding inserted behind our back. (Census on this config: 3
    all-gathers; the unfused GSPMD-partitioned path, where XLA chooses
    the schedule, compiles to ~33 all-gathers + 6 all-to-alls + 8
    collective-permutes -- why shard_map is the production choice.)
    """
    mesh, rgb, depth, mask, params_r, params_s = setup
    grid = icosphere.make_rotation_grid()
    dev_mesh = sharding.make_hyp_mesh()
    padded, valid = sharding.pad_grid(grid, len(jax.devices()))
    args = (params_r, params_s, jnp.asarray(rgb), jnp.asarray(depth),
            jnp.asarray(mask), jnp.asarray(padded), jnp.asarray(valid))

    fn = sharding.make_sharded_register(
        mesh, dev_mesh, jnp.asarray(K), 1, CFG, NET_CFG,
        use_fused="interpret",
    )
    census = _collective_census(_jitted_of(fn), *args)
    assert 1 <= census["all-gather"] <= 4, census
    for kind in ("all-reduce", "reduce-scatter", "all-to-all",
                 "collective-permute"):
        assert census[kind] == 0, census


def test_sharded_register_cross_attention_adds_one_gather(setup):
    """att_cross needs every pooled hypothesis embedding on every chip:
    exactly ONE extra all-gather (apply_scorer axis_name) vs the plain
    scorer -- a few hundred KB over ICI, not a resharding storm."""
    mesh, rgb, depth, mask, params_r, _ = setup
    net_cfg_x = networks.NetConfig(
        width1=8, width2=16, embed_dim=64, num_heads=4, crop_hw=32,
        cross_attention=True,
    )
    params_sx = networks.init_scorer(7, net_cfg_x)
    params_s = networks.init_scorer(1, NET_CFG)
    grid = icosphere.make_rotation_grid()
    dev_mesh = sharding.make_hyp_mesh()
    padded, valid = sharding.pad_grid(grid, len(jax.devices()))

    def census_for(ncfg, ps):
        fn = sharding.make_sharded_register(
            mesh, dev_mesh, jnp.asarray(K), 1, CFG, ncfg,
            use_fused="interpret",
        )
        return _collective_census(
            _jitted_of(fn), params_r, ps, jnp.asarray(rgb),
            jnp.asarray(depth), jnp.asarray(mask), jnp.asarray(padded),
            jnp.asarray(valid),
        )

    plain = census_for(NET_CFG, params_s)
    cross = census_for(net_cfg_x, params_sx)
    assert cross["all-gather"] == plain["all-gather"] + 1, (plain, cross)

"""Multi-chip scale-out: shard the hypothesis axis over a TPU device mesh.

The reference is a single-process single-GPU pipeline with NO distributed
backend (SURVEY.md SS2.9) -- its only parallel axis is the 252-hypothesis
batch pushed through every kernel and both engines. That axis is exactly what
shards across chips: every per-hypothesis stage (crop TFs, rasterization,
crops, refiner, scorer) is embarrassingly parallel over hypotheses, the
per-image stages (depth filters, translation guess) are cheap and replicated,
and the only cross-chip communication is the final argmax over 252 scores --
one all-gather of a few hundred floats over ICI, inserted automatically by
XLA's SPMD partitioner from the sharding annotations (pjit recipe: pick a
mesh, annotate, let XLA place collectives).

252 is not divisible by typical chip counts, so the grid is padded up to a
multiple of the mesh size and the pad rows are masked out of the argmax with
-inf scores.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from foundationpose_cpp_tpu.config import FoundationPoseConfig
from foundationpose_cpp_tpu.models import networks
from foundationpose_cpp_tpu.pipeline.foundationpose import (
    prepare_register,
    refine_and_score,
    refine_loop,
    register_step,
    track_step,
)
from foundationpose_cpp_tpu.pipeline.renderer import MeshConstants

HYP_AXIS = "hyp"


def make_hyp_mesh(devices: list[Any] | None = None) -> Mesh:
    """1-D mesh over all (or the given) devices, named 'hyp'."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (HYP_AXIS,))


def pad_grid(rot_grid: np.ndarray, n_devices: int) -> tuple[np.ndarray, np.ndarray]:
    """Pad (M,4,4) grid to a multiple of n_devices; returns (grid, valid)."""
    m = rot_grid.shape[0]
    pad = (-m) % n_devices
    valid = np.ones((m + pad,), dtype=bool)
    if pad:
        filler = np.tile(np.eye(4, dtype=rot_grid.dtype), (pad, 1, 1))
        rot_grid = np.concatenate([rot_grid, filler], axis=0)
        valid[m:] = False
    return rot_grid, valid


def make_sharded_register(
    mesh_consts: MeshConstants,
    device_mesh: Mesh,
    K: jnp.ndarray,
    refine_itr: int,
    cfg: FoundationPoseConfig,
    net_cfg: networks.NetConfig,
    rasterize_fn: Any = None,
    use_fused: bool | str = False,
):
    """Build a multi-chip Register step sharded over the hypothesis axis.

    Returns fn(params_r, params_s, rgb, depth, mask, rot_grid_padded,
    hyp_valid) -> (best_pose, poses, scores, ok). rot_grid_padded / hyp_valid
    must come from pad_grid(..., mesh size).

    use_fused selects the renderer exactly as in the single-chip pipeline:
    False = pure-XLA op composition, partitioned automatically by the SPMD
    partitioner from sharding constraints; True = the Pallas production
    megakernel ("interpret" = same kernel in interpret mode, for CPU-mesh
    tests). Pallas custom calls carry no SPMD partitioning rules, so the
    fused path runs the per-hypothesis section (refine loop + score render +
    scorer) under shard_map: each chip renders and scores its local
    hypothesis shard; the only cross-chip traffic is the scorer
    cross-attention's pooled all-gather (networks.apply_scorer axis_name)
    and the final argmax, both a few hundred KB over ICI.
    """
    hyp = NamedSharding(device_mesh, P(HYP_AXIS))
    repl = NamedSharding(device_mesh, P())

    if use_fused:
        def per_shard(params_r, params_s, rgb, xyz_map, poses, hyp_valid):
            poses, scores = refine_and_score(
                mesh_consts, params_r, params_s, poses, rgb, xyz_map, K,
                refine_itr, cfg, net_cfg, rasterize_fn, use_fused,
                scorer_axis_name=HYP_AXIS,
            )
            scores = jnp.where(hyp_valid, scores, -jnp.inf)
            return poses, scores

        sharded_body = jax.shard_map(
            per_shard,
            mesh=device_mesh,
            in_specs=(P(), P(), P(), P(), P(HYP_AXIS), P(HYP_AXIS)),
            out_specs=(P(HYP_AXIS), P(HYP_AXIS)),
            check_vma=False,
        )

        def fn(params_r, params_s, rgb, depth, mask, rot_grid, hyp_valid):
            poses0, xyz_map, ok = prepare_register(
                depth, mask, rot_grid, K, cfg
            )
            poses, scores = sharded_body(
                params_r, params_s, rgb, xyz_map, poses0, hyp_valid
            )
            best = jnp.argmax(scores)
            best_pose = jnp.where(ok, poses[best], jnp.nan)
            return best_pose, poses, scores, ok

    else:

        def fn(params_r, params_s, rgb, depth, mask, rot_grid, hyp_valid):
            rot_grid = jax.lax.with_sharding_constraint(rot_grid, hyp)
            hyp_valid = jax.lax.with_sharding_constraint(hyp_valid, hyp)
            best, poses, scores, ok = register_step(
                mesh_consts, params_r, params_s, rgb, depth, mask, rot_grid,
                K, refine_itr, cfg, net_cfg, rasterize_fn,
                hyp_valid=hyp_valid,
            )
            return best, poses, scores, ok

    jitted = jax.jit(
        fn,
        in_shardings=(repl, repl, repl, repl, repl, hyp, hyp),
        out_shardings=(repl, hyp, hyp, repl),
    )
    n_dev = device_mesh.size

    def checked(params_r, params_s, rgb, depth, mask, rot_grid, hyp_valid):
        # fail here with a plain message instead of deep inside GSPMD with
        # a cryptic partitioning error (use pad_grid to round the grid up)
        n = rot_grid.shape[0]
        if n % n_dev or hyp_valid.shape[0] != n:
            raise ValueError(
                f"[sharding] rot_grid ({n}) must be a multiple of the mesh "
                f"size ({n_dev}) with hyp_valid the same length "
                f"({hyp_valid.shape[0]}); use pad_grid(grid, {n_dev})"
            )
        return jitted(params_r, params_s, rgb, depth, mask, rot_grid, hyp_valid)

    return checked


def make_sharded_track_batch(
    mesh_consts: MeshConstants,
    device_mesh: Mesh,
    K: jnp.ndarray,
    refine_itr: int,
    cfg: FoundationPoseConfig,
    net_cfg: networks.NetConfig,
    rasterize_fn: Any = None,
    use_fused: bool | str = False,
):
    """Multi-instance Track sharded over the instance axis.

    fn(params_r, rgb, depth, poses (N,4,4)) -> (N,4,4); N must be a multiple
    of the mesh size. use_fused as in make_sharded_register: the Pallas
    megakernel runs under shard_map (no cross-chip traffic at all here --
    the refiner has no cross-hypothesis interaction).
    """
    inst = NamedSharding(device_mesh, P(HYP_AXIS))
    repl = NamedSharding(device_mesh, P())

    if use_fused:
        from foundationpose_cpp_tpu.ops import depth as depth_ops

        def per_shard(params_r, rgb, xyz_map, poses):
            return refine_loop(
                mesh_consts, params_r, poses, rgb, xyz_map, K, refine_itr,
                cfg, net_cfg, rasterize_fn, use_fused,
            )

        sharded_body = jax.shard_map(
            per_shard,
            mesh=device_mesh,
            in_specs=(P(), P(), P(), P(HYP_AXIS)),
            out_specs=P(HYP_AXIS),
            check_vma=False,
        )

        def fn(params_r, rgb, depth, poses):
            xyz_map = depth_ops.depth_to_xyz(depth, K, cfg.min_depth)
            return sharded_body(params_r, rgb, xyz_map, poses)

    else:

        def fn(params_r, rgb, depth, poses):
            poses = jax.lax.with_sharding_constraint(poses, inst)
            return track_step(
                mesh_consts, params_r, rgb, depth, poses, K, refine_itr, cfg,
                net_cfg, rasterize_fn,
            )

    jitted = jax.jit(
        fn, in_shardings=(repl, repl, repl, inst), out_shardings=inst
    )
    n_dev = device_mesh.size

    def checked(params_r, rgb, depth, poses):
        if poses.shape[0] % n_dev:
            raise ValueError(
                f"[sharding] instance count ({poses.shape[0]}) must be a "
                f"multiple of the mesh size ({n_dev}); pad with identity "
                f"poses and drop the extras"
            )
        return jitted(params_r, rgb, depth, poses)

    return checked

"""Multi-chip Register scaling smoke on a virtual 8-device CPU mesh.

bench.py runs this as a subprocess (the virtual-device XLA flag must be
set before jax imports): times single-device register_step vs
make_sharded_register over the mesh on the SAME inputs, and censuses the
collectives GSPMD/shard_map inserted in each compiled executable. On a
real multi-chip slice the same code paths time the true ICI scaling; on
the CPU mesh the numbers smoke-test that the sharded program compiles,
executes, and keeps its collective schedule minimal (the production
fused path: all-gathers only -- hypothesis-shard assembly + the score
all-gather feeding the argmax -- no all-to-all / collective-permute
resharding storms).

Prints ONE JSON line. Extension axis beyond the single-GPU reference
(SURVEY.md SS2.9): the 252-hypothesis batch is the scale axis.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

N_DEV = 8

if __name__ == "__main__":
    os.environ.setdefault(
        "XLA_FLAGS", f"--xla_force_host_platform_device_count={N_DEV}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from foundationpose_cpp_tpu import FoundationPoseConfig, networks
    from foundationpose_cpp_tpu.geometry import icosphere
    from foundationpose_cpp_tpu.meshio import procedural
    from foundationpose_cpp_tpu.parallel import sharding
    from foundationpose_cpp_tpu.pipeline.foundationpose import register_step
    from foundationpose_cpp_tpu.pipeline.renderer import MeshConstants
    from foundationpose_cpp_tpu.utils import synthetic

    # small net + crop so the CPU smoke stays in seconds; the sharding
    # structure (grid padding, specs, collectives) is size-independent
    net_cfg = networks.NetConfig(
        width1=8, width2=16, embed_dim=64, num_heads=4, crop_hw=32
    )
    cfg = FoundationPoseConfig(crop_window_h=32, crop_window_w=32)
    K = np.array([[300.0, 0, 80], [0, 300.0, 60], [0, 0, 1]], np.float32)
    h, w = 120, 160

    cube = procedural.textured_cube(size=0.1)
    mesh = MeshConstants.from_asset(cube)
    pose = synthetic.default_pose(tz=0.5)
    rgb, depth, mask = synthetic.render_scene(mesh, pose, K, h, w, cfg)
    rgb, depth, mask = jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(mask)
    params_r = networks.init_refiner(0, net_cfg)
    params_s = networks.init_scorer(1, net_cfg)
    grid = icosphere.make_rotation_grid()
    dev_mesh = sharding.make_hyp_mesh()
    padded, valid = sharding.pad_grid(grid, N_DEV)
    padded_j, valid_j = jnp.asarray(padded), jnp.asarray(valid)
    Kj = jnp.asarray(K)

    def _time(fn, *args, reps: int = 1) -> float:
        out = fn(*args)
        jax.block_until_ready(out)  # compile + settle
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps * 1e3

    single = jax.jit(
        lambda pr, ps, a, b, c, g, v: register_step(
            mesh, pr, ps, a, b, c, g, Kj, 1, cfg, net_cfg, hyp_valid=v
        )
    )
    ms_single = _time(
        single, params_r, params_s, rgb, depth, mask, padded_j, valid_j
    )

    sharded = sharding.make_sharded_register(
        mesh, dev_mesh, Kj, 1, cfg, net_cfg
    )
    ms_sharded = _time(
        sharded, params_r, params_s, rgb, depth, mask, padded_j, valid_j
    )

    # collective census of the compiled executables (GSPMD inserts these
    # from the sharding annotations; the test suite pins the fused path's
    # schedule -- tests/test_parallel.py)
    kinds = ("all-gather", "all-reduce", "reduce-scatter", "all-to-all",
             "collective-permute")

    def census(use_fused):
        fn = sharding.make_sharded_register(
            mesh, dev_mesh, Kj, 1, cfg, net_cfg, use_fused=use_fused
        )
        cells = {v: c.cell_contents for v, c in
                 zip(fn.__code__.co_freevars, fn.__closure__)}
        txt = cells["jitted"].lower(
            params_r, params_s, rgb, depth, mask, padded_j, valid_j
        ).compile().as_text()
        return {
            k: n for k in kinds
            if (n := len(re.findall(rf"\b{k}(?:-start)?\(", txt)))
        }

    print(json.dumps({
        "n_devices": N_DEV,
        "platform": "cpu-virtual",
        "register_ms_single": round(ms_single, 1),
        "register_ms_sharded": round(ms_sharded, 1),
        "speedup": round(ms_single / ms_sharded, 2),
        "collectives_unfused": census(False),
        "collectives_fused": census("interpret"),
        # virtual CPU devices time-slice the SAME host cores the
        # single-device XLA-CPU program already multithreads over, so
        # speedup < 1 here is a host artifact, not an ICI prediction;
        # the fused path's all-gather-only schedule (pinned in
        # tests/test_parallel.py) is what scales on real chips
        "note": "cpu-virtual smoke: correctness + collective schedule, "
                "not ICI scaling",
    }))

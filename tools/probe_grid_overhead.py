"""Measure Pallas per-grid-cell fixed overhead on the TPU.

The fused renderer runs grid (252 views x 5 x 5 tiles) = 6300 cells; its
empty-scene floor was measured at ~2.8 us/cell (r3). This probe separates
per-CELL cost from per-LANE cost by running a minimal kernel (iota + store,
no faces) over the same total lanes arranged as (a) 1024-lane cells at
grid 252x5x5 vs (b) 5120-lane cells at grid 252x5x1. If (b) is much
faster, the renderer's floor is per-cell-bound and a wide-tile refactor
(TILE 32x160) pays; if equal, the floor is per-lane work and the refactor
is dead weight.

Usage: python tools/probe_grid_overhead.py [--iters 32]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from foundationpose_cpp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    def make(lanes, n_tx, label):
        def kernel(out_ref, scratch):
            # the renderer prologue in miniature: lane coords, a couple of
            # vector ops, scratch init, one (8, lanes) store
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
            fy = (2.0 * (lane // 32).astype(jnp.float32) + 1.0) / 160.0
            fx = (2.0 * (lane % 32).astype(jnp.float32) + 1.0) / 160.0
            scratch[0:1] = jnp.full((1, lanes), 0x7F000000, jnp.int32)
            scratch[1:2] = jnp.zeros((1, lanes), jnp.int32)
            acc = jnp.concatenate(
                [fx, fy, fx * fy, fx + fy] + [fx] * 4, axis=0
            )
            out_ref[0, 0, 0] = acc + scratch[0:2].astype(jnp.float32).sum()

        grid = (252, 5, n_tx)

        @jax.jit
        def run():
            return pl.pallas_call(
                kernel,
                grid=grid,
                out_specs=pl.BlockSpec(
                    (1, 1, 1, 8, lanes), lambda i, t, u: (i, t, u, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (252, 5, n_tx, 8, lanes), jnp.float32
                ),
                scratch_shapes=[pltpu.VMEM((8, lanes), jnp.int32)],
            )()

        @jax.jit
        def loop():
            def body(c, _):
                o = run()
                return c + o[0, 0, 0, 0, 0], None

            c, _ = jax.lax.scan(
                body, jnp.float32(0.0), None, length=args.iters
            )
            return c

        _ = np.asarray(loop())
        t0 = time.perf_counter()
        _ = np.asarray(loop())
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        cells = int(np.prod(grid))
        print(
            f"{label}: grid {grid} = {cells} cells x {lanes} lanes: "
            f"{ms:.2f} ms/iter = {ms * 1e3 / cells:.2f} us/cell"
        )

    make(1024, 5, "narrow (32x32 tiles)")
    make(5120, 1, "wide   (32x160 tiles)")


if __name__ == "__main__":
    main()

"""A/B micro-bench of the encodeA stem conv (7x7/s2, 6->64) formulations.

The direct stem measures 6.2 ms at 2x252 batch on a v5e -- ~10% MXU
utilization (cin=6, strided 7x7) and the largest single slack in the nets
(ideal ~0.6 ms). Variants measured here:

  direct       lax.conv 7x7 stride 2, torch pad 3 (production)
  pad8/pad16   same, input channel-padded with zeros (layout probe)
  s2d          space-to-depth via 6-D transpose then 4x4 VALID conv
               (the round-3 negative result, re-baselined)
  polyphase    4 strided-slice sub-convs (4x4 taps each), summed
  blocked      4x4 VALID conv on an ALREADY 2x2-blocked input -- the
               ceiling for a pipeline that emits blocked crops from the
               renderer/warp for free (the untile transpose is reshaped,
               not added)

Run on TPU: python tools/bench_stem.py [--iters 8] [--n 252]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--n", type=int, default=252)
    args = ap.parse_args()
    it, n2 = args.iters, 2 * args.n

    import jax
    import jax.numpy as jnp

    from foundationpose_cpp_tpu.models import networks

    cfg = networks.NetConfig()
    hw, cin, cout = cfg.crop_hw, cfg.in_channels, cfg.width1
    params = networks.init_refiner(0, cfg)
    p0 = params["encodeA"]["conv0"]
    w, b = p0["w"], p0["b"]  # (7,7,6,64), (64,)

    # generate on-device (host H2D of GBs stalls the tunnel)
    key = jax.random.PRNGKey(0)
    x = jax.jit(
        lambda k: jax.random.uniform(k, (it, n2, hw, hw, cin)).astype(
            jnp.bfloat16
        )
    )(key)

    def timed(name, fn, xs):
        def outer(stack):
            def step(c, xi):
                return c + fn(xi), None

            c, _ = jax.lax.scan(step, jnp.float32(0.0), stack)
            return c

        f = jax.jit(outer)
        _ = np.asarray(f(xs))
        t0 = time.perf_counter()
        _ = np.asarray(f(xs))
        dt = (time.perf_counter() - t0) / it * 1e3
        print(f"{name:28s} {dt:8.2f} ms/iter")
        return dt

    def direct(xi):
        return networks._conv(xi, w, b, stride=2).sum().astype(jnp.float32)

    timed("direct 7x7 s2", direct, x)

    for cpad in (8, 16, 32):
        wp = jnp.pad(w, ((0, 0), (0, 0), (0, cpad - cin), (0, 0)))

        def padded(xi, wp=wp, cpad=cpad):
            xp = jnp.pad(xi, ((0, 0), (0, 0), (0, 0), (0, cpad - cin)))
            return networks._conv(xp, wp, b, stride=2).sum().astype(
                jnp.float32
            )

        timed(f"direct, C padded to {cpad}", padded, x)

    def s2d(xi):
        return networks._conv0_s2d(xi, w, b).sum().astype(jnp.float32)

    timed("s2d (6-D transpose)", s2d, x)

    def polyphase(xi):
        # out[o] = sum_i xpad[2o+i] w[i] = sum_{r,s in 2x2} VALID 4-tap
        # conv of the (r, s) parity plane of xpad with taps w[2d+r - ...]
        xp = jnp.pad(xi, ((0, 0), (3, 4), (3, 4), (0, 0)))  # 167
        acc = None
        for r in range(2):
            for s in range(2):
                sub = xp[:, r::2, s::2, :]  # (n2, 84, 84, 6) -> valid 4 tap
                # tap d covers padded row 2d + r; original kernel index
                # i = 2d + r - ... : with pad 3, out o reads xpad rows
                # 2o..2o+6, i.e. parity-r plane rows o + ceil((0..6-r)/2).
                # Build the 4-tap kernel for this parity:
                taps = np.zeros((4, 4, cin, cout), np.float32)
                wnp = np.asarray(w, np.float32)
                for i in range(7):
                    if i % 2 == r:
                        for j in range(7):
                            if j % 2 == s:
                                taps[i // 2, j // 2] += wnp[i, j]
                out = jax.lax.conv_general_dilated(
                    sub,
                    jnp.asarray(taps, jnp.bfloat16),
                    window_strides=(1, 1),
                    padding="VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32,
                )[:, : hw // 2, : hw // 2]
                acc = out if acc is None else acc + out
        return (acc + b).sum().astype(jnp.float32)

    timed("polyphase (4 sub-convs)", polyphase, x)

    # the blocked ceiling: input arrives already 2x2-blocked (the renderer
    # and warp can emit this layout for free inside their existing final
    # transposes), stem = one dense 4x4x(4*cin) VALID conv
    kh = 4
    xb = jax.jit(
        lambda k: jax.random.uniform(
            k, (it, n2, hw // 2 + 3, hw // 2 + 3, 4 * cin)
        ).astype(jnp.bfloat16)
    )(key)
    w8 = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))  # 7 -> 8 taps, front
    wb = jnp.asarray(
        np.asarray(w8, np.float32)
        .reshape(kh, 2, kh, 2, cin, cout)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(kh, kh, 4 * cin, cout),
        jnp.bfloat16,
    )

    def blocked(xi):
        out = jax.lax.conv_general_dilated(
            xi, wb,
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return (out + b).sum().astype(jnp.float32)

    timed("blocked input (ceiling)", blocked, xb)


if __name__ == "__main__":
    main()

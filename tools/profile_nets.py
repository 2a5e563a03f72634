"""Stage-level TPU timing of the refiner/scorer forward (perf harness).

Times encodeA / encodeAB / transformer / full separately with the same
in-scan methodology as tools/profile_register.py (stacked distinct inputs
as scan xs so nothing hoists; one host readback as the barrier).

Usage: python tools/profile_nets.py [--iters 8] [--n 252]
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
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"],
                    help="dtype of the crop inputs fed to the net")
    args = ap.parse_args()
    it, n = args.iters, args.n

    import jax
    import jax.numpy as jnp

    from foundationpose_cpp_tpu import networks

    cfg = networks.NetConfig()
    rng = np.random.default_rng(0)
    dt = jnp.float32 if args.dtype == "f32" else jnp.bfloat16
    hw = cfg.crop_hw
    crops_a = jnp.asarray(
        rng.uniform(size=(it, n, hw, hw, 6)).astype(np.float32)
    ).astype(dt)
    crops_b = jnp.asarray(
        rng.uniform(size=(it, n, hw, hw, 6)).astype(np.float32)
    ).astype(dt)
    params_r = networks.init_refiner(0, cfg)

    def timed(name, fn, *xs_stacked):
        def outer(*stacks):
            def step(c, xs):
                return c + fn(*xs), None

            c, _ = jax.lax.scan(step, jnp.float32(0.0), stacks)
            return c

        f = jax.jit(outer)
        out = f(*xs_stacked)
        _ = np.asarray(out)
        t0 = time.perf_counter()
        out = f(*xs_stacked)
        _ = np.asarray(out)
        dtm = (time.perf_counter() - t0) / it * 1e3
        print(f"{name:28s} {dtm:8.2f} ms/iter")
        return dtm

    p = params_r["encodeA"]

    def enc_a(a, b):
        both = jnp.concatenate([a, b], axis=0)
        return networks.apply_encoder(params_r, both, cfg).sum().astype(jnp.float32)

    timed("encodeA (2N batch)", enc_a, crops_a, crops_b)

    def conv0_only(a, b):
        both = jnp.concatenate([a, b], axis=0).astype(cfg.dtype)
        h = networks._conv_relu(both, p["conv0"], stride=2)
        return h.sum().astype(jnp.float32)

    timed("  conv0 7x7 s2 (6->64)", conv0_only, crops_a, crops_b)

    def conv01(a, b):
        both = jnp.concatenate([a, b], axis=0).astype(cfg.dtype)
        h = networks._conv_relu(both, p["conv0"], stride=2)
        h = networks._conv_relu(h, p["conv1"], stride=2)
        return h.sum().astype(jnp.float32)

    timed("  +conv1 3x3 s2 (64->128)", conv01, crops_a, crops_b)

    # encodeAB + transformer, from precomputed encodeA features
    s2 = hw // 4
    feats_a = jnp.asarray(
        rng.uniform(size=(it, n, s2, s2, cfg.width2)).astype(np.float32)
    ).astype(cfg.dtype)
    feats_b = jnp.asarray(
        rng.uniform(size=(it, n, s2, s2, cfg.width2)).astype(np.float32)
    ).astype(cfg.dtype)

    def enc_ab(fa, fb):
        ab = jnp.concatenate([fa, fb], axis=-1)
        q = params_r["encodeAB"]
        ab = networks._res_block(ab, q["res0"])
        ab = networks._conv_relu(ab, q["conv"], stride=2)
        ab = networks._res_block(ab, q["res1"])
        return ab.sum().astype(jnp.float32)

    timed("encodeAB", enc_ab, feats_a, feats_b)

    def enc_ab_res0(fa, fb):
        ab = jnp.concatenate([fa, fb], axis=-1)
        return networks._res_block(
            ab, params_r["encodeAB"]["res0"]
        ).sum().astype(jnp.float32)

    timed("  res0 (2x 3x3 256ch @40)", enc_ab_res0, feats_a, feats_b)

    s3_ = hw // 8
    feats_ab = jnp.asarray(
        rng.uniform(size=(it, n, s3_, s3_, cfg.embed_dim)).astype(np.float32)
    ).astype(cfg.dtype)

    def enc_ab_res1(fab):
        return networks._res_block(
            fab, params_r["encodeAB"]["res1"]
        ).sum().astype(jnp.float32)

    timed("  res1 (2x 3x3 512ch @20)", enc_ab_res1, feats_ab)

    s3 = hw // 8
    toks = jnp.asarray(
        rng.uniform(size=(it, n, s3 * s3, cfg.embed_dim)).astype(np.float32)
    ).astype(cfg.dtype)

    def xform(t):
        for layer in params_r["encoder"]:
            t = networks._encoder_layer(t, layer, cfg.num_heads)
        return t.sum().astype(jnp.float32)

    timed("transformer", xform, toks)

    layer0 = params_r["encoder"][0]

    def attn_only(t):
        return networks._self_attention(
            t, layer0["attn"], cfg.num_heads
        ).sum().astype(jnp.float32)

    timed("  self-attention (qkv+core+proj)", attn_only, toks)

    def mlp_ln_only(t):
        x = networks._layer_norm(t, layer0["ln1_s"], layer0["ln1_b"])
        h = jax.nn.relu(networks._linear(x, layer0["mlp_w1"], layer0["mlp_b1"]))
        h = networks._linear(h, layer0["mlp_w2"], layer0["mlp_b2"])
        return networks._layer_norm(
            x + h, layer0["ln2_s"], layer0["ln2_b"]
        ).sum().astype(jnp.float32)

    timed("  FFN + 2x LayerNorm", mlp_ln_only, toks)

    def full(a, b):
        o = networks.apply_refiner(params_r, a, b, cfg)
        return o["trans"].sum() + o["rot"].sum()

    timed("FULL refiner", full, crops_a, crops_b)

    gmac = networks.flops_per_pair(cfg) * n / 1e9
    print(f"\nflops: {gmac:.1f} GMAC per batch-{n} forward "
          f"({2 * gmac / 1e3:.2f} TFLOP)")


if __name__ == "__main__":
    main()

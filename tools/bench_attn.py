"""A/B micro-bench of transformer-encoder variants (perf harness).

Times the full encoder layer at N=252, T=400, D=512 under different
numerics: (a) production (f32 logits+softmax), (b) bf16 logits+softmax,
(c) bf16 with f32 max-subtraction. Also A/Bs the encodeA stem conv
(direct 7x7/s2 vs space-to-depth). Run on TPU.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from foundationpose_cpp_tpu.models import networks

    cfg = networks.NetConfig()
    it, n, t, d = 8, 252, cfg.num_tokens, cfg.embed_dim
    nh = cfg.num_heads
    hd = d // nh
    params = networks.init_refiner(0, cfg)
    layer = params["encoder"][0]
    # generate on-device: host-built arrays of this size stall the axon
    # tunnel for minutes (measured; ~4 GB of H2D)
    toks = jax.jit(
        lambda k: jax.random.uniform(k, (it, n, t, d)).astype(jnp.bfloat16)
    )(jax.random.PRNGKey(0))

    def timed(name, fn, *xs):
        def outer(*stacks):
            def step(c, x):
                return c + fn(*x), None

            c, _ = jax.lax.scan(step, jnp.float32(0.0), stacks)
            return c

        f = jax.jit(outer)
        _ = np.asarray(f(*xs))
        t0 = time.perf_counter()
        _ = np.asarray(f(*xs))
        dt = (time.perf_counter() - t0) / it * 1e3
        print(f"{name:34s} {dt:8.2f} ms/iter")

    import math

    p = layer["attn"]

    def attn_core(x, logits_dtype, softmax_f32):
        qkv = networks._linear(x, p["qkv_w"], p["qkv_b"])
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(a):
            return a.reshape(n, t, nh, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        q = q / math.sqrt(hd)
        logits = jnp.einsum(
            "nhqd,nhkd->nhqk", q, k, preferred_element_type=logits_dtype
        )
        if softmax_f32:
            attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        else:
            attn = jax.nn.softmax(logits, axis=-1)
        attn = attn.astype(x.dtype)
        out = jnp.einsum(
            "nhqk,nhkd->nhqd", attn, v, preferred_element_type=jnp.float32
        )
        out = out.transpose(0, 2, 1, 3).reshape(n, t, d).astype(x.dtype)
        return networks._linear(out, p["proj_w"], p["proj_b"])

    def full_layer(x, logits_dtype, softmax_f32):
        x = networks._layer_norm(
            x + attn_core(x, logits_dtype, softmax_f32),
            layer["ln1_s"], layer["ln1_b"],
        )
        h = jax.nn.relu(networks._linear(x, layer["mlp_w1"], layer["mlp_b1"]))
        h = networks._linear(h, layer["mlp_w2"], layer["mlp_b2"])
        return networks._layer_norm(
            x + h, layer["ln2_s"], layer["ln2_b"]
        ).sum().astype(jnp.float32)

    timed("(a) production f32 logits", lambda x: full_layer(x, jnp.float32, True), toks)
    timed("(b) bf16 logits + bf16 softmax", lambda x: full_layer(x, jnp.bfloat16, False), toks)
    timed("(c) bf16 logits + f32 softmax", lambda x: full_layer(x, jnp.bfloat16, True), toks)

    # accuracy of (b) vs (a) on one batch
    xa = toks[0]
    ya = full_layer(xa, jnp.float32, True)
    yb = full_layer(xa, jnp.bfloat16, False)
    print(f"sum-output rel diff (b vs a): "
          f"{abs(float(ya) - float(yb)) / abs(float(ya)):.2e}")

    # stem conv A/B
    crops = jax.jit(
        lambda k: jax.random.uniform(k, (it, 2 * n, cfg.crop_hw, cfg.crop_hw, 6))
    )(jax.random.PRNGKey(1))
    pc = params["encodeA"]["conv0"]

    def direct(x):
        return networks._conv(
            x.astype(cfg.dtype), pc["w"], pc["b"], stride=2
        ).sum().astype(jnp.float32)

    def s2d(x):
        return networks._conv0_s2d(
            x.astype(cfg.dtype), pc["w"], pc["b"]
        ).sum().astype(jnp.float32)

    def s2d_pre_bf16(x):
        # cast to bf16 BEFORE the pad/block shuffle (half the shuffle bytes)
        return networks._conv0_s2d(
            x.astype(jnp.bfloat16), pc["w"], pc["b"]
        ).sum().astype(jnp.float32)

    timed("conv0 direct 7x7/s2", direct, crops)
    timed("conv0 space-to-depth", s2d, crops)
    timed("conv0 s2d (pre-cast bf16)", s2d_pre_bf16, crops)


if __name__ == "__main__" and "--encode-ab" not in sys.argv:
    main()


def bench_encode_ab() -> None:
    """A/B: res0's first conv on concat(A,B) vs split-weight sum.

    conv(concat(A,B), W) == conv(A, W[:, :, :C]) + conv(B, W[:, :, C:])
    -- the split form never materializes the (2N, 40, 40, 256) concat.
    """
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from foundationpose_cpp_tpu.models import networks

    cfg = networks.NetConfig()
    it, n, s2, c = 8, 252, cfg.crop_hw // 4, cfg.width2
    params = networks.init_refiner(0, cfg)
    q = params["encodeAB"]

    feats = jax.jit(
        lambda k: jax.random.uniform(
            k, (2, it, n, s2, s2, c)
        ).astype(jnp.bfloat16)
    )(jax.random.PRNGKey(2))
    fa, fb = feats[0], feats[1]

    def timed(name, fn, *xs):
        def outer(*stacks):
            def step(cr, x):
                return cr + fn(*x), None

            cr, _ = jax.lax.scan(step, jnp.float32(0.0), stacks)
            return cr

        f = jax.jit(outer)
        _ = np.asarray(f(*xs))
        t0 = time.perf_counter()
        _ = np.asarray(f(*xs))
        print(f"{name:34s} {(time.perf_counter() - t0) / it * 1e3:8.2f} ms/iter")

    def concat_form(a, b):
        ab = jnp.concatenate([a, b], axis=-1)
        ab = networks._res_block(ab, q["res0"])
        ab = networks._conv_relu(ab, q["conv"], stride=2)
        ab = networks._res_block(ab, q["res1"])
        return ab.sum().astype(jnp.float32)

    def split_form(a, b):
        w1, b1 = q["res0"]["w1"], q["res0"]["b1"]
        ha = networks._conv(a, w1[:, :, :c], jnp.zeros_like(b1))
        hb = networks._conv(b, w1[:, :, c:], b1)
        h = jax.nn.relu(ha + hb)
        h = networks._conv(h, q["res0"]["w2"], q["res0"]["b2"])
        ab = jnp.concatenate([a, b], axis=-1)  # skip connection still needs it
        ab = jax.nn.relu(ab + h)
        ab = networks._conv_relu(ab, q["conv"], stride=2)
        ab = networks._res_block(ab, q["res1"])
        return ab.sum().astype(jnp.float32)

    timed("encodeAB concat form", concat_form, fa, fb)
    timed("encodeAB split-weight form", split_form, fa, fb)
    # equivalence
    xa, xb = fa[0].astype(jnp.float32), fb[0].astype(jnp.float32)
    cfg32 = networks.NetConfig(dtype=jnp.float32)
    del cfg32
    d = float(jnp.max(jnp.abs(concat_form(xa, xb) - split_form(xa, xb))))
    print(f"sum-diff (f32 inputs): {d:.3e}")


if __name__ == "__main__" and "--encode-ab" in __import__("sys").argv:
    bench_encode_ab()

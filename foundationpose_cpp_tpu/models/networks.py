"""Refiner / scorer networks: bf16 XLA forward passes.

The reference treats both nets as opaque ONNX->TensorRT engines with a fixed
blob contract (SURVEY.md SS2.8, tools/cvt_onnx2trt.bash:3-15):

  refiner: render_input, transf_input [N,160,160,6] NHWC -> trans [N,3], rot [N,3]
  scorer:  render_input, transf_input [N,160,160,6] NHWC -> scores [N,1]

This module implements that contract natively: a siamese CNN encoder over the
two 6-channel crops, feature concat, a small pre-norm transformer over the
spatial tokens, and per-task heads -- the FoundationPose-style
render-and-compare architecture, expressed as plain functional JAX (params
pytree + pure apply) so the pipeline can inline it into one compiled Register
program. Compute is bf16 on the MXU; heads accumulate and emit f32.

Weights for the published FoundationPose checkpoints are converted with
tools/convert_onnx.py when the ONNX files (Google Drive distribution,
reference README.md:72) and the `onnx` package are available; otherwise the
nets run with seeded random weights, which exercises every code path and
keeps shapes/dtypes/flops honest for benchmarking.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class NetConfig:
    """Architecture knobs shared by refiner and scorer."""

    in_channels: int = 6
    stem_channels: tuple[int, ...] = (64, 128, 256)  # stride-2 stages
    trunk_channels: int = 512  # after A||B concat + fuse conv (stride 2)
    num_transformer_blocks: int = 4
    num_heads: int = 8
    mlp_ratio: float = 4.0
    crop_hw: int = 160
    dtype: Any = jnp.bfloat16

    @property
    def tokens_per_side(self) -> int:
        # three stride-2 stages + one stride-2 fuse conv: 160 -> 10
        return self.crop_hw // (2 ** (len(self.stem_channels) + 1))


# ---------------------------------------------------------------------------
# primitives


def _conv(x, w, b, stride=1):
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (out + b.astype(jnp.float32)).astype(x.dtype)


def _layer_norm(x, scale, bias, eps=1e-6):
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _linear(x, w, b):
    out = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return (out + b).astype(x.dtype)


def _attention(x, p, num_heads):
    n, t, d = x.shape
    hd = d // num_heads
    qkv = _linear(x, p["qkv_w"], p["qkv_b"])  # (N, T, 3D)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(a):
        return a.reshape(n, t, num_heads, hd).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    logits = jnp.einsum("nhqd,nhkd->nhqk", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(logits / math.sqrt(hd), axis=-1).astype(x.dtype)
    out = jnp.einsum("nhqk,nhkd->nhqd", attn, v, preferred_element_type=jnp.float32)
    out = out.transpose(0, 2, 1, 3).reshape(n, t, d).astype(x.dtype)
    return _linear(out, p["proj_w"], p["proj_b"])


def _transformer_block(x, p, num_heads):
    x = x + _attention(_layer_norm(x, p["ln1_s"], p["ln1_b"]), p["attn"], num_heads)
    h = _layer_norm(x, p["ln2_s"], p["ln2_b"])
    h = _linear(h, p["mlp_w1"], p["mlp_b1"])
    h = jax.nn.gelu(h)
    h = _linear(h, p["mlp_w2"], p["mlp_b2"])
    return x + h


def _res_block(x, p):
    h = jax.nn.relu(_conv(x, p["w1"], p["b1"]))
    h = _conv(h, p["w2"], p["b2"])
    return jax.nn.relu(x + h)


# ---------------------------------------------------------------------------
# init


def _init_conv(key, kh, kw, cin, cout, dtype):
    wkey, _ = jax.random.split(key)
    fan_in = kh * kw * cin
    w = jax.random.normal(wkey, (kh, kw, cin, cout), dtype=jnp.float32)
    w = (w * math.sqrt(2.0 / fan_in)).astype(dtype)
    return {"w": w, "b": jnp.zeros((cout,), dtype=dtype)}


def _init_linear(key, din, dout, dtype):
    w = jax.random.normal(key, (din, dout), dtype=jnp.float32)
    w = (w * math.sqrt(1.0 / din)).astype(dtype)
    return w, jnp.zeros((dout,), dtype=jnp.float32)


def _init_block(key, dim, mlp_dim, dtype):
    keys = jax.random.split(key, 4)
    qkv_w, qkv_b = _init_linear(keys[0], dim, 3 * dim, dtype)
    proj_w, proj_b = _init_linear(keys[1], dim, dim, dtype)
    mlp_w1, mlp_b1 = _init_linear(keys[2], dim, mlp_dim, dtype)
    mlp_w2, mlp_b2 = _init_linear(keys[3], mlp_dim, dim, dtype)
    ones = jnp.ones((dim,), jnp.float32)
    zeros = jnp.zeros((dim,), jnp.float32)
    return {
        "ln1_s": ones, "ln1_b": zeros, "ln2_s": ones, "ln2_b": zeros,
        "attn": {"qkv_w": qkv_w, "qkv_b": qkv_b, "proj_w": proj_w, "proj_b": proj_b},
        "mlp_w1": mlp_w1, "mlp_b1": mlp_b1, "mlp_w2": mlp_w2, "mlp_b2": mlp_b2,
    }


def init_encoder(key, cfg: NetConfig) -> Params:
    params: Params = {}
    keys = jax.random.split(key, 2 * len(cfg.stem_channels) + 2)
    cin = cfg.in_channels
    for i, cout in enumerate(cfg.stem_channels):
        ksize = 7 if i == 0 else 3
        params[f"stem{i}"] = _init_conv(keys[2 * i], ksize, ksize, cin, cout, cfg.dtype)
        res = {}
        c1 = _init_conv(keys[2 * i + 1], 3, 3, cout, cout, cfg.dtype)
        res["w1"], res["b1"] = c1["w"], c1["b"]
        c2 = _init_conv(jax.random.fold_in(keys[2 * i + 1], 1), 3, 3, cout, cout, cfg.dtype)
        res["w2"], res["b2"] = c2["w"], c2["b"]
        params[f"res{i}"] = res
        cin = cout
    return params


def apply_encoder(params: Params, x: jnp.ndarray, cfg: NetConfig) -> jnp.ndarray:
    """(N, 160, 160, 6) -> (N, 20, 20, C_last)."""
    h = x.astype(cfg.dtype)
    for i in range(len(cfg.stem_channels)):
        p = params[f"stem{i}"]
        h = jax.nn.relu(_conv(h, p["w"], p["b"], stride=2))
        h = _res_block(h, params[f"res{i}"])
    return h


def init_trunk(key, cfg: NetConfig, head_dims: dict[str, int]) -> Params:
    keys = jax.random.split(key, cfg.num_transformer_blocks + 3 + len(head_dims))
    params: Params = {
        "fuse": _init_conv(
            keys[0], 3, 3, 2 * cfg.stem_channels[-1], cfg.trunk_channels, cfg.dtype
        ),
        "pos_embed": (
            jax.random.normal(
                keys[1], (cfg.tokens_per_side**2, cfg.trunk_channels), jnp.float32
            )
            * 0.02
        ).astype(cfg.dtype),
        "ln_f_s": jnp.ones((cfg.trunk_channels,), jnp.float32),
        "ln_f_b": jnp.zeros((cfg.trunk_channels,), jnp.float32),
    }
    mlp_dim = int(cfg.trunk_channels * cfg.mlp_ratio)
    for i in range(cfg.num_transformer_blocks):
        params[f"block{i}"] = _init_block(keys[2 + i], cfg.trunk_channels, mlp_dim, cfg.dtype)
    for j, (name, dim) in enumerate(sorted(head_dims.items())):
        w, b = _init_linear(
            keys[2 + cfg.num_transformer_blocks + j], cfg.trunk_channels, dim, cfg.dtype
        )
        params[f"head_{name}"] = {"w": w, "b": b}
    return params


def apply_trunk(
    params: Params,
    feat_a: jnp.ndarray,
    feat_b: jnp.ndarray,
    cfg: NetConfig,
    head_names: tuple[str, ...],
) -> dict[str, jnp.ndarray]:
    """Fuse the two encoder maps, run the transformer, project heads (f32)."""
    h = jnp.concatenate([feat_a, feat_b], axis=-1)
    p = params["fuse"]
    h = jax.nn.relu(_conv(h, p["w"], p["b"], stride=2))  # (N, 10, 10, D)
    n, th, tw, d = h.shape
    tokens = h.reshape(n, th * tw, d) + params["pos_embed"][None]
    for i in range(cfg.num_transformer_blocks):
        tokens = _transformer_block(tokens, params[f"block{i}"], cfg.num_heads)
    tokens = _layer_norm(tokens, params["ln_f_s"], params["ln_f_b"])
    pooled = tokens.mean(axis=1).astype(jnp.float32)  # (N, D)
    out = {}
    for name in head_names:
        hp = params[f"head_{name}"]
        out[name] = jnp.dot(
            pooled, hp["w"].astype(jnp.float32), preferred_element_type=jnp.float32
        ) + hp["b"].astype(jnp.float32)
    return out


# ---------------------------------------------------------------------------
# the two models


REFINER_HEADS = {"trans": 3, "rot": 3}
SCORER_HEADS = {"scores": 1}


def init_refiner(seed: int = 0, cfg: NetConfig = NetConfig()) -> Params:
    key = jax.random.PRNGKey(seed)
    k_enc, k_trunk = jax.random.split(key)
    return {
        "encoder": init_encoder(k_enc, cfg),
        "trunk": init_trunk(k_trunk, cfg, REFINER_HEADS),
    }


def init_scorer(seed: int = 1, cfg: NetConfig = NetConfig()) -> Params:
    key = jax.random.PRNGKey(seed)
    k_enc, k_trunk = jax.random.split(key)
    return {
        "encoder": init_encoder(k_enc, cfg),
        "trunk": init_trunk(k_trunk, cfg, SCORER_HEADS),
    }


def apply_refiner(
    params: Params,
    render_input: jnp.ndarray,
    transf_input: jnp.ndarray,
    cfg: NetConfig = NetConfig(),
) -> dict[str, jnp.ndarray]:
    """Blob contract: (N,160,160,6) x2 -> {'trans': (N,3), 'rot': (N,3)}."""
    feat_a = apply_encoder(params["encoder"], render_input, cfg)
    feat_b = apply_encoder(params["encoder"], transf_input, cfg)
    return apply_trunk(params["trunk"], feat_a, feat_b, cfg, ("trans", "rot"))


def apply_scorer(
    params: Params,
    render_input: jnp.ndarray,
    transf_input: jnp.ndarray,
    cfg: NetConfig = NetConfig(),
) -> dict[str, jnp.ndarray]:
    """Blob contract: (N,160,160,6) x2 -> {'scores': (N,1)}."""
    feat_a = apply_encoder(params["encoder"], render_input, cfg)
    feat_b = apply_encoder(params["encoder"], transf_input, cfg)
    return apply_trunk(params["trunk"], feat_a, feat_b, cfg, ("scores",))


def count_params(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))

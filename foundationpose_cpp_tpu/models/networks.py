"""Refiner / scorer networks: the published FoundationPose graphs in JAX.

The reference treats both nets as opaque ONNX->TensorRT engines with a fixed
blob contract (SURVEY.md SS2.8, /root/reference/tools/cvt_onnx2trt.bash:3-15,
blob names /root/reference/detection_6d_foundationpose/src/foundationpose.cpp:78-83):

  refiner: render_input, transf_input [N,160,160,6] NHWC -> trans [N,3], rot [N,3]
  scorer:  render_input, transf_input [N,160,160,6] NHWC -> scores [N,1]

Those engines are exports of NVIDIA FoundationPose's ``RefineNet`` and
``ScoreNetMultiPair`` (NVlabs/FoundationPose ``learning/models/
{refine_network,score_network}.py``). This module implements that topology
layer-for-layer, TPU-first:

  encodeA  (siamese, shared):  ConvBNReLU(6->64, 7x7, s2)
                               ConvBNReLU(64->128, 3x3, s2)
                               ResnetBasicBlock(128)
  encodeAB (on concat A||B):   ResnetBasicBlock(256)
                               ConvBNReLU(256->512, 3x3, s2)
                               ResnetBasicBlock(512)
  tokens:  (160/8)^2 = 400 spatial tokens of dim 512
           + sinusoidal positional embedding (max_len 400)
  encoder: 1x post-norm TransformerEncoderLayer (4 heads, FFN 512, ReLU)
  pool:    mean over tokens
  heads:   refiner Linear(512->3) x2 (trans, rot); scorer Linear(512->1)

TPU-first choices (vs a torch translation):
  * BatchNorm is FOLDED into the convolutions at weight-conversion time
    (tools/convert_onnx.py) -- inference never pays a separate normalize,
    and XLA fuses conv+bias+relu into single MXU-friendly fusions.
  * Everything runs NHWC bf16 on the MXU with f32 accumulation
    (``preferred_element_type``); heads emit f32.
  * The two siamese encoder passes are one conv over a 2N batch (same trick
    as torch.cat([A,B],0) in the original) so MXU tiles stay full.
  * Params are a plain pytree + pure apply fn so the pipeline inlines both
    nets into its single compiled Register program (no engine boundary).

The scorer optionally carries the "MultiPair" cross-hypothesis attention
(one more encoder layer over the N pooled features); the converter enables
it when the checkpoint contains ``att_cross.*`` tensors.

Weights come from the published FoundationPose checkpoints via
tools/convert_onnx.py (torch .pth or ONNX; distribution is out-of-band,
reference README.md:72). Without them the nets run with seeded random
weights of the exact same topology, which keeps shapes/dtypes/flops honest
for benchmarking (~6.5 GMAC per hypothesis pair at 160x160).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from foundationpose_cpp_tpu.ops import attention_pallas

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class NetConfig:
    """Published-graph dimensions (defaults) with toy-scale knobs for CI.

    Defaults pin the NVlabs FoundationPose RefineNet/ScoreNetMultiPair
    shapes; tests shrink width1/width2/embed_dim/crop_hw to run on CPU.
    """

    in_channels: int = 6
    width1: int = 64        # encodeA conv1 (7x7, stride 2)
    width2: int = 128       # encodeA conv2 (3x3, stride 2) + res block
    embed_dim: int = 512    # encodeAB output channels / transformer d_model
    num_heads: int = 4
    ffn_dim: int = 512      # TransformerEncoderLayer dim_feedforward
    num_encoder_layers: int = 1
    crop_hw: int = 160
    cross_attention: bool = False  # scorer ScoreNetMultiPair att_cross
    dtype: Any = jnp.bfloat16
    # attention core implementation: "auto" picks the whole-head Pallas
    # kernel (ops/attention_pallas.py) when tracing for TPU and the shape
    # fits its VMEM budget, else the XLA einsum path. "xla" forces the
    # einsum path (parity oracles, CPU). "pallas"/"pallas_interpret" force
    # the kernel (the latter interpreted, for CPU tests).
    attn_impl: str = "auto"

    @property
    def tokens_per_side(self) -> int:
        # three stride-2 convs: crop_hw / 8 (160 -> 20; max_len 400 tokens)
        return self.crop_hw // 8

    @property
    def num_tokens(self) -> int:
        return self.tokens_per_side**2


# ---------------------------------------------------------------------------
# primitives


def _conv(x, w, b, stride=1):
    """NHWC conv + bias (BN pre-folded), f32 accumulation on the MXU.

    Padding is torch-style symmetric (k-1)//2 -- NOT XLA "SAME", which pads
    asymmetrically for stride 2 and would break weight parity with the
    published checkpoints.
    """
    kh, kw = w.shape[0], w.shape[1]
    pad = ((kh - 1) // 2, (kh - 1) // 2), ((kw - 1) // 2, (kw - 1) // 2)
    out = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (out + b.astype(jnp.float32)).astype(x.dtype)


def _conv_relu(x, p, stride=1):
    """ConvBNReLU (network_modules.py) with BN folded into (w, b)."""
    return jax.nn.relu(_conv(x, p["w"], p["b"], stride=stride))


def _conv0_s2d(x, w, b):
    """The 7x7/stride-2 stem conv as a space-to-depth 4x4/stride-1 conv.

    Mathematically identical to _conv(x, w, b, stride=2) with torch pad 3
    (tests/test_training.py pins the equivalence). Kept as a measured
    NEGATIVE result: the direct stem runs at ~10% MXU utilization (cin=6,
    strided 7x7), but on v5e the 2x2-pixel blocking shuffle costs more than
    the denser 4x4x24 contraction saves (encodeA 9.7 -> 10.9 ms at 2x252;
    tools/bench_attn.py is the harness). Weights stay in the published
    7x7x6x64 layout and are reshaped on the fly.

    Derivation: out[o] = sum_i xpad[2o+i] w[i], i in 0..6, pad 3. Writing
    the padded row index as 2(o+d)+r (block d = o..o+3, parity r) gives
    i = 2d+r, i.e. a VALID 4-tap conv over 2x2-blocked pixels with the
    8th (zero-padded) tap never read.
    """
    kh, kw, c, o = w.shape
    n, h, wd, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))  # (N, H+6, W+6, C)
    hp, wp = h + 6, wd + 6
    xb = xp.reshape(n, hp // 2, 2, wp // 2, 2, c)
    xb = xb.transpose(0, 1, 3, 2, 4, 5).reshape(n, hp // 2, wp // 2, 4 * c)
    w8 = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))  # 7 -> 8 taps
    wb = (
        w8.reshape(4, 2, 4, 2, c, o)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(4, 4, 4 * c, o)
    )
    out = jax.lax.conv_general_dilated(
        xb,
        wb.astype(xb.dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (out + b.astype(jnp.float32)).astype(x.dtype)


def _res_block(x, p):
    """ResnetBasicBlock (network_modules.py): conv-bn-relu-conv-bn + skip."""
    h = jax.nn.relu(_conv(x, p["w1"], p["b1"]))
    h = _conv(h, p["w2"], p["b2"])
    return jax.nn.relu(x + h)


def _layer_norm(x, scale, bias, eps=1e-5):
    """torch.nn.LayerNorm semantics (eps 1e-5), f32 statistics."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def _linear(x, w, b):
    out = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    return (out + b.astype(jnp.float32)).astype(x.dtype)


def _use_pallas_attn(attn_impl, num_heads, t, hd, dtype):
    """Trace-time choice of the attention core (see NetConfig.attn_impl)."""
    if attn_impl in ("pallas", "pallas_interpret"):
        return True
    if attn_impl != "auto":
        return False
    return (
        jax.default_backend() == "tpu"
        and attention_pallas.fits_vmem(num_heads, t, hd, jnp.dtype(dtype).itemsize)
    )


def _self_attention(x, p, num_heads, attn_impl="auto"):
    """torch.nn.MultiheadAttention forward (packed in_proj, scaled dot).

    The attention core (logits, softmax, weighted sum) runs as the
    whole-head Pallas kernel on TPU (ops/attention_pallas.py -- logits
    stay in VMEM; 8.2 -> ~3 ms per encoder layer at refiner shapes). The
    XLA fallback keeps the earlier tuning: bf16 inputs emit bf16 logits
    (MXU still accumulates f32; only the output rounds) and upcast inside
    the softmax -- at N=252, T=400 the f32 logits tensor is 645 MB of HBM
    traffic and the bf16 variant measures 13.6 -> 9.4 ms per layer
    (tools/bench_attn.py). f32 inputs (training, parity oracles) keep
    full-precision logits.
    """
    n, t, d = x.shape
    hd = d // num_heads
    qkv = _linear(x, p["qkv_w"], p["qkv_b"])  # (N, T, 3D)
    use_pallas = _use_pallas_attn(attn_impl, num_heads, t, hd, x.dtype)
    if use_pallas and hd % 128 == 0:
        # packed-qkv kernel: heads are lane slices of the projection, so
        # the (N, T, 3D) -> (N, H, T, hd) transposes (and the output
        # un-transpose) never exist -- they cost more than the attention
        # core at production shapes (tools/bench_attn.py)
        out = attention_pallas.mha_packed_qkv(
            qkv, num_heads,
            scale=1.0 / math.sqrt(hd),
            interpret=attn_impl == "pallas_interpret",
        )
        return _linear(out, p["proj_w"], p["proj_b"])
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(a):
        return a.reshape(n, t, num_heads, hd).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    if use_pallas:
        out = attention_pallas.mha_whole_head(
            q, k, v,
            scale=1.0 / math.sqrt(hd),
            interpret=attn_impl == "pallas_interpret",
        )
    else:
        logits_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
        logits = jnp.einsum(
            "nhqd,nhkd->nhqk", q, k, preferred_element_type=logits_dtype
        )
        attn = jax.nn.softmax(
            logits.astype(jnp.float32) / math.sqrt(hd), axis=-1
        ).astype(x.dtype)
        out = jnp.einsum(
            "nhqk,nhkd->nhqd", attn, v, preferred_element_type=jnp.float32
        )
    out = out.transpose(0, 2, 1, 3).reshape(n, t, d).astype(x.dtype)
    return _linear(out, p["proj_w"], p["proj_b"])


def _encoder_layer(x, p, num_heads, attn_impl="auto"):
    """Post-norm (norm_first=False) TransformerEncoderLayer, ReLU FFN.

    torch: x = norm1(x + attn(x)); x = norm2(x + linear2(relu(linear1(x))))
    """
    x = _layer_norm(
        x + _self_attention(x, p["attn"], num_heads, attn_impl),
        p["ln1_s"], p["ln1_b"],
    )
    h = jax.nn.relu(_linear(x, p["mlp_w1"], p["mlp_b1"]))
    h = _linear(h, p["mlp_w2"], p["mlp_b2"])
    return _layer_norm(x + h, p["ln2_s"], p["ln2_b"])


def sinusoidal_position_table(max_len: int, d_model: int) -> np.ndarray:
    """The PositionalEmbedding buffer (network_modules.py): sin/cos table."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64) * -(math.log(10000.0) / d_model)
    )
    pe = np.zeros((max_len, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe.astype(np.float32)


# ---------------------------------------------------------------------------
# init (random weights, exact published topology)


def _init_conv(key, kh, kw, cin, cout, dtype):
    fan_in = kh * kw * cin
    w = jax.random.normal(key, (kh, kw, cin, cout), dtype=jnp.float32)
    w = (w * math.sqrt(2.0 / fan_in)).astype(dtype)
    return {"w": w, "b": jnp.zeros((cout,), jnp.float32)}


def _init_res(key, ch, dtype):
    k1, k2 = jax.random.split(key)
    c1 = _init_conv(k1, 3, 3, ch, ch, dtype)
    c2 = _init_conv(k2, 3, 3, ch, ch, dtype)
    return {"w1": c1["w"], "b1": c1["b"], "w2": c2["w"], "b2": c2["b"]}


def _init_linear(key, din, dout, dtype):
    w = jax.random.normal(key, (din, dout), dtype=jnp.float32)
    w = (w * math.sqrt(1.0 / din)).astype(dtype)
    return w, jnp.zeros((dout,), jnp.float32)


def _init_encoder_layer(key, dim, ffn_dim, dtype):
    keys = jax.random.split(key, 4)
    qkv_w, qkv_b = _init_linear(keys[0], dim, 3 * dim, dtype)
    proj_w, proj_b = _init_linear(keys[1], dim, dim, dtype)
    mlp_w1, mlp_b1 = _init_linear(keys[2], dim, ffn_dim, dtype)
    mlp_w2, mlp_b2 = _init_linear(keys[3], ffn_dim, dim, dtype)
    ones = jnp.ones((dim,), jnp.float32)
    zeros = jnp.zeros((dim,), jnp.float32)
    return {
        "attn": {"qkv_w": qkv_w, "qkv_b": qkv_b, "proj_w": proj_w, "proj_b": proj_b},
        "ln1_s": ones, "ln1_b": zeros, "ln2_s": ones, "ln2_b": zeros,
        "mlp_w1": mlp_w1, "mlp_b1": mlp_b1, "mlp_w2": mlp_w2, "mlp_b2": mlp_b2,
    }


def _init_backbone(key, cfg: NetConfig, head_dims: dict[str, int],
                   cross_attention: bool) -> Params:
    keys = jax.random.split(key, 8 + cfg.num_encoder_layers + len(head_dims))
    d = cfg.dtype
    params: Params = {
        # encodeA: ConvBNReLU(7,s2) -> ConvBNReLU(3,s2) -> ResnetBasicBlock
        "encodeA": {
            "conv0": _init_conv(keys[0], 7, 7, cfg.in_channels, cfg.width1, d),
            "conv1": _init_conv(keys[1], 3, 3, cfg.width1, cfg.width2, d),
            "res": _init_res(keys[2], cfg.width2, d),
        },
        # encodeAB: ResnetBasicBlock -> ConvBNReLU(3,s2) -> ResnetBasicBlock
        "encodeAB": {
            "res0": _init_res(keys[3], 2 * cfg.width2, d),
            "conv": _init_conv(keys[4], 3, 3, 2 * cfg.width2, cfg.embed_dim, d),
            "res1": _init_res(keys[5], cfg.embed_dim, d),
        },
        "pos_embed": jnp.asarray(
            sinusoidal_position_table(cfg.num_tokens, cfg.embed_dim)
        ),
        "encoder": [
            _init_encoder_layer(keys[6 + i], cfg.embed_dim, cfg.ffn_dim, d)
            for i in range(cfg.num_encoder_layers)
        ],
    }
    off = 6 + cfg.num_encoder_layers
    if cross_attention:
        params["att_cross"] = _init_encoder_layer(
            keys[off], cfg.embed_dim, cfg.ffn_dim, d
        )
    off += 1
    for j, (name, dim) in enumerate(sorted(head_dims.items())):
        w, b = _init_linear(keys[off + j], cfg.embed_dim, dim, d)
        params[f"head_{name}"] = {"w": w, "b": b}
    return params


# ---------------------------------------------------------------------------
# apply


def apply_encoder(params: Params, x: jnp.ndarray, cfg: NetConfig) -> jnp.ndarray:
    """encodeA: (M, crop, crop, 6) -> (M, crop/4, crop/4, width2)."""
    p = params["encodeA"]
    h = x.astype(cfg.dtype)
    h = _conv_relu(h, p["conv0"], stride=2)
    h = _conv_relu(h, p["conv1"], stride=2)
    return _res_block(h, p["res"])


def _apply_backbone(
    params: Params,
    render_input: jnp.ndarray,
    transf_input: jnp.ndarray,
    cfg: NetConfig,
    head_names: tuple[str, ...],
    cross_attention: bool,
    group_size: int | None = None,
    axis_name: str | None = None,
) -> dict[str, jnp.ndarray]:
    n = render_input.shape[0]
    # siamese encode over a 2N batch (torch.cat([A,B],0) in the original)
    both = jnp.concatenate([render_input, transf_input], axis=0)
    feats = apply_encoder(params, both, cfg)
    ab = jnp.concatenate([feats[:n], feats[n:]], axis=-1)  # channel concat
    p = params["encodeAB"]
    ab = _res_block(ab, p["res0"])
    ab = _conv_relu(ab, p["conv"], stride=2)
    ab = _res_block(ab, p["res1"])  # (N, crop/8, crop/8, D)
    _, th, tw, d = ab.shape
    # torch flattens (H, W) channels-first then permutes: token t = y*W + x,
    # identical to an NHWC reshape.
    tokens = ab.reshape(n, th * tw, d) + params["pos_embed"][None].astype(cfg.dtype)
    for layer in params["encoder"]:
        tokens = _encoder_layer(tokens, layer, cfg.num_heads, cfg.attn_impl)
    pooled = tokens.mean(axis=1)  # (N, D)
    n_local = pooled.shape[0]
    if cross_attention and "att_cross" in params:
        # ScoreNetMultiPair: one encoder layer attending ACROSS the
        # hypotheses of one scene (sequence axis = pose batch). At
        # inference the whole batch is one scene (group_size=None); the
        # trainer packs several scenes per batch and passes their size so
        # attention never crosses scene boundaries.
        #
        # Under multi-chip SPMD (axis_name set, called inside shard_map with
        # the hypothesis axis sharded) the heavy per-hypothesis backbone
        # above runs on local shards; only the pooled (N, D) embeddings --
        # a few hundred KB -- ride one all-gather over ICI so the cross
        # layer still sees every hypothesis, exactly like single-chip.
        if axis_name is not None:
            pooled = jax.lax.all_gather(
                pooled, axis_name, axis=0, tiled=True
            )  # (N_total, D), device order == hyp-shard order
        d = pooled.shape[-1]
        seq = pooled[None] if group_size is None else pooled.reshape(
            -1, group_size, d
        )
        pooled = _encoder_layer(
            seq, params["att_cross"], cfg.num_heads, cfg.attn_impl
        ).reshape(pooled.shape)
    pooled = pooled.astype(jnp.float32)
    out = {}
    for name in head_names:
        hp = params[f"head_{name}"]
        out[name] = jnp.dot(
            pooled, hp["w"].astype(jnp.float32), preferred_element_type=jnp.float32
        ) + hp["b"].astype(jnp.float32)
    if axis_name is not None and pooled.shape[0] != n_local:
        # slice the replicated post-gather head outputs back to this
        # device's hypothesis shard so out_specs stay P(axis)
        i = jax.lax.axis_index(axis_name)
        out = {
            k: jax.lax.dynamic_slice_in_dim(v, i * n_local, n_local, 0)
            for k, v in out.items()
        }
    return out


# ---------------------------------------------------------------------------
# the two models (blob contract of foundationpose.cpp:78-83)


REFINER_HEADS = {"trans": 3, "rot": 3}
SCORER_HEADS = {"scores": 1}


def init_refiner(seed: int = 0, cfg: NetConfig = NetConfig()) -> Params:
    return _init_backbone(
        jax.random.PRNGKey(seed), cfg, REFINER_HEADS, cross_attention=False
    )


def init_scorer(seed: int = 1, cfg: NetConfig = NetConfig()) -> Params:
    return _init_backbone(
        jax.random.PRNGKey(seed), cfg, SCORER_HEADS,
        cross_attention=cfg.cross_attention,
    )


def apply_refiner(
    params: Params,
    render_input: jnp.ndarray,
    transf_input: jnp.ndarray,
    cfg: NetConfig = NetConfig(),
) -> dict[str, jnp.ndarray]:
    """RefineNet: (N,160,160,6) x2 -> {'trans': (N,3), 'rot': (N,3)} (raw).

    The tanh * 0.349 rot normalization happens in the pipeline's pose
    composition (geometry/transforms.py), matching foundationpose.cpp:384-390
    where it is applied OUTSIDE the engine.
    """
    return _apply_backbone(
        params, render_input, transf_input, cfg, ("trans", "rot"),
        cross_attention=False,
    )


def apply_scorer(
    params: Params,
    render_input: jnp.ndarray,
    transf_input: jnp.ndarray,
    cfg: NetConfig = NetConfig(),
    group_size: int | None = None,
    axis_name: str | None = None,
) -> dict[str, jnp.ndarray]:
    """ScoreNet(MultiPair): (N,160,160,6) x2 -> {'scores': (N,1)} logits.

    The MultiPair cross-hypothesis layer engages when the checkpoint
    carries it (att_cross tensors), matching the converter's auto-detect
    -- a loaded MultiPair checkpoint works without flipping the config.

    axis_name: mesh axis the hypothesis batch is sharded over when called
    inside shard_map (parallel/sharding.py); the cross layer then
    all-gathers pooled embeddings so multi-chip scoring matches single-chip.
    """
    return _apply_backbone(
        params, render_input, transf_input, cfg, ("scores",),
        cross_attention=cfg.cross_attention or "att_cross" in params,
        group_size=group_size,
        axis_name=axis_name,
    )


def count_params(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def flops_per_pair(cfg: NetConfig = NetConfig()) -> int:
    """MAC count per hypothesis pair (honesty check for bench numbers)."""
    s1 = cfg.crop_hw // 2   # after conv0
    s2 = cfg.crop_hw // 4   # after conv1 / res
    s3 = cfg.crop_hw // 8   # after encodeAB conv
    c1, c2, d = cfg.width1, cfg.width2, cfg.embed_dim
    t = cfg.num_tokens
    enc_a = (
        s1 * s1 * c1 * 49 * cfg.in_channels
        + s2 * s2 * c2 * 9 * c1
        + 2 * s2 * s2 * c2 * 9 * c2
    ) * 2  # two crops
    enc_ab = (
        2 * s2 * s2 * (2 * c2) * 9 * (2 * c2)
        + s3 * s3 * d * 9 * (2 * c2)
        + 2 * s3 * s3 * d * 9 * d
    )
    xf = cfg.num_encoder_layers * (
        4 * t * d * d + 2 * t * t * d + 2 * t * d * cfg.ffn_dim
    )
    return enc_a + enc_ab + xf

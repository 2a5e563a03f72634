"""Convert published FoundationPose checkpoints into this package's pytrees.

The reference consumes the NVlabs FoundationPose refiner/scorer as opaque
ONNX->TensorRT engines (/root/reference/tools/cvt_onnx2trt.bash:3-15, blob
contract foundationpose.cpp:78-83). The graphs are exports of
``RefineNet`` / ``ScoreNetMultiPair`` (NVlabs/FoundationPose
``learning/models/{refine_network,score_network}.py``), whose torch module
tree is:

    encodeA.0      ConvBNReLU(c_in -> 64, k7, s2)      (conv + BN + ReLU)
    encodeA.1      ConvBNReLU(64 -> 128, k3, s2)
    encodeA.2      ResnetBasicBlock(128)               (conv1 bn1 conv2 bn2)
    encodeAB.0     ResnetBasicBlock(256)
    encodeAB.1     ConvBNReLU(256 -> 512, k3, s2)
    encodeAB.2     ResnetBasicBlock(512)
    pos_embed.pe   sinusoidal buffer (1, 400, 512)
    encoder.layers.{i}.{self_attn,linear1,linear2,norm1,norm2}
    trans_head.0 / rot_head.0 / score_head.0   Linear heads
    att_cross.*    (scorer MultiPair cross-hypothesis layer, optional)

This module maps every tensor of such a state dict BY NAME onto the pytree
produced by :mod:`foundationpose_cpp_tpu.models.networks`, performing the
TPU-side graph rewrites:

  * BatchNorm is folded into the preceding conv (w' = w * g/sqrt(v+eps),
    b' = beta + (b - mu) * g/sqrt(v+eps)) so the runtime never normalizes.
  * torch OIHW conv weights -> JAX HWIO; torch (out,in) linears -> (in,out).
  * ``in_proj_weight`` (3D, D) -> transposed packed qkv (D, 3D); the q/k/v
    column order is preserved (torch packs q,k,v along dim 0).
  * conv/linear weights cast to cfg.dtype (bf16); biases/LN params stay f32.

Conversion is STRICT: every source tensor must be consumed (except
``num_batches_tracked``), every target leaf must be written exactly once,
and every shape must match -- any unknown, missing, ambiguous or
mis-shaped tensor raises ``ConversionError`` listing the offenders. There
is no shape-greedy guessing: a checkpoint that does not follow the
published naming fails loudly instead of producing a silent garbage
checkpoint.
"""

from __future__ import annotations

import logging
import re
from typing import Any, Mapping

import numpy as np

from foundationpose_cpp_tpu.models import networks

logger = logging.getLogger("foundationpose_cpp_tpu")

Array = np.ndarray


class ConversionError(RuntimeError):
    pass


_BN_EPS = 1e-5  # torch.nn.BatchNorm2d default
_IGNORED = ("num_batches_tracked",)

# Accept both ConvBNReLU naming styles seen in the lineage of
# network_modules.py: nn.Sequential children ('.0.' conv, '.1.' bn) and
# attribute children ('.conv.', '.bn.').
_CONV_ALIASES = {"0": "conv", "conv": "conv", "1": "bn", "bn": "bn"}


def _strip_prefixes(sd: Mapping[str, Array]) -> dict[str, Array]:
    out = {}
    for k, v in sd.items():
        for pre in ("module.", "model."):
            while k.startswith(pre):
                k = k[len(pre):]
        out[k] = np.asarray(v)
    return out


def _conv_hwio(w: Array) -> Array:
    if w.ndim != 4:
        raise ConversionError(f"conv weight must be 4-D OIHW, got {w.shape}")
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _fold_bn(
    w_oihw: Array,
    b: Array | None,
    bn: dict[str, Array] | None,
    where: str,
) -> tuple[Array, Array]:
    """Fold an optional BatchNorm into (HWIO weight, f32 bias)."""
    o = w_oihw.shape[0]
    bias = np.zeros((o,), np.float64) if b is None else b.astype(np.float64)
    w = w_oihw.astype(np.float64)
    if bn is not None:
        missing = {"weight", "bias", "running_mean", "running_var"} - set(bn)
        if missing:
            raise ConversionError(f"{where}: BN tensors missing {sorted(missing)}")
        scale = bn["weight"].astype(np.float64) / np.sqrt(
            bn["running_var"].astype(np.float64) + _BN_EPS
        )
        w = w * scale[:, None, None, None]
        bias = bn["bias"].astype(np.float64) + (bias - bn["running_mean"]) * scale
    return _conv_hwio(w), bias.astype(np.float32)


class _Collector:
    """Groups the flat state dict by unit, tracking consumption strictly."""

    def __init__(self, sd: Mapping[str, Array]):
        self.sd = dict(sd)
        self.consumed: set[str] = set()

    def take(self, key: str, where: str, optional: bool = False) -> Array | None:
        if key not in self.sd:
            if optional:
                return None
            raise ConversionError(f"{where}: missing tensor '{key}'")
        self.consumed.add(key)
        return self.sd[key]

    def take_conv_bn(self, base: str, styles=("0", "conv")) -> tuple[Array, Array]:
        """Read a ConvBNReLU unit at `base` in either naming style."""
        for conv_name, bn_name in ((styles[0], "1"), (styles[1], "bn")):
            wkey = f"{base}.{conv_name}.weight"
            if wkey in self.sd:
                w = self.take(wkey, base)
                b = self.take(f"{base}.{conv_name}.bias", base, optional=True)
                bn = None
                if f"{base}.{bn_name}.running_mean" in self.sd:
                    bn = {
                        f: self.take(f"{base}.{bn_name}.{f}", base)
                        for f in ("weight", "bias", "running_mean", "running_var")
                    }
                return _fold_bn(w, b, bn, base)
        raise ConversionError(
            f"{base}: no conv weight found (tried "
            f"{base}.0.weight and {base}.conv.weight)"
        )

    def take_res_block(self, base: str) -> dict[str, Array]:
        """ResnetBasicBlock: conv1(+bn1), conv2(+bn2)."""
        out = {}
        for i in (1, 2):
            w = self.take(f"{base}.conv{i}.weight", base)
            b = self.take(f"{base}.conv{i}.bias", base, optional=True)
            bn = None
            if f"{base}.bn{i}.running_mean" in self.sd:
                bn = {
                    f: self.take(f"{base}.bn{i}.{f}", base)
                    for f in ("weight", "bias", "running_mean", "running_var")
                }
            wf, bf = _fold_bn(w, b, bn, f"{base}.conv{i}")
            out[f"w{i}"], out[f"b{i}"] = wf, bf
        if any(k.startswith(f"{base}.downsample") for k in self.sd):
            raise ConversionError(
                f"{base}: downsample branch present; published blocks are "
                "identity-skip (stride 1, equal channels) -- unsupported"
            )
        return out

    def take_encoder_layer(self, base: str) -> dict[str, Any]:
        """torch TransformerEncoderLayer -> our encoder-layer dict."""
        in_w = self.take(f"{base}.self_attn.in_proj_weight", base)
        in_b = self.take(f"{base}.self_attn.in_proj_bias", base)
        out_w = self.take(f"{base}.self_attn.out_proj.weight", base)
        out_b = self.take(f"{base}.self_attn.out_proj.bias", base)
        return {
            "attn": {
                "qkv_w": np.ascontiguousarray(in_w.T),
                "qkv_b": in_b.astype(np.float32),
                "proj_w": np.ascontiguousarray(out_w.T),
                "proj_b": out_b.astype(np.float32),
            },
            "ln1_s": self.take(f"{base}.norm1.weight", base).astype(np.float32),
            "ln1_b": self.take(f"{base}.norm1.bias", base).astype(np.float32),
            "ln2_s": self.take(f"{base}.norm2.weight", base).astype(np.float32),
            "ln2_b": self.take(f"{base}.norm2.bias", base).astype(np.float32),
            "mlp_w1": np.ascontiguousarray(self.take(f"{base}.linear1.weight", base).T),
            "mlp_b1": self.take(f"{base}.linear1.bias", base).astype(np.float32),
            "mlp_w2": np.ascontiguousarray(self.take(f"{base}.linear2.weight", base).T),
            "mlp_b2": self.take(f"{base}.linear2.bias", base).astype(np.float32),
        }

    def take_head(self, base: str) -> dict[str, Array]:
        """Linear head, either `head.0.weight` (Sequential) or `head.weight`."""
        for key in (f"{base}.0.weight", f"{base}.weight"):
            if key in self.sd:
                w = self.take(key, base)
                b = self.take(key[:-6] + "bias", base)
                return {"w": np.ascontiguousarray(w.T), "b": b.astype(np.float32)}
        raise ConversionError(f"{base}: no head weight found")

    def unconsumed(self) -> list[str]:
        return sorted(
            k for k in self.sd
            if k not in self.consumed and not k.endswith(_IGNORED)
        )


def infer_net_config(
    sd: Mapping[str, Array], crop_hw: int = 160
) -> networks.NetConfig:
    """Derive NetConfig dimensions from the checkpoint itself."""
    sd = _strip_prefixes(sd)
    col = _Collector(sd)

    def conv_out(base):
        for k in (f"{base}.0.weight", f"{base}.conv.weight"):
            if k in sd:
                return sd[k].shape
        raise ConversionError(f"cannot find conv weight under {base}")

    s0 = conv_out("encodeA.0")  # (width1, c_in, 7, 7)
    s1 = conv_out("encodeA.1")  # (width2, width1, 3, 3)
    s2 = conv_out("encodeAB.1")  # (embed_dim, 2*width2, 3, 3)
    n_layers = len({
        m.group(1) for k in sd
        if (m := re.match(r"encoder\.layers\.(\d+)\.", k))
    })
    ffn = sd["encoder.layers.0.linear1.weight"].shape[0]
    heads_present = [h for h in ("trans_head", "rot_head", "score_head")
                     if any(k.startswith(h) for k in sd)]
    del col, heads_present
    return networks.NetConfig(
        in_channels=int(s0[1]), width1=int(s0[0]), width2=int(s1[0]),
        embed_dim=int(s2[0]), ffn_dim=int(ffn),
        num_encoder_layers=max(1, n_layers), crop_hw=crop_hw,
        cross_attention=any(k.startswith("att_cross") for k in sd),
    )


def convert_state_dict(
    sd: Mapping[str, Array],
    model: str,
    cfg: networks.NetConfig | None = None,
) -> tuple[networks.Params, networks.NetConfig]:
    """Map a FoundationPose torch state dict onto our params pytree.

    Returns (params, cfg). Raises ConversionError on ANY unknown, missing,
    or mis-shaped tensor.
    """
    import jax.numpy as jnp

    if model not in ("refiner", "scorer"):
        raise ValueError(f"model must be 'refiner' or 'scorer', got {model!r}")
    sd = _strip_prefixes(sd)
    if cfg is None:
        cfg = infer_net_config(sd)
    col = _Collector(sd)

    params: dict[str, Any] = {}
    ca0w, ca0b = col.take_conv_bn("encodeA.0")
    ca1w, ca1b = col.take_conv_bn("encodeA.1")
    params["encodeA"] = {
        "conv0": {"w": ca0w, "b": ca0b},
        "conv1": {"w": ca1w, "b": ca1b},
        "res": col.take_res_block("encodeA.2"),
    }
    cabw, cabb = col.take_conv_bn("encodeAB.1")
    params["encodeAB"] = {
        "res0": col.take_res_block("encodeAB.0"),
        "conv": {"w": cabw, "b": cabb},
        "res1": col.take_res_block("encodeAB.2"),
    }
    pe = col.take("pos_embed.pe", "pos_embed", optional=True)
    if pe is None:
        pe = networks.sinusoidal_position_table(cfg.num_tokens, cfg.embed_dim)
    else:
        pe = pe.reshape(pe.shape[-2], pe.shape[-1])  # (1, T, D) -> (T, D)
        ref = networks.sinusoidal_position_table(pe.shape[0], pe.shape[1])
        if not np.allclose(pe, ref, atol=1e-4):
            raise ConversionError(
                "pos_embed.pe does not match the sinusoidal table -- "
                "unexpected positional-embedding variant"
            )
        pe = pe[: cfg.num_tokens]
    params["pos_embed"] = pe.astype(np.float32)
    params["encoder"] = [
        col.take_encoder_layer(f"encoder.layers.{i}")
        for i in range(cfg.num_encoder_layers)
    ]
    if any(k.startswith("att_cross") for k in sd):
        base = (
            "att_cross.layers.0"
            if any(k.startswith("att_cross.layers.0") for k in sd)
            else "att_cross"
        )
        params["att_cross"] = col.take_encoder_layer(base)
    head_map = {"refiner": {"trans": "trans_head", "rot": "rot_head"},
                "scorer": {"scores": "score_head"}}[model]
    for ours, theirs in head_map.items():
        params[f"head_{ours}"] = col.take_head(theirs)

    leftovers = col.unconsumed()
    if leftovers:
        raise ConversionError(
            f"{len(leftovers)} checkpoint tensors not consumed by the "
            f"mapping (unknown layout?): {leftovers[:20]}"
        )

    # cast to the runtime dtype policy and validate against the init skeleton
    def cast(path, x):
        name = path[-1]
        is_matmul = name in ("w", "w1", "w2", "qkv_w", "proj_w", "mlp_w1", "mlp_w2")
        return jnp.asarray(x, dtype=cfg.dtype if is_matmul else jnp.float32)

    params = _tree_map_with_path(cast, params)
    skeleton = (
        networks.init_refiner(0, cfg) if model == "refiner"
        else networks.init_scorer(0, cfg)
    )
    _check_same_structure(skeleton, params)
    return params, cfg


def _tree_map_with_path(fn, tree, path=()):
    if isinstance(tree, dict):
        return {k: _tree_map_with_path(fn, v, path + (k,)) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_tree_map_with_path(fn, v, path + (str(i),)) for i, v in enumerate(tree)]
    return fn(path, tree)


def _check_same_structure(ref, got, path=""):
    """Verify the converted pytree matches the init skeleton leaf-for-leaf."""
    if isinstance(ref, dict) != isinstance(got, dict) or (
        isinstance(ref, list) != isinstance(got, list)
    ):
        raise ConversionError(f"{path}: structure mismatch {type(ref)} vs {type(got)}")
    if isinstance(ref, dict):
        if set(ref) != set(got):
            raise ConversionError(
                f"{path}: keys differ; missing={sorted(set(ref) - set(got))} "
                f"extra={sorted(set(got) - set(ref))}"
            )
        for k in ref:
            _check_same_structure(ref[k], got[k], f"{path}/{k}")
    elif isinstance(ref, list):
        if len(ref) != len(got):
            raise ConversionError(f"{path}: list length {len(got)} != {len(ref)}")
        for i, (r, g) in enumerate(zip(ref, got)):
            _check_same_structure(r, g, f"{path}/{i}")
    else:
        if tuple(ref.shape) != tuple(got.shape):
            raise ConversionError(
                f"{path}: shape {tuple(got.shape)} != expected {tuple(ref.shape)}"
            )


# ---------------------------------------------------------------------------
# file front-ends


def load_torch_checkpoint(path: str, allow_pickle: bool = False) -> dict[str, Array]:
    """Load a torch .pth safely (weights_only first; pickle needs opt-in)."""
    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        if not allow_pickle:
            raise ConversionError(
                f"{path}: not loadable with weights_only=True. Re-run with "
                "--allow-pickle ONLY if you trust this file (pickle executes "
                "arbitrary code)."
            )
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt and isinstance(ckpt["model"], dict):
        ckpt = ckpt["model"]
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in ckpt.items()}


def load_onnx_initializers(path: str) -> dict[str, Array]:
    """Recover a named state dict from an ONNX export of the torch modules.

    Parses the protobuf directly (models/onnx_reader.py -- no `onnx`
    package needed) and reconstructs canonical parameter names by graph
    traversal (models/onnx_recover.py): name-preserving exports pass
    through unchanged, while constant-folded exports (anonymous
    ``onnx::Conv_*``/``onnx::MatMul_*`` initializers, Constant-inlined
    tensors) are renamed from the known trunk/encoder structure. Folded
    exports carry no separate BatchNorm tensors; their convs arrive
    pre-folded, which `convert_state_dict` handles via its optional-BN
    path.
    """
    from foundationpose_cpp_tpu.models import onnx_reader, onnx_recover

    try:
        graph = onnx_reader.parse_model(path)
    except onnx_reader.OnnxParseError as e:
        raise ConversionError(f"{path}: {e}") from e
    try:
        return onnx_recover.recover_state_dict(graph)
    except onnx_recover.RecoveryError as e:
        # a name-preserving export whose GRAPH shape deviates from the
        # published trunk (different exporter decomposition, extra folded
        # ops) still carries every parameter by name -- return those and
        # let convert_state_dict's strict checks validate completeness
        named = onnx_recover.named_float_initializers(graph)
        if named:
            logger.warning(
                "%s: structural recovery failed (%s); falling back to the "
                "%d named initializers", path, e, len(named),
            )
            return named
        raise ConversionError(
            f"{path}: cannot recover parameter names from this graph "
            f"({e}); convert from the torch .pth checkpoint instead"
        ) from e


def convert_file(
    path: str,
    model: str,
    out_path: str | None = None,
    allow_pickle: bool = False,
    crop_hw: int = 160,
) -> tuple[networks.Params, networks.NetConfig]:
    """Convert a .pth/.pt/.onnx file; optionally save npz via checkpoint.py."""
    if path.endswith(".onnx"):
        sd = load_onnx_initializers(path)
    else:
        sd = load_torch_checkpoint(path, allow_pickle=allow_pickle)
    cfg = infer_net_config(sd, crop_hw=crop_hw)
    params, cfg = convert_state_dict(sd, model, cfg)
    if out_path:
        from foundationpose_cpp_tpu.models import checkpoint

        checkpoint.save_params(params, out_path)
    return params, cfg

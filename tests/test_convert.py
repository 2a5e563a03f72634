"""Weight-converter round trip vs a torch oracle of the published graphs.

Builds torch modules that replicate the NVlabs FoundationPose
RefineNet/ScoreNetMultiPair module tree AND state-dict naming
(learning/models/{refine_network,score_network,network_modules}.py), runs
them in eval mode, converts their state dict with models/convert.py (BN
folding, OIHW->HWIO, packed qkv), and checks our JAX forward matches torch
to float32 tolerance. This is the proof that when the real checkpoints
land, tools/convert_onnx.py maps 100% of their tensors correctly.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from foundationpose_cpp_tpu.models import checkpoint, convert, networks  # noqa: E402

# toy dims (same graph, CPU-fast): crop 32 -> 4x4 = 16 tokens
C_IN, W1, W2, D, HEADS, FFN, CROP = 6, 8, 16, 32, 2, 24, 32


# --- torch replica of network_modules.py -----------------------------------


class ConvBNReLU(nn.Sequential):
    def __init__(self, c_in, c_out, kernel_size=3, stride=1):
        super().__init__(
            nn.Conv2d(c_in, c_out, kernel_size, stride,
                      padding=(kernel_size - 1) // 2, bias=False),
            nn.BatchNorm2d(c_out),
            nn.ReLU(inplace=True),
        )


class ResnetBasicBlock(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv1 = nn.Conv2d(ch, ch, 3, 1, 1, bias=True)
        self.bn1 = nn.BatchNorm2d(ch)
        self.conv2 = nn.Conv2d(ch, ch, 3, 1, 1, bias=True)
        self.bn2 = nn.BatchNorm2d(ch)
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return self.relu(out + x)


class PositionalEmbedding(nn.Module):
    def __init__(self, d_model, max_len):
        super().__init__()
        pe = torch.zeros(max_len, d_model).float()
        position = torch.arange(0, max_len).float().unsqueeze(1)
        div_term = (
            torch.arange(0, d_model, 2).float() * -(math.log(10000.0) / d_model)
        ).exp()
        pe[:, 0::2] = torch.sin(position * div_term)
        pe[:, 1::2] = torch.cos(position * div_term)
        self.register_buffer("pe", pe.unsqueeze(0))

    def forward(self, x):
        return x + self.pe[:, : x.size(1)]


class _Backbone(nn.Module):
    def __init__(self):
        super().__init__()
        self.encodeA = nn.Sequential(
            ConvBNReLU(C_IN, W1, 7, 2),
            ConvBNReLU(W1, W2, 3, 2),
            ResnetBasicBlock(W2),
        )
        self.encodeAB = nn.Sequential(
            ResnetBasicBlock(2 * W2),
            ConvBNReLU(2 * W2, D, 3, 2),
            ResnetBasicBlock(D),
        )
        self.pos_embed = PositionalEmbedding(D, max_len=(CROP // 8) ** 2)
        layer = nn.TransformerEncoderLayer(
            d_model=D, nhead=HEADS, dim_feedforward=FFN, dropout=0.0,
            batch_first=True,
        )
        self.encoder = nn.TransformerEncoder(layer, num_layers=1)

    def embed(self, a, b):
        bs = len(a)
        x = torch.cat([a, b], dim=0)
        x = self.encodeA(x)
        ab = torch.cat((x[:bs], x[bs:]), dim=1)
        ab = self.encodeAB(ab)
        ab = self.pos_embed(ab.reshape(bs, ab.shape[1], -1).permute(0, 2, 1))
        ab = self.encoder(ab)
        return ab.mean(dim=1)


class TorchRefineNet(_Backbone):
    def __init__(self):
        super().__init__()
        self.trans_head = nn.Sequential(nn.Linear(D, 3))
        self.rot_head = nn.Sequential(nn.Linear(D, 3))

    def forward(self, a, b):
        f = self.embed(a, b)
        return self.trans_head(f), self.rot_head(f)


class TorchScoreNetMultiPair(_Backbone):
    def __init__(self):
        super().__init__()
        self.att_cross = nn.TransformerEncoderLayer(
            d_model=D, nhead=HEADS, dim_feedforward=FFN, dropout=0.0,
            batch_first=True,
        )
        self.score_head = nn.Sequential(nn.Linear(D, 1))

    def forward(self, a, b):
        f = self.embed(a, b)  # (N, D)
        f = self.att_cross(f.unsqueeze(0)).squeeze(0)  # attend across poses
        return self.score_head(f)


# --- helpers ----------------------------------------------------------------


def _randomize_bn(model, seed=0):
    """Give BN layers non-trivial running stats so folding is really tested."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.3)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) * 2 + 0.2)
            with torch.no_grad():
                m.weight.copy_(torch.rand(m.num_features, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.num_features, generator=g) * 0.2)


def _state_dict_np(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _jax_cfg(cross=False):
    return networks.NetConfig(
        in_channels=C_IN, width1=W1, width2=W2, embed_dim=D, num_heads=HEADS,
        ffn_dim=FFN, crop_hw=CROP, cross_attention=cross, dtype=jnp.float32,
    )


def _inputs(n=3, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.uniform(-1, 1, size=(n, CROP, CROP, C_IN)).astype(np.float32)
    b = rng.uniform(-1, 1, size=(n, CROP, CROP, C_IN)).astype(np.float32)
    return a, b


# --- tests -------------------------------------------------------------------


def test_refiner_roundtrip_matches_torch():
    torch.manual_seed(0)
    model = TorchRefineNet()
    _randomize_bn(model)
    model.eval()
    sd = _state_dict_np(model)

    params, cfg = convert.convert_state_dict(sd, "refiner", _jax_cfg())
    a, b = _inputs()
    with torch.no_grad():
        t_trans, t_rot = model(
            torch.from_numpy(a).permute(0, 3, 1, 2),
            torch.from_numpy(b).permute(0, 3, 1, 2),
        )
    out = networks.apply_refiner(params, jnp.asarray(a), jnp.asarray(b), cfg)
    np.testing.assert_allclose(
        np.asarray(out["trans"]), t_trans.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["rot"]), t_rot.numpy(), rtol=1e-4, atol=1e-5
    )


def test_scorer_roundtrip_with_cross_attention():
    torch.manual_seed(1)
    model = TorchScoreNetMultiPair()
    _randomize_bn(model, seed=1)
    model.eval()
    sd = _state_dict_np(model)

    params, cfg = convert.convert_state_dict(sd, "scorer", _jax_cfg(cross=True))
    assert "att_cross" in params
    a, b = _inputs(n=5, seed=2)
    with torch.no_grad():
        t_scores = model(
            torch.from_numpy(a).permute(0, 3, 1, 2),
            torch.from_numpy(b).permute(0, 3, 1, 2),
        )
    out = networks.apply_scorer(params, jnp.asarray(a), jnp.asarray(b), cfg)
    np.testing.assert_allclose(
        np.asarray(out["scores"]), t_scores.numpy(), rtol=1e-4, atol=1e-5
    )


def test_infer_net_config_from_checkpoint():
    torch.manual_seed(0)
    sd = _state_dict_np(TorchScoreNetMultiPair())
    cfg = convert.infer_net_config(sd, crop_hw=CROP)
    assert (cfg.width1, cfg.width2, cfg.embed_dim) == (W1, W2, D)
    assert cfg.ffn_dim == FFN and cfg.num_encoder_layers == 1
    assert cfg.cross_attention is True


def test_attr_style_convbnrelu_names():
    """ConvBNReLU written with .conv/.bn attribute children also maps."""
    torch.manual_seed(0)
    model = TorchRefineNet()
    _randomize_bn(model)
    model.eval()
    sd = _state_dict_np(model)
    renamed = {}
    for k, v in sd.items():
        k2 = k
        for blk in ("encodeA.0", "encodeA.1", "encodeAB.1"):
            k2 = k2.replace(f"{blk}.0.", f"{blk}.conv.").replace(
                f"{blk}.1.", f"{blk}.bn."
            )
        renamed[k2] = v
    params, cfg = convert.convert_state_dict(renamed, "refiner", _jax_cfg())
    a, b = _inputs(n=1)
    out = networks.apply_refiner(params, jnp.asarray(a), jnp.asarray(b), cfg)
    assert np.isfinite(np.asarray(out["trans"])).all()


def test_module_prefix_stripped_and_npz_roundtrip(tmp_path):
    torch.manual_seed(0)
    model = TorchRefineNet()
    model.eval()
    sd = {f"module.{k}": v for k, v in _state_dict_np(model).items()}
    params, cfg = convert.convert_state_dict(sd, "refiner", _jax_cfg())
    path = str(tmp_path / "r.npz")
    checkpoint.save_params(params, path)
    loaded = checkpoint.load_params(path)
    a, b = _inputs(n=1)
    o1 = networks.apply_refiner(params, jnp.asarray(a), jnp.asarray(b), cfg)
    o2 = networks.apply_refiner(loaded, jnp.asarray(a), jnp.asarray(b), cfg)
    np.testing.assert_array_equal(np.asarray(o1["trans"]), np.asarray(o2["trans"]))


def test_unknown_tensor_rejected():
    torch.manual_seed(0)
    sd = _state_dict_np(TorchRefineNet())
    sd["mystery.weight"] = np.zeros((3, 3), np.float32)
    with pytest.raises(convert.ConversionError, match="not consumed"):
        convert.convert_state_dict(sd, "refiner", _jax_cfg())


def test_missing_tensor_rejected():
    torch.manual_seed(0)
    sd = _state_dict_np(TorchRefineNet())
    del sd["encoder.layers.0.linear1.weight"]
    with pytest.raises(convert.ConversionError, match="missing tensor"):
        convert.convert_state_dict(sd, "refiner", _jax_cfg())


def test_wrong_shape_rejected():
    torch.manual_seed(0)
    sd = _state_dict_np(TorchRefineNet())
    sd["trans_head.0.weight"] = np.zeros((4, D), np.float32)
    with pytest.raises(convert.ConversionError, match="shape"):
        convert.convert_state_dict(sd, "refiner", _jax_cfg())


def test_nonstandard_pos_embed_rejected():
    torch.manual_seed(0)
    model = TorchRefineNet()
    model.eval()
    sd = _state_dict_np(model)
    sd["pos_embed.pe"] = np.random.default_rng(0).normal(
        size=sd["pos_embed.pe"].shape
    ).astype(np.float32)
    with pytest.raises(convert.ConversionError, match="sinusoidal"):
        convert.convert_state_dict(sd, "refiner", _jax_cfg())


def test_converted_params_run_in_bf16_pipeline_dtype():
    """Converted weights respect the dtype policy (bf16 matmuls, f32 rest)."""
    torch.manual_seed(0)
    model = TorchRefineNet()
    model.eval()
    cfg = networks.NetConfig(
        in_channels=C_IN, width1=W1, width2=W2, embed_dim=D, num_heads=HEADS,
        ffn_dim=FFN, crop_hw=CROP, dtype=jnp.bfloat16,
    )
    params, _ = convert.convert_state_dict(_state_dict_np(model), "refiner", cfg)
    assert params["encodeA"]["conv0"]["w"].dtype == jnp.bfloat16
    assert params["encodeA"]["conv0"]["b"].dtype == jnp.float32
    assert params["encoder"][0]["attn"]["qkv_w"].dtype == jnp.bfloat16
    a, b = _inputs(n=2)
    out = networks.apply_refiner(params, jnp.asarray(a), jnp.asarray(b), cfg)
    assert np.isfinite(np.asarray(out["trans"])).all()

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


# --- torch replica: the package-level parity oracle (models/torch_ref.py) --

from foundationpose_cpp_tpu.models import torch_ref  # noqa: E402


def TorchRefineNet():
    return torch_ref.build_modules(_jax_cfg())["RefineNet"]()


def TorchScoreNetMultiPair():
    return torch_ref.build_modules(_jax_cfg(cross=True))["ScoreNetMultiPair"]()


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


def test_torch_oracle_infer_core_matches_xla_core():
    """The named-blob parity oracle (TorchRefInferCore) and XlaInferCore
    agree on identical weights -- the cross-framework check the reference
    performs manually against onnxruntime outputs."""
    from foundationpose_cpp_tpu.models import infer_core

    torch.manual_seed(3)
    cfg = _jax_cfg()
    oracle = torch_ref.create_refiner_oracle(cfg)
    params, _ = convert.convert_state_dict(
        torch_ref.state_dict_numpy(oracle._net), "refiner", cfg
    )
    core = infer_core.create_refiner_core(params, cfg)
    a, b = _inputs(n=2, seed=7)
    blobs = {"render_input": a, "transf_input": b}
    got = core.infer({k: jnp.asarray(v) for k, v in blobs.items()})
    want = oracle.infer(blobs)
    assert oracle.output_names() == core.output_names() == ("trans", "rot")
    np.testing.assert_allclose(
        np.asarray(got["trans"]), want["trans"], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got["rot"]), want["rot"], rtol=1e-4, atol=1e-5
    )

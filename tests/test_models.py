"""Refiner/scorer networks: blob contract, determinism, dtype policy."""

import numpy as np
import jax
import jax.numpy as jnp

from foundationpose_cpp_tpu.models import infer_core, networks

CFG = networks.NetConfig(
    width1=8, width2=16, embed_dim=64, num_heads=4, crop_hw=32,
)


def _inputs(n=3, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.uniform(size=(n, CFG.crop_hw, CFG.crop_hw, 6)).astype(np.float32)
    b = rng.uniform(size=(n, CFG.crop_hw, CFG.crop_hw, 6)).astype(np.float32)
    return jnp.asarray(a), jnp.asarray(b)


def test_refiner_blob_contract():
    params = networks.init_refiner(0, CFG)
    a, b = _inputs()
    out = networks.apply_refiner(params, a, b, CFG)
    assert set(out) == {"trans", "rot"}
    assert out["trans"].shape == (3, 3)
    assert out["rot"].shape == (3, 3)
    assert out["trans"].dtype == jnp.float32
    assert np.isfinite(np.asarray(out["trans"])).all()


def test_scorer_blob_contract():
    params = networks.init_scorer(1, CFG)
    a, b = _inputs(seed=1)
    out = networks.apply_scorer(params, a, b, CFG)
    assert set(out) == {"scores"}
    assert out["scores"].shape == (3, 1)


def test_deterministic_and_input_sensitive():
    params = networks.init_refiner(0, CFG)
    a, b = _inputs()
    o1 = networks.apply_refiner(params, a, b, CFG)
    o2 = networks.apply_refiner(params, a, b, CFG)
    np.testing.assert_array_equal(np.asarray(o1["rot"]), np.asarray(o2["rot"]))
    o3 = networks.apply_refiner(params, b, a, CFG)  # swapped branches
    assert not np.allclose(np.asarray(o1["trans"]), np.asarray(o3["trans"]))


def test_batch_independence():
    """Each sample's output must not depend on its batch neighbors."""
    params = networks.init_scorer(1, CFG)
    a, b = _inputs(n=4, seed=2)
    full = np.asarray(networks.apply_scorer(params, a, b, CFG)["scores"])
    solo = np.asarray(networks.apply_scorer(params, a[1:2], b[1:2], CFG)["scores"])
    np.testing.assert_allclose(full[1], solo[0], rtol=2e-2, atol=2e-3)


def test_param_dtype_policy():
    """Matmul/conv weights live in bf16 (MXU); norms and biases in f32."""
    params = networks.init_refiner(0, CFG)
    layer = params["encoder"][0]
    assert layer["attn"]["qkv_w"].dtype == jnp.bfloat16
    assert layer["mlp_w1"].dtype == jnp.bfloat16
    assert layer["ln1_s"].dtype == jnp.float32
    assert layer["mlp_b1"].dtype == jnp.float32
    assert params["encodeA"]["conv0"]["w"].dtype == jnp.bfloat16
    assert params["encodeA"]["conv0"]["b"].dtype == jnp.float32


def test_infer_core_bucketing():
    core = infer_core.create_scorer_core(cfg=CFG)
    core.buckets = (2, 4)
    a, b = _inputs(n=3, seed=3)
    out = core.infer({"render_input": a, "transf_input": b})
    assert out["scores"].shape == (3, 1)  # padded to 4 internally, sliced back
    assert core.input_names() == ("render_input", "transf_input")
    assert core.output_names() == ("scores",)


def test_infer_core_missing_blob_raises():
    core = infer_core.create_refiner_core(cfg=CFG)
    a, _ = _inputs(n=1)
    try:
        core.infer({"render_input": a})
        assert False, "expected KeyError"
    except KeyError:
        pass

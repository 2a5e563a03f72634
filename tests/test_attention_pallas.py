"""Whole-head Pallas attention vs the XLA einsum path.

The kernel (ops/attention_pallas.py) must be output-equivalent to the
f32 XLA attention core: both accumulate logits in f32 and run the
softmax in f32, so f32 inputs agree to reduce-order noise and bf16
inputs agree to bf16 rounding (the XLA path's extra bf16 logits rounding
is the documented difference).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from foundationpose_cpp_tpu.models import networks
from foundationpose_cpp_tpu.ops import attention_pallas


def _xla_attention_core(q, k, v, f32_logits=True):
    hd = q.shape[-1]
    ld = jnp.float32 if (f32_logits or q.dtype != jnp.bfloat16) else jnp.bfloat16
    logits = jnp.einsum("nhqd,nhkd->nhqk", q, k, preferred_element_type=ld)
    attn = jax.nn.softmax(
        logits.astype(jnp.float32) / math.sqrt(hd), axis=-1
    ).astype(q.dtype)
    return jnp.einsum("nhqk,nhkd->nhqd", attn, v, preferred_element_type=jnp.float32)


@pytest.mark.parametrize(
    "b,h,t,d",
    [(3, 4, 40, 32), (1, 1, 13, 8), (2, 2, 128, 128), (1, 4, 100, 16)],
)
def test_kernel_matches_xla_f32(b, h, t, d):
    key = jax.random.PRNGKey(b * 1000 + t)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, t, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, t, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, t, d), jnp.float32)
    got = attention_pallas.mha_whole_head(q, k, v, interpret=True)
    want = _xla_attention_core(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_kernel_matches_xla_bf16():
    key = jax.random.PRNGKey(7)
    kq, kk, kv = jax.random.split(key, 3)
    shape = (2, 4, 40, 32)
    q = jax.random.normal(kq, shape, jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(kk, shape, jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(kv, shape, jnp.float32).astype(jnp.bfloat16)
    got = np.asarray(
        attention_pallas.mha_whole_head(q, k, v, interpret=True)
    ).astype(np.float32)
    # reference: same core at f32 logits (the kernel's semantics)
    want = np.asarray(
        _xla_attention_core(q, k, v, f32_logits=True)
    ).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=0.02, atol=0.02)
    assert got.dtype == np.float32 and not np.isnan(got).any()


def test_explicit_scale_is_applied():
    q = jnp.ones((1, 1, 8, 8), jnp.float32)
    k = jnp.ones((1, 1, 8, 8), jnp.float32)
    v = jnp.arange(64, dtype=jnp.float32).reshape(1, 1, 8, 8)
    # uniform logits -> softmax uniform regardless of scale; use distinct q
    q = q.at[0, 0, 0, 0].set(2.0)
    a = attention_pallas.mha_whole_head(q, k, v, scale=0.0, interpret=True)
    # scale 0 -> uniform attention -> every row is the mean of v
    np.testing.assert_allclose(
        np.asarray(a[0, 0]), np.tile(np.asarray(v[0, 0]).mean(0), (8, 1)),
        rtol=1e-6, atol=1e-6,
    )


def test_self_attention_pallas_path_matches_xla():
    """The networks.py wiring (qkv split, head reshape, proj) must agree
    between attn_impl='pallas_interpret' and the XLA path at f32."""
    cfg = networks.NetConfig(
        width1=8, width2=8, embed_dim=32, ffn_dim=32, crop_hw=32,
        dtype=jnp.float32,
    )
    params = networks.init_refiner(0, cfg)
    layer = params["encoder"][0]
    x = jax.random.normal(jax.random.PRNGKey(3), (2, cfg.num_tokens, 32))
    got = networks._encoder_layer(
        x, layer, cfg.num_heads, attn_impl="pallas_interpret"
    )
    want = networks._encoder_layer(x, layer, cfg.num_heads, attn_impl="xla")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_auto_policy_stays_xla_on_cpu():
    assert not networks._use_pallas_attn("auto", 4, 400, 128, jnp.bfloat16)
    assert networks._use_pallas_attn("pallas", 4, 400, 128, jnp.bfloat16)
    assert networks._use_pallas_attn(
        "pallas_interpret", 4, 400, 128, jnp.bfloat16
    )
    assert not networks._use_pallas_attn("xla", 4, 400, 128, jnp.bfloat16)


def test_fits_vmem_budget():
    # production refiner shape fits; an LLM-scale context does not
    assert attention_pallas.fits_vmem(4, 400, 128)
    assert attention_pallas.fits_vmem(4, 252, 128)  # att_cross
    assert not attention_pallas.fits_vmem(4, 4096, 128)


def test_packed_qkv_matches_whole_head():
    """mha_packed_qkv (heads as lane slices of the in_proj output) must
    equal mha_whole_head on the reshaped/transposed views bit-for-bit --
    the packed kernel only removes layout work, not arithmetic."""
    n, t, d, nh = 3, 64, 512, 4
    hd = d // nh
    key = jax.random.PRNGKey(7)
    qkv = jax.random.normal(key, (n, t, 3 * d), jnp.float32)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(a):
        return a.reshape(n, t, nh, hd).transpose(0, 2, 1, 3)

    want = attention_pallas.mha_whole_head(
        heads(q), heads(k), heads(v), scale=1.0 / math.sqrt(hd),
        interpret=True,
    )
    want = np.asarray(want).transpose(0, 2, 1, 3).reshape(n, t, d)
    got = np.asarray(
        attention_pallas.mha_packed_qkv(qkv, nh, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_packed_qkv_rejects_unaligned_head_dim():
    qkv = jnp.zeros((1, 8, 3 * 64), jnp.float32)
    with pytest.raises(ValueError, match="multiple of 128"):
        attention_pallas.mha_packed_qkv(qkv, 2, interpret=True)


def test_self_attention_packed_route_matches_xla():
    """The production route (_self_attention with hd=128 -> packed
    kernel) agrees with the XLA path to f32 reduce-order noise."""
    cfg = networks.NetConfig()
    params = networks.init_refiner(0, cfg)
    layer = params["encoder"][0]
    x = jax.random.normal(
        jax.random.PRNGKey(3), (2, 32, cfg.embed_dim), jnp.float32
    )
    got = networks._self_attention(
        x, layer["attn"], cfg.num_heads, "pallas_interpret"
    )
    want = networks._self_attention(x, layer["attn"], cfg.num_heads, "xla")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3
    )

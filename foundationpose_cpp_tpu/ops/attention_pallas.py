"""Whole-head multi-head attention as a single Pallas TPU kernel.

Motivation (measured, v5e, refiner shapes N=252 H=4 T=400 D=128): the XLA
encoder layer materializes the (N, H, T, T) attention logits in HBM --
322 MB at bf16 -- and reads them back through the softmax, which makes the
one transformer layer cost 8.2 ms of the refiner's 28.5 ms while its
matmuls are worth ~1 ms of MXU time. At these shapes one head's q, k, v
and its (T, T) logits fit comfortably in VMEM (~1 MB), so no flash-style
streaming/tiling is needed: each grid program computes every head of one
batch element end to end -- two MXU dots and an in-register softmax --
and the logits never touch HBM.

The reference runs attention inside an opaque TensorRT engine
(/root/reference/tools/cvt_onnx2trt.bash:3-15); this kernel is the
TPU-native equivalent of TRT's fused attention for the published topology
(torch.nn.TransformerEncoderLayer, see docs/ARCH_NETWORKS.md).

Numerics: logits accumulate in f32 on the MXU and the softmax runs in f32
(max-subtracted), matching the production XLA path's f32 softmax; the
probability matrix is cast to the input dtype for the second dot exactly
like the XLA path casts post-softmax. The only deliberate difference is
that bf16 inputs keep FULL f32 logits here (the XLA path rounds logits to
bf16 to halve their HBM footprint -- a concession this kernel does not
need, since logits never leave VMEM).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# conservative per-program VMEM budget for the auto policy (bytes); v5e
# has 16 MiB less double-buffering overheads
_VMEM_BUDGET = 10 * 1024 * 1024


def _kernel(q_ref, k_ref, v_ref, o_ref, *, num_heads, scale):
    # heads loop is a static python unroll (num_heads is 4 in production);
    # each head is two MXU dots with the softmax living in VMEM/registers
    for j in range(num_heads):
        # scale rides on q (T*D elements) instead of the logits (T*T);
        # f32 so bf16 inputs don't round the product twice
        q = q_ref[0, j].astype(jnp.float32) * scale  # (T, D)
        k = k_ref[0, j]
        v = v_ref[0, j]
        logits = jax.lax.dot_general(
            q.astype(k.dtype), k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (T, T) f32, never leaves VMEM
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        s = jnp.sum(e, axis=-1, keepdims=True)
        # reciprocal-broadcast-multiply: a (T, 1) divide plus T*T cheap
        # multiplies instead of T*T multi-cycle VPU divides
        attn = (e * (1.0 / s)).astype(v.dtype)
        o_ref[0, j] = jax.lax.dot_general(
            attn, v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def fits_vmem(num_heads: int, t: int, d: int, itemsize: int = 2) -> bool:
    """Auto-policy guard: per-program footprint of the whole-head kernel.

    Pallas double-buffers the q/k/v/o blocks across grid programs (the
    next program's inputs prefetch while this one computes), so those
    blocks count TWICE against the ~16 MiB VMEM; only the in-kernel
    f32 logits/softmax scratch is single-buffered.
    """
    qkvo = 2 * (4 * num_heads * t * d * itemsize)  # double-buffered blocks
    logits = t * t * 4 + 2 * t * 4  # f32 logits + softmax stats
    return qkvo + logits < _VMEM_BUDGET


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def mha_whole_head(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(q kᵀ · scale) v per (batch, head), one batch row per program.

    q, k, v: (B, H, T, D). Returns (B, H, T, D) in q's dtype. scale
    defaults to 1/sqrt(D). Caller is responsible for the fits_vmem check;
    shapes beyond the budget belong on the XLA path.
    """
    b, h, t, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    spec = pl.BlockSpec((1, h, t, d), lambda i: (i, 0, 0, 0))
    return pl.pallas_call(
        functools.partial(_kernel, num_heads=h, scale=scale),
        grid=(b,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
        interpret=interpret,
    )(q, k, v)


def _kernel_packed(qkv_ref, o_ref, *, num_heads, head_dim, scale):
    # heads are LANE SLICES of the packed projection: head j's q/k/v live
    # at columns [j*hd), [D + j*hd), [2D + j*hd) of the (T, 3D) block --
    # no head-axis transpose ever exists, in XLA or here (hd % 128 == 0
    # keeps every slice lane-tile aligned)
    d = num_heads * head_dim
    for j in range(num_heads):
        q = qkv_ref[0, :, j * head_dim : (j + 1) * head_dim]
        k = qkv_ref[0, :, d + j * head_dim : d + (j + 1) * head_dim]
        v = qkv_ref[0, :, 2 * d + j * head_dim : 2 * d + (j + 1) * head_dim]
        qf = q.astype(jnp.float32) * scale
        logits = jax.lax.dot_general(
            qf.astype(k.dtype), k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (T, T) f32, never leaves VMEM
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        s = jnp.sum(e, axis=-1, keepdims=True)
        attn = (e * (1.0 / s)).astype(v.dtype)
        o_ref[0, :, j * head_dim : (j + 1) * head_dim] = jax.lax.dot_general(
            attn, v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "interpret")
)
def mha_packed_qkv(
    qkv: jnp.ndarray,
    num_heads: int,
    *,
    scale: float | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Attention straight off the packed qkv projection.

    qkv: (B, T, 3D) -- torch's in_proj output layout [q | k | v], each D
    wide with heads contiguous (head j = columns j*hd : (j+1)*hd).
    Returns (B, T, D): per-head softmax(q k^T scale) v written back with
    heads concatenated on lanes -- the layout the output projection
    consumes directly. Compared to mha_whole_head this removes BOTH
    XLA-side head reshape/transposes of q/k/v and the output
    un-transpose (measured: the transposes cost more than the attention
    core at production shapes). Requires head_dim % 128 == 0 so head
    slices are lane-aligned; caller falls back to the generic path
    otherwise.
    """
    b, t, d3 = qkv.shape
    d = d3 // 3
    hd = d // num_heads
    if scale is None:
        scale = 1.0 / math.sqrt(hd)
    if hd % 128:
        raise ValueError(f"head_dim ({hd}) must be a multiple of 128")
    return pl.pallas_call(
        functools.partial(
            _kernel_packed, num_heads=num_heads, head_dim=hd, scale=scale
        ),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, t, 3 * d), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, t, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, d), qkv.dtype),
        interpret=interpret,
    )(qkv)

"""Model-runtime layer: the reference's inference_core rebuilt for JAX.

The reference links against EasyDeployTool's `BaseInferCore` (a git submodule
it does not vendor; API reconstructed in SURVEY.md SS2.8 from call sites:
foundationpose.cpp:126-139, 207, 331-355, 413-436). That design -- mutable
blob buffers with host/device placement flags and a blocking SyncInfer --
exists because TensorRT engines are opaque callables. Under XLA the natural
equivalent is: a pytree of weights plus a pure apply function that the
pipeline INLINES into its single compiled program. `InferCore` keeps the
standalone call surface (named blobs in, named blobs out, dynamic batch via
bucketed compilation) for users who ran the engines directly.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Protocol

import jax
import jax.numpy as jnp

from foundationpose_cpp_tpu.models import networks


class BaseInferCore(Protocol):
    """Named-blob inference interface (BaseInferCore::SyncInfer parity)."""

    def input_names(self) -> tuple[str, ...]: ...

    def output_names(self) -> tuple[str, ...]: ...

    def infer(self, blobs: dict[str, jnp.ndarray]) -> dict[str, jnp.ndarray]: ...


@dataclasses.dataclass
class XlaInferCore:
    """Wraps (apply_fn, params) as a blob-named engine with batch bucketing.

    Dynamic batch [1..max_batch] is served TensorRT-style: the first call of a
    given bucket compiles an executable for that shape, later calls reuse it
    (mirrors the dynamic-shape TRT engines of tools/cvt_onnx2trt.bash). Inputs
    are padded up to the nearest bucket.
    """

    apply_fn: Callable[..., dict[str, jnp.ndarray]]
    params: Any
    _input_names: tuple[str, ...] = ("render_input", "transf_input")
    _output_names: tuple[str, ...] = ()
    buckets: tuple[int, ...] = (1, 8, 64, 252)

    def input_names(self) -> tuple[str, ...]:
        return self._input_names

    def output_names(self) -> tuple[str, ...]:
        return self._output_names

    @functools.cached_property
    def _jitted(self):
        return jax.jit(lambda params, a, b: self.apply_fn(params, a, b))

    def infer(self, blobs: dict[str, jnp.ndarray]) -> dict[str, jnp.ndarray]:
        for name in self._input_names:
            if name not in blobs:
                raise KeyError(f"[XlaInferCore] missing input blob '{name}'")
        a = blobs[self._input_names[0]]
        b = blobs[self._input_names[1]]
        n = a.shape[0]
        bucket = next((bk for bk in self.buckets if bk >= n), n)
        if bucket != n:
            pad = ((0, bucket - n), (0, 0), (0, 0), (0, 0))
            a = jnp.pad(a, pad)
            b = jnp.pad(b, pad)
        out = self._jitted(self.params, a, b)
        return {k: v[:n] for k, v in out.items()}


def create_refiner_core(
    params: Any | None = None,
    cfg: networks.NetConfig = networks.NetConfig(),
    seed: int = 0,
) -> XlaInferCore:
    """Factory mirroring CreateTrtInferCore for the refiner engine."""
    if params is None:
        params = networks.init_refiner(seed, cfg)
    return XlaInferCore(
        apply_fn=lambda p, a, b: networks.apply_refiner(p, a, b, cfg),
        params=params,
        _output_names=("trans", "rot"),
    )


def create_scorer_core(
    params: Any | None = None,
    cfg: networks.NetConfig = networks.NetConfig(),
    seed: int = 1,
) -> XlaInferCore:
    """Factory mirroring CreateTrtInferCore for the scorer engine."""
    if params is None:
        params = networks.init_scorer(seed, cfg)
    return XlaInferCore(
        apply_fn=lambda p, a, b: networks.apply_scorer(p, a, b, cfg),
        params=params,
        _output_names=("scores",),
    )

"""Torch-CPU reference nets: the cross-framework parity oracle.

SURVEY.md SS7.5 prescribes an independent CPU oracle for the refiner/scorer
so the JAX forward (models/networks.py) and the weight converter
(models/convert.py) can be validated end-to-end without the out-of-band
published checkpoints (reference README.md:72). onnxruntime is not available
in this environment, so the oracle is a torch replica of the NVlabs
FoundationPose module tree -- ``RefineNet`` / ``ScoreNetMultiPair``
(learning/models/{refine_network,score_network,network_modules}.py) -- with
the exact state-dict naming the published .pth checkpoints carry. That makes
it serve double duty:

1. parity oracle: run both frameworks on the same weights + inputs and
   compare (tests/test_convert.py does this for every tensor kind);
2. converter fixture: its ``state_dict()`` is byte-layout identical to a
   real checkpoint, so ``convert.convert_state_dict`` is exercised against
   the true naming scheme.

torch is an optional dependency of this module only; everything degrades
with a clear ImportError if absent.
"""

from __future__ import annotations

import math

from foundationpose_cpp_tpu.models import networks

try:  # torch (cpu) is baked into the dev image; optional for users
    import torch
    import torch.nn as nn

    TORCH_AVAILABLE = True
except ImportError:  # pragma: no cover - exercised only without torch
    TORCH_AVAILABLE = False
    torch = None
    nn = None


def _require_torch() -> None:
    if not TORCH_AVAILABLE:
        raise ImportError(
            "[torch_ref] torch is required for the CPU parity oracle; "
            "install torch (cpu build is sufficient) or use the JAX nets "
            "directly via models.networks"
        )


def build_modules(cfg: networks.NetConfig):
    """Define the torch module classes for a given NetConfig.

    Classes are built inside a function so importing this module never
    touches torch at class-definition time. Returns a namespace dict with
    RefineNet / ScoreNetMultiPair (published names and state-dict layout).
    """
    _require_torch()

    class ConvBNReLU(nn.Sequential):
        """network_modules.py ConvBNReLU: conv(bias=False) + BN + ReLU."""

        def __init__(self, c_in, c_out, kernel_size=3, stride=1):
            super().__init__(
                nn.Conv2d(c_in, c_out, kernel_size, stride,
                          padding=(kernel_size - 1) // 2, bias=False),
                nn.BatchNorm2d(c_out),
                nn.ReLU(inplace=True),
            )

    class ResnetBasicBlock(nn.Module):
        """network_modules.py ResnetBasicBlock (biased convs + BN + skip)."""

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
        """network_modules.py PositionalEmbedding: sinusoidal buffer."""

        def __init__(self, d_model, max_len):
            super().__init__()
            pe = torch.zeros(max_len, d_model).float()
            position = torch.arange(0, max_len).float().unsqueeze(1)
            div_term = (
                torch.arange(0, d_model, 2).float()
                * -(math.log(10000.0) / d_model)
            ).exp()
            pe[:, 0::2] = torch.sin(position * div_term)
            pe[:, 1::2] = torch.cos(position * div_term)
            self.register_buffer("pe", pe.unsqueeze(0))

        def forward(self, x):
            return x + self.pe[:, : x.size(1)]

    class _Backbone(nn.Module):
        """Shared siamese trunk of RefineNet / ScoreNetMultiPair."""

        def __init__(self):
            super().__init__()
            c, w1, w2, d = (
                cfg.in_channels, cfg.width1, cfg.width2, cfg.embed_dim
            )
            self.encodeA = nn.Sequential(
                ConvBNReLU(c, w1, 7, 2),
                ConvBNReLU(w1, w2, 3, 2),
                ResnetBasicBlock(w2),
            )
            self.encodeAB = nn.Sequential(
                ResnetBasicBlock(2 * w2),
                ConvBNReLU(2 * w2, d, 3, 2),
                ResnetBasicBlock(d),
            )
            self.pos_embed = PositionalEmbedding(
                d, max_len=cfg.num_tokens
            )
            layer = nn.TransformerEncoderLayer(
                d_model=d, nhead=cfg.num_heads,
                dim_feedforward=cfg.ffn_dim, dropout=0.0, batch_first=True,
            )
            self.encoder = nn.TransformerEncoder(
                layer, num_layers=cfg.num_encoder_layers
            )

        def embed(self, a, b):
            bs = len(a)
            x = torch.cat([a, b], dim=0)
            x = self.encodeA(x)
            ab = torch.cat((x[:bs], x[bs:]), dim=1)
            ab = self.encodeAB(ab)
            ab = self.pos_embed(
                ab.reshape(bs, ab.shape[1], -1).permute(0, 2, 1)
            )
            ab = self.encoder(ab)
            return ab.mean(dim=1)

    class RefineNet(_Backbone):
        """refine_network.py RefineNet: trans/rot heads on the trunk."""

        def __init__(self):
            super().__init__()
            d = cfg.embed_dim
            self.trans_head = nn.Sequential(nn.Linear(d, 3))
            self.rot_head = nn.Sequential(nn.Linear(d, 3))

        def forward(self, a, b):
            f = self.embed(a, b)
            return self.trans_head(f), self.rot_head(f)

    class ScoreNetMultiPair(_Backbone):
        """score_network.py ScoreNetMultiPair: optional cross-hypothesis
        attention + score head."""

        def __init__(self):
            super().__init__()
            d = cfg.embed_dim
            if cfg.cross_attention:
                self.att_cross = nn.TransformerEncoderLayer(
                    d_model=d, nhead=cfg.num_heads,
                    dim_feedforward=cfg.ffn_dim, dropout=0.0,
                    batch_first=True,
                )
            self.score_head = nn.Sequential(nn.Linear(d, 1))

        def forward(self, a, b):
            f = self.embed(a, b)  # (N, D)
            if cfg.cross_attention:
                f = self.att_cross(f.unsqueeze(0)).squeeze(0)
            return self.score_head(f)

    return {
        "ConvBNReLU": ConvBNReLU,
        "ResnetBasicBlock": ResnetBasicBlock,
        "PositionalEmbedding": PositionalEmbedding,
        "RefineNet": RefineNet,
        "ScoreNetMultiPair": ScoreNetMultiPair,
    }


def build_refine_net(cfg: networks.NetConfig = networks.NetConfig()):
    """RefineNet instance in eval mode (the published module tree)."""
    net = build_modules(cfg)["RefineNet"]()
    net.eval()
    return net


def build_score_net(cfg: networks.NetConfig = networks.NetConfig()):
    """ScoreNetMultiPair instance in eval mode."""
    net = build_modules(cfg)["ScoreNetMultiPair"]()
    net.eval()
    return net


def state_dict_numpy(model) -> dict:
    """Model state_dict as numpy arrays (convert.convert_state_dict input)."""
    _require_torch()
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


class TorchRefInferCore:
    """BaseInferCore impl running the torch oracle on CPU (NHWC blobs in,
    named blobs out) -- the counterpart of the reference's parity runs
    against onnxruntime/TensorRT outputs.
    """

    def __init__(self, net, output_names: tuple[str, ...]):
        _require_torch()
        self._net = net
        self._output_names = tuple(output_names)

    def input_names(self) -> tuple[str, ...]:
        return ("render_input", "transf_input")

    def output_names(self) -> tuple[str, ...]:
        return self._output_names

    def infer(self, blobs):
        import numpy as np

        a = torch.from_numpy(
            np.asarray(blobs["render_input"], dtype=np.float32)
        ).permute(0, 3, 1, 2)
        b = torch.from_numpy(
            np.asarray(blobs["transf_input"], dtype=np.float32)
        ).permute(0, 3, 1, 2)
        with torch.no_grad():
            out = self._net(a, b)
        if not isinstance(out, tuple):
            out = (out,)
        return {
            name: o.numpy() for name, o in zip(self._output_names, out)
        }


def create_refiner_oracle(cfg: networks.NetConfig = networks.NetConfig()):
    """Refiner parity oracle: blobs -> {trans, rot} on torch CPU."""
    return TorchRefInferCore(build_refine_net(cfg), ("trans", "rot"))


def create_scorer_oracle(cfg: networks.NetConfig = networks.NetConfig()):
    """Scorer parity oracle: blobs -> {scores} on torch CPU."""
    return TorchRefInferCore(build_score_net(cfg), ("scores",))

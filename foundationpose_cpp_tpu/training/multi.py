"""Object-generalizable training: one refiner/scorer across a mesh family.

The reference's engines are object-agnostic -- one set of weights serves any
mesh (simple_tests/src/test_foundationpose.cpp:22-46 loads the engines once
and runs mustard; no per-object step exists anywhere in the tree). The
round-2 synthetic trainer (training/synthetic.py) bakes ONE mesh into the
compiled train step, so its weights are per-object. This module removes that
gap the TPU-native way: the whole object family rides the compiled step as a
stacked, padded MESH BANK, and every optimizer step draws a random object
with `jax.random` INSIDE the jit -- one executable, zero retraces, randomized
object per step.

Why this works with zero changes to the fused render kernel
(ops/render_fused.py):

- `FusedMeshTables.num_faces` and `.diameter` are static meta fields, so the
  bank pads every object's face tables to a common count (all-zero pad faces
  are degenerate -> the prepass `nondeg` check culls them) and the family is
  generated at a COMMON diameter (meshio/family.py -- the pipeline is
  diameter-normalized end to end, so this costs no generality).
- `backface_cull_ok` must be uniform across the bank; it is pinned False
  (culling is only ever an optimization -- render output is identical).

The per-step object draw indexes the bank's data arrays with a traced index
and rebuilds the (static-metadata) table/mesh dataclasses inside the trace.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from foundationpose_cpp_tpu.config import FoundationPoseConfig
from foundationpose_cpp_tpu.meshio.mesh_loader import MeshAsset
from foundationpose_cpp_tpu.models import networks
from foundationpose_cpp_tpu.ops.render_fused import FusedMeshTables
from foundationpose_cpp_tpu.pipeline.renderer import MeshConstants
from foundationpose_cpp_tpu.training import synthetic as single


@dataclasses.dataclass(frozen=True)
class MeshBank:
    """Stacked, padded per-object tables (device arrays) + static metadata."""

    face_verts: jnp.ndarray  # (O, F_pad, 3, 3)
    face_normals: jnp.ndarray  # (O, F_pad, 3, 3)
    face_colors: jnp.ndarray  # (O, F_pad, 3, 3)
    add_pts: jnp.ndarray  # (O, P, 3) centered surface points for ADD labels
    diameter: float  # common family diameter (static)
    names: tuple[str, ...]

    @property
    def n_objects(self) -> int:
        return int(self.face_verts.shape[0])

    @property
    def num_faces(self) -> int:
        return int(self.face_verts.shape[1])


def build_mesh_bank(
    assets: Sequence[MeshAsset],
    face_pad: int = 256,
    add_points: int = 256,
) -> MeshBank:
    """Stack assets into a bank; pad face tables to a common multiple of
    `face_pad` (the fused kernel's chunk size, so padding adds no partial
    chunk). All assets must share one diameter (family contract)."""
    diam = float(assets[0].diameter)
    for a in assets:
        if abs(float(a.diameter) - diam) > 1e-5:
            raise ValueError(
                f"[MeshBank] asset '{a.name}' diameter {a.diameter} != {diam}; "
                "the bank requires a common family diameter (meshio/family.py)"
            )
    tables = [FusedMeshTables.from_asset(a, as_numpy=True) for a in assets]
    f_max = max(t.num_faces for t in tables)
    f_pad = -(-f_max // face_pad) * face_pad

    def pad(t: jnp.ndarray) -> np.ndarray:
        arr = np.asarray(t)
        out = np.zeros((f_pad,) + arr.shape[1:], arr.dtype)
        out[: arr.shape[0]] = arr
        return out

    rng = np.random.default_rng(0)
    pts = []
    for a in assets:
        centered = np.asarray(a.vertices) - np.asarray(a.model_center)[None]
        idx = rng.choice(centered.shape[0], size=add_points, replace=True)
        pts.append(centered[idx])

    return MeshBank(
        face_verts=jnp.asarray(np.stack([pad(t.face_verts) for t in tables])),
        face_normals=jnp.asarray(
            np.stack([pad(t.face_normals) for t in tables])
        ),
        face_colors=jnp.asarray(np.stack([pad(t.face_colors) for t in tables])),
        add_pts=jnp.asarray(np.stack(pts), jnp.float32),
        diameter=diam,
        names=tuple(a.name for a in assets),
    )


def bank_mesh(bank: MeshBank, idx: jnp.ndarray) -> MeshConstants:
    """MeshConstants view of bank object `idx` (traced), for the FUSED path.

    Only the fields the fused training path reads are real: `.fused` (the
    render tables), `.diameter` (static) and `.vertices` (the ADD-label
    point set). The unfused-path fields are minimal placeholders -- using
    this object with use_fused=False is a bug (the dummy faces would render
    nothing).
    """
    tables = FusedMeshTables(
        face_verts=bank.face_verts[idx],
        face_normals=bank.face_normals[idx],
        face_colors=bank.face_colors[idx],
        num_faces=bank.num_faces,
        diameter=bank.diameter,
        backface_cull_ok=False,  # must be uniform; False is always correct
    )
    return MeshConstants(
        vertices=bank.add_pts[idx],
        normals=jnp.zeros((1, 3), jnp.float32),
        texcoords=jnp.zeros((1, 2), jnp.float32),
        faces=jnp.zeros((1, 3), jnp.int32),
        face_valid=jnp.zeros((1,), bool),
        texture=jnp.zeros((2, 2, 3), jnp.float32),
        diameter=bank.diameter,
        model_center=jnp.zeros((3,), jnp.float32),
        orient_bounds=jnp.eye(4, dtype=jnp.float32),
        fused=tables,
    )


def _multi_batch(
    bank: MeshBank,
    key: jax.Array,
    K: jnp.ndarray,
    cfg: FoundationPoseConfig,
    tcfg: single.SyntheticTrainConfig,
    make_single: Callable[..., dict[str, jnp.ndarray]],
    use_fused: bool,
) -> dict[str, jnp.ndarray]:
    if not use_fused:
        # bank_mesh's unfused-path fields are placeholders (faces=zeros):
        # the unfused renderer would produce all-black frames and the run
        # would train for an hour on garbage before anyone noticed
        raise ValueError(
            "mesh-bank training requires the fused renderer (use_fused=True;"
            " on CPU pass interpret-mode tables or train per-object instead)"
        )
    ko, kb = jax.random.split(key)
    idx = jax.random.randint(ko, (), 0, bank.n_objects)
    mesh = bank_mesh(bank, idx)
    return make_single(mesh, kb, K, cfg, tcfg, None, use_fused)


def train_refiner_multi(
    bank: MeshBank,
    cfg: FoundationPoseConfig,
    net_cfg: networks.NetConfig,
    tcfg: single.SyntheticTrainConfig,
    steps: int = 8000,
    seed: int = 0,
    K: np.ndarray | None = None,
    use_fused: bool | None = None,
    log: Callable[[str], None] | None = None,
    init_params: Any | None = None,
) -> Any:
    """Train ONE RefineNet across the bank; returns f32 params."""
    if use_fused is None:
        use_fused = jax.default_backend() == "tpu"
    Kj = jnp.asarray(K if K is not None else single.default_intrinsics(tcfg))
    # attn_impl: the whole-head Pallas kernel is forward-only; training
    # differentiates through the (numerically equivalent) XLA core
    net_cfg_t = dataclasses.replace(
        net_cfg, dtype=jnp.float32, attn_impl="xla"
    )

    def make_batch(key):
        return _multi_batch(
            bank, key, Kj, cfg, tcfg, single.make_refiner_batch, use_fused
        )

    def loss(params, batch):
        return single.refiner_loss(params, batch, net_cfg_t, cfg.rot_normalizer)

    return single._train(
        init_params if init_params is not None
        else networks.init_refiner(seed, net_cfg_t),
        make_batch, loss, tcfg, steps, seed, log,
    )


def train_scorer_multi(
    bank: MeshBank,
    cfg: FoundationPoseConfig,
    net_cfg: networks.NetConfig,
    tcfg: single.SyntheticTrainConfig,
    steps: int = 5000,
    seed: int = 1,
    K: np.ndarray | None = None,
    use_fused: bool | None = None,
    log: Callable[[str], None] | None = None,
    init_params: Any | None = None,
) -> Any:
    """Train ONE ScoreNet(MultiPair) across the bank; returns f32 params."""
    if use_fused is None:
        use_fused = jax.default_backend() == "tpu"
    Kj = jnp.asarray(K if K is not None else single.default_intrinsics(tcfg))
    # forward-only Pallas attention: see train_refiner_multi
    net_cfg_t = dataclasses.replace(
        net_cfg, dtype=jnp.float32, attn_impl="xla"
    )

    def make_batch(key):
        return _multi_batch(
            bank, key, Kj, cfg, tcfg, single.make_scorer_batch, use_fused
        )

    def loss(params, batch):
        return single.scorer_loss(params, batch, net_cfg_t)

    return single._train(
        init_params if init_params is not None
        else networks.init_scorer(seed, net_cfg_t),
        make_batch, loss, tcfg, steps, seed, log,
    )

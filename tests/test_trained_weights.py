"""The committed synthetic-trained weights actually work (CPU, exact path).

Gated on weights/ being present. These tests load the checkpoints produced
by tools/train_synthetic.py (trained on TPU with the fused renderer) and
check functional accuracy through the EXACT unfused CPU path -- cross-path
generalization is part of the claim: the refiner must reduce pose error
and the scorer must rank hypotheses by alignment, neither of which random
weights do. Reference parity context: the reference's accuracy rests
entirely on pre-trained engines it downloads out-of-band (README.md:72);
these weights are the in-repo equivalent.
"""

import os
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from foundationpose_cpp_tpu.config import FoundationPoseConfig
from foundationpose_cpp_tpu.geometry import transforms
from foundationpose_cpp_tpu.meshio import procedural
from foundationpose_cpp_tpu.models import checkpoint, networks
from foundationpose_cpp_tpu.pipeline.foundationpose import track_step
from foundationpose_cpp_tpu.pipeline.renderer import MeshConstants
from foundationpose_cpp_tpu.training import synthetic as tr

_WDIR = pathlib.Path(__file__).resolve().parent.parent / "weights"
_RPATH = _WDIR / "refiner_cube6_full.npz"
_SPATH = _WDIR / "scorer_cube6_full.npz"

_MESHES = {
    "cube6": procedural.face_colored_cube,
    "house": procedural.textured_house,
}

pytestmark = pytest.mark.skipif(
    not (_RPATH.exists() and _SPATH.exists()),
    reason="trained weights not present (run tools/train_synthetic.py)",
)

CFG = FoundationPoseConfig()
NET = networks.NetConfig()
TCFG = tr.SyntheticTrainConfig()


def _weights(kind: str, mesh_name: str) -> str:
    p = _WDIR / f"{kind}_{mesh_name}_full.npz"
    if not p.exists():
        pytest.skip(f"{p.name} not trained")
    return str(p)


@pytest.fixture(scope="module", params=sorted(_MESHES))
def mesh_name(request):
    return request.param


@pytest.fixture(scope="module")
def mesh(mesh_name):
    return MeshConstants.from_asset(_MESHES[mesh_name](name=mesh_name))


@pytest.fixture(scope="module")
def scene(mesh):
    Kj = jnp.asarray(tr.default_intrinsics(TCFG))
    gt = tr.sample_scene_poses(jax.random.PRNGKey(123), 1, TCFG)
    rgb, depth = tr.render_observed(
        mesh, gt, Kj, TCFG.frame_hw, TCFG.frame_hw, CFG
    )
    return Kj, np.asarray(gt)[0], rgb[0], depth[0]


def _rot_err_deg(a, b):
    tr_ = np.trace(a[:3, :3] @ b[:3, :3].T)
    return float(np.degrees(np.arccos(np.clip((tr_ - 1) / 2, -1, 1))))


def test_trained_refiner_reduces_pose_error(mesh_name, mesh, scene):
    Kj, gt, rgb, depth = scene
    params_r = checkpoint.load_params(_weights("refiner", mesh_name))
    hyp = np.asarray(
        tr.perturb_poses(
            jax.random.PRNGKey(7), jnp.asarray(gt[None]), 12.0, 0.2,
            mesh.diameter,
        )
    )[0]
    err0_rot = _rot_err_deg(hyp, gt)
    err0_t = float(np.linalg.norm(hyp[:3, 3] - gt[:3, 3]))
    out = np.asarray(
        track_step(
            mesh, params_r, rgb, depth, jnp.asarray(hyp[None]), Kj, 3, CFG,
            NET,
        )
    )[0]
    err_rot = _rot_err_deg(out, gt)
    err_t = float(np.linalg.norm(out[:3, 3] - gt[:3, 3]))
    # three refine iterations must cut both errors by at least half
    assert err_rot < max(0.5 * err0_rot, 2.0), (err0_rot, err_rot)
    assert err_t < max(0.5 * err0_t, 0.005), (err0_t, err_t)


@pytest.mark.slow
def test_trained_scorer_ranks_by_alignment(mesh_name, mesh):
    params_s = checkpoint.load_params(_weights("scorer", mesh_name))
    Kj = jnp.asarray(tr.default_intrinsics(TCFG))
    batch = tr.make_scorer_batch(
        mesh, jax.random.PRNGKey(11), Kj, CFG,
        # uniform perturbation magnitudes: the interpretable eval mix.
        # scorer_sym_frac=0 pins the PRE-round-5 distribution these
        # legacy per-object checkpoints were trained on -- principal-flip
        # negatives are covered by the retrained multi weights
        # (tests/test_multi_weights.py, weights/eval_multi_full.json)
        tr.SyntheticTrainConfig(
            batch=64, hyps_per_scene=8, scorer_angle_power=1.0,
            scorer_sym_frac=0.0,
        ),
    )
    s, k = batch["labels"].shape
    # group_size keeps the MultiPair cross-hypothesis attention within each
    # scene (matching scorer_loss and Register-time semantics); without it
    # att_cross would attend across scene boundaries.
    out = networks.apply_scorer(
        params_s, batch["render_input"], batch["transf_input"], NET,
        group_size=k,
    )
    logits = np.asarray(out["scores"]).reshape(s, k)
    add = np.asarray(batch["add"])
    # the property Register needs is that the ARGMAX hypothesis is among
    # the best, not a total order over bad hypotheses: in every scene the
    # chosen pose must beat the median, and on average rank in the top 2
    # of 8 (random weights give rank ~3.5 and beat the median half the
    # time; measured trained ranks are 0-2 in 8/8 scenes)
    chosen_idx = logits.argmax(-1)
    chosen = add[np.arange(s), chosen_idx]
    # allow one outlier scene in eight: the end-to-end property (zero
    # flips over 12 full Register runs) is pinned by the training eval;
    # this raw 8-hypothesis variant is noisier
    assert (chosen < np.median(add, axis=-1)).mean() >= 0.85, (chosen, add)
    ranks = (add < chosen[:, None]).sum(-1)
    assert ranks.mean() <= 2.0, ranks
    # weaker pooled rank correlation (exact ordering of far-off hypotheses
    # is noisy and not load-bearing)
    from scipy.stats import spearmanr

    rhos = [spearmanr(logits[i], -add[i]).statistic for i in range(s)]
    assert np.mean(rhos) > 0.25, rhos


def test_trained_weights_fingerprint_loadable():
    """Checkpoints round-trip and carry production shapes."""
    params_r = checkpoint.load_params(str(_RPATH))
    n = networks.count_params(params_r)
    assert n > 5_000_000  # full-config RefineNet
    w = params_r["encodeA"]["conv0"]["w"]
    assert tuple(w.shape) == (7, 7, 6, 64)
    assert w.dtype == jnp.bfloat16
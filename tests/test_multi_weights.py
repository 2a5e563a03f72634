"""The committed OBJECT-GENERALIZABLE weights work on objects the trainer
never saw (CPU, exact path).

This is the repo's analogue of the reference's object-agnostic engines
(reference README.md:72: one checkpoint download serves any mesh;
simple_tests/src/test_foundationpose.cpp:22-46 loads engines and runs an
arbitrary mesh). tools/train_multi.py trains ONE refiner/scorer across a
randomized procedural family (meshio/family.py) and writes
weights/{refiner,scorer}_multi_full.npz plus a 12-scene-per-object eval
report. Two layers of pinning here:

  1. the committed eval report (produced on TPU with the fused renderer)
     must meet the headline bounds -- unseen objects < 8 deg mean rotation,
     ZERO symmetry flips -- so the README claims cannot silently drift;
  2. a from-scratch CPU Register run on fresh unseen objects through the
     EXACT (unfused) path must reproduce the behavior, making the claim
     cross-path and independent of the recorded artifact.
"""

import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from foundationpose_cpp_tpu.config import FoundationPoseConfig
from foundationpose_cpp_tpu.geometry import icosphere
from foundationpose_cpp_tpu.meshio import family
from foundationpose_cpp_tpu.models import checkpoint, networks
from foundationpose_cpp_tpu.pipeline.foundationpose import register_step
from foundationpose_cpp_tpu.pipeline.renderer import MeshConstants
from foundationpose_cpp_tpu.training import synthetic as tr
from foundationpose_cpp_tpu.utils import metrics

_WDIR = pathlib.Path(__file__).resolve().parent.parent / "weights"
_RPATH = _WDIR / "refiner_multi_full.npz"
_SPATH = _WDIR / "scorer_multi_full.npz"
_EVAL = _WDIR / "eval_multi_full.json"

pytestmark = pytest.mark.skipif(
    not (_RPATH.exists() and _SPATH.exists()),
    reason="multi-object weights not present (run tools/train_multi.py)",
)

CFG = FoundationPoseConfig()
NET = networks.NetConfig()
TCFG = tr.SyntheticTrainConfig()


def test_eval_report_meets_headline_bounds():
    """The committed TPU eval report: every UNSEEN object under 8 deg mean
    rotation, ADD-S under 10 mm, zero symmetry flips over 12 scenes."""
    assert _EVAL.exists(), "eval_multi_full.json must ship with the weights"
    report = json.loads(_EVAL.read_text())
    unseen = {
        k: v for k, v in report.items()
        if k.startswith(("unseen_seed:", "heldout_wedge:", "fixed_house:"))
    }
    # the eval set covers unseen seeds AND a held-out generator family
    assert sum(k.startswith("unseen_seed:") for k in unseen) >= 2
    assert sum(k.startswith("heldout_wedge:") for k in unseen) >= 1
    for name, r in unseen.items():
        assert r["n_scenes"] >= 12, name
        assert r["register_rot_deg"] < 8.0, (name, r["register_rot_deg"])
        assert r["register_adds"] < 0.010, (name, r["register_adds"])
        assert r["register_flips"] == 0, (name, r["register_flips"])


def _register_scenes(asset, params_r, params_s, n_scenes, seed):
    mesh = MeshConstants.from_asset(asset)
    Kj = jnp.asarray(tr.default_intrinsics(TCFG))
    rot_grid = jnp.asarray(icosphere.make_rotation_grid())
    root = jax.random.PRNGKey(seed)
    rots, flips = [], 0
    for i in range(n_scenes):
        gt = np.asarray(
            tr.sample_scene_poses(jax.random.fold_in(root, i), 1, TCFG)
        )[0]
        rgb, depth = tr.render_observed(
            mesh, jnp.asarray(gt[None]), Kj, TCFG.frame_hw, TCFG.frame_hw, CFG
        )
        mask = (np.asarray(depth)[0] > 0).astype(np.uint8) * 255
        best, _, _, ok = register_step(
            mesh, params_r, params_s, rgb[0], depth[0], jnp.asarray(mask),
            rot_grid, Kj, 1, CFG, NET,
        )
        assert bool(ok)
        rot = metrics.rotation_error_deg(np.asarray(best), gt)
        rots.append(rot)
        flips += rot > 45.0
    return float(np.mean(rots)), int(flips)


@pytest.mark.slow
def test_register_unseen_objects_cpu_exact_path():
    """From-scratch Register on two objects neither the trainer nor the
    committed eval ever saw, through the exact unfused CPU path.

    Bounds are looser than the 12-scene TPU eval (3 scenes, cross-path
    bf16-vs-f32 drift) but categorically reject a non-generalizing model:
    random or per-object-overfit weights give ~60-120 deg here.
    """
    params_r = checkpoint.load_params(str(_RPATH))
    params_s = checkpoint.load_params(str(_SPATH))
    for label, asset in (
        ("fresh_seed", family.random_family_asset(40_009)),
        ("fresh_wedge",
         family.random_family_asset(
             41_003, generator="wedge", diameter=family.FAMILY_DIAMETER
         )),
    ):
        mean_rot, flips = _register_scenes(asset, params_r, params_s, 3, 99)
        assert mean_rot < 12.0, (label, mean_rot)
        assert flips == 0, (label, flips)


def test_multi_weights_loadable_and_production_shaped():
    params_r = checkpoint.load_params(str(_RPATH))
    params_s = checkpoint.load_params(str(_SPATH))
    assert networks.count_params(params_r) > 5_000_000
    assert "att_cross" in params_s  # trained as ScoreNetMultiPair
    w = params_r["encodeA"]["conv0"]["w"]
    assert tuple(w.shape) == (7, 7, 6, 64) and w.dtype == jnp.bfloat16

"""Tests for the synthetic trainer (CPU, toy scale).

Validates the pieces that make training correct: the rotation log map,
the refine-target inversion (targets fed through apply_refine_delta must
land exactly on the ground truth), batch generator consistency (a
hypothesis equal to the ground truth produces matching render/observed
crops), and that a few optimizer steps actually reduce the loss on a tiny
net. Reference has no training subsystem (SURVEY.md SS5 checkpoint/resume:
inference only); this is the in-repo replacement for its out-of-band
pre-trained engines.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from foundationpose_cpp_tpu import FoundationPoseConfig, networks
from foundationpose_cpp_tpu.geometry import transforms
from foundationpose_cpp_tpu.meshio import procedural
from foundationpose_cpp_tpu.pipeline.renderer import MeshConstants
from foundationpose_cpp_tpu.training import synthetic as tr

CFG = FoundationPoseConfig(crop_window_h=32, crop_window_w=32)
TCFG = tr.SyntheticTrainConfig(
    frame_hw=64, focal=180.0, batch=4, hyps_per_scene=4, steps_per_call=2
)
NET = networks.NetConfig(
    width1=8, width2=8, embed_dim=16, num_heads=2, ffn_dim=16, crop_hw=32
)


@pytest.fixture(scope="module")
def mesh():
    return MeshConstants.from_asset(procedural.textured_cube(size=0.1))


# ---------------------------------------------------------------------------
# rotation log map


def test_matrix_to_axis_angle_roundtrip():
    rng = np.random.default_rng(0)
    rv = rng.normal(size=(64, 3)).astype(np.float32)
    rv *= (rng.uniform(0.0, 3.0, size=(64, 1)) / np.linalg.norm(rv, axis=-1, keepdims=True)).astype(np.float32)
    rv[0] = 0.0  # identity
    rv[1] = [1e-6, 0, 0]  # tiny angle
    mats = transforms.axis_angle_to_matrix(jnp.asarray(rv))
    back = np.asarray(transforms.matrix_to_axis_angle(mats))
    np.testing.assert_allclose(back, rv, atol=2e-4)


def test_matrix_to_axis_angle_near_pi():
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(1)
    axes = rng.normal(size=(16, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    rv = (axes * (np.pi - 1e-5)).astype(np.float32)
    mats = transforms.axis_angle_to_matrix(jnp.asarray(rv))
    back = np.asarray(transforms.matrix_to_axis_angle(mats))
    # rotvec ~ -rotvec at pi: compare the reconstructed MATRICES
    m2 = np.asarray(Rotation.from_rotvec(back).as_matrix())
    np.testing.assert_allclose(m2, np.asarray(mats), atol=1e-3)


def test_matrix_to_axis_angle_vs_scipy():
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(2)
    mats = Rotation.random(32, random_state=rng).as_matrix().astype(np.float32)
    ours = np.asarray(transforms.matrix_to_axis_angle(jnp.asarray(mats)))
    ref = Rotation.from_matrix(mats).as_rotvec()
    np.testing.assert_allclose(ours, ref, atol=5e-4)


# ---------------------------------------------------------------------------
# target inversion


def test_refine_targets_invert_apply_refine_delta(mesh):
    key = jax.random.PRNGKey(3)
    kp, kh = jax.random.split(key)
    gt = tr.sample_scene_poses(kp, 8, TCFG)
    hyp = tr.perturb_poses(kh, gt, 15.0, 0.3, mesh.diameter)
    t_t, rv_t = tr.refine_targets(gt, hyp, mesh.diameter, CFG.rot_normalizer)
    # rotation targets from a 15-degree perturbation stay inside the tanh range
    assert float(jnp.max(jnp.abs(rv_t))) < CFG.rot_normalizer
    rot_raw = jnp.arctanh(rv_t / CFG.rot_normalizer)
    recovered = transforms.apply_refine_delta(
        hyp, t_t, rot_raw, mesh.diameter, CFG.rot_normalizer
    )
    np.testing.assert_allclose(
        np.asarray(recovered), np.asarray(gt), atol=1e-4
    )


def test_perturb_poses_bounded(mesh):
    gt = tr.sample_scene_poses(jax.random.PRNGKey(4), 32, TCFG)
    hyp = tr.perturb_poses(
        jax.random.PRNGKey(5), gt, 20.0, 0.25, mesh.diameter
    )
    t_err = np.asarray(jnp.abs(hyp[:, :3, 3] - gt[:, :3, 3]))
    assert t_err.max() <= 0.25 * mesh.diameter / 2 + 1e-6
    tr_ = np.asarray(
        jnp.einsum("nij,nij->n", hyp[:, :3, :3], gt[:, :3, :3])
    )  # trace(R_h R_gt^T)
    ang = np.degrees(np.arccos(np.clip((tr_ - 1) / 2, -1, 1)))
    assert ang.max() <= 20.0 + 1e-3


# ---------------------------------------------------------------------------
# batch generators


def test_refiner_batch_shapes_and_content(mesh):
    Kj = jnp.asarray(tr.default_intrinsics(TCFG))
    batch = jax.jit(
        lambda k: tr.make_refiner_batch(mesh, k, Kj, CFG, TCFG)
    )(jax.random.PRNGKey(6))
    n, ch = TCFG.batch, CFG.crop_window_h
    assert batch["render_input"].shape == (n, ch, ch, 6)
    assert batch["transf_input"].shape == (n, ch, ch, 6)
    assert batch["trans_target"].shape == (n, 3)
    assert batch["rotvec_target"].shape == (n, 3)
    # every scene renders a visible object in both branches
    fg_r = np.asarray(jnp.any(batch["render_input"][..., 3:] != 0, axis=-1))
    fg_t = np.asarray(jnp.any(batch["transf_input"][..., 3:] != 0, axis=-1))
    assert (fg_r.reshape(n, -1).mean(-1) > 0.05).all()
    assert (fg_t.reshape(n, -1).mean(-1) > 0.02).all()


def test_gt_hypothesis_crops_agree(mesh):
    """hyp == gt: the rendered crop and the warped observed crop align."""
    Kj = jnp.asarray(tr.default_intrinsics(TCFG))
    gt = tr.sample_scene_poses(jax.random.PRNGKey(7), 2, TCFG)
    rgb_obs, depth_obs = tr.render_observed(
        mesh, gt, Kj, TCFG.frame_hw, TCFG.frame_hw, CFG
    )
    render_in, transf_in = tr._model_inputs(
        mesh, gt, rgb_obs, depth_obs, Kj, CFG.refine_crop_ratio, CFG,
        None, False,
    )
    fg_r = np.asarray(jnp.any(render_in[..., 3:] != 0, axis=-1))
    fg_t = np.asarray(jnp.any(transf_in[..., 3:] != 0, axis=-1))
    inter = (fg_r & fg_t).sum()
    union = (fg_r | fg_t).sum()
    assert inter / union > 0.7  # warping the 64px frame loses some edge px
    both = fg_r & fg_t
    xyz_r = np.asarray(render_in[..., 3:])[both]
    xyz_t = np.asarray(transf_in[..., 3:])[both]
    med = np.median(np.abs(xyz_r - xyz_t))
    assert med < 0.08  # same surface, diameter-normalized units


def test_scorer_batch_labels(mesh):
    Kj = jnp.asarray(tr.default_intrinsics(TCFG))
    batch = jax.jit(
        lambda k: tr.make_scorer_batch(mesh, k, Kj, CFG, TCFG)
    )(jax.random.PRNGKey(8))
    s = TCFG.batch // TCFG.hyps_per_scene
    k = TCFG.hyps_per_scene
    assert batch["render_input"].shape[0] == s * k
    assert batch["labels"].shape == (s, k)
    lab = np.asarray(batch["labels"])
    np.testing.assert_allclose(lab.sum(-1), 1.0, atol=1e-5)
    # best label per scene = smallest ADD
    assert (lab.argmax(-1) == np.asarray(batch["add"]).argmin(-1)).all()


def test_conv0_s2d_equivalence():
    """Space-to-depth stem conv == direct 7x7/s2 conv (f32 tolerance)."""
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 6)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(7, 7, 6, 16)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    a = networks._conv(x, w, b, stride=2)
    s = networks._conv0_s2d(x, w, b)
    np.testing.assert_allclose(np.asarray(a), np.asarray(s), atol=1e-4)


# ---------------------------------------------------------------------------
# optimization


def test_refiner_training_reduces_loss(mesh):
    Kj = jnp.asarray(tr.default_intrinsics(TCFG))

    losses = []

    def log(msg):
        losses.append(float(msg.split("loss=")[1].split()[0]))

    params = tr.train_refiner(
        mesh, CFG, NET, TCFG, steps=16, seed=0, K=np.asarray(Kj), log=log,
        use_fused=False,
    )
    assert losses[-1] < losses[0]
    # trained params stay finite
    assert all(
        bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(params)
    )


def test_scorer_training_runs(mesh):
    params = tr.train_scorer(
        mesh, CFG, NET, TCFG, steps=4, seed=1, use_fused=False,
    )
    assert all(
        bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(params)
    )


def test_trainers_override_forward_only_attention(mesh):
    """Trainers must force attn_impl="xla": the whole-head Pallas kernel is
    forward-only (pallas_call has no VJP), and on TPU NetConfig's "auto"
    resolves to it -- an un-overridden trainer crashes at the first
    value_and_grad with a linearization error. Simulate the TPU choice on
    CPU with an explicit pallas request; the trainer must still train."""
    import dataclasses

    net = dataclasses.replace(NET, attn_impl="pallas_interpret")
    params = tr.train_scorer(
        mesh, CFG, net, TCFG, steps=2, seed=1, use_fused=False,
    )
    assert all(
        bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(params)
    )


def test_scorer_cross_attention_grouping():
    """MultiPair cross-attention stays within a scene's hypothesis group."""
    cfg = networks.NetConfig(
        width1=8, width2=8, embed_dim=16, num_heads=2, ffn_dim=16,
        crop_hw=32, cross_attention=True,
    )
    params = networks.init_scorer(0, cfg)
    assert "att_cross" in params
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(size=(8, 32, 32, 6)).astype(np.float32))
    b = jnp.asarray(rng.uniform(size=(8, 32, 32, 6)).astype(np.float32))
    # grouped (2 scenes x 4 hyps) == applying each scene separately
    grouped = networks.apply_scorer(params, a, b, cfg, group_size=4)["scores"]
    s0 = networks.apply_scorer(params, a[:4], b[:4], cfg)["scores"]
    s1 = networks.apply_scorer(params, a[4:], b[4:], cfg)["scores"]
    np.testing.assert_allclose(
        np.asarray(grouped), np.concatenate([s0, s1]), atol=2e-2
    )
    # cross-talk exists WITHIN a group: perturbing hypothesis 0 changes
    # hypothesis 1's score...
    a2 = a.at[0].add(0.5)
    pert = networks.apply_scorer(params, a2, b, cfg, group_size=4)["scores"]
    assert abs(float(pert[1, 0] - grouped[1, 0])) > 1e-6
    # ...but NOT across groups
    np.testing.assert_allclose(
        np.asarray(pert[4:]), np.asarray(grouped[4:]), atol=2e-2
    )
    # auto-detect: checkpoint with att_cross engages the layer even when
    # the config flag is off (converter/demo DWIM)
    cfg_off = networks.NetConfig(
        width1=8, width2=8, embed_dim=16, num_heads=2, ffn_dim=16,
        crop_hw=32, cross_attention=False,
    )
    auto = networks.apply_scorer(params, a, b, cfg_off)["scores"]
    base = networks.apply_scorer(
        {k: v for k, v in params.items() if k != "att_cross"}, a, b, cfg_off
    )["scores"]
    assert abs(float((auto - base).sum())) > 1e-6


def test_principal_flip_poses_exact_flips():
    """With zero residual, every flip is an exact 90/180/270-degree
    OBJECT-frame principal-axis rotation of the gt (right-multiplied,
    the reference's symmetry-tf convention)."""
    import jax

    from foundationpose_cpp_tpu.training import synthetic as tr

    gt = np.asarray(
        tr.sample_scene_poses(
            jax.random.PRNGKey(3), 16, tr.SyntheticTrainConfig()
        )
    )
    hyp = np.asarray(
        tr.principal_flip_poses(
            jax.random.PRNGKey(4), jnp.asarray(gt), 0.1,
            residual_rot_deg=0.0, residual_trans_frac=0.0,
        )
    )
    assert hyp.shape == gt.shape
    np.testing.assert_allclose(hyp[:, :3, 3], gt[:, :3, 3], atol=1e-6)
    seen_angles = set()
    for g, h in zip(gt, hyp):
        rel = g[:3, :3].T @ h[:3, :3]  # object-frame flip
        ang = np.degrees(
            np.arccos(np.clip((np.trace(rel) - 1) / 2, -1, 1))
        )
        assert min(abs(ang - 90), abs(ang - 180)) < 0.1, ang  # f32 near pi
        seen_angles.add(round(ang / 90) * 90)
        # axis-aligned: the relative rotation permutes the basis vectors
        perm = np.abs(rel)
        np.testing.assert_allclose(perm.sum(0), 1.0, atol=1e-5)
        np.testing.assert_allclose(perm.sum(1), 1.0, atol=1e-5)
    assert seen_angles == {90, 180}  # both flip magnitudes drawn


def test_scorer_batch_contains_sym_negatives():
    """scorer_sym_frac > 0 injects near-flip hypotheses: some hypotheses
    sit within a few degrees of an exact principal flip of their gt."""
    import jax

    from foundationpose_cpp_tpu.meshio import procedural
    from foundationpose_cpp_tpu.pipeline.renderer import MeshConstants
    from foundationpose_cpp_tpu.training import synthetic as tr

    cfg = FoundationPoseConfig(crop_window_h=32, crop_window_w=32)
    tcfg = tr.SyntheticTrainConfig(
        batch=32, frame_hw=64, scorer_sym_frac=0.5
    )
    mesh = MeshConstants.from_asset(procedural.face_colored_cube())
    batch = tr.make_scorer_batch(
        mesh, jax.random.PRNGKey(0), jnp.asarray(tr.default_intrinsics(tcfg)),
        cfg, tcfg, use_fused=False,
    )
    s, k = batch["labels"].shape
    assert batch["render_input"].shape[0] == s * k
    # labels still normalized per scene
    np.testing.assert_allclose(
        np.asarray(batch["labels"]).sum(-1), 1.0, atol=1e-5
    )

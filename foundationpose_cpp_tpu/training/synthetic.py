"""Synthetic render-and-compare training for the refiner/scorer nets.

The reference's accuracy comes entirely from NVIDIA's pre-trained
checkpoints (opaque TRT engines, reference README.md:72); it ships no
training code. When those out-of-band files are unavailable, this module
makes the pipeline *functionally* accurate by training the exact published
topology (models/networks.py) the same way the original was trained:
render-and-compare on synthetic pose-perturbed views (FoundationPose,
CVPR 2024, trained purely on synthetic data).

TPU-first structure: one compiled program per optimizer step -- the data
generator (observed-frame render, crop warps, target math) and the
forward/backward both live inside the same jit, so the training loop has
one host dispatch per step and zero host-side data loading. The generator
reuses the inference pipeline's own ops (render_branch, warp, pointcloud),
which guarantees the train distribution IS the inference distribution.

Refiner supervision inverts apply_refine_delta (transforms.py:297-319 /
RefinePostProcess foundationpose.cpp:360-406): the target is exactly the
(trans, rot) output that would move the hypothesis onto the ground truth.
Scorer supervision is a per-scene listwise softmax over K hypotheses
against soft labels exp(-ADD/tau).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from foundationpose_cpp_tpu.config import FoundationPoseConfig
from foundationpose_cpp_tpu.geometry import transforms
from foundationpose_cpp_tpu.models import networks
from foundationpose_cpp_tpu.ops import depth as depth_ops
from foundationpose_cpp_tpu.ops import pointcloud, warp
from foundationpose_cpp_tpu.pipeline.renderer import MeshConstants, render_branch


@dataclasses.dataclass(frozen=True)
class SyntheticTrainConfig:
    """Knobs of the synthetic data distribution and the optimizer."""

    # camera of the synthetic scenes: square frame, object fills ~half of it
    frame_hw: int = 160
    focal: float = 450.0
    tz_range: tuple[float, float] = (0.45, 0.75)
    xy_frac: float = 0.06  # |x/z|, |y/z| <= this (stays in frame)

    # refiner perturbations (hypothesis = perturbed ground truth)
    rot_max_deg: float = 25.0
    trans_frac: float = 0.3  # |t_err| <= frac * diameter/2 per axis

    # scorer hypothesis spread: must cover post-refine residuals, the
    # register grid's ~30 degree nearest-rotation gap, AND far-off poses --
    # a scorer trained only to 50 degrees cannot reject geometric-symmetry
    # flips (measured: 90-degree-flipped cube poses won the argmax because
    # flips were out of distribution), so the max spans the full range
    scorer_rot_max_deg: float = 180.0
    scorer_trans_frac: float = 0.5
    # density exponent for scorer perturbation magnitudes: u^power * max.
    # power 2 concentrates samples at SMALL errors -- Register ranks
    # post-refine residuals, so fine discrimination near zero matters most
    scorer_angle_power: float = 2.0
    # fraction of hypotheses drawn uniformly from [far_min, max] degrees
    # instead: near-symmetry flips live in the tail (a 180-degree house
    # flip is ~3% of a u^2 draw), and a scorer that never contrasts them
    # picks flipped poses at Register (measured: 8/12 flipped scenes)
    scorer_far_frac: float = 0.25
    scorer_far_min_deg: float = 90.0
    # fraction of hypotheses replaced by EXACT principal-axis flips of the
    # ground truth (90/180/270 degrees about a random object axis, plus a
    # small residual): for box-like objects these are silhouette-identical
    # poses that only texture disambiguates -- the random-axis far draws
    # above almost never land on them, and a scorer that never contrasts
    # a face flip against its texture picked the flipped cube6 pose at
    # Register (r4 eval: register_flips 1/12, tracked mean 8.7 degrees)
    scorer_sym_frac: float = 0.15
    hyps_per_scene: int = 8
    score_tau: float = 0.05  # soft-label temperature, units of diameter

    batch: int = 64  # refiner scenes per step (scorer: batch//hyps_per_scene)
    lr: float = 2e-4
    weight_decay: float = 1e-5
    warmup_steps: int = 100
    steps_per_call: int = 10  # optimizer steps fused into one dispatch
    add_points: int = 256  # mesh-vertex subsample for ADD labels


def default_intrinsics(tcfg: SyntheticTrainConfig) -> np.ndarray:
    s = tcfg.frame_hw
    return np.array(
        [[tcfg.focal, 0.0, s / 2], [0.0, tcfg.focal, s / 2], [0.0, 0.0, 1.0]],
        dtype=np.float32,
    )


# ---------------------------------------------------------------------------
# pose sampling


def _random_rotations(key: jax.Array, n: int) -> jnp.ndarray:
    """Uniform random rotations via normalized quaternions -> (n, 3, 3)."""
    q = jax.random.normal(key, (n, 4), dtype=jnp.float32)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def sample_scene_poses(
    key: jax.Array, n: int, tcfg: SyntheticTrainConfig
) -> jnp.ndarray:
    """n random object-in-camera ground-truth poses inside the frustum."""
    kr, kz, kxy = jax.random.split(key, 3)
    poses = jnp.tile(jnp.eye(4, dtype=jnp.float32), (n, 1, 1))
    poses = poses.at[:, :3, :3].set(_random_rotations(kr, n))
    tz = jax.random.uniform(
        kz, (n,), minval=tcfg.tz_range[0], maxval=tcfg.tz_range[1]
    )
    xy = jax.random.uniform(
        kxy, (n, 2), minval=-tcfg.xy_frac, maxval=tcfg.xy_frac
    ) * tz[:, None]
    poses = poses.at[:, 0, 3].set(xy[:, 0])
    poses = poses.at[:, 1, 3].set(xy[:, 1])
    poses = poses.at[:, 2, 3].set(tz)
    return poses


def perturb_poses(
    key: jax.Array,
    gt_poses: jnp.ndarray,
    rot_max_deg: float,
    trans_frac: float,
    diameter: float,
    angle_power: float = 1.0,
    far_frac: float = 0.0,
    far_min_deg: float = 90.0,
) -> jnp.ndarray:
    """Hypotheses = ground truth with bounded rotation/translation noise.

    Rotation noise is applied on the LEFT (camera frame), matching the
    refiner's delta convention R' = dR^T R (apply_refine_delta).
    angle_power > 1 concentrates magnitudes near zero (u^power * max);
    far_frac replaces that fraction of draws with uniform
    [far_min_deg, rot_max_deg] angles (symmetry-flip negatives).
    """
    n = gt_poses.shape[0]
    ka, km, kt, kf, kg = jax.random.split(key, 5)
    axis = jax.random.normal(ka, (n, 3), dtype=jnp.float32)
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-9)
    u = jax.random.uniform(km, (n, 1))
    ang = (u**angle_power) * float(np.deg2rad(rot_max_deg))
    take_far = None
    if far_frac > 0.0:
        far = jax.random.uniform(
            kf, (n, 1),
            minval=float(np.deg2rad(far_min_deg)),
            maxval=float(np.deg2rad(rot_max_deg)),
        )
        take_far = jax.random.bernoulli(kg, far_frac, (n, 1))
        ang = jnp.where(take_far, far, ang)
    d_rot = transforms.axis_angle_to_matrix(axis * ang)
    t_noise_raw = jax.random.uniform(
        kt, (n, 3), minval=-trans_frac, maxval=trans_frac
    ) * (diameter / 2.0)
    t_noise = t_noise_raw
    if angle_power != 1.0:
        t_noise = t_noise * (u**(angle_power - 1.0))
        # far-angle negatives must keep full-range translation error too;
        # the u-scale above comes from the unrelated small-angle draw and
        # would otherwise make far negatives rotation-only.
        if take_far is not None:
            t_noise = jnp.where(take_far, t_noise_raw, t_noise)
    hyp = gt_poses.at[:, :3, :3].set(
        jnp.einsum("nij,njk->nik", d_rot, gt_poses[:, :3, :3])
    )
    return hyp.at[:, :3, 3].add(t_noise)


def principal_flip_poses(
    key: jax.Array,
    gt_poses: jnp.ndarray,
    diameter: float,
    residual_rot_deg: float = 12.0,
    residual_trans_frac: float = 0.15,
) -> jnp.ndarray:
    """Hypotheses at exact 90/180/270-degree OBJECT-frame principal-axis
    flips of the ground truth, with a small residual perturbation.

    Right-multiplied like the reference's symmetry transforms
    (foundationpose_sampling.cpp:152-162, ``cur_pose * tf``): for boxes
    these are the silhouette-identical flips a scorer can only reject by
    reading the texture -- the hardest negatives for Register's argmax.
    """
    n = gt_poses.shape[0]
    ka, kq, kr = jax.random.split(key, 3)
    axes = jnp.eye(3, dtype=jnp.float32)[jax.random.randint(ka, (n,), 0, 3)]
    ang = jax.random.randint(kq, (n, 1), 1, 4).astype(jnp.float32) * (
        jnp.pi / 2.0
    )
    r_flip = transforms.axis_angle_to_matrix(axes * ang)
    flipped = gt_poses.at[:, :3, :3].set(
        jnp.einsum("nij,njk->nik", gt_poses[:, :3, :3], r_flip)
    )
    return perturb_poses(
        kr, flipped, residual_rot_deg, residual_trans_frac, diameter,
        angle_power=2.0,
    )


def refine_targets(
    gt_poses: jnp.ndarray,
    hyp_poses: jnp.ndarray,
    diameter: float,
    rot_normalizer: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The refiner output that maps hyp -> gt under apply_refine_delta.

    apply_refine_delta does t' = t + trans*(d/2), R' = A(tanh(rot)*c)^T R.
    Solving R' = R_gt gives A = R_hyp R_gt^T, so the rotation target (in
    radians, BEFORE the tanh squash) is log(R_hyp R_gt^T).
    Returns (trans_target (N,3), rotvec_target (N,3) in radians).
    """
    t_target = (gt_poses[:, :3, 3] - hyp_poses[:, :3, 3]) / (diameter / 2.0)
    a = jnp.einsum(
        "nij,nkj->nik", hyp_poses[:, :3, :3], gt_poses[:, :3, :3]
    )  # R_hyp @ R_gt^T
    rv_target = transforms.matrix_to_axis_angle(a)
    return t_target, rv_target


# ---------------------------------------------------------------------------
# synthetic observations (traced; the jit-able twin of utils.synthetic)


def render_observed(
    mesh: MeshConstants,
    gt_poses: jnp.ndarray,
    K: jnp.ndarray,
    h: int,
    w: int,
    cfg: FoundationPoseConfig,
    rasterize_fn: Any = None,
    use_fused: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Render N observed frames at the gt poses -> (rgb u8, depth f32).

    Full frame as the crop window (bbox = whole image), exactly like
    utils.synthetic.render_scene but traceable and batched. Depth is
    recovered from the render branch's diameter-normalized xyz channels.
    """
    n = gt_poses.shape[0]
    bbox = jnp.broadcast_to(
        jnp.array([0.0, 0.0, float(w), float(h)], jnp.float32), (n, 4)
    )
    clip = transforms.pose_clip_matrix(
        gt_poses, bbox, K, h, w, cfg.znear, cfg.zfar
    )
    out6 = render_branch(mesh, gt_poses, clip, h, w, cfg, rasterize_fn, use_fused)
    rgb = jnp.round(jnp.clip(out6[..., :3], 0.0, 1.0) * 255.0).astype(jnp.uint8)
    xyz_ds = out6[..., 3:6]
    fg = jnp.any(xyz_ds != 0.0, axis=-1)
    z = xyz_ds[..., 2] * (mesh.diameter / 2.0) + gt_poses[:, 2, 3][:, None, None]
    depth = jnp.where(fg, z, 0.0).astype(jnp.float32)
    return rgb, depth


def _model_inputs(
    mesh: MeshConstants,
    hyp_poses: jnp.ndarray,
    rgb_obs: jnp.ndarray,
    depth_obs: jnp.ndarray,
    K: jnp.ndarray,
    crop_ratio: float,
    cfg: FoundationPoseConfig,
    rasterize_fn: Any,
    use_fused: bool,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(render_input, transf_input) for N (scene, hypothesis) pairs.

    Unlike render_and_transform (one shared image, N poses), every
    hypothesis here has its OWN observed frame; the observed branch vmaps
    the same warp/threshold ops over the scene axis.
    """
    ch, cw = cfg.crop_window_h, cfg.crop_window_w
    h, w = rgb_obs.shape[1:3]
    tfs = transforms.compute_crop_window_tf(
        hyp_poses, K, (ch, cw), crop_ratio, mesh.diameter
    )
    bbox = transforms.construct_bbox2d(tfs, ch, cw)
    clip = transforms.pose_clip_matrix(
        hyp_poses, bbox, K, h, w, cfg.znear, cfg.zfar
    )
    render_in = render_branch(
        mesh, hyp_poses, clip, ch, cw, cfg, rasterize_fn, use_fused
    )

    def obs(rgb_i, depth_i, tf_i, hyp_i):
        xyz_i = depth_ops.depth_to_xyz(depth_i, K, cfg.min_depth)
        if use_fused:
            rc = warp.warp_crop_linear_u8_mxu(rgb_i, tf_i[None], ch, cw)
            xc = warp.warp_crop_nearest_f32_mxu(xyz_i, tf_i[None], ch, cw)
        else:
            rc = warp.warp_crop_linear_u8(rgb_i, tf_i[None], ch, cw)
            xc = warp.warp_crop_nearest_f32(xyz_i, tf_i[None], ch, cw)
        xc = pointcloud.threshold_and_downscale_pointcloud(
            xc, hyp_i[None], mesh.diameter / 2.0, cfg.min_depth, cfg.max_depth
        )
        return pointcloud.concat_channels(rc, xc)[0]

    transf_in = jax.vmap(obs)(rgb_obs, depth_obs, tfs, hyp_poses)
    return render_in, transf_in


# ---------------------------------------------------------------------------
# batches


def make_refiner_batch(
    mesh: MeshConstants,
    key: jax.Array,
    K: jnp.ndarray,
    cfg: FoundationPoseConfig,
    tcfg: SyntheticTrainConfig,
    rasterize_fn: Any = None,
    use_fused: bool = False,
) -> dict[str, jnp.ndarray]:
    """One refiner training batch of tcfg.batch (scene, hypothesis) pairs."""
    kp, kh = jax.random.split(key)
    gt = sample_scene_poses(kp, tcfg.batch, tcfg)
    hyp = perturb_poses(kh, gt, tcfg.rot_max_deg, tcfg.trans_frac, mesh.diameter)
    rgb_obs, depth_obs = render_observed(
        mesh, gt, K, tcfg.frame_hw, tcfg.frame_hw, cfg, rasterize_fn, use_fused
    )
    render_in, transf_in = _model_inputs(
        mesh, hyp, rgb_obs, depth_obs, K, cfg.refine_crop_ratio, cfg,
        rasterize_fn, use_fused,
    )
    t_t, rv_t = refine_targets(gt, hyp, mesh.diameter, cfg.rot_normalizer)
    return {
        "render_input": render_in,
        "transf_input": transf_in,
        "trans_target": t_t,
        "rotvec_target": rv_t,
    }


def make_scorer_batch(
    mesh: MeshConstants,
    key: jax.Array,
    K: jnp.ndarray,
    cfg: FoundationPoseConfig,
    tcfg: SyntheticTrainConfig,
    rasterize_fn: Any = None,
    use_fused: bool = False,
) -> dict[str, jnp.ndarray]:
    """S scenes x K hypotheses with soft ADD labels (flattened to S*K)."""
    kh_ = tcfg.hyps_per_scene
    s = max(1, tcfg.batch // kh_)
    kp, kh, kf, kb = jax.random.split(key, 4)
    gt = sample_scene_poses(kp, s, tcfg)  # (S,4,4)
    gt_rep = jnp.repeat(gt, kh_, axis=0)  # (S*K,4,4)
    hyp = perturb_poses(
        kh, gt_rep, tcfg.scorer_rot_max_deg, tcfg.scorer_trans_frac,
        mesh.diameter, angle_power=tcfg.scorer_angle_power,
        far_frac=tcfg.scorer_far_frac, far_min_deg=tcfg.scorer_far_min_deg,
    )
    if tcfg.scorer_sym_frac > 0.0:
        # texture-only-distinguishable hard negatives (see config note)
        sym_hyp = principal_flip_poses(kf, gt_rep, mesh.diameter)
        take = jax.random.bernoulli(kb, tcfg.scorer_sym_frac, (gt_rep.shape[0], 1, 1))
        hyp = jnp.where(take, sym_hyp, hyp)
    rgb_obs, depth_obs = render_observed(
        mesh, gt, K, tcfg.frame_hw, tcfg.frame_hw, cfg, rasterize_fn, use_fused
    )
    rgb_rep = jnp.repeat(rgb_obs, kh_, axis=0)
    depth_rep = jnp.repeat(depth_obs, kh_, axis=0)
    render_in, transf_in = _model_inputs(
        mesh, hyp, rgb_rep, depth_rep, K, cfg.score_crop_ratio, cfg,
        rasterize_fn, use_fused,
    )
    # ADD error per hypothesis on a fixed vertex subsample
    v = mesh.vertices
    stride = max(1, v.shape[0] // tcfg.add_points)
    pts = v[::stride]  # (P,3)
    p_gt = jnp.einsum("nij,pj->npi", gt_rep[:, :3, :3], pts) + gt_rep[:, None, :3, 3]
    p_hy = jnp.einsum("nij,pj->npi", hyp[:, :3, :3], pts) + hyp[:, None, :3, 3]
    add = jnp.linalg.norm(p_hy - p_gt, axis=-1).mean(axis=-1)  # (S*K,)
    labels = jax.nn.softmax(
        -add.reshape(s, kh_) / (tcfg.score_tau * mesh.diameter), axis=-1
    )
    return {
        "render_input": render_in,
        "transf_input": transf_in,
        "labels": labels,  # (S, K)
        "add": add.reshape(s, kh_),
    }


# ---------------------------------------------------------------------------
# losses


def refiner_loss(
    params: Any,
    batch: dict[str, jnp.ndarray],
    net_cfg: networks.NetConfig,
    rot_normalizer: float,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    out = networks.apply_refiner(
        params, batch["render_input"], batch["transf_input"], net_cfg
    )
    l_t = jnp.mean((out["trans"] - batch["trans_target"]) ** 2)
    # supervise the squashed rotation (what apply_refine_delta consumes);
    # targets beyond the +-rot_normalizer tanh range saturate toward +-1
    rv_unit = jnp.clip(batch["rotvec_target"] / rot_normalizer, -0.999, 0.999)
    l_r = jnp.mean((jnp.tanh(out["rot"]) - rv_unit) ** 2)
    return l_t + l_r, {"loss_trans": l_t, "loss_rot": l_r}


def scorer_loss(
    params: Any,
    batch: dict[str, jnp.ndarray],
    net_cfg: networks.NetConfig,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    s, k = batch["labels"].shape
    out = networks.apply_scorer(
        params, batch["render_input"], batch["transf_input"], net_cfg,
        # MultiPair: attend within each scene's K hypotheses only
        group_size=k if net_cfg.cross_attention else None,
    )
    logits = out["scores"].reshape(s, k)
    ce = -jnp.sum(batch["labels"] * jax.nn.log_softmax(logits, axis=-1), -1)
    # rank quality: fraction of scenes where argmax(score) = argmin(ADD)
    top1 = jnp.mean(
        (jnp.argmax(logits, -1) == jnp.argmin(batch["add"], -1)).astype(
            jnp.float32
        )
    )
    return jnp.mean(ce), {"top1": top1}


# ---------------------------------------------------------------------------
# training loops


def _f32(tree: Any) -> Any:
    return jax.tree.map(lambda a: a.astype(jnp.float32), tree)


def _train(
    init_params: Any,
    make_batch: Callable[[jax.Array], dict[str, jnp.ndarray]],
    loss_fn: Callable[[Any, dict[str, jnp.ndarray]], tuple[jnp.ndarray, dict]],
    tcfg: SyntheticTrainConfig,
    steps: int,
    seed: int,
    log: Callable[[str], None] | None,
) -> Any:
    import optax

    spc_eff = max(1, tcfg.steps_per_call)
    steps_run = -(-steps // spc_eff) * spc_eff
    if steps_run != steps and log is not None:
        # a ragged tail chunk would change the scan length and recompile
        # the ENTIRE jitted train step (minutes for fused-render steps)
        # for a handful of steps of work; a few extra steps at the end of
        # the cosine decay are benign by comparison
        log(
            f"rounding steps {steps} -> {steps_run} (multiple of "
            f"steps_per_call={spc_eff}; avoids a tail-chunk recompile)"
        )
    steps = steps_run
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, tcfg.lr, tcfg.warmup_steps, max(steps, tcfg.warmup_steps + 1)
    )
    opt = optax.adamw(schedule, weight_decay=tcfg.weight_decay)
    params = _f32(init_params)
    opt_state = opt.init(params)

    spc = max(1, tcfg.steps_per_call)

    @jax.jit
    def run_chunk(params, opt_state, keys):
        def one_step(carry, key):
            params, opt_state = carry
            batch = make_batch(key)
            batch = jax.lax.stop_gradient(batch)
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch
            )
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (loss, aux)

        (params, opt_state), (losses, auxes) = jax.lax.scan(
            one_step, (params, opt_state), keys
        )
        return params, opt_state, losses, auxes

    root = jax.random.PRNGKey(seed)
    t0 = time.perf_counter()
    done = 0
    while done < steps:
        n = min(spc, steps - done)
        keys = jax.random.split(jax.random.fold_in(root, done), n)
        params, opt_state, losses, auxes = run_chunk(params, opt_state, keys)
        done += n
        if log is not None:
            aux_s = ", ".join(
                f"{k}={float(np.asarray(v[-1])):.4f}" for k, v in auxes.items()
            )
            rate = done / (time.perf_counter() - t0)
            log(
                f"step {done}/{steps}  loss={float(np.asarray(losses[-1])):.4f}"
                f"  {aux_s}  ({rate:.1f} steps/s)"
            )
    return params


def train_refiner(
    mesh: MeshConstants,
    cfg: FoundationPoseConfig,
    net_cfg: networks.NetConfig,
    tcfg: SyntheticTrainConfig,
    steps: int = 2000,
    seed: int = 0,
    K: np.ndarray | None = None,
    rasterize_fn: Any = None,
    use_fused: bool | None = None,
    log: Callable[[str], None] | None = None,
) -> Any:
    """Train RefineNet on synthetic pairs; returns an f32 params pytree."""
    if use_fused is None:
        use_fused = jax.default_backend() == "tpu"
    Kj = jnp.asarray(K if K is not None else default_intrinsics(tcfg))
    # train in f32: conv VJPs reject the bf16-in/f32-accum mix the inference
    # path uses (XLA:TPU still runs f32 matmuls as bf16 passes on the MXU).
    # attn_impl: the whole-head Pallas kernel is forward-only; training
    # differentiates through the (numerically equivalent) XLA core.
    net_cfg_t = dataclasses.replace(
        net_cfg, dtype=jnp.float32, attn_impl="xla"
    )

    def make_batch(key):
        return make_refiner_batch(
            mesh, key, Kj, cfg, tcfg, rasterize_fn, use_fused
        )

    def loss(params, batch):
        return refiner_loss(params, batch, net_cfg_t, cfg.rot_normalizer)

    return _train(
        networks.init_refiner(seed, net_cfg_t), make_batch, loss, tcfg, steps,
        seed, log,
    )


def train_scorer(
    mesh: MeshConstants,
    cfg: FoundationPoseConfig,
    net_cfg: networks.NetConfig,
    tcfg: SyntheticTrainConfig,
    steps: int = 2000,
    seed: int = 1,
    K: np.ndarray | None = None,
    rasterize_fn: Any = None,
    use_fused: bool | None = None,
    log: Callable[[str], None] | None = None,
) -> Any:
    """Train ScoreNet on synthetic K-way ranking; returns f32 params."""
    if use_fused is None:
        use_fused = jax.default_backend() == "tpu"
    Kj = jnp.asarray(K if K is not None else default_intrinsics(tcfg))
    # forward-only Pallas attention: see train_refiner
    net_cfg_t = dataclasses.replace(
        net_cfg, dtype=jnp.float32, attn_impl="xla"
    )

    def make_batch(key):
        return make_scorer_batch(
            mesh, key, Kj, cfg, tcfg, rasterize_fn, use_fused
        )

    def loss(params, batch):
        return scorer_loss(params, batch, net_cfg_t)

    return _train(
        networks.init_scorer(seed, net_cfg_t), make_batch, loss, tcfg, steps,
        seed, log,
    )

"""FoundationPose: the public Register/Track pipeline, one XLA program each.

Reference API surface: Base6DofDetectionModel::{Register, Track}
(include/detection_6d_foundationpose/foundationpose.hpp:36-64) and the
orchestration in src/foundationpose.cpp:181-265. Input contracts preserved:
RGB order uint8 image, float32 metric depth, uint8 binary mask (Register
only), intrinsics bound to the image geometry, per-mesh registry keyed by
target name, poses emitted in the mesh coordinate frame, refine_itr
parameter (default 1), size/registry validation mirroring
CheckInputArguments (:155-179).

TPU-native structure (SURVEY.md SS7): where the reference's Register crosses
the host/device boundary >= 6 times per call (upload, sampler D2H, per-stage
blob staging, host Eigen pose composition, thrust argmax), each call here is
ONE compiled XLA program with one H2D (the frame) and one D2H (the pose):

  register: depth filters -> on-device translation guess -> 252-pose grid ->
            scan(refine_itr) [render+crop -> refiner -> compose delta] ->
            render+crop(1.1) -> scorer -> argmax

Programs are compiled per (mesh, image size, hypothesis count, refine_itr)
and cached -- the same policy as the reference's TensorRT engines with
dynamic-shape buckets (tools/cvt_onnx2trt.bash), which also JIT per shape
profile. Dynamic-sized input (reference README.md:20) works by recompiling
once per new camera geometry.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from foundationpose_cpp_tpu.config import DEFAULT_CONFIG, FoundationPoseConfig
from foundationpose_cpp_tpu.geometry import icosphere, transforms
from foundationpose_cpp_tpu.meshio.mesh_loader import MeshAsset
from foundationpose_cpp_tpu.models import networks
from foundationpose_cpp_tpu.ops import depth as depth_ops
from foundationpose_cpp_tpu.pipeline.renderer import MeshConstants, render_and_transform


def refine_loop(
    mesh: MeshConstants,
    params_r: Any,
    poses: jnp.ndarray,
    rgb: jnp.ndarray,
    xyz_map: jnp.ndarray,
    K: jnp.ndarray,
    refine_itr: int,
    cfg: FoundationPoseConfig,
    net_cfg: networks.NetConfig,
    rasterize_fn: Any = None,
    use_fused: bool = False,
    image_hw: tuple | None = None,
) -> jnp.ndarray:
    """scan over refine iterations: render -> refiner -> compose delta.

    The reference runs this loop on the host with a SyncInfer + Eigen
    post-process per iteration (foundationpose.cpp:200-213); here the whole
    loop is a lax.scan inside the compiled program.
    """

    def body(poses, _):
        render_in, transf_in = render_and_transform(
            mesh, poses, rgb, xyz_map, K, cfg.refine_crop_ratio, cfg,
            rasterize_fn, use_fused, image_hw,
        )
        out = networks.apply_refiner(params_r, render_in, transf_in, net_cfg)
        new_poses = transforms.apply_refine_delta(
            poses, out["trans"], out["rot"], mesh.diameter, cfg.rot_normalizer
        )
        return new_poses, None

    poses, _ = jax.lax.scan(body, poses, None, length=refine_itr)
    return poses


def prepare_register(
    depth: jnp.ndarray,
    mask: jnp.ndarray,
    rot_grid: jnp.ndarray,
    K: jnp.ndarray,
    cfg: FoundationPoseConfig,
    image_hw: tuple | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-image Register front end: depth filters -> translation guess ->
    hypothesis poses, plus the raw-depth xyz map the crops sample.

    Replicated under multi-chip sharding (cheap, image-sized work); the
    per-hypothesis heavy lifting lives in refine_and_score.
    Returns (poses0 (M,4,4), xyz_map, ok).
    """
    df = cfg.depth_filter
    extent_valid = None
    if image_hw is not None:
        hh, ww = depth.shape
        rows = jax.lax.broadcasted_iota(jnp.int32, (hh, ww), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (hh, ww), 1)
        extent_valid = (rows < image_hw[0]) & (cols < image_hw[1])
    eroded = depth_ops.erode_depth(
        depth, df.erode_radius, df.erode_depth_diff_thres,
        df.erode_ratio_thres, df.zfar, valid=extent_valid,
    )
    filtered = depth_ops.bilateral_filter_depth(
        eroded, df.bilateral_radius, df.bilateral_sigma_d,
        df.bilateral_sigma_r, df.zfar, df.bilateral_mean_band,
    )
    center, ok = depth_ops.guess_translation(filtered, mask, K, cfg.min_depth)
    poses = rot_grid.at[:, :3, 3].set(center[None, :])
    xyz_map = depth_ops.depth_to_xyz(depth, K, cfg.min_depth)
    return poses, xyz_map, ok


def refine_and_score(
    mesh: MeshConstants,
    params_r: Any,
    params_s: Any,
    poses: jnp.ndarray,
    rgb: jnp.ndarray,
    xyz_map: jnp.ndarray,
    K: jnp.ndarray,
    refine_itr: int,
    cfg: FoundationPoseConfig,
    net_cfg: networks.NetConfig,
    rasterize_fn: Any = None,
    use_fused: bool = False,
    image_hw: tuple | None = None,
    scorer_axis_name: str | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-hypothesis section of Register: refine loop + score render +
    scorer. Everything here is embarrassingly parallel over the hypothesis
    axis except the scorer's optional cross-attention, which all-gathers
    pooled embeddings when scorer_axis_name names a shard_map mesh axis
    (parallel/sharding.py wraps this exact function for multi-chip).

    Returns (refined_poses (M,4,4), raw scores (M,)).
    """
    poses = refine_loop(
        mesh, params_r, poses, rgb, xyz_map, K, refine_itr, cfg, net_cfg,
        rasterize_fn, use_fused, image_hw,
    )
    render_in, transf_in = render_and_transform(
        mesh, poses, rgb, xyz_map, K, cfg.score_crop_ratio, cfg, rasterize_fn,
        use_fused, image_hw,
    )
    out = networks.apply_scorer(
        params_s, render_in, transf_in, net_cfg, axis_name=scorer_axis_name
    )
    return poses, out["scores"][:, 0]


def register_step(
    mesh: MeshConstants,
    params_r: Any,
    params_s: Any,
    rgb: jnp.ndarray,
    depth: jnp.ndarray,
    mask: jnp.ndarray,
    rot_grid: jnp.ndarray,
    K: jnp.ndarray,
    refine_itr: int,
    cfg: FoundationPoseConfig,
    net_cfg: networks.NetConfig,
    rasterize_fn: Any = None,
    hyp_valid: jnp.ndarray | None = None,
    use_fused: bool = False,
    image_hw: tuple | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The full Register computation as one traceable function.

    hyp_valid masks padded grid rows (multi-chip sharding pads 252 up to a
    multiple of the device count); invalid rows score -inf before the argmax.
    image_hw carries the REAL (h, w) extents (traced scalars) when the input
    arrays are zero-padded to a size bucket; see FoundationPoseConfig
    .size_buckets.

    Returns (best_pose, refined_poses, scores, ok).
    """
    poses, xyz_map, ok = prepare_register(
        depth, mask, rot_grid, K, cfg, image_hw
    )
    poses, scores = refine_and_score(
        mesh, params_r, params_s, poses, rgb, xyz_map, K, refine_itr, cfg,
        net_cfg, rasterize_fn, use_fused, image_hw,
    )
    if hyp_valid is not None:
        scores = jnp.where(hyp_valid, scores, -jnp.inf)
    best = jnp.argmax(scores)  # getMaxScoreIndex (thrust) equivalent
    # NaN-poison the best pose when the translation guess failed so the
    # caller can detect failure from the pose readback alone -- the host
    # never does a separate blocking bool(ok) sync on the hot path.
    best_pose = jnp.where(ok, poses[best], jnp.nan)
    return best_pose, poses, scores, ok


def track_step(
    mesh: MeshConstants,
    params_r: Any,
    rgb: jnp.ndarray,
    depth: jnp.ndarray,
    poses: jnp.ndarray,
    K: jnp.ndarray,
    refine_itr: int,
    cfg: FoundationPoseConfig,
    net_cfg: networks.NetConfig,
    rasterize_fn: Any = None,
    use_fused: bool = False,
    image_hw: tuple | None = None,
) -> jnp.ndarray:
    """Track computation for a (N, 4, 4) batch of instances of one mesh.

    N=1 reproduces the reference Track; N>1 is the multi-object tracking
    batch (instances share the refiner weights and the mesh)."""
    xyz_map = depth_ops.depth_to_xyz(depth, K, cfg.min_depth)
    return refine_loop(
        mesh, params_r, poses, rgb, xyz_map, K, refine_itr, cfg, net_cfg,
        rasterize_fn, use_fused, image_hw,
    )


class FoundationPose:
    """Multi-mesh 6-DoF pose estimator (CreateFoundationPoseModel parity)."""

    def __init__(
        self,
        refiner_params: Any,
        scorer_params: Any,
        mesh_assets: list[MeshAsset],
        intrinsic: np.ndarray,
        max_input_image_h: int = 1080,
        max_input_image_w: int = 1920,
        config: FoundationPoseConfig = DEFAULT_CONFIG,
        net_config: networks.NetConfig = networks.NetConfig(),
        rasterize_fn: Any = None,
        use_fused_renderer: bool | None = None,
        auto_subdivide: bool | None = None,
        subdivide_max_faces: int = 8192,
    ) -> None:
        if not mesh_assets:
            raise ValueError("[FoundationPose] need at least one mesh asset")
        self._cfg = config
        self._net_cfg = net_config
        self._refiner_params = refiner_params
        self._scorer_params = scorer_params
        self._K = jnp.asarray(np.asarray(intrinsic, dtype=np.float32))
        self._max_h = max_input_image_h
        self._max_w = max_input_image_w
        if use_fused_renderer is None:
            # the fused megakernel is the TPU production path; the unfused
            # op composition is the exact/portable path used elsewhere
            use_fused_renderer = jax.default_backend() == "tpu"
        # keep the value verbatim: "interpret" is a documented mode (the
        # fused kernel in Pallas interpret mode, for CPU hosts); bool()
        # would coerce it to True and try to lower the real TPU kernel
        self._use_fused = use_fused_renderer
        if auto_subdivide is None:
            # The texture-fidelity policy (meshio/subdivide.py
            # subdivide_adaptive) matters exactly when the FUSED renderer is
            # in play: the megakernel samples the texture at face corners,
            # so a sharp-textured mesh needs subdividing until corner
            # sampling matches per-pixel texturing. The unfused path does
            # true per-pixel bilinear texturing (ops/rasterize.py
            # texture_bilinear_wrap, reference texture.cu:131-179 semantics)
            # and needs no policy.
            auto_subdivide = self._use_fused
        self._meshes: dict[str, MeshConstants] = {}
        self._assets: dict[str, MeshAsset] = {}
        for asset in mesh_assets:
            if asset.name in self._meshes:
                raise ValueError(f"[FoundationPose] duplicate mesh name '{asset.name}'")
            # subdivide_max_faces bounds the fused-render cost the policy
            # may spend on texture fidelity (render time scales with the
            # face table); the residual error past the cap is logged.
            self._meshes[asset.name] = MeshConstants.from_asset(
                asset, auto_subdivide=bool(auto_subdivide),
                subdivide_max_faces=subdivide_max_faces,
            )
            self._assets[asset.name] = asset
        self._rot_grid = jnp.asarray(
            icosphere.make_rotation_grid(config.n_views, config.inplane_step_deg)
        )
        self._rasterize_fn = rasterize_fn
        self._register_cache: dict[tuple, Any] = {}
        self._track_cache: dict[tuple, Any] = {}

    # ------------------------------------------------------------------
    # validation (CheckInputArguments, foundationpose.cpp:155-179)

    def _check_inputs(self, rgb, depth, mask, target_name) -> None:
        if rgb.shape[:2] != depth.shape[:2] or (
            mask is not None and mask.shape[:2] != depth.shape[:2]
        ):
            raise ValueError(
                f"[FoundationPose] rgb/depth/mask size mismatch: "
                f"{rgb.shape[:2]} vs {depth.shape[:2]}"
                + (f" vs {mask.shape[:2]}" if mask is not None else "")
            )
        if rgb.shape[0] > self._max_h or rgb.shape[1] > self._max_w:
            raise ValueError(
                f"[FoundationPose] image {rgb.shape[:2]} exceeds construction "
                f"max ({self._max_h}, {self._max_w})"
            )
        if target_name not in self._meshes:
            raise KeyError(
                f"[FoundationPose] unknown target '{target_name}'; registered: "
                f"{sorted(self._meshes)}"
            )
        if rgb.dtype != np.uint8:
            raise TypeError("[FoundationPose] rgb must be uint8 RGB")
        if depth.dtype != np.float32:
            raise TypeError("[FoundationPose] depth must be float32 meters")

    # ------------------------------------------------------------------
    # traced program bodies

    def _register_program(self, mesh_name: str, refine_itr: int,
                          bucketed: bool = False):
        mesh = self._meshes[mesh_name]

        if bucketed:
            # arrays are padded to a bucket; the REAL extents ride as dynamic
            # scalars so every size within the bucket shares this executable
            @jax.jit
            def program(params_r, params_s, rgb, depth, mask, rot_grid, h, w):
                return register_step(
                    mesh, params_r, params_s, rgb, depth, mask, rot_grid,
                    self._K, refine_itr, self._cfg, self._net_cfg,
                    self._rasterize_fn, use_fused=self._use_fused,
                    image_hw=(h, w),
                )

            return program

        @jax.jit
        def program(params_r, params_s, rgb, depth, mask, rot_grid):
            return register_step(
                mesh, params_r, params_s, rgb, depth, mask, rot_grid,
                self._K, refine_itr, self._cfg, self._net_cfg,
                self._rasterize_fn, use_fused=self._use_fused,
            )

        return program

    def _track_program(self, mesh_name: str, refine_itr: int,
                       bucketed: bool = False):
        mesh = self._meshes[mesh_name]

        if bucketed:
            @jax.jit
            def program(params_r, rgb, depth, pose, h, w):
                poses = track_step(
                    mesh, params_r, rgb, depth, pose[None, :, :], self._K,
                    refine_itr, self._cfg, self._net_cfg, self._rasterize_fn,
                    use_fused=self._use_fused, image_hw=(h, w),
                )
                return poses[0]

            return program

        @jax.jit
        def program(params_r, rgb, depth, pose):
            poses = track_step(
                mesh, params_r, rgb, depth, pose[None, :, :], self._K,
                refine_itr, self._cfg, self._net_cfg, self._rasterize_fn,
                use_fused=self._use_fused,
            )
            return poses[0]

        return program

    # ------------------------------------------------------------------
    # size bucketing (reference README.md:20 dynamic input sizes)

    def _bucket_for(self, h: int, w: int) -> tuple[int, int] | None:
        """Smallest configured bucket fitting (h, w); None = bucketing off."""
        buckets = self._cfg.size_buckets
        if buckets is None:
            return None
        for bh, bw in sorted(buckets, key=lambda b: b[0] * b[1]):
            if bh >= h and bw >= w:
                return (int(bh), int(bw))
        raise ValueError(
            f"[FoundationPose] no size bucket fits ({h}, {w}); "
            f"buckets={buckets}"
        )

    @staticmethod
    def _pad_to(arr: np.ndarray, bh: int, bw: int) -> np.ndarray:
        h, w = arr.shape[:2]
        if (h, w) == (bh, bw):
            return np.asarray(arr)
        pad = [(0, bh - h), (0, bw - w)] + [(0, 0)] * (arr.ndim - 2)
        return np.pad(np.asarray(arr), pad)

    # ------------------------------------------------------------------
    # public API

    def _run_register(self, rgb, depth, mask, target_name, refine_itr):
        """Shared Register plumbing (cache key, bucket padding, dispatch);
        returns the raw (best, poses, scores, ok) device tuple. The key /
        bucket / padding policy lives HERE only -- register and
        register_with_scores differ solely in what they read back."""
        self._check_inputs(rgb, depth, mask, target_name)
        h, w = rgb.shape[:2]
        bucket = self._bucket_for(h, w)
        key = ("register", target_name, bucket or (h, w), int(refine_itr),
               bucket is not None)
        if key not in self._register_cache:
            self._register_cache[key] = self._register_program(
                target_name, int(refine_itr), bucketed=bucket is not None
            )
        program = self._register_cache[key]
        if bucket is not None:
            bh, bw = bucket
            return program(
                self._refiner_params, self._scorer_params,
                jnp.asarray(self._pad_to(rgb, bh, bw)),
                jnp.asarray(self._pad_to(depth, bh, bw)),
                jnp.asarray(self._pad_to(mask, bh, bw)),
                self._rot_grid, jnp.int32(h), jnp.int32(w),
            )
        return program(
            self._refiner_params, self._scorer_params,
            jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(mask),
            self._rot_grid,
        )

    def register(
        self,
        rgb: np.ndarray,
        depth: np.ndarray,
        mask: np.ndarray,
        target_name: str,
        refine_itr: int = 1,
    ) -> np.ndarray:
        """Cold-start pose estimation; returns a 4x4 pose in mesh frame.

        Mirrors FoundationPose::Register (foundationpose.cpp:181-228).
        Raises RuntimeError when the mask is empty / has no valid depth (the
        reference's sampler CHECK_STATE failure path).
        """
        best, _, _, _ = self._run_register(
            rgb, depth, mask, target_name, refine_itr
        )
        # ONE blocking D2H: the pose itself. Failure rides in-band as a
        # NaN-poisoned pose (register_step), so no separate bool(ok) sync
        # (~26 ms/call on a tunneled chip, one dispatch stall everywhere).
        out = np.asarray(best)
        if np.isnan(out[0, 0]):
            raise RuntimeError(
                "[FoundationPose] translation guess failed: mask is empty or "
                "contains no valid depth"
            )
        return out

    def register_with_scores(
        self, rgb, depth, mask, target_name, refine_itr: int = 1
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Register returning (best_pose, all refined poses, scores)."""
        best, poses, scores, _ = self._run_register(
            rgb, depth, mask, target_name, refine_itr
        )
        # one batched transfer instead of three sequential blocking syncs
        best, poses, scores = jax.device_get((best, poses, scores))
        if np.isnan(best[0, 0]):
            raise RuntimeError("[FoundationPose] translation guess failed")
        return np.asarray(best), np.asarray(poses), np.asarray(scores)

    def track(
        self,
        rgb: np.ndarray,
        depth: np.ndarray,
        hyp_pose: np.ndarray,
        target_name: str,
        refine_itr: int = 1,
    ) -> np.ndarray:
        """Per-frame pose update (FoundationPose::Track, :230-265)."""
        self._check_inputs(rgb, depth, None, target_name)
        h, w = rgb.shape[:2]
        bucket = self._bucket_for(h, w)
        key = ("track", target_name, bucket or (h, w), int(refine_itr),
               bucket is not None)
        if key not in self._track_cache:
            self._track_cache[key] = self._track_program(
                target_name, int(refine_itr), bucketed=bucket is not None
            )
        pose_j = jnp.asarray(np.asarray(hyp_pose, dtype=np.float32))
        if bucket is not None:
            bh, bw = bucket
            out = self._track_cache[key](
                self._refiner_params,
                jnp.asarray(self._pad_to(rgb, bh, bw)),
                jnp.asarray(self._pad_to(depth, bh, bw)),
                pose_j, jnp.int32(h), jnp.int32(w),
            )
        else:
            out = self._track_cache[key](
                self._refiner_params, jnp.asarray(rgb), jnp.asarray(depth),
                pose_j,
            )
        return np.asarray(out)

    def track_batch(
        self,
        rgb: np.ndarray,
        depth: np.ndarray,
        hyp_poses: np.ndarray,
        target_name: str,
        refine_itr: int = 1,
    ) -> np.ndarray:
        """Track a batch of instances of one mesh in the same frame.

        Extension over the reference (which tracks one hypothesis per call):
        the (N, 4, 4) instance batch rides the same leading axis the
        252-hypothesis Register uses, so N instances cost one program.
        """
        self._check_inputs(rgb, depth, None, target_name)
        hyp_poses = np.asarray(hyp_poses, dtype=np.float32)
        n = hyp_poses.shape[0]
        h, w = rgb.shape[:2]
        bucket = self._bucket_for(h, w)
        key = ("track_batch", target_name, bucket or (h, w),
               int(refine_itr), n, bucket is not None)
        if key not in self._track_cache:
            mesh = self._meshes[target_name]

            if bucket is not None:
                # same size-bucket policy as track()/register(): pad to the
                # bucket, pass the real extents as dynamic scalars, so a
                # stream of varying camera sizes shares one executable
                @jax.jit
                def program(params_r, rgb, depth, poses, h_, w_):
                    return track_step(
                        mesh, params_r, rgb, depth, poses, self._K,
                        int(refine_itr), self._cfg, self._net_cfg,
                        self._rasterize_fn, use_fused=self._use_fused,
                        image_hw=(h_, w_),
                    )
            else:
                @jax.jit
                def program(params_r, rgb, depth, poses):
                    return track_step(
                        mesh, params_r, rgb, depth, poses, self._K,
                        int(refine_itr), self._cfg, self._net_cfg,
                        self._rasterize_fn, use_fused=self._use_fused,
                    )

            self._track_cache[key] = program
        if bucket is not None:
            bh, bw = bucket
            out = self._track_cache[key](
                self._refiner_params,
                jnp.asarray(self._pad_to(rgb, bh, bw)),
                jnp.asarray(self._pad_to(depth, bh, bw)),
                jnp.asarray(hyp_poses), jnp.int32(h), jnp.int32(w),
            )
        else:
            out = self._track_cache[key](
                self._refiner_params, jnp.asarray(rgb), jnp.asarray(depth),
                jnp.asarray(hyp_poses),
            )
        return np.asarray(out)

    def make_packed_tracker(
        self,
        target_name: str,
        frame_hw: tuple[int, int],
        refine_itr: int = 1,
        depth_format: str = "u16mm",
        rgb_half: bool = False,
    ):
        """Deployment fast path for per-frame tracking (AsyncTracker).

        Returns step(packed, pose) -> pose: a jitted Track whose input is
        ONE packed uint8 frame buffer -- rgb uint8 bytes followed by depth
        bytes, exactly the native FrameRing layout -- and whose pose is a
        DEVICE array fed forward across calls. A frame therefore costs
        exactly one H2D and zero D2H; JAX dispatch is async, so
        back-to-back calls pipeline on the chip (measured 1.7 ms/call
        chained on v5e, vs ~26 ms for the np-in / np-out track() that pays
        a host round trip per call). The caller reads poses back with
        np.asarray at its own (lagged) cadence.

        depth_format selects the depth wire encoding:
          * "u16mm" (default): little-endian uint16 millimeters -- the
            camera's native format (reference help_func.hpp:10-52 reads
            16-bit PNG depth and divides by 1000). Frame = H*W*5 bytes,
            29% less H2D than f32; mm->m conversion happens on-device.
          * "f32": float32 meters, H*W*7 bytes -- for producers that
            already hold filtered/metric depth at sub-mm precision.

        rgb_half ships the color plane at HALF resolution ((H/2)*(W/2)*3
        bytes, 2x2 box-downsampled by pack_frame; bilinearly upsampled
        on-device) -- H*W*2.75 bytes per frame with u16mm, a further 45%
        H2D cut for transfer-starved links. Depth stays full-res (it
        drives the geometry); the quality cost is color-detail only and
        only when the object's crop magnifies past the camera's Nyquist,
        so it is opt-in. Requires even H, W.
        """
        if target_name not in self._meshes:
            raise KeyError(
                f"[FoundationPose] unknown target '{target_name}'; "
                f"registered: {sorted(self._meshes)}"
            )
        if depth_format not in ("u16mm", "f32"):
            raise ValueError(
                f"depth_format must be 'u16mm' or 'f32', got {depth_format!r}"
            )
        h, w = int(frame_hw[0]), int(frame_hw[1])
        if h > self._max_h or w > self._max_w:
            raise ValueError(
                f"[FoundationPose] frame ({h}, {w}) exceeds max "
                f"({self._max_h}, {self._max_w})"
            )
        if rgb_half and (h % 2 or w % 2):
            raise ValueError(f"rgb_half requires even frame dims, got ({h}, {w})")
        mesh = self._meshes[target_name]
        rgb_n = (h // 2) * (w // 2) * 3 if rgb_half else h * w * 3
        itr = int(refine_itr)

        @jax.jit
        def step(params_r, packed, pose):
            if rgb_half:
                small = packed[:rgb_n].reshape(h // 2, w // 2, 3)
                rgb = jax.image.resize(
                    small.astype(jnp.float32), (h, w, 3), method="linear"
                )
            else:
                rgb = packed[:rgb_n].reshape(h, w, 3).astype(jnp.float32)
            if depth_format == "u16mm":
                depth = jax.lax.bitcast_convert_type(
                    packed[rgb_n:].reshape(h, w, 2), jnp.uint16
                ).astype(jnp.float32) * 1e-3
            else:
                depth = jax.lax.bitcast_convert_type(
                    packed[rgb_n:].reshape(h, w, 4), jnp.float32
                )
            poses = track_step(
                mesh, params_r, rgb, depth, pose[None, :, :], self._K, itr,
                self._cfg, self._net_cfg, self._rasterize_fn,
                use_fused=self._use_fused,
            )
            return poses[0]

        def bound(packed, pose):
            return step(self._refiner_params, packed, pose)

        return bound

    @staticmethod
    def packed_frame_bytes(
        frame_hw: tuple[int, int],
        depth_format: str = "u16mm",
        rgb_half: bool = False,
    ) -> int:
        """Byte size of one make_packed_tracker/FrameRing frame."""
        h, w = int(frame_hw[0]), int(frame_hw[1])
        depth_b = h * w * {"u16mm": 2, "f32": 4}[depth_format]
        rgb_b = (h // 2) * (w // 2) * 3 if rgb_half else h * w * 3
        return rgb_b + depth_b

    @staticmethod
    def pack_frame(
        rgb: np.ndarray,
        depth: np.ndarray,
        depth_format: str = "u16mm",
        rgb_half: bool = False,
    ) -> np.ndarray:
        """Pack (rgb u8 (H,W,3), depth (H,W)) into one contiguous u8 buffer
        matching make_packed_tracker's wire layout.

        For "u16mm", f32-meter depth is quantized to whole millimeters
        (the sensor's native resolution; values clip to [0, 65.535] m) --
        pass a uint16 array to skip the conversion entirely. rgb_half
        2x2-box-downsamples the color plane (see make_packed_tracker).
        """
        rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
        if rgb_half:
            hh, ww = rgb.shape[0] // 2, rgb.shape[1] // 2
            rgb = (
                rgb.reshape(hh, 2, ww, 2, 3).astype(np.uint16)
                .sum(axis=(1, 3)) + 2
            ) // 4
            rgb = rgb.astype(np.uint8)
        rgb_flat = rgb.reshape(-1)
        if depth_format == "u16mm":
            if depth.dtype == np.uint16:
                d = np.ascontiguousarray(depth)
            else:
                d = np.clip(
                    np.nan_to_num(np.asarray(depth, np.float64)) * 1000.0,
                    0.0, 65535.0,
                ).round().astype(np.uint16)
        elif depth_format == "f32":
            d = np.ascontiguousarray(depth, dtype=np.float32)
        else:
            raise ValueError(
                f"depth_format must be 'u16mm' or 'f32', got {depth_format!r}"
            )
        return np.concatenate([rgb_flat, d.view(np.uint8).reshape(-1)])

    def convert_pose_mesh2bbox(self, pose: np.ndarray, target_name: str) -> np.ndarray:
        """Pose frame change mesh -> oriented bbox (mesh_loader.hpp:75-81)."""
        mesh = self._meshes[target_name]
        return np.asarray(
            transforms.convert_pose_mesh2bbox(
                jnp.asarray(np.asarray(pose, np.float32)),
                mesh.model_center,
                mesh.orient_bounds,
            )
        )

    def object_dimension(self, target_name: str) -> np.ndarray:
        return self._assets[target_name].dimensions


def create_foundationpose_model(
    refiner_params: Any,
    scorer_params: Any,
    mesh_assets: list[MeshAsset],
    intrinsic: np.ndarray,
    max_input_image_h: int = 1080,
    max_input_image_w: int = 1920,
    **kwargs,
) -> FoundationPose:
    """Factory mirroring CreateFoundationPoseModel (foundationpose.cpp:448-458)."""
    return FoundationPose(
        refiner_params, scorer_params, mesh_assets, intrinsic,
        max_input_image_h, max_input_image_w, **kwargs,
    )

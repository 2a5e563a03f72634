"""Typed configuration for the TPU-native FoundationPose pipeline.

Every knob here mirrors a compile-time constant or constructor default of the
reference C++/CUDA implementation (zz990099/foundationpose_cpp), lifted into a
single frozen dataclass as SURVEY.md SS5 prescribes. Reference provenance:

- blob names / 252 poses / crop ratios / rot normalizer:
  detection_6d_foundationpose/src/foundationpose.cpp:76-99
- crop window 160x160, min_depth 0.001, max image 1080x1920:
  foundationpose.cpp:34-36, include/.../foundationpose.hpp:104-105
- renderer min/max depth 0.001/4.0: src/foundationpose_render.hpp:24-27
- znear/zfar 0.1/100: foundationpose_render.cpp:155-156
- lighting weights 0.8/0.5: foundationpose_render.cpp:663
- depth-filter defaults: src/foundationpose_sampling.cu.hpp:27-44
- rotation grid n_views=40, inplane_step=60: foundationpose_sampling.cpp:212
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class DepthFilterConfig:
    """Depth erode + bilateral filter parameters (foundationpose_sampling.cu)."""

    erode_radius: int = 2
    erode_depth_diff_thres: float = 0.001
    erode_ratio_thres: float = 0.8
    zfar: float = 100.0
    bilateral_radius: int = 2
    bilateral_sigma_d: float = 2.0
    bilateral_sigma_r: float = 100000.0
    # neighbors farther than this from the local mean are excluded
    bilateral_mean_band: float = 0.01


@dataclasses.dataclass(frozen=True)
class FoundationPoseConfig:
    """All pipeline constants, with reference-identical defaults."""

    # model input crop
    crop_window_h: int = 160
    crop_window_w: int = 160

    # hypothesis grid (icosphere views x in-plane rotations = 252)
    n_views: int = 40
    inplane_step_deg: int = 60

    # crop ratios per mode
    refine_crop_ratio: float = 1.2
    score_crop_ratio: float = 1.1

    # depth validity window for the pointcloud threshold
    min_depth: float = 0.001
    max_depth: float = 4.0

    # refiner output decoding: delta_rot = tanh(rot) * rot_normalizer (20 deg)
    rot_normalizer: float = 0.349065850398865

    # OpenGL projection planes
    znear: float = 0.1
    zfar: float = 100.0

    # Lambert shading weights
    w_ambient: float = 0.8
    w_diffuse: float = 0.5

    # input image bound (construction-time max, mirrors reference factory)
    max_input_image_h: int = 1080
    max_input_image_w: int = 1920

    # default refine iterations per Register/Track call
    refine_itr: int = 1

    # dynamic-input-size buckets (reference README.md:20 serves any size <=
    # max with pre-sized buffers). When set, inputs are zero-padded up to the
    # smallest (H, W) bucket and the real extents ride through the program as
    # dynamic scalars, so all sizes within a bucket share ONE executable.
    # None = compile per exact size (the default, zero overhead).
    size_buckets: tuple[tuple[int, int], ...] | None = None

    # dtype policy: bf16 for the neural nets, f32 for geometry/render
    use_bf16_models: bool = True

    depth_filter: DepthFilterConfig = dataclasses.field(
        default_factory=DepthFilterConfig
    )

    @property
    def num_hypotheses(self) -> int:
        """252 for the defaults: 42 icosphere vertices x 6 in-plane rotations."""
        from foundationpose_cpp_tpu.geometry.icosphere import rotation_grid_size

        return rotation_grid_size(self.n_views, self.inplane_step_deg)


DEFAULT_CONFIG = FoundationPoseConfig()

"""foundationpose_cpp_tpu: TPU-native FoundationPose 6-DoF pose estimation.

A from-scratch JAX/XLA/Pallas rebuild of zz990099/foundationpose_cpp
(C++/CUDA/TensorRT) with the same capabilities: model-based Register (252
icosphere hypotheses -> render-and-compare refine -> score -> argmax) and
per-frame Track, for RGB-D input and textured/texture-less meshes.
"""

from foundationpose_cpp_tpu.config import DEFAULT_CONFIG, FoundationPoseConfig
from foundationpose_cpp_tpu.meshio.mesh_loader import (
    MeshAsset,
    load_mesh,
    make_mesh_asset,
)
from foundationpose_cpp_tpu.models import networks
from foundationpose_cpp_tpu.models.infer_core import (
    create_refiner_core,
    create_scorer_core,
)
from foundationpose_cpp_tpu.pipeline.foundationpose import (
    FoundationPose,
    create_foundationpose_model,
)

__all__ = [
    "DEFAULT_CONFIG",
    "FoundationPoseConfig",
    "FoundationPose",
    "MeshAsset",
    "create_foundationpose_model",
    "create_refiner_core",
    "create_scorer_core",
    "load_mesh",
    "make_mesh_asset",
    "networks",
]

__version__ = "0.1.0"

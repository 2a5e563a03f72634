"""Synthetic self-supervised training for the refiner/scorer networks.

The reference ships pre-trained TensorRT engines and has no training code;
its accuracy comes from NVIDIA's published FoundationPose checkpoints
(reference README.md:72, distributed out-of-band). This package closes the
accuracy gap when those checkpoints are unavailable: it trains the exact
published topology (models/networks.py) on synthetic render pairs generated
by this framework's own renderer -- the same render-and-compare scheme the
original model was trained with (pose-perturbed crops vs ground-truth
views), all inside one compiled TPU program per step.
"""

from foundationpose_cpp_tpu.training.synthetic import (  # noqa: F401
    SyntheticTrainConfig,
    make_refiner_batch,
    make_scorer_batch,
    refine_targets,
    train_refiner,
    train_scorer,
)

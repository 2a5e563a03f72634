"""Full-size program smoke tests (VERDICT r1 weak #3).

Every other pipeline test shrinks the nets and crops to run fast on CPU;
these compile/execute the PRODUCTION 160x160 / default-NetConfig programs so
a mis-shaped constant in the full-size path cannot pass CI and then fail on
the TPU bench. The fused-kernel full-size path is exercised on real TPU by
bench.py and the verify drive; here the exact (unfused) path stands in on
CPU with identical shapes through nets, crops, warps and pose math.
"""

import numpy as np
import jax
import jax.numpy as jnp

from foundationpose_cpp_tpu.config import FoundationPoseConfig
from foundationpose_cpp_tpu.geometry import icosphere
from foundationpose_cpp_tpu.meshio import procedural
from foundationpose_cpp_tpu.models import networks
from foundationpose_cpp_tpu.pipeline.foundationpose import (
    register_step,
    track_step,
)
from foundationpose_cpp_tpu.pipeline.renderer import MeshConstants
from foundationpose_cpp_tpu.utils import synthetic

CFG = FoundationPoseConfig()  # production: crop 160x160, 252 hypotheses
NET = networks.NetConfig()  # production: 64/128/512, 400 tokens
K = np.array([[300.0, 0, 80], [0, 300.0, 60], [0, 0, 1]], dtype=np.float32)
H, W = 96, 128  # small image; every model-side shape is production-size


def _scene():
    cube = procedural.textured_cube(size=0.1)
    mesh = MeshConstants.from_asset(cube)
    pose = synthetic.default_pose(tz=0.5)
    rgb, depth, mask = synthetic.render_scene(mesh, pose, K, H, W, CFG)
    return mesh, pose, rgb, depth, mask


def test_fullsize_register_program_compiles():
    """Compile (not run) the exact full-size Register program: 252 x 160x160
    crops through the production refiner+scorer."""
    mesh, _, rgb, depth, mask = _scene()
    rot_grid = jnp.asarray(
        icosphere.make_rotation_grid(CFG.n_views, CFG.inplane_step_deg)
    )
    params_r = networks.init_refiner(0, NET)
    params_s = networks.init_scorer(1, NET)

    def program(params_r, params_s, rgb, depth, mask, rot_grid):
        return register_step(
            mesh, params_r, params_s, rgb, depth, mask, rot_grid,
            jnp.asarray(K), 1, CFG, NET,
        )

    args = (
        params_r, params_s, jnp.asarray(rgb), jnp.asarray(depth),
        jnp.asarray(mask), rot_grid,
    )
    out_shapes = jax.eval_shape(program, *args)
    assert tuple(out_shapes[0].shape) == (4, 4)
    assert tuple(out_shapes[2].shape) == (252,)
    jax.jit(program).lower(*args).compile()  # XLA must accept the real thing


def test_fullsize_track_executes():
    """Run one full-size Track step (N=1, production crop + nets) on CPU."""
    mesh, pose, rgb, depth, _ = _scene()
    params_r = networks.init_refiner(0, NET)
    out = track_step(
        mesh, params_r, jnp.asarray(rgb), jnp.asarray(depth),
        jnp.asarray(pose[None]), jnp.asarray(K), 1, CFG, NET,
    )
    out = np.asarray(out)
    assert out.shape == (1, 4, 4)
    assert np.isfinite(out).all()
    r = out[0, :3, :3]
    assert np.allclose(r @ r.T, np.eye(3), atol=1e-3)

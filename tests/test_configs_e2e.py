"""The BASELINE.json configuration matrix, exercised end-to-end.

Configs (BASELINE.json "configs"):
  1. Track on a textured mesh               -> tests/test_pipeline_e2e.py
  2. Register (252 hypotheses)              -> tests/test_pipeline_e2e.py
  3. Texture-less mesh path (gray fallback) -> here
  4. Custom (BundleSDF-like) dense mesh + dynamic-sized input -> here
  5. Multi-object tracking batch            -> here
"""

import numpy as np
import pytest

from foundationpose_cpp_tpu import (
    FoundationPoseConfig,
    create_foundationpose_model,
    networks,
)
from foundationpose_cpp_tpu.meshio import mesh_loader as ml
from foundationpose_cpp_tpu.meshio import procedural
from foundationpose_cpp_tpu.meshio.decimate import decimate_vertex_clustering
from foundationpose_cpp_tpu.pipeline.renderer import MeshConstants
from foundationpose_cpp_tpu.utils import metrics, synthetic

NET_CFG = networks.NetConfig(
    width1=8, width2=16, embed_dim=64, num_heads=4, crop_hw=32,
)
CFG = FoundationPoseConfig(crop_window_h=32, crop_window_w=32)
K = np.array([[300.0, 0, 80], [0, 300.0, 60], [0, 0, 1]], dtype=np.float32)
H, W = 120, 160


def _model(assets, h=H, w=W):
    return create_foundationpose_model(
        networks.init_refiner(0, NET_CFG), networks.init_scorer(1, NET_CFG),
        assets, K, h, w, config=CFG, net_config=NET_CFG,
    )


def test_textureless_mesh_path():
    """PR#13 parity mode: no texture -> constant gray, pipeline runs."""
    cube = procedural.textured_cube()
    gray = ml.make_mesh_asset(
        "gray_cube", cube.vertices, cube.faces,
        texcoords=cube.texcoords, vertex_normals=cube.vertex_normals,
        texture=None,  # -> 2x2 gray (100,100,100)/255 fallback
    )
    assert gray.texture.shape == (2, 2, 3)
    np.testing.assert_allclose(gray.texture, 100.0 / 255.0, atol=1e-6)

    mesh = MeshConstants.from_asset(gray)
    pose = synthetic.default_pose(0.5)
    rgb, depth, mask = synthetic.render_scene(mesh, pose, K, H, W, CFG)
    # the rendered object must be uniformly gray modulo shading
    fg = mask > 0
    assert fg.any()
    channels = rgb[fg].astype(np.int32)
    assert (np.abs(channels[:, 0] - channels[:, 1]) <= 1).all()
    assert (np.abs(channels[:, 1] - channels[:, 2]) <= 1).all()

    model = _model([gray])
    out = model.register(rgb, depth, mask, "gray_cube")
    assert np.isfinite(out).all()
    out2 = model.track(rgb, depth, pose, "gray_cube")
    assert np.isfinite(out2).all()


def test_dense_mesh_decimation_and_register():
    """BundleSDF-style dense mesh: decimate, then run the pipeline."""
    dense = procedural.textured_uv_sphere("scan", radius=0.05, n_lat=40, n_lon=60)
    assert dense.num_faces > 4000
    slim = decimate_vertex_clustering(dense, target_faces=900)
    assert slim.num_faces <= 900
    assert slim.num_faces > 100
    # geometry preserved: diameter within 10%, surface points close
    np.testing.assert_allclose(slim.diameter, dense.diameter, rtol=0.1)
    d = np.linalg.norm(slim.vertices, axis=1)
    np.testing.assert_allclose(d, 0.05, atol=0.01)

    mesh = MeshConstants.from_asset(slim)
    pose = synthetic.default_pose(0.5)
    rgb, depth, mask = synthetic.render_scene(mesh, pose, K, H, W, CFG)
    model = _model([slim])
    out = model.register(rgb, depth, mask, "scan")
    assert np.isfinite(out).all()


def test_dynamic_sized_input():
    """Reference README.md:20 feature: per-size programs under one model."""
    cube = procedural.textured_cube()
    mesh = MeshConstants.from_asset(cube)
    pose = synthetic.default_pose(0.5)
    model = _model([cube], h=240, w=320)
    for (h, w) in [(120, 160), (96, 128), (240, 320)]:
        Ks = K.copy()
        Ks[0, 2], Ks[1, 2] = w / 2, h / 2
        rgb, depth, mask = synthetic.render_scene(mesh, pose, Ks, h, w, CFG)
        # note: intrinsics are bound at construction; sizes share K center
        out = model.track(rgb, depth, pose, "cube")
        assert out.shape == (4, 4) and np.isfinite(out).all()
    # exceeding the construction max still raises
    big = np.zeros((300, 400, 3), np.uint8)
    with pytest.raises(ValueError, match="exceeds construction max"):
        model.track(big, np.zeros((300, 400), np.float32), pose, "cube")


def test_multi_object_tracking_batch():
    """N instances of one mesh tracked in a single compiled program."""
    cube = procedural.textured_cube()
    mesh = MeshConstants.from_asset(cube)
    base = synthetic.default_pose(0.5)
    rgb, depth, _ = synthetic.render_scene(mesh, base, K, H, W, CFG)
    model = _model([cube])

    rng = np.random.default_rng(0)
    hyp = np.tile(base[None], (5, 1, 1))
    hyp[:, :3, 3] += rng.normal(0, 0.01, (5, 3)).astype(np.float32)
    out = model.track_batch(rgb, depth, hyp, "cube")
    assert out.shape == (5, 4, 4)
    # batch result equals per-instance tracking
    for i in range(5):
        solo = model.track(rgb, depth, hyp[i], "cube")
        np.testing.assert_allclose(out[i], solo, rtol=1e-2, atol=2e-3)


@pytest.mark.slow
def test_fused_and_exact_paths_agree_on_register():
    """Weight-free parity check: the fused TPU renderer and the exact
    (reference-faithful) path must produce matching poses through the FULL
    register program when the mesh's vertex colors match its texture."""
    import jax

    if jax.default_backend() != "cpu":
        pytest.skip("interpret-mode comparison is a CPU test")
    sphere = procedural.textured_uv_sphere(radius=0.05, n_lat=10, n_lon=14)
    pose = synthetic.default_pose(0.5)
    mesh = MeshConstants.from_asset(sphere)
    rgb, depth, mask = synthetic.render_scene(mesh, pose, K, H, W, CFG)

    def build(use_fused):
        return create_foundationpose_model(
            networks.init_refiner(0, NET_CFG), networks.init_scorer(1, NET_CFG),
            [sphere], K, H, W, config=CFG, net_config=NET_CFG,
            use_fused_renderer=use_fused,
        )

    exact = build(False).register(rgb, depth, mask, "sphere")
    # the public interpret mode: the fused kernel run interpreted on CPU
    # (slow; tiny mesh keeps it tractable) -- also pins that the class
    # passes the string through instead of bool-coercing it to True
    fused = build("interpret").register(rgb, depth, mask, "sphere")

    # same scene, same weights: the two render paths differ only by
    # vertex-vs-pixel texture sampling; the chosen pose should be close
    pts = sphere.vertices
    assert metrics.adds_error(fused, exact, pts) < 0.02

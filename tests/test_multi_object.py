"""Randomized object family (meshio/family.py) + mesh-bank trainer
(training/multi.py): the object-generalizable training path.

The reference's engines are object-agnostic (one checkpoint serves any mesh,
simple_tests/src/test_foundationpose.cpp:22-46); these tests pin the
machinery that gives this repo the same property. End-to-end accuracy of the
trained multi-object weights is pinned separately (test_trained_weights.py
gates on the committed checkpoints).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from foundationpose_cpp_tpu import networks
from foundationpose_cpp_tpu.config import FoundationPoseConfig
from foundationpose_cpp_tpu.geometry import transforms
from foundationpose_cpp_tpu.meshio import family
from foundationpose_cpp_tpu.pipeline.renderer import MeshConstants, render_branch
from foundationpose_cpp_tpu.training import multi
from foundationpose_cpp_tpu.training import synthetic as tr

ALL_GENERATORS = family.TRAIN_GENERATORS + family.HELDOUT_GENERATORS


def test_family_deterministic_and_normalized():
    for gen in ALL_GENERATORS:
        a = family.random_family_asset(7, generator=gen)
        b = family.random_family_asset(7, generator=gen)
        np.testing.assert_array_equal(a.vertices, b.vertices)
        np.testing.assert_array_equal(a.texture, b.texture)
        # family contract: common diameter (the bank/trainer depend on it)
        assert abs(a.diameter - family.FAMILY_DIAMETER) < 1e-5, gen
        assert a.faces.shape[0] >= 12
        assert a.texcoords.shape == (a.vertices.shape[0], 2)
        # normals are unit for every face-referenced vertex (render shading
        # input; unreferenced grid-seam verts get zero normals, never drawn)
        ref = np.unique(a.faces)
        n = np.linalg.norm(a.vertex_normals[ref], axis=-1)
        np.testing.assert_allclose(n, 1.0, atol=1e-4)


def test_family_seed_draws_cover_generators():
    gens = {family.random_family_asset(s).name.split("_")[0] for s in range(40)}
    assert gens == set(family.TRAIN_GENERATORS)
    # held-out generator never appears in training draws
    assert not gens & set(family.HELDOUT_GENERATORS)


def test_family_renders_nonempty():
    """Every generator renders a visible, lit object via the unfused path."""
    cfg = FoundationPoseConfig()
    K = jnp.asarray(
        np.array([[450.0, 0, 64], [0, 450.0, 64], [0, 0, 1]], np.float32)
    )
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 0.5
    poses = jnp.asarray(pose[None])
    bbox = jnp.array([[0.0, 0.0, 128.0, 128.0]])
    for gen in ALL_GENERATORS:
        mesh = MeshConstants.from_asset(family.random_family_asset(3, generator=gen))
        clip = transforms.pose_clip_matrix(
            poses, bbox, K, 128, 128, cfg.znear, cfg.zfar
        )
        out = np.asarray(render_branch(mesh, poses, clip, 128, 128, cfg))
        fg = (out[0, ..., 3:] != 0).any(-1)
        assert fg.mean() > 0.02, gen  # object visible
        assert out[0, ..., :3][fg].mean() > 0.01, gen  # textured + lit


def test_mesh_bank_padding_and_gather():
    assets = [family.random_family_asset(s) for s in range(3)]
    bank = multi.build_mesh_bank(assets, face_pad=256)
    assert bank.num_faces % 256 == 0
    assert bank.face_verts.shape == (3, bank.num_faces, 3, 3)
    assert bank.add_pts.shape[1:] == (256, 3)
    # padded rows are all-zero (degenerate faces the prepass culls)
    f0 = family.random_family_asset(0).faces.shape[0]
    assert np.all(np.asarray(bank.face_verts)[0, f0:] == 0.0)
    mesh = multi.bank_mesh(bank, jnp.int32(1))
    np.testing.assert_allclose(
        np.asarray(mesh.fused.face_verts), np.asarray(bank.face_verts)[1]
    )
    assert mesh.diameter == bank.diameter


def test_mesh_bank_rejects_mixed_diameters():
    from foundationpose_cpp_tpu.meshio import procedural

    a = family.random_family_asset(0)
    b = procedural.textured_house()  # diameter != FAMILY_DIAMETER
    with pytest.raises(ValueError, match="diameter"):
        multi.build_mesh_bank([a, b])


def test_bank_fused_render_matches_per_object_tables():
    """Rendering from a bank slice == rendering from the object's own
    (padded) tables: bank padding with degenerate faces changes nothing."""
    from foundationpose_cpp_tpu.ops.render_fused import (
        FusedMeshTables,
        render_views_fused,
    )

    assets = [family.random_family_asset(s) for s in range(2)]
    bank = multi.build_mesh_bank(assets, face_pad=256)
    cfg = FoundationPoseConfig()
    K = jnp.asarray(
        np.array([[450.0, 0, 16], [0, 450.0, 16], [0, 0, 1]], np.float32)
    )
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 0.5
    poses = jnp.asarray(pose[None])
    bbox = jnp.array([[0.0, 0.0, 32.0, 32.0]])
    clip = transforms.pose_clip_matrix(poses, bbox, K, 32, 32, cfg.znear, cfg.zfar)
    for i, asset in enumerate(assets):
        own = FusedMeshTables.from_asset(asset, face_pad=bank.num_faces)
        own = dataclasses.replace(own, backface_cull_ok=False)
        a = np.asarray(
            render_views_fused(own, poses, clip, 32, 32, interpret=True)
        )
        b = np.asarray(
            render_views_fused(
                multi.bank_mesh(bank, jnp.int32(i)).fused, poses, clip, 32, 32,
                interpret=True,
            )
        )
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_multi_trainer_two_steps_updates_params():
    """2 optimizer steps through the full multi-object path (interpret-mode
    fused render inside the compiled step) change the params and return
    finite losses."""
    assets = [family.random_family_asset(s) for s in range(2)]
    bank = multi.build_mesh_bank(assets)
    cfg = FoundationPoseConfig(crop_window_h=32, crop_window_w=32)
    tcfg = tr.SyntheticTrainConfig(
        frame_hw=32, batch=2, hyps_per_scene=2, steps_per_call=2,
        warmup_steps=1,
    )
    net = networks.NetConfig(
        width1=8, width2=8, embed_dim=32, ffn_dim=32, num_encoder_layers=1,
        crop_hw=32,
    )
    p0 = networks.init_refiner(0, dataclasses.replace(net, dtype=jnp.float32))
    p1 = multi.train_refiner_multi(
        bank, cfg, net, tcfg, steps=2, use_fused="interpret",
    )
    assert all(
        np.isfinite(np.asarray(x, np.float32)).all() for x in jax.tree.leaves(p1)
    )
    diffs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a, np.float32)
                                  - np.asarray(b, np.float32)).max()),
        p0, p1,
    )
    assert max(jax.tree.leaves(diffs)) > 0.0

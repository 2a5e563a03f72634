"""Rasterizer / interpolation / texture vs. brute-force numpy oracles."""

import numpy as np
import jax.numpy as jnp

from foundationpose_cpp_tpu.ops import rasterize as ras
from tests import oracle


def _random_scene(n=2, v=12, f=16, seed=0):
    """Random clip-space triangles in front of the camera (w > 0)."""
    rng = np.random.default_rng(seed)
    w = rng.uniform(1.0, 3.0, size=(n, v, 1)).astype(np.float32)
    xy = rng.uniform(-1.0, 1.0, size=(n, v, 2)).astype(np.float32) * w
    z = rng.uniform(-0.9, 0.9, size=(n, v, 1)).astype(np.float32) * w
    clip = np.concatenate([xy, z, w], axis=-1)
    faces = rng.integers(0, v, size=(f, 3)).astype(np.int32)
    return clip, faces


def test_rasterize_matches_oracle_random_triangles():
    clip, faces = _random_scene()
    h = w = 16
    got = np.asarray(ras.rasterize(jnp.asarray(clip), jnp.asarray(faces), h, w))
    want = oracle.rasterize_oracle(clip, faces, h, w)
    # triangle ids must match exactly except where razor-thin f32 depth ties
    # or shared edges could differ; demand >= 99% agreement and close barys
    agree = (got[..., 3] == want[..., 3]).mean()
    assert agree > 0.99, f"triangle id agreement {agree}"
    m = got[..., 3] == want[..., 3]
    np.testing.assert_allclose(got[m], want[m], rtol=1e-4, atol=1e-4)


def test_rasterize_background_is_zero():
    clip, faces = _random_scene(seed=1)
    out = np.asarray(ras.rasterize(jnp.asarray(clip), jnp.asarray(faces), 16, 16))
    bg = out[..., 3] == 0
    assert bg.any()
    assert (out[bg] == 0).all()


def test_rasterize_culls_behind_camera_faces():
    clip, faces = _random_scene(n=1, seed=2)
    clip[0, faces[0, 0], 3] = -0.5  # one vertex behind the camera
    out = np.asarray(ras.rasterize(jnp.asarray(clip), jnp.asarray(faces), 16, 16))
    assert not (out[..., 3] == 1.0).any()


def test_rasterize_respects_face_valid_mask():
    clip, faces = _random_scene(n=1, seed=3)
    valid = np.ones((faces.shape[0],), dtype=bool)
    valid[0] = False
    out = np.asarray(
        ras.rasterize(
            jnp.asarray(clip), jnp.asarray(faces), 16, 16, face_valid=jnp.asarray(valid)
        )
    )
    assert not (out[..., 3] == 1.0).any()


def test_rasterize_depth_ordering_two_overlapping_quads():
    # two full-screen triangles at different depths; nearest (smaller z/w) wins
    def quad(z):
        return np.array(
            [[-2, -2, z, 1], [2, -2, z, 1], [2, 2, z, 1], [-2, 2, z, 1]],
            dtype=np.float32,
        )

    clip = np.concatenate([quad(0.5), quad(-0.2)], axis=0)[None]  # far then near
    faces = np.array([[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], dtype=np.int32)
    out = np.asarray(ras.rasterize(jnp.asarray(clip), jnp.asarray(faces), 8, 8))
    assert set(np.unique(out[..., 3])) <= {3.0, 4.0}
    np.testing.assert_allclose(out[..., 2], -0.2, atol=1e-6)


def test_interpolate_matches_oracle_instanced_and_broadcast():
    clip, faces = _random_scene(seed=4)
    h = w = 16
    rast = np.asarray(ras.rasterize(jnp.asarray(clip), jnp.asarray(faces), h, w))
    rng = np.random.default_rng(5)
    attr_i = rng.normal(size=(clip.shape[0], clip.shape[1], 3)).astype(np.float32)
    attr_b = rng.normal(size=(clip.shape[1], 2)).astype(np.float32)
    got_i = np.asarray(
        ras.interpolate_attributes(jnp.asarray(attr_i), jnp.asarray(rast), jnp.asarray(faces))
    )
    got_b = np.asarray(
        ras.interpolate_attributes(jnp.asarray(attr_b), jnp.asarray(rast), jnp.asarray(faces))
    )
    np.testing.assert_allclose(got_i, oracle.interpolate_oracle(attr_i, rast, faces), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_b, oracle.interpolate_oracle(attr_b, rast, faces), rtol=1e-5, atol=1e-5)


def test_texture_bilinear_wrap_matches_oracle():
    rng = np.random.default_rng(6)
    tex = rng.uniform(size=(9, 13, 3)).astype(np.float32)
    uv = rng.uniform(-0.3, 1.3, size=(2, 8, 8, 2)).astype(np.float32)
    got = np.asarray(ras.texture_bilinear_wrap(jnp.asarray(tex), jnp.asarray(uv)))
    want = oracle.texture_oracle(tex, uv)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_shade_color_formula():
    rng = np.random.default_rng(7)
    color = rng.uniform(size=(1, 4, 4, 3)).astype(np.float32) * 1.4
    diff = rng.uniform(size=(1, 4, 4, 1)).astype(np.float32)
    rast = np.zeros((1, 4, 4, 4), dtype=np.float32)
    rast[0, :2, :, 3] = 7.0  # foreground rows
    got = np.asarray(
        ras.shade_color(jnp.asarray(color), jnp.asarray(diff), jnp.asarray(rast))
    )
    want = np.clip(color * (0.8 + diff * 0.5) * np.clip(rast[..., 3:4], 0, 1), 0, 1)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    assert (got[0, 2:] == 0).all()


def test_flip_vertical():
    x = np.arange(2 * 3 * 2 * 1, dtype=np.float32).reshape(2, 3, 2, 1)
    got = np.asarray(ras.flip_vertical(jnp.asarray(x)))
    np.testing.assert_array_equal(got, x[:, ::-1])

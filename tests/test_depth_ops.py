"""Depth preprocessing ops vs. per-pixel numpy oracles."""

import numpy as np
import jax.numpy as jnp

from foundationpose_cpp_tpu.ops import depth as depth_ops
from tests import oracle


def _synthetic_depth(h=24, w=32, seed=0):
    rng = np.random.default_rng(seed)
    d = np.full((h, w), 0.8, dtype=np.float32)
    d += rng.normal(0, 0.0004, size=(h, w)).astype(np.float32)
    # structured content: a nearer box and some invalid pixels
    d[6:14, 8:20] = 0.55
    d[2, 3] = 0.0  # invalid (below 0.1)
    d[5, 5] = 150.0  # beyond zfar
    d[10, 10] = 0.559  # edge jump inside box
    d[18:20, 25:28] = 0.05
    return d


def test_erode_depth_matches_oracle():
    d = _synthetic_depth()
    got = np.asarray(depth_ops.erode_depth(jnp.asarray(d)))
    want = oracle.erode_depth_oracle(d)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_bilateral_filter_matches_oracle():
    d = _synthetic_depth(seed=1)
    got = np.asarray(depth_ops.bilateral_filter_depth(jnp.asarray(d)))
    want = oracle.bilateral_filter_depth_oracle(d)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_depth_to_xyz_matches_oracle():
    d = _synthetic_depth(seed=2)
    K = np.array([[600.0, 0, 16], [0, 590.0, 12], [0, 0, 1]], dtype=np.float32)
    got = np.asarray(depth_ops.depth_to_xyz(jnp.asarray(d), jnp.asarray(K)))
    want = oracle.depth_to_xyz_oracle(d, K)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_guess_translation_matches_oracle_odd_and_even():
    K = np.array([[600.0, 0, 16], [0, 590.0, 12], [0, 0, 1]], dtype=np.float32)
    for seed in (3, 4):
        d = _synthetic_depth(seed=seed)
        mask = np.zeros_like(d, dtype=np.uint8)
        mask[6:14, 8 : 20 + seed] = 1  # vary valid count parity
        mask[7, 9] = 0
        got, ok = depth_ops.guess_translation(jnp.asarray(d), jnp.asarray(mask), jnp.asarray(K))
        assert bool(ok)
        want = oracle.guess_translation_oracle(d, mask, K)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_guess_translation_empty_mask_reports_failure():
    d = _synthetic_depth()
    mask = np.zeros_like(d, dtype=np.uint8)
    K = np.eye(3, dtype=np.float32)
    _, ok = depth_ops.guess_translation(jnp.asarray(d), jnp.asarray(mask), jnp.asarray(K))
    assert not bool(ok)


def test_erode_depth_invalid_center_zeroed():
    d = np.full((8, 8), 0.05, dtype=np.float32)
    got = np.asarray(depth_ops.erode_depth(jnp.asarray(d)))
    assert (got == 0).all()

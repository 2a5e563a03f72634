"""Geometry layer goldens: icosphere grid, projections, crop TFs, pose math."""

import numpy as np
import jax.numpy as jnp

from foundationpose_cpp_tpu.geometry import icosphere, transforms


def test_icosphere_vertex_counts():
    # 12 base vertices; one subdivision -> 42; two -> 162
    assert icosphere.generate_icosphere_vertices(12).shape == (12, 3)
    assert icosphere.generate_icosphere_vertices(13).shape == (42, 3)
    assert icosphere.generate_icosphere_vertices(40).shape == (42, 3)
    assert icosphere.generate_icosphere_vertices(43).shape == (162, 3)


def test_icosphere_vertices_unit_norm():
    v = icosphere.generate_icosphere_vertices(40)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-6)


def test_rotation_grid_is_252_rigid_transforms():
    grid = icosphere.make_rotation_grid(40, 60)
    assert grid.shape == (252, 4, 4)
    # rotations orthonormal, det +1
    rots = grid[:, :3, :3]
    eye = np.eye(3, dtype=np.float32)
    for r in rots[::17]:
        np.testing.assert_allclose(r @ r.T, eye, atol=1e-5)
        assert np.linalg.det(r) > 0.99
    # object-in-camera translation = -R @ cam_pos; |cam_pos| = 1 on the sphere
    np.testing.assert_allclose(np.linalg.norm(grid[:, :3, 3], axis=1), 1.0, atol=1e-5)
    assert grid.shape == (icosphere.rotation_grid_size(40, 60), 4, 4)


def test_look_at_frames_match_reference_semantics():
    frames = icosphere.sample_views_icosphere(40)
    for f in frames[::5]:
        pos = f[:3, 3]
        z = f[:3, 2]
        np.testing.assert_allclose(z, -pos / np.linalg.norm(pos), atol=1e-6)
        # x orthogonal to up=(0,0,1) unless degenerate
        np.testing.assert_allclose(f[:3, :3] @ f[:3, :3].T, np.eye(3), atol=1e-5)


def test_projection_matrix_matches_formula():
    K = jnp.asarray([[600.0, 0.0, 320.0], [0.0, 610.0, 240.0], [0.0, 0.0, 1.0]])
    P = np.asarray(transforms.projection_from_intrinsics(K, 480, 640, 0.1, 100.0))
    assert P.shape == (4, 4)
    np.testing.assert_allclose(P[0, 0], 2 * 600 / 640, rtol=1e-6)
    np.testing.assert_allclose(P[1, 1], 2 * 610 / 480, rtol=1e-6)
    np.testing.assert_allclose(P[0, 2], (-2 * 320 + 640) / 640, atol=1e-6)
    np.testing.assert_allclose(P[1, 2], (2 * 240 - 480) / 480, atol=1e-6)
    np.testing.assert_allclose(P[2, 2], -(100.0 + 0.1) / (100.0 - 0.1), rtol=1e-6)
    np.testing.assert_allclose(P[2, 3], -2 * 100.0 * 0.1 / (100.0 - 0.1), rtol=1e-6)
    np.testing.assert_allclose(P[3], [0, 0, -1, 0], atol=0)
    # a point on the optical axis at znear maps to ndc z = -1, at zfar to +1
    for zcam, ndc in [(0.1, -1.0), (100.0, 1.0)]:
        p_gl = np.array([0.0, 0.0, -zcam, 1.0])  # GL camera looks down -z
        clip = P @ p_gl
        np.testing.assert_allclose(clip[2] / clip[3], ndc, atol=1e-5)


def _numpy_crop_tf(poses, K, out_size, crop_ratio, diameter):
    """Literal transcription of ComputeCropWindowTF/ComputeTF for the test."""
    r = np.float32(diameter * crop_ratio / 2)
    offsets = np.array(
        [[0, 0, 0], [r, 0, 0], [-r, 0, 0], [0, r, 0], [0, -r, 0]], dtype=np.float32
    )

    def round_away(x):  # std::round on float
        return np.sign(x) * np.floor(np.abs(x) + np.float32(0.5))

    tfs = []
    for pose in poses.astype(np.float32):
        pts = pose[:3, 3][None, :] + offsets
        projected = (K.astype(np.float32) @ pts.T).T
        uvs = projected[:, :2] / projected[:, 2:3]
        center = uvs[0]
        radius = abs((uvs - center)[:, 1].max())
        left = round_away(center[0] - radius)
        right = round_away(center[0] + radius)
        top = round_away(center[1] - radius)
        bottom = round_away(center[1] + radius)
        tf = np.eye(3)
        tf[0, 2] = -left
        tf[1, 2] = -top
        new_tf = np.eye(3)
        new_tf[0, 0] = out_size[0] / (right - left)
        new_tf[1, 1] = out_size[1] / (bottom - top)
        tfs.append(new_tf @ tf)
    return np.stack(tfs)


def test_crop_window_tf_matches_reference_math():
    rng = np.random.default_rng(0)
    K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]], dtype=np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
    poses[:, :3, 3] = rng.uniform([-0.2, -0.2, 0.4], [0.2, 0.2, 1.2], (5, 3))
    got = np.asarray(
        transforms.compute_crop_window_tf(
            jnp.asarray(poses), jnp.asarray(K), (160, 160), 1.2, 0.2
        )
    )
    want = _numpy_crop_tf(poses, K, (160, 160), 1.2, 0.2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_bbox2d_roundtrip():
    rng = np.random.default_rng(1)
    K = jnp.asarray([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
    poses = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    poses[:, :3, 3] = rng.uniform([-0.1, -0.1, 0.5], [0.1, 0.1, 1.0], (4, 3))
    tfs = transforms.compute_crop_window_tf(jnp.asarray(poses), K, (160, 160), 1.2, 0.15)
    bbox = np.asarray(transforms.construct_bbox2d(tfs, 160, 160))
    # mapping the returned original-image corners through tf gives crop corners
    tfs_np = np.asarray(tfs)
    for i in range(4):
        tl = tfs_np[i] @ np.array([bbox[i, 0], bbox[i, 1], 1.0])
        br = tfs_np[i] @ np.array([bbox[i, 2], bbox[i, 3], 1.0])
        np.testing.assert_allclose(tl[:2], [0, 0], atol=1e-3)
        np.testing.assert_allclose(br[:2], [159, 159], atol=1e-3)


def test_axis_angle_matches_scipy():
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(2)
    rv = rng.normal(size=(10, 3)).astype(np.float32) * 0.5
    rv[0] = 0.0  # degenerate case
    got = np.asarray(transforms.axis_angle_to_matrix(jnp.asarray(rv)))
    want = Rotation.from_rotvec(rv).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_matrix_to_axis_angle_near_pi_degenerate_axes():
    """Shepperd pivot: relative signs survive when any axis component ~ 0.

    Regression for the round-2 advisor finding: anchoring the sign recovery
    on the x component returned a wrong rotation (round-trip matrix error
    2.0) for axes with x ~ 0, e.g. (0, 1, -1)/sqrt(2) at pi - 5e-4.
    """
    axes = np.array(
        [
            [0.0, 1.0, -1.0],
            [0.0, 1.0, 1.0],
            [1.0, 0.0, -1.0],
            [1.0, -1.0, 0.0],
            [0.0, 0.0, 1.0],
            [0.01, 0.7, -0.714],
        ]
    )
    axes = axes / np.linalg.norm(axes, axis=-1, keepdims=True)
    cases = []
    for ax in axes:
        for ang in (np.pi - 5e-4, np.pi - 1e-5, np.pi, 3.0):
            cases.append(ax * ang)
    rv = jnp.asarray(np.stack(cases), jnp.float32)
    R = transforms.axis_angle_to_matrix(rv)
    R2 = transforms.axis_angle_to_matrix(transforms.matrix_to_axis_angle(R))
    # f32 arccos conditioning near pi bounds the residual ~2e-3; the broken
    # branch produced errors of 2.0 here
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=5e-3)


def test_apply_refine_delta_matches_reference_composition():
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(3)
    n = 6
    poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    poses[:, :3, :3] = Rotation.random(n, rng).as_matrix()
    poses[:, :3, 3] = rng.normal(size=(n, 3)) * 0.1
    trans = rng.normal(size=(n, 3)).astype(np.float32)
    rot = rng.normal(size=(n, 3)).astype(np.float32)
    diameter = 0.19

    got = np.asarray(
        transforms.apply_refine_delta(
            jnp.asarray(poses), jnp.asarray(trans), jnp.asarray(rot), diameter
        )
    )

    for i in range(n):
        t_new = poses[i, :3, 3] + trans[i] * diameter / 2
        rv = np.tanh(rot[i]) * 0.349065850398865
        r_delta = Rotation.from_rotvec(rv).as_matrix().T
        r_new = r_delta @ poses[i, :3, :3]
        np.testing.assert_allclose(got[i, :3, 3], t_new, atol=1e-5)
        np.testing.assert_allclose(got[i, :3, :3], r_new, atol=1e-5)
        np.testing.assert_allclose(got[i, 3], [0, 0, 0, 1], atol=0)


def test_convert_pose_mesh2bbox():
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [1.0, 2.0, 3.0]
    center = np.array([0.1, 0.2, 0.3], dtype=np.float32)
    ob = np.eye(4, dtype=np.float32)
    ob[:3, 3] = [0.5, 0, 0]
    got = np.asarray(
        transforms.convert_pose_mesh2bbox(
            jnp.asarray(pose), jnp.asarray(center), jnp.asarray(ob)
        )
    )
    tf_c = np.eye(4)
    tf_c[:3, 3] = -center
    np.testing.assert_allclose(got, pose @ tf_c @ ob, atol=1e-6)


# --- rotational symmetry sets (geometry/symmetry.py) ------------------------


def test_symmetry_box_group_sizes():
    from foundationpose_cpp_tpu.geometry import symmetry

    cube = symmetry.box()  # all extents equal: full rotation group
    assert cube.shape == (24, 4, 4)
    sq = symmetry.box((0.1, 0.1, 0.3))  # square cuboid: 8 rotations
    assert sq.shape[0] == 8
    gen = symmetry.box((0.1, 0.2, 0.3))  # generic box: identity + 3 flips
    assert gen.shape[0] == 4
    for group in (cube, sq, gen):
        for s in group:
            r = s[:3, :3]
            np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
            assert np.linalg.det(r) > 0.99
        # identity is a member
        assert min(np.abs(group - np.eye(4)).max(axis=(1, 2))) < 1e-6


def test_symmetry_cyclic():
    from foundationpose_cpp_tpu.geometry import symmetry

    c6 = symmetry.axis_cyclic(2, 6)
    assert c6.shape == (6, 4, 4)
    # composing the generator 6 times returns to identity
    g = c6[1][:3, :3]
    acc = np.eye(3)
    for _ in range(6):
        acc = g @ acc
    np.testing.assert_allclose(acc, np.eye(3), atol=1e-6)


def test_rotation_error_deg_sym_cube_flip():
    from foundationpose_cpp_tpu.geometry import symmetry
    from foundationpose_cpp_tpu.utils import metrics

    rng = np.random.default_rng(0)
    # random gt rotation
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    r_gt = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])
    gt = np.eye(4)
    gt[:3, :3] = r_gt
    cube = symmetry.box()
    # estimate = gt flipped by a cube symmetry: 90 deg plain error, 0 sym
    est = gt.copy()
    est[:3, :3] = r_gt @ cube[5][:3, :3]
    plain = metrics.rotation_error_deg(est, gt)
    if plain < 1.0:  # element 5 could be identity-adjacent; pick another
        est[:3, :3] = r_gt @ cube[10][:3, :3]
        plain = metrics.rotation_error_deg(est, gt)
    assert plain > 45.0
    assert metrics.rotation_error_deg_sym(est, gt, cube) < 1e-4
    # None / identity-only set reduces to the plain metric
    assert metrics.rotation_error_deg_sym(est, gt, None) == plain
    np.testing.assert_allclose(
        metrics.rotation_error_deg_sym(est, gt, symmetry.identity()),
        plain, atol=1e-6,
    )


def test_mesh_asset_symmetries_field():
    from foundationpose_cpp_tpu.meshio import procedural

    # the checkerboard cube is visually identical under the full cube
    # rotation group and declares it; the face-colored cube is
    # pose-unique and must NOT declare symmetries
    cube = procedural.textured_cube(size=0.1)
    assert cube.symmetries is not None and cube.symmetries.shape == (24, 4, 4)
    cube6 = procedural.face_colored_cube()
    assert cube6.symmetries is None

"""SMPL LBS unit tests: rest-pose identity, rigid global rotation,
rodrigues correctness, projection algebra."""

import jax.numpy as jnp
import numpy as np

from impersonator_tpu.ops import smpl as smpl_ops


def _params(assets):
    return smpl_ops.SMPLParams.from_assets(assets)


def test_rodrigues_matches_scipy_formula(rng):
    theta = rng.standard_normal((8, 3)).astype(np.float32)
    R = np.asarray(smpl_ops.batch_rodrigues(jnp.asarray(theta)))
    for i in range(8):
        v = theta[i] + 1e-8
        angle = np.linalg.norm(v)
        axis = v / angle
        K = np.array([
            [0, -axis[2], axis[1]],
            [axis[2], 0, -axis[0]],
            [-axis[1], axis[0], 0],
        ])
        expected = np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K
        np.testing.assert_allclose(R[i], expected, atol=1e-5)


def test_rodrigues_orthonormal(rng):
    theta = rng.standard_normal((16, 3)).astype(np.float32)
    R = np.asarray(smpl_ops.batch_rodrigues(jnp.asarray(theta)))
    eye = np.broadcast_to(np.eye(3), R.shape)
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_rest_pose_is_template_plus_shape(assets):
    params = _params(assets)
    beta = jnp.zeros((2, 10))
    theta = jnp.zeros((2, 72))
    verts, joints, rots = smpl_ops.smpl_forward(params, beta, theta, assets.parents)
    # zero pose, zero shape -> template (pose blendshapes vanish since R=I)
    np.testing.assert_allclose(np.asarray(verts[0]), assets.v_template, atol=1e-5)
    assert joints.shape == (2, 19, 3)
    np.testing.assert_allclose(np.asarray(rots[0, 0]), np.eye(3), atol=1e-6)


def test_global_rotation_is_rigid(assets, rng):
    """Rotating only the root joint must rigidly rotate the whole mesh
    around the root joint location (minus pose-blendshape noise ~0)."""
    params = _params(assets)
    beta = jnp.zeros((1, 10))
    theta0 = jnp.zeros((1, 72))
    aa = np.zeros((1, 72), np.float32)
    aa[0, :3] = [0.0, np.pi / 2, 0.0]

    v0, _, _ = smpl_ops.smpl_forward(params, beta, theta0, assets.parents)
    v1, _, _ = smpl_ops.smpl_forward(params, beta, jnp.asarray(aa), assets.parents)

    root = assets.j_regressor.T @ assets.v_template  # (24, 3)
    root0 = root[0]
    R = np.asarray(smpl_ops.batch_rodrigues(jnp.asarray(aa[:, :3])))[0]
    expected = (np.asarray(v0[0]) - root0) @ R.T + root0
    np.testing.assert_allclose(np.asarray(v1[0]), expected, atol=1e-4)


def test_shape_blendshapes_move_verts(assets):
    params = _params(assets)
    theta = jnp.zeros((1, 72))
    beta = jnp.ones((1, 10))
    v, _, _ = smpl_ops.smpl_forward(params, beta, theta, assets.parents)
    expected = assets.v_template + (np.ones(10) @ assets.shapedirs).reshape(-1, 3)
    np.testing.assert_allclose(np.asarray(v[0]), expected, atol=1e-5)


def test_orth_proj_idrot():
    x = jnp.asarray(np.arange(18, dtype=np.float32).reshape(1, 6, 3))
    cam = jnp.asarray([[2.0, 0.5, -0.5]])
    out = np.asarray(smpl_ops.batch_orth_proj_idrot(x, cam))
    expected = 2.0 * (np.arange(18).reshape(1, 6, 3)[..., :2] + [0.5, -0.5])
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_get_details_shapes(assets):
    params = _params(assets)
    theta85 = jnp.zeros((3, 85)).at[:, 0].set(0.9)
    det = smpl_ops.get_details(params, theta85, assets.parents)
    assert det["verts"].shape == (3, assets.nv, 3)
    assert det["j2d"].shape == (3, 19, 2)
    assert det["cam"].shape == (3, 3)

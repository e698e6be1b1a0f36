"""Batched SMPL linear-blend-skinning in pure JAX.

Functional re-design of the reference's torch module
(``networks/batch_smpl.py:23-375``): the model constants live in a
:class:`SMPLParams` pytree, the forward is a pure function that jits,
vmaps and shards cleanly. The math is the standard SMPL pipeline:

    shape blendshapes -> joint regression -> pose blendshapes ->
    global rigid chain -> LBS skinning -> cocoplus joint regression

Numerical conventions match the reference exactly (1e-8 shift inside
Rodrigues, relative bone transforms, weak-perspective projection) so
converted checkpoints reproduce the same vertices.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Geometry matmuls are tiny but precision-critical (joint regression feeds
# the rasterizer); force full fp32 accumulation regardless of the backend's
# default (TPU would otherwise use bf16 passes on the MXU).
_HI = jax.lax.Precision.HIGHEST

from impersonator_tpu.assets import SMPLAssets, NUM_JOINTS


class SMPLParams(NamedTuple):
    """Device-resident SMPL constants (a pytree of jnp arrays)."""

    v_template: jax.Array   # (nv, 3)
    shapedirs: jax.Array    # (10, nv*3)
    posedirs: jax.Array     # (207, nv*3)
    j_regressor: jax.Array  # (nv, 24)
    lbs_weights: jax.Array  # (nv, 24)
    joint_regressor: jax.Array  # (nv, 19)
    faces: jax.Array        # (nf, 3) int32

    @classmethod
    def from_assets(cls, assets: SMPLAssets, dtype=jnp.float32) -> "SMPLParams":
        return cls(
            v_template=jnp.asarray(assets.v_template, dtype),
            shapedirs=jnp.asarray(assets.shapedirs, dtype),
            posedirs=jnp.asarray(assets.posedirs, dtype),
            j_regressor=jnp.asarray(assets.j_regressor, dtype),
            lbs_weights=jnp.asarray(assets.lbs_weights, dtype),
            joint_regressor=jnp.asarray(assets.joint_regressor, dtype),
            faces=jnp.asarray(assets.faces, jnp.int32),
        )


def batch_rodrigues(theta: jax.Array) -> jax.Array:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3).

    Matches reference ``batch_rodrigues`` (batch_smpl.py:64-101) including
    its elementwise +1e-8 regularizer before the norm.
    """
    shifted = theta + 1e-8
    angle = jnp.linalg.norm(shifted, axis=-1, keepdims=True)  # (..., 1)
    r = shifted / angle
    cos = jnp.cos(angle)[..., None]
    sin = jnp.sin(angle)[..., None]
    outer = r[..., :, None] * r[..., None, :]
    eye = jnp.eye(3, dtype=theta.dtype)
    rx, ry, rz = r[..., 0], r[..., 1], r[..., 2]
    zeros = jnp.zeros_like(rx)
    skew = jnp.stack(
        [
            jnp.stack([zeros, -rz, ry], axis=-1),
            jnp.stack([rz, zeros, -rx], axis=-1),
            jnp.stack([-ry, rx, zeros], axis=-1),
        ],
        axis=-2,
    )
    return cos * eye + (1.0 - cos) * outer + sin * skew


def _rigid_chain(rots: jax.Array, joints: jax.Array, parents: np.ndarray):
    """Forward-kinematics over the (static) kinematic tree.

    rots: (N, 24, 3, 3); joints: (N, 24, 3).
    Returns posed joints (N, 24, 3) and LBS transforms A (N, 24, 4, 4),
    reproducing ``batch_global_rigid_transformation``
    (batch_smpl.py:129-218). The 24-step python loop unrolls at trace
    time — the tree is a compile-time constant.
    """
    n = rots.shape[0]
    dtype = rots.dtype

    def make_mat(rot, t):
        # (N,3,3), (N,3) -> (N,4,4)
        top = jnp.concatenate([rot, t[..., None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype), (n, 1, 4))
        return jnp.concatenate([top, bottom], axis=-2)

    # Compose by tree DEPTH LEVEL: joints at the same depth multiply
    # their parents' results in ONE batched (N, k, 4, 4) matmul, so the
    # sequential critical path is the tree depth (7 for SMPL), not the
    # 23-step per-joint chain — tiny-matmul launch latency dominated the
    # old unroll on TPU.
    parents = np.asarray(parents)
    depth = np.zeros(NUM_JOINTS, np.int64)
    for i in range(1, NUM_JOINTS):
        depth[i] = depth[int(parents[i])] + 1

    bones = joints - joints[:, parents]           # (N, 24, 3); j0 unused
    local = jnp.concatenate([
        jnp.concatenate([rots, bones[..., None]], axis=-1),
        jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0], dtype),
                         (n, NUM_JOINTS, 1, 4))], axis=-2)  # (N, 24, 4, 4)

    results = [None] * NUM_JOINTS
    results[0] = make_mat(rots[:, 0], joints[:, 0])
    for d in range(1, int(depth.max()) + 1):
        ids = np.nonzero(depth == d)[0]
        par = jnp.stack([results[int(parents[i])] for i in ids], axis=1)
        prod = jnp.matmul(par, local[:, ids], precision=_HI)
        for k, i in enumerate(ids):
            results[int(i)] = prod[:, k]
    stacked = jnp.stack(results, axis=1)  # (N, 24, 4, 4)

    posed_joints = stacked[:, :, :3, 3]

    # Relative transforms: subtract the transform applied to the rest joint
    # so skinning moves vertices by (posed - rest) bone motion.
    j_home = jnp.concatenate(
        [joints, jnp.zeros((n, NUM_JOINTS, 1), dtype)], axis=-1)  # w=0
    init_bone = jnp.einsum("njab,njb->nja", stacked, j_home, precision=_HI)
    rel = stacked.at[:, :, :, 3].add(-init_bone)
    return posed_joints, rel


def smpl_forward(
    params: SMPLParams,
    beta: jax.Array,
    theta: jax.Array,
    parents: np.ndarray,
):
    """SMPL forward: (beta (N,10), theta (N,72)) -> verts, joints, rots.

    Mirrors ``SMPL.forward`` (batch_smpl.py:285-375).
    Returns:
        verts:  (N, nv, 3) skinned vertices
        joints: (N, 19, 3) cocoplus joints
        rots:   (N, 24, 3, 3) per-joint rotations
    """
    n = beta.shape[0]
    nv = params.v_template.shape[0]

    v_shaped = jnp.matmul(beta, params.shapedirs, precision=_HI).reshape(n, nv, 3) + params.v_template
    j = jnp.einsum("nvc,vj->njc", v_shaped, params.j_regressor, precision=_HI)

    rots = batch_rodrigues(theta.reshape(n, NUM_JOINTS, 3))
    pose_feature = (rots[:, 1:] - jnp.eye(3, dtype=rots.dtype)).reshape(n, -1)
    v_posed = jnp.matmul(pose_feature, params.posedirs, precision=_HI).reshape(n, nv, 3) + v_shaped

    _, rel = _rigid_chain(rots, j, parents)

    # skinning: per-vertex blend of joint transforms
    t_mats = jnp.einsum("vj,njab->nvab", params.lbs_weights, rel, precision=_HI)  # (N, nv, 4, 4)
    v_homo = jnp.concatenate(
        [v_posed, jnp.ones((n, nv, 1), v_posed.dtype)], axis=-1)
    verts = jnp.einsum("nvab,nvb->nva", t_mats, v_homo, precision=_HI)[..., :3]

    joints = jnp.einsum("nvc,vk->nkc", verts, params.joint_regressor, precision=_HI)
    return verts, joints, rots


def batch_orth_proj_idrot(x: jax.Array, camera: jax.Array) -> jax.Array:
    """Weak-perspective projection: (N, P, 3), cam (N, 3 = [s, tx, ty]) ->
    (N, P, 2). Reference batch_smpl.batch_orth_proj_idrot (:221-232)."""
    return camera[:, None, 0:1] * (x[..., :2] + camera[:, None, 1:])


def get_details(params: SMPLParams, theta85: jax.Array, parents: np.ndarray):
    """Split an 85-dim theta into cam/pose/shape and run SMPL.

    Mirrors ``HumanModelRecovery.get_details`` (networks/hmr.py:302-330).
    """
    cam = theta85[:, 0:3]
    pose = theta85[:, 3:75]
    shape = theta85[:, 75:]
    verts, j3d, _ = smpl_forward(params, shape, pose, parents)
    j2d = batch_orth_proj_idrot(j3d, cam)
    return {
        "theta": theta85,
        "cam": cam,
        "pose": pose,
        "shape": shape,
        "verts": verts,
        "j2d": j2d,
        "j3d": j3d,
    }

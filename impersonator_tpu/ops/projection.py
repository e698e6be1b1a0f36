"""Camera / projection helpers for the renderer.

Covers the reference's ``orthographic_proj_withz_idrot`` (utils/nmr.py:10-28),
the neural-renderer ``look_at`` transform (look_at.py:6-62) and the Euler
rotation used by the novel-view task (utils/cv_utils.py:333-353).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# Renderer eye position: [0, 0, -(1/tan(view_angle) + 1)] with the default
# 30° viewing angle (SMPLRenderer.__init__, utils/nmr.py:177).
def eye_z(viewing_angle_deg: float = 30.0) -> float:
    return 1.0 / math.tan(math.radians(viewing_angle_deg)) + 1.0


DEFAULT_EYE_Z = eye_z()


def orthographic_proj_withz_idrot(x: jax.Array, cam: jax.Array, offset_z: float = 0.0):
    """x (B, N, 3), cam (B, 3 = [s, tx, ty]) -> (B, N, 3).

    xy := s * (xy + t); z preserved (+offset). utils/nmr.py:10-28.
    """
    scale = cam[:, 0][:, None, None]
    trans = cam[:, None, 1:3]
    xy = scale * (x[..., :2] + trans)
    z = x[..., 2:3] + offset_z
    return jnp.concatenate([xy, z], axis=-1)


def look_at(vertices: jax.Array, eye, at=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0)):
    """General "look at" camera transform (neural_renderer look_at.py:6-62).

    vertices: (B, N, 3). With the renderer's default on-axis eye
    [0,0,-z_e] this degenerates to a translation by +z_e along z; the
    general rotation path is kept for API parity.
    """
    eye = jnp.asarray(eye, vertices.dtype)
    at = jnp.asarray(at, vertices.dtype)
    up = jnp.asarray(up, vertices.dtype)

    def _norm(v):
        return v / jnp.maximum(jnp.linalg.norm(v), 1e-5)

    z_axis = _norm(at - eye)
    x_axis = _norm(jnp.cross(up, z_axis))
    y_axis = _norm(jnp.cross(z_axis, x_axis))
    r = jnp.stack([x_axis, y_axis, z_axis], axis=0)  # (3, 3), rows are axes
    return (vertices - eye) @ r.T


def look_at_on_axis(vertices: jax.Array, eye_z_value: float = DEFAULT_EYE_Z):
    """Fast path of :func:`look_at` for the renderer's fixed eye on -z:
    a pure z-translation (rotation is identity)."""
    return vertices + jnp.asarray([0.0, 0.0, eye_z_value], vertices.dtype)


def look(vertices: jax.Array, eye, direction=(0.0, 1.0, 0.0),
         up=(0.0, 1.0, 0.0)):
    """"Look" transform: like :func:`look_at` but the camera z-axis is a
    *direction* rather than a target point (neural_renderer look.py:6-57).

    vertices: (B, N, 3).
    """
    eye = jnp.asarray(eye, vertices.dtype)
    direction = jnp.asarray(direction, vertices.dtype)
    up = jnp.asarray(up, vertices.dtype)

    def _norm(v):
        return v / jnp.maximum(jnp.linalg.norm(v), 1e-5)

    z_axis = _norm(direction)
    x_axis = _norm(jnp.cross(up, z_axis))
    y_axis = _norm(jnp.cross(z_axis, x_axis))
    r = jnp.stack([x_axis, y_axis, z_axis], axis=0)  # rows are camera axes
    return (vertices - eye) @ r.T


def perspective(vertices: jax.Array, angle: float = 30.0):
    """Perspective divide with a given half viewing angle
    (neural_renderer perspective.py:6-22): x,y := x,y / (z * tan(angle)).

    vertices: (B, N, 3)."""
    width = math.tan(math.radians(angle))
    z = vertices[..., 2]
    x = vertices[..., 0] / z / width
    y = vertices[..., 1] / z / width
    return jnp.stack([x, y, z], axis=-1)


def get_points_from_angles(distance, elevation, azimuth, degrees: bool = True):
    """Spherical camera position -> eye xyz
    (neural_renderer get_points_from_angles.py:6-26). Accepts scalars or
    arrays (broadcast); returns a (3,) or (N, 3) array."""
    distance = jnp.asarray(distance, jnp.float32)
    elevation = jnp.asarray(elevation, jnp.float32)
    azimuth = jnp.asarray(azimuth, jnp.float32)
    if degrees:
        elevation = elevation * (jnp.pi / 180.0)
        azimuth = azimuth * (jnp.pi / 180.0)
    pts = jnp.stack(
        [
            distance * jnp.cos(elevation) * jnp.sin(azimuth),
            distance * jnp.sin(elevation),
            -distance * jnp.cos(elevation) * jnp.cos(azimuth),
        ],
        axis=-1,
    )
    return pts


def euler_to_matrix(rt, deg: bool = True) -> jax.Array:
    """Euler angles (3,) -> rotation matrix (3,3).

    Matches utils/cv_utils.euler2matrix (cv_utils.py:333-353):
    R = Rz @ Ry @ Rx with angles given per-axis.
    """
    rt = jnp.asarray(rt, jnp.float32)
    if deg:
        rt = rt * (jnp.pi / 180.0)
    x, y, z = rt[0], rt[1], rt[2]
    cx, sx = jnp.cos(x), jnp.sin(x)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cz, sz = jnp.cos(z), jnp.sin(z)
    rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]], jnp.float32)
    ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], jnp.float32)
    rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]], jnp.float32)
    return rz @ ry @ rx

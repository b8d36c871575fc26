"""Rotation representations in JAX: axis-angle <-> matrix <-> quaternion <->
6d, plus slerp.

Replaces the reference's pytorch3d.transforms dependency
(mogen/models/utils/quaternion.py, datasets/pipelines/rotation_conversions.py)
with batched pure-jnp implementations (same math: Rodrigues, Zhou et al. 6d
continuity representation, Shepperd-style matrix->quat).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def axis_angle_to_matrix(aa: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] axis-angle -> [..., 3, 3] via the Rodrigues formula."""
    angle = jnp.linalg.norm(aa + 1e-8, axis=-1, keepdims=True)
    axis = aa / angle
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(x)
    K = jnp.stack([
        jnp.stack([zeros, -z, y], axis=-1),
        jnp.stack([z, zeros, -x], axis=-1),
        jnp.stack([-y, x, zeros], axis=-1),
    ], axis=-2)
    cos = jnp.cos(angle)[..., None]
    sin = jnp.sin(angle)[..., None]
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    return eye + sin * K + (1 - cos) * (K @ K)


def matrix_to_axis_angle(R: jnp.ndarray) -> jnp.ndarray:
    return quaternion_to_axis_angle(matrix_to_quaternion(R))


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (w, x, y, z) -> [..., 3, 3]."""
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)


def matrix_to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 4] (w, x, y, z), numerically stable branchless form."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    # four candidate quaternions (from each diagonal dominance case)
    qw = jnp.stack([1 + m00 + m11 + m22, m21 - m12, m02 - m20, m10 - m01], -1)
    qx = jnp.stack([m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20], -1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21], -1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22], -1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # [..., 4, 4]
    traces = jnp.stack([1 + m00 + m11 + m22, 1 + m00 - m11 - m22,
                        1 - m00 + m11 - m22, 1 - m00 - m11 + m22], axis=-1)
    best = jnp.argmax(traces, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quaternion_to_axis_angle(q: jnp.ndarray) -> jnp.ndarray:
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    xyz = q[..., 1:]
    norm = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    angle = 2 * jnp.arctan2(norm[..., 0], w)
    scale = jnp.where(norm[..., 0] > 1e-6, angle / (norm[..., 0] + 1e-12), 2.0 / jnp.maximum(w, 1e-6))
    return xyz * scale[..., None]


def axis_angle_to_quaternion(aa: jnp.ndarray) -> jnp.ndarray:
    angle = jnp.linalg.norm(aa + 1e-12, axis=-1, keepdims=True)
    half = angle / 2
    w = jnp.cos(half)
    xyz = aa / angle * jnp.sin(half)
    return jnp.concatenate([w, xyz], axis=-1)


def matrix_to_rotation_6d(R: jnp.ndarray) -> jnp.ndarray:
    """First two ROWS of R, flattened (pytorch3d convention): [..., 6]."""
    return R[..., :2, :].reshape(R.shape[:-2] + (6,))


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """Gram-Schmidt per Zhou et al. (pytorch3d convention, row vectors)."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / (jnp.linalg.norm(a1, axis=-1, keepdims=True) + 1e-12)
    a2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2 / (jnp.linalg.norm(a2, axis=-1, keepdims=True) + 1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def quat_to_6v(q):
    return matrix_to_rotation_6d(quaternion_to_matrix(q))


def quat_from_6v(d6):
    return matrix_to_quaternion(rotation_6d_to_matrix(d6))


def ax_to_6v(aa):
    return matrix_to_rotation_6d(axis_angle_to_matrix(aa))


def ax_from_6v(d6):
    return matrix_to_axis_angle(rotation_6d_to_matrix(d6))


def quat_slerp(x, y, a):
    """Spherical linear interpolation (quaternion.py:35-74)."""
    dot = jnp.sum(x * y, axis=-1)
    y = jnp.where(dot[..., None] < 0, -y, y)
    dot = jnp.abs(dot)
    a = jnp.zeros_like(x[..., 0]) + a
    linear = (1.0 - dot) < 0.01
    omega = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sinom = jnp.sin(omega)
    amt0 = jnp.where(linear, 1.0 - a, jnp.sin((1.0 - a) * omega) / jnp.where(linear, 1.0, sinom))
    amt1 = jnp.where(linear, a, jnp.sin(a * omega) / jnp.where(linear, 1.0, sinom))
    return amt0[..., None] * x + amt1[..., None] * y

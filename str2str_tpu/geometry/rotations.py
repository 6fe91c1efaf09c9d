"""SO(3) rotation parameterizations and conversions, in pure jnp.

All functions are shape-polymorphic over leading batch dims, jit/vmap/grad
compatible, and numerically safe near the identity (Taylor branches selected
with `jnp.where`, guarded against NaN gradients).

Quaternions are (w, x, y, z) with the convention R(q1 ∘ q2) = R(q1) @ R(q2)
acting on column vectors.

Capability parity with the reference's rotation layer
(`/root/reference/src/common/rotation3d.py`, `rigid_utils.py` quaternion ops),
re-derived for XLA: no data-dependent branching, no eigendecompositions.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "quat_multiply",
    "quat_conjugate",
    "quat_rotate",
    "standardize_quat",
    "quat_to_matrix",
    "matrix_to_quat",
    "axis_angle_to_quat",
    "quat_to_axis_angle",
    "axis_angle_to_matrix",
    "matrix_to_axis_angle",
    "compose_axis_angle",
    "random_quat",
    "euler_angles_to_matrix",
    "matrix_to_euler_angles",
    "rotation_6d_to_matrix",
    "matrix_to_rotation_6d",
]


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a ∘ b for (..., 4) quaternions."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate (= inverse for unit quaternions)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate points v (..., 3) by unit quaternions q (..., 4).

    Uses the expanded form R(q) v = v + 2 w (u x v) + 2 u x (u x v),
    u = q.xyz — cheaper than materializing matrices for a single apply.
    """
    u = q[..., 1:]
    w = q[..., :1]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def standardize_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Flip sign so the real part is non-negative."""
    return jnp.where(q[..., :1] < 0, -q, q)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) -> rotation matrix (..., 3, 3)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    two = jnp.asarray(2.0, dtype=q.dtype)
    xx, yy, zz = two * x * x, two * y * y, two * z * z
    xy, xz, yz = two * x * y, two * x * z, two * y * z
    wx, wy, wz = two * w * x, two * w * y, two * w * z
    m = jnp.stack(
        [
            1.0 - yy - zz, xy - wz, xz + wy,
            xy + wz, 1.0 - xx - zz, yz - wx,
            xz - wy, yz + wx, 1.0 - xx - yy,
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def _sqrt_positive(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt(max(0, x)) with a zero (not NaN) gradient at x <= 0."""
    positive = x > 0
    safe = jnp.where(positive, x, jnp.ones_like(x))
    return jnp.where(positive, jnp.sqrt(safe), jnp.zeros_like(x))


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4), w >= 0.

    Branch-free: builds all four Shepperd candidates and selects the one with
    the largest pivot, so it is stable for every rotation angle.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    q_abs = _sqrt_positive(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )

    # Candidate quaternions, each scaled by its own pivot (unnormalized).
    cand = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )  # (..., 4 candidates, 4)

    eps = jnp.asarray(0.1, dtype=m.dtype)
    denom = 2.0 * jnp.maximum(eps, q_abs[..., None])
    cand = cand / denom

    best = jnp.argmax(q_abs, axis=-1)
    onehot = jax_one_hot(best, 4, dtype=m.dtype)
    q = jnp.sum(cand * onehot[..., None], axis=-2)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return standardize_quat(q)


def jax_one_hot(idx: jnp.ndarray, n: int, dtype) -> jnp.ndarray:
    return (idx[..., None] == jnp.arange(n)).astype(dtype)


def axis_angle_to_quat(v: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector (..., 3) -> unit quaternion.

    q = (cos(θ/2), sin(θ/2) * v/θ). The sin(θ/2)/θ factor uses a 4th-order
    Taylor series below θ=1e-3 so gradients stay finite at θ=0.
    """
    theta2 = jnp.sum(v * v, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta2 + jnp.asarray(1e-30, v.dtype))
    small = theta < 1e-3
    # sin(θ/2)/θ  ≈ 1/2 - θ²/48  (+O(θ⁴))
    sin_half_over_theta = jnp.where(
        small, 0.5 - theta2 / 48.0, jnp.sin(0.5 * theta) / theta
    )
    w = jnp.cos(0.5 * theta)
    return jnp.concatenate([w, v * sin_half_over_theta], axis=-1)


def quat_to_axis_angle(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> rotation vector with angle in [0, π].

    Follows the scipy/OpenFold convention: flip to w >= 0, then
    θ = 2 atan2(‖xyz‖, w) and v = θ * xyz / sin(θ/2), with a Taylor branch
    of the scale 2 + θ²/12 + 7θ⁴/2880 for θ <= 1e-3
    (see reference rigid_utils.py get_rotvec).
    """
    q = standardize_quat(q)
    xyz = q[..., 1:]
    # Gradient-safe norm: at the identity rotation xyz == 0 exactly and the
    # plain norm's gradient is 0/0 = NaN (this is hit on every training
    # step-1, where the zero-initialized update head makes the predicted
    # rotation equal its input).
    norm_xyz = jnp.sqrt(jnp.sum(xyz * xyz, axis=-1, keepdims=True) + 1e-24)
    angle = 2.0 * jnp.arctan2(norm_xyz, q[..., :1])
    angle2 = angle * angle
    small = angle <= 1e-3
    small_scale = 2.0 + angle2 / 12.0 + 7.0 * angle2 * angle2 / 2880.0
    safe_sin = jnp.where(small, jnp.ones_like(angle), jnp.sin(0.5 * angle))
    large_scale = angle / safe_sin
    return jnp.where(small, small_scale, large_scale) * xyz


def axis_angle_to_matrix(v: jnp.ndarray) -> jnp.ndarray:
    return quat_to_matrix(axis_angle_to_quat(v))


def matrix_to_axis_angle(m: jnp.ndarray) -> jnp.ndarray:
    return quat_to_axis_angle(matrix_to_quat(m))


def compose_axis_angle(v1: jnp.ndarray, v2: jnp.ndarray) -> jnp.ndarray:
    """Rotation-vector of R(v1) @ R(v2), composed in quaternion space.

    The reference composes 3x3 matrices in float64 (so3.py compose_rotvec);
    quaternion composition keeps fp32 accuracy without emulated doubles.
    """
    q = quat_multiply(axis_angle_to_quat(v1), axis_angle_to_quat(v2))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return quat_to_axis_angle(q)


def random_quat(key, shape=(), dtype=jnp.float32) -> jnp.ndarray:
    """Uniform random unit quaternions (Haar measure on SO(3))."""
    import jax

    g = jax.random.normal(key, shape + (4,), dtype=dtype)
    q = g / jnp.linalg.norm(g, axis=-1, keepdims=True)
    return standardize_quat(q)


# ---------------------------------------------------------------------------
# Euler-angle and 6D rotation representations (reference rotation3d.py:
# euler_angles_to_matrix :194, matrix_to_euler_angles :266,
# rotation_6d_to_matrix :556, matrix_to_rotation_6d :580 — the PyTorch3D
# converter surface the reference carries; unused by any Str2Str call path
# but part of its API).


def _single_axis_rotation(axis: str, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices about one lab axis (rotation3d.py:164-192)."""
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    if axis == "X":
        flat = (one, zero, zero, zero, cos, -sin, zero, sin, cos)
    elif axis == "Y":
        flat = (cos, zero, sin, zero, one, zero, -sin, zero, cos)
    elif axis == "Z":
        flat = (cos, -sin, zero, sin, cos, zero, zero, zero, one)
    else:
        raise ValueError("letter must be either X, Y or Z.")
    return jnp.stack(flat, -1).reshape(angle.shape + (3, 3))


def _check_convention(convention: str):
    if len(convention) != 3:
        raise ValueError("Convention must have 3 letters.")
    if convention[1] in (convention[0], convention[2]):
        raise ValueError(f"Invalid convention {convention}.")
    for letter in convention:
        if letter not in ("X", "Y", "Z"):
            raise ValueError(f"Invalid letter {letter} in convention string.")


def euler_angles_to_matrix(euler_angles: jnp.ndarray,
                           convention: str) -> jnp.ndarray:
    """Euler angles (radians, (..., 3)) -> rotation matrices (..., 3, 3)
    under an extrinsic XYZ-style convention string."""
    if euler_angles.ndim == 0 or euler_angles.shape[-1] != 3:
        raise ValueError("Invalid input euler angles.")
    _check_convention(convention)
    ms = [_single_axis_rotation(c, euler_angles[..., i])
          for i, c in enumerate(convention)]
    return ms[0] @ ms[1] @ ms[2]


def _angle_from_tan(axis: str, other_axis: str, data: jnp.ndarray,
                    horizontal: bool, tait_bryan: bool) -> jnp.ndarray:
    """First/third Euler angle from the two matrix entries that are a
    positive constant times its sine and cosine (rotation3d.py:225-263)."""
    i1, i2 = {"X": (2, 1), "Y": (0, 2), "Z": (1, 0)}[axis]
    if horizontal:
        i2, i1 = i1, i2
    even = (axis + other_axis) in ("XY", "YZ", "ZX")
    if horizontal == even:
        return jnp.arctan2(data[..., i1], data[..., i2])
    if tait_bryan:
        return jnp.arctan2(-data[..., i2], data[..., i1])
    return jnp.arctan2(data[..., i2], -data[..., i1])


def matrix_to_euler_angles(matrix: jnp.ndarray,
                           convention: str) -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) -> Euler angles (..., 3)."""
    _check_convention(convention)
    if matrix.shape[-1] != 3 or matrix.shape[-2] != 3:
        raise ValueError(f"Invalid rotation matrix shape {matrix.shape}.")
    idx = {"X": 0, "Y": 1, "Z": 2}
    i0, i2 = idx[convention[0]], idx[convention[2]]
    tait_bryan = i0 != i2
    if tait_bryan:
        central = jnp.arcsin(
            matrix[..., i0, i2] * (-1.0 if i0 - i2 in (-1, 2) else 1.0))
    else:
        central = jnp.arccos(matrix[..., i0, i0])
    return jnp.stack([
        _angle_from_tan(convention[0], convention[1],
                        matrix[..., i2], False, tait_bryan),
        central,
        _angle_from_tan(convention[2], convention[1],
                        matrix[..., i0, :], True, tait_bryan),
    ], -1)


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """Zhou et al. 6D rotation representation -> matrix via Gram-Schmidt
    (rotation3d.py:556-578)."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-12)
    b2 = a2 - jnp.sum(b1 * a2, -1, keepdims=True) * b1
    b2 = b2 / jnp.maximum(jnp.linalg.norm(b2, axis=-1, keepdims=True), 1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack((b1, b2, b3), axis=-2)


def matrix_to_rotation_6d(matrix: jnp.ndarray) -> jnp.ndarray:
    """Matrix -> 6D representation: the first two rows (rotation3d.py:580)."""
    return matrix[..., :2, :].reshape(matrix.shape[:-2] + (6,))

"""Rotation representation conversions (pure JAX, batched, jit-safe).

Behavioral parity targets (reference: /root/reference/hamer/hamer/utils/geometry.py:5-70,
/root/reference/hamer/infer.py:65-96, manopth rodrigues_layer):

- ``aa_to_rotmat``: axis-angle -> rotmat via quaternion, including the
  reference's ``+1e-8`` pre-norm regularizer (geometry.py:15).
- ``rot6d_to_rotmat``: Gram-Schmidt per Zhou et al., column-stacked
  (geometry.py:47-70).
- ``rotmat_to_aa``: inverse Rodrigues (reference uses cv2.Rodrigues at
  infer.py:1082-1096 when saving .npy params).

All functions accept arbitrary leading batch dims.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_to_rotmat(quat: jax.Array) -> jax.Array:
    """(..., 4) wxyz quaternion -> (..., 3, 3) rotation matrix."""
    norm = jnp.linalg.norm(quat, axis=-1, keepdims=True)
    q = quat / norm
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    rot = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=-1,
    )
    return rot.reshape(quat.shape[:-1] + (3, 3))


def aa_to_rotmat(theta: jax.Array) -> jax.Array:
    """(..., 3) axis-angle -> (..., 3, 3) rotation matrix (via quaternion).

    Matches the reference numerics: the angle is the L2 norm of
    ``theta + 1e-8`` (elementwise), and the axis is ``theta / angle``.
    """
    angle = jnp.linalg.norm(theta + 1e-8, axis=-1, keepdims=True)
    normalized = theta / angle
    half = angle * 0.5
    quat = jnp.concatenate([jnp.cos(half), jnp.sin(half) * normalized], axis=-1)
    return quat_to_rotmat(quat)


def rot6d_to_rotmat(x: jax.Array) -> jax.Array:
    """(..., 6) continuous 6D rotation rep -> (..., 3, 3).

    The 6 numbers are interpreted as a (2, 3) row-major matrix whose rows
    are the first two (unnormalized) columns a1, a2 of the rotation; the
    output columns are (b1, b2, b1 x b2) after Gram-Schmidt.
    """
    shape = x.shape[:-1]
    m = x.reshape(shape + (2, 3))
    a1 = m[..., 0, :]
    a2 = m[..., 1, :]
    eps = 1e-12
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), eps)
    proj = jnp.sum(b1 * a2, axis=-1, keepdims=True)
    u2 = a2 - proj * b1
    b2 = u2 / jnp.maximum(jnp.linalg.norm(u2, axis=-1, keepdims=True), eps)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def rotmat_to_quat(rot: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation matrix -> (..., 4) wxyz quaternion (w >= 0).

    Branchless "max trace" construction, safe under jit/vmap.
    """
    m00, m01, m02 = rot[..., 0, 0], rot[..., 0, 1], rot[..., 0, 2]
    m10, m11, m12 = rot[..., 1, 0], rot[..., 1, 1], rot[..., 1, 2]
    m20, m21, m22 = rot[..., 2, 0], rot[..., 2, 1], rot[..., 2, 2]

    # Four candidate constructions; pick the numerically largest pivot.
    qw_sq = jnp.maximum(0.0, 1.0 + m00 + m11 + m22)
    qx_sq = jnp.maximum(0.0, 1.0 + m00 - m11 - m22)
    qy_sq = jnp.maximum(0.0, 1.0 - m00 + m11 - m22)
    qz_sq = jnp.maximum(0.0, 1.0 - m00 - m11 + m22)

    # Candidate quaternions (unnormalized), one per pivot.
    cw = jnp.stack([qw_sq, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    cx = jnp.stack([m21 - m12, qx_sq, m01 + m10, m02 + m20], axis=-1)
    cy = jnp.stack([m02 - m20, m01 + m10, qy_sq, m12 + m21], axis=-1)
    cz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz_sq], axis=-1)

    sq = jnp.stack([qw_sq, qx_sq, qy_sq, qz_sq], axis=-1)
    idx = jnp.argmax(sq, axis=-1)
    cand = jnp.stack([cw, cx, cy, cz], axis=-2)  # (..., 4 cand, 4)
    q = jnp.take_along_axis(cand, idx[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    # Canonicalize sign: w >= 0.
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q


def rotmat_to_aa(rot: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation matrix -> (..., 3) axis-angle (Rodrigues inverse)."""
    q = rotmat_to_quat(rot)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    xyz = q[..., 1:]
    sin_half = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(sin_half[..., 0], w)[..., None]
    axis = xyz / jnp.maximum(sin_half, 1e-12)
    # As angle -> 0 the axis is ill-defined; aa -> 0 smoothly.
    return jnp.where(sin_half < 1e-8, xyz * 2.0, axis * angle)


def rotmat_orthonormalize(rot: jax.Array) -> jax.Array:
    """Project (..., 3, 3) near-rotations onto SO(3) via SVD (det +1).

    Equivalent of manopth's ``rotproj.batch_rotprojs`` used when feeding
    rotation matrices into the MANO layer (manolayer.py:166-171).
    """
    u, _, vt = jnp.linalg.svd(rot)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", u, vt))
    d = jnp.concatenate(
        [jnp.ones(rot.shape[:-2] + (2,), rot.dtype), det[..., None]], axis=-1
    )
    return jnp.einsum("...ij,...j,...jk->...ik", u, d, vt)


# --- Euler-angle conventions -------------------------------------------------
# Parity target: the reference's KeypointFusion rotation-convention
# library (rootnet/KeypointFusion/util/object_transform.py:74-107
# ee_to_rotmat / rotmat_to_ee, which delegate to pytorch3d
# euler_angles_to_matrix / matrix_to_euler_angles). Conventions are
# 3-letter axis strings ("xyz" etc., case-insensitive, pytorch3d
# intrinsic semantics: R = R_c0(a0) @ R_c1(a1) @ R_c2(a2)).

def _axis_rotmat(axis: str, angle: jax.Array) -> jax.Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    if axis == "x":
        rows = ((one, zero, zero), (zero, c, -s), (zero, s, c))
    elif axis == "y":
        rows = ((c, zero, s), (zero, one, zero), (-s, zero, c))
    elif axis == "z":
        rows = ((c, -s, zero), (s, c, zero), (zero, zero, one))
    else:
        raise ValueError(f"bad axis {axis!r}")
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def _check_convention(convention: str) -> str:
    """Three axes from xyz with no immediate repeats (pytorch3d rule;
    admits both Tait-Bryan xyz... and proper-Euler zxz... sequences)."""
    convention = convention.lower()
    if (len(convention) != 3 or any(a not in "xyz" for a in convention)
            or convention[0] == convention[1]
            or convention[1] == convention[2]):
        raise ValueError(f"bad euler convention {convention!r}")
    return convention


def ee_to_rotmat(euler: jax.Array, convention: str = "xyz") -> jax.Array:
    """(..., 3) euler angles (radians) -> (..., 3, 3) rotation matrix."""
    convention = _check_convention(convention)
    mats = [_axis_rotmat(a, euler[..., i])
            for i, a in enumerate(convention)]
    return mats[0] @ mats[1] @ mats[2]


def rotmat_to_ee(rot: jax.Array, convention: str = "xyz") -> jax.Array:
    """(..., 3, 3) rotation matrix -> (..., 3) euler angles (radians).

    Tait-Bryan sequences (all axes distinct); principal branch, matching
    pytorch3d matrix_to_euler_angles / scipy intrinsic extraction. For a
    convention (c0, c1, c2) with permutation sign s (+1 for xyz/yzx/zxy):

        b = arcsin(s * R[i0, i2])
        a = atan2(-s * R[i1, i2], R[i2, i2])
        c = atan2(-s * R[i0, i1], R[i0, i0])
    """
    convention = _check_convention(convention)
    if convention[0] == convention[2]:
        raise NotImplementedError("proper Euler (repeated-axis) extraction "
                                  "not needed by the reference")
    i0 = "xyz".index(convention[0])
    i1 = "xyz".index(convention[1])
    i2 = "xyz".index(convention[2])
    sign = 1.0 if convention in ("xyz", "yzx", "zxy") else -1.0
    central = jnp.arcsin(jnp.clip(sign * rot[..., i0, i2], -1.0, 1.0))
    first = jnp.arctan2(-sign * rot[..., i1, i2], rot[..., i2, i2])
    third = jnp.arctan2(-sign * rot[..., i0, i1], rot[..., i0, i0])
    return jnp.stack([first, central, third], axis=-1)


def aa_to_ee(theta: jax.Array, convention: str = "xyz") -> jax.Array:
    """axis-angle -> euler (object_transform.aa_to_ee:193-210)."""
    return rotmat_to_ee(aa_to_rotmat(theta), convention)


def ee_to_aa(euler: jax.Array, convention: str = "xyz") -> jax.Array:
    """euler -> axis-angle (object_transform.ee_to_aa:232-249)."""
    return rotmat_to_aa(ee_to_rotmat(euler, convention))

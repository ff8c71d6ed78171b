"""MANO hand model: differentiable LBS forward in pure JAX.

Two output conventions coexist in the reference and are both provided:

- ``mano_forward_rotmat`` — smplx.MANOLayer semantics used by HaMeR
  (reference hamer/hamer/models/mano_wrapper.py:12-44): rotation-matrix
  pose input, meters, 16 regressed joints + 5 fingertip vertices
  {thumb 744, index 320, middle 443, ring 554, pinky 671}, reordered to
  the 21-joint OpenPose convention.
- ``mano_forward_manopth`` — manopth.ManoLayer semantics used by RootNet/SAR
  (reference rootnet/KeypointFusion/manopth/manopth/manolayer.py:112-276):
  axis-angle (or PCA) pose input with optional mean-pose offset,
  millimeters (x1000), fingertip vertices [745, 317, 444|445, 556, 673],
  same OpenPose reorder.

The LBS core (shape blend, pose blend, 3-level FK, skinning) is shared and
expressed as batched einsums so XLA maps it onto the MXU; a fully fused
Pallas variant lives in ops/ for the latency path.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hamer_yolo_tpu.geometry.rotations import aa_to_rotmat

# OpenPose 21-joint reorder shared by both conventions
# (mano_wrapper.py:25, manolayer.py:262).
MANO_TO_OPENPOSE = np.array(
    [0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18, 10, 11, 12, 19, 7, 8, 9, 20],
    np.int32,
)
# smplx vertex_ids['mano'] fingertips (mano_wrapper.py:30).
SMPLX_TIP_IDS = np.array([744, 320, 443, 554, 671], np.int32)
# manopth fingertip sampling (manolayer.py:252-255).
MANOPTH_TIP_IDS_RIGHT = np.array([745, 317, 444, 556, 673], np.int32)
MANOPTH_TIP_IDS_LEFT = np.array([745, 317, 445, 556, 673], np.int32)


class ManoModel(NamedTuple):
    """Immutable MANO parameters as JAX arrays (a pytree leaf bundle)."""

    v_template: jax.Array  # (778, 3)
    shapedirs: jax.Array  # (778, 3, S)
    posedirs: jax.Array  # (778, 3, 135)
    J_regressor: jax.Array  # (16, 778)
    weights: jax.Array  # (778, 16)
    faces: jax.Array  # (1538, 3) int32
    parents: Tuple[int, ...]  # static kinematic tree
    hands_components: jax.Array  # (45, 45)
    hands_mean: jax.Array  # (45,)
    side: str = "right"

    @classmethod
    def from_arrays(cls, data: Dict[str, np.ndarray], side: str = "right",
                    dtype=jnp.float32) -> "ManoModel":
        return cls(
            v_template=jnp.asarray(data["v_template"], dtype),
            shapedirs=jnp.asarray(data["shapedirs"], dtype),
            posedirs=jnp.asarray(data["posedirs"], dtype),
            J_regressor=jnp.asarray(data["J_regressor"], dtype),
            weights=jnp.asarray(data["weights"], dtype),
            faces=jnp.asarray(data["f"], jnp.int32),
            parents=tuple(int(p) for p in data["kintree_parents"]),
            hands_components=jnp.asarray(data["hands_components"], dtype),
            hands_mean=jnp.asarray(data["hands_mean"], dtype),
            side=side,
        )


def lbs(
    model: ManoModel,
    betas: jax.Array,
    rotmats: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Core linear blend skinning.

    betas: (B, S'), rotmats: (B, 16, 3, 3) incl. global orient at index 0.
    Returns (vertices (B, 778, 3), joints (B, 16, 3)) in template units
    (meters). Joint k's output position is the FK transform's translation.
    """
    B = rotmats.shape[0]
    nb = betas.shape[-1]

    # Shape blendshapes: v_shaped = T + shapedirs . betas
    v_shaped = model.v_template + jnp.einsum(
        "vds,bs->bvd", model.shapedirs[..., :nb], betas
    )
    # Rest-pose joints
    j_rest = jnp.einsum("jv,bvd->bjd", model.J_regressor, v_shaped)

    # Pose blendshapes from the 15 non-root rotations: (R - I) flattened.
    eye = jnp.eye(3, dtype=rotmats.dtype)
    pose_feature = (rotmats[:, 1:] - eye).reshape(B, 135)
    v_posed = v_shaped + jnp.einsum("vdp,bp->bvd", model.posedirs, pose_feature)

    # Forward kinematics along the (static) parent chain.
    # A[k] = A[parent] @ [R_k | j_k - j_parent]
    transforms = [None] * 16
    rel0 = jnp.concatenate([rotmats[:, 0], j_rest[:, 0, :, None]], axis=-1)  # (B,3,4)
    transforms[0] = rel0
    for k in range(1, 16):
        p = model.parents[k]
        t_rel = j_rest[:, k] - j_rest[:, p]
        rel = jnp.concatenate([rotmats[:, k], t_rel[:, :, None]], axis=-1)  # (B,3,4)
        parent = transforms[p]
        rot = jnp.einsum("bij,bjk->bik", parent[:, :, :3], rel[:, :, :3])
        tr = jnp.einsum("bij,bj->bi", parent[:, :, :3], rel[:, :, 3]) + parent[:, :, 3]
        transforms[k] = jnp.concatenate([rot, tr[:, :, None]], axis=-1)
    A = jnp.stack(transforms, axis=1)  # (B, 16, 3, 4)

    joints = A[:, :, :, 3]  # global joint positions

    # Remove the rest-pose joint location from each transform
    # (the "inverse bind" part of skinning): t' = t - R_global @ j_rest.
    t_skin = joints - jnp.einsum("bkij,bkj->bki", A[:, :, :, :3], j_rest)

    # Skinning: per-vertex blended rotation and translation.
    W = model.weights  # (V, 16)
    R_blend = jnp.einsum("vk,bkij->bvij", W, A[:, :, :, :3])
    t_blend = jnp.einsum("vk,bki->bvi", W, t_skin)
    verts = jnp.einsum("bvij,bvj->bvi", R_blend, v_posed) + t_blend
    return verts, joints


class ManoOutput(NamedTuple):
    vertices: jax.Array  # (B, 778, 3)
    joints: jax.Array  # (B, 21, 3) OpenPose order


def mano_forward_rotmat(
    model: ManoModel,
    global_orient: jax.Array,
    hand_pose: jax.Array,
    betas: jax.Array,
    fused: bool = False,
) -> ManoOutput:
    """smplx.MANOLayer-convention forward (HaMeR path, pose2rot=False).

    global_orient: (B, 1, 3, 3), hand_pose: (B, 15, 3, 3), betas: (B, 10).
    Output in meters; joints = 16 regressed + smplx fingertip vertices,
    OpenPose order. Reference hamer.py:541 -> mano_wrapper.py:32-44.
    fused=True routes through the single-kernel Pallas LBS
    (ops/mano_pallas.py, TPU only).
    """
    rotmats = jnp.concatenate([global_orient, hand_pose], axis=1)
    if fused:
        from hamer_yolo_tpu.ops.mano_pallas import mano_lbs_fused

        verts, joints16 = mano_lbs_fused(model, betas, rotmats)
    else:
        verts, joints16 = lbs(model, betas, rotmats)
    tips = verts[:, SMPLX_TIP_IDS]
    joints = jnp.concatenate([joints16, tips], axis=1)[:, MANO_TO_OPENPOSE]
    return ManoOutput(vertices=verts, joints=joints)


def mano_forward_manopth(
    model: ManoModel,
    pose_coeffs: jax.Array,
    betas: Optional[jax.Array] = None,
    trans: Optional[jax.Array] = None,
    use_pca: bool = False,
    ncomps: int = 45,
    flat_hand_mean: bool = True,
    center_idx: Optional[int] = None,
    root_palm: bool = False,
) -> ManoOutput:
    """manopth.ManoLayer-convention forward (SAR path).

    pose_coeffs: (B, 3 + ncomps) axis-angle root + hand pose (PCA coeffs
    if use_pca). Output in MILLIMETERS (x1000, manolayer.py:273-275),
    manopth fingertips, OpenPose joint order.
    """
    B = pose_coeffs.shape[0]
    root_aa = pose_coeffs[:, :3]
    hand = pose_coeffs[:, 3:3 + ncomps]
    if use_pca:
        hand = hand @ model.hands_components[:ncomps]
    if not flat_hand_mean:
        hand = hand + model.hands_mean
    aa = jnp.concatenate([root_aa, hand], axis=1).reshape(B, 16, 3)
    rotmats = aa_to_rotmat(aa)

    if betas is None:
        betas = jnp.zeros((B, 10), pose_coeffs.dtype)
    verts, joints16 = lbs(model, betas, rotmats)

    tip_ids = MANOPTH_TIP_IDS_RIGHT if model.side == "right" else MANOPTH_TIP_IDS_LEFT
    tips = verts[:, jnp.asarray(tip_ids)]
    if root_palm:
        palm = (verts[:, 95] + verts[:, 22])[:, None] / 2.0
        joints16 = jnp.concatenate([palm, joints16[:, 1:]], axis=1)
    joints = jnp.concatenate([joints16, tips], axis=1)[:, MANO_TO_OPENPOSE]

    if trans is not None:
        joints = joints + trans[:, None]
        verts = verts + trans[:, None]
    elif center_idx is not None:
        center = joints[:, center_idx:center_idx + 1]
        joints = joints - center
        verts = verts - center

    return ManoOutput(vertices=verts * 1000.0, joints=joints * 1000.0)


def sar_joint_regressor(model: ManoModel) -> jax.Array:
    """(21, 778) regressor mapping vertices -> OpenPose-ordered joints.

    Reference rootnet/mano.py:20-26: 16-joint J_regressor + fingertip
    one-hots [745, 317, 445, 556, 673], reordered. (Note the reference uses
    445 for the middle tip in the one-hot even for the right hand.)
    """
    V = model.J_regressor.shape[1]
    tips = np.zeros((5, V), np.float32)
    for i, vid in enumerate([745, 317, 445, 556, 673]):
        tips[i, vid] = 1.0
    reg = jnp.concatenate([model.J_regressor, jnp.asarray(tips)], axis=0)
    return reg[jnp.asarray(MANO_TO_OPENPOSE)]


def mano_template(model: ManoModel) -> jax.Array:
    """(778, 3) template vertices (SAIGB's per-vertex positional feature)."""
    return model.v_template


def watertight_closure_faces() -> np.ndarray:
    """Extra triangles sealing the MANO wrist opening for OBJ export.

    Reference renderer.py:202-216 appends these 14 hand-authored faces so
    exported meshes are watertight.
    """
    return np.array(
        [
            [92, 38, 122], [234, 92, 122], [239, 234, 122], [279, 239, 122],
            [215, 279, 122], [215, 122, 118], [215, 118, 117], [215, 117, 119],
            [215, 119, 120], [215, 120, 108], [215, 108, 79], [215, 79, 78],
            [215, 78, 121], [214, 215, 121],
        ],
        np.int32,
    )

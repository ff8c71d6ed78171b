"""Pallas fused MANO kernel: blendshapes + FK + LBS in one VMEM pass.

The north-star's "fused MANO kernel": the XLA path (models/mano.lbs) emits
~10 separate HLO ops per hand (shape blend, joint regression, pose blend,
16 FK compositions, skinning einsums). Here the whole chain runs in one
Pallas kernel per hand slot with every intermediate in VMEM:

  v_shaped = T + shapedirs . betas                (778x3, MXU)
  j_rest   = J_regressor @ v_shaped               (16x3, MXU)
  v_posed  = v_shaped + posedirs . (R[1:] - I)    (778x3, MXU)
  A_k      = A_parent . [R_k | j_k - j_parent]    (16-step unrolled FK)
  verts    = blend(W, A) applied to v_posed       (778x16 @ 16x12, MXU)

Static model tensors (shapedirs/posedirs/regressor/weights ~1.7 MB f32)
ride along as kernel operands and stay VMEM-resident across the grid.
Returns vertices and the 16 FK joint positions (the convention wrappers in
models/mano.py add fingertips/reordering).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hamer_yolo_tpu.models.mano import ManoModel

V = 778
J = 16


def _mano_kernel(betas_ref, rot_ref, vt_ref, sd_ref, pd_ref, jr_ref, w_ref,
                 verts_ref, joints_ref, *, parents: Tuple[int, ...], n_betas: int):
    betas = betas_ref[0]  # (n_betas,)
    rot = rot_ref[0]  # (16, 9) row-major rotmats

    # Shape blend: (V*3, S) @ (S,) -> (V, 3)
    v_shaped = vt_ref[:] + jnp.dot(
        sd_ref[:], betas, preferred_element_type=jnp.float32
    ).reshape(V, 3)

    # Rest joints: (J, V) @ (V, 3)
    j_rest = jnp.dot(jr_ref[:], v_shaped, preferred_element_type=jnp.float32)

    # Pose blend from non-root rotations: (V*3, 135) @ (135,)
    eye9 = jnp.tile(jnp.eye(3, dtype=rot.dtype).reshape(1, 9), (J - 1, 1))
    pose_feat = (rot[1:] - eye9).reshape(135)
    v_posed = v_shaped + jnp.dot(
        pd_ref[:], pose_feat, preferred_element_type=jnp.float32
    ).reshape(V, 3)

    # FK (unrolled static chain; 3x3 work on the VPU)
    Rs = rot.reshape(J, 3, 3)
    g_rot = [None] * J
    g_t = [None] * J
    g_rot[0] = Rs[0]
    g_t[0] = j_rest[0]
    for k in range(1, J):
        p = parents[k]
        t_rel = j_rest[k] - j_rest[p]
        g_rot[k] = jnp.dot(g_rot[p], Rs[k], preferred_element_type=jnp.float32)
        g_t[k] = jnp.dot(g_rot[p], t_rel, preferred_element_type=jnp.float32) + g_t[p]
    A_rot = jnp.stack(g_rot)  # (J, 3, 3)
    A_t = jnp.stack(g_t)  # (J, 3)
    joints_ref[0, :, :] = A_t

    # Inverse-bind translation: t' = t - R j_rest
    t_skin = A_t - jnp.einsum("kij,kj->ki", A_rot, j_rest)

    # Skinning: per-vertex 3x4 transform = W @ [R | t'] flattened (J, 12)
    A_flat = jnp.concatenate([A_rot.reshape(J, 9), t_skin], axis=1)  # (J, 12)
    T = jnp.dot(w_ref[:], A_flat, preferred_element_type=jnp.float32)  # (V, 12)
    R_b = T[:, :9].reshape(V, 3, 3)
    t_b = T[:, 9:]
    verts_ref[0, :, :] = jnp.einsum("vij,vj->vi", R_b, v_posed) + t_b


def mano_lbs_fused(
    model: ManoModel,
    betas: jax.Array,
    rotmats: jax.Array,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused equivalent of models/mano.lbs.

    betas: (S, nb), rotmats: (S, 16, 3, 3) ->
    (vertices (S, 778, 3), joints (S, 16, 3)).
    """
    S, nb = betas.shape
    sd = model.shapedirs[..., :nb].reshape(V * 3, nb)
    pd = model.posedirs.reshape(V * 3, 135)
    rot_flat = rotmats.reshape(S, J, 9)

    kernel = functools.partial(
        _mano_kernel, parents=model.parents, n_betas=nb
    )
    verts, joints = pl.pallas_call(
        kernel,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, nb), lambda i: (i, 0)),
            pl.BlockSpec((1, J, 9), lambda i: (i, 0, 0)),
            pl.BlockSpec((V, 3), lambda i: (0, 0)),
            pl.BlockSpec((V * 3, nb), lambda i: (0, 0)),
            pl.BlockSpec((V * 3, 135), lambda i: (0, 0)),
            pl.BlockSpec((J, V), lambda i: (0, 0)),
            pl.BlockSpec((V, J), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, V, 3), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, J, 3), lambda i: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S, V, 3), jnp.float32),
            jax.ShapeDtypeStruct((S, J, 3), jnp.float32),
        ),
        interpret=interpret,
    )(betas, rot_flat, model.v_template, sd, pd, model.J_regressor, model.weights)
    return verts, joints

"""Pallas fused MANO kernel: blendshapes + skinning in one VMEM pass.

The north-star's "fused MANO kernel", structured for Mosaic's lowering
rules: all the FLOPs (shape blend (2334 x nb), pose blend (2334 x 135),
skinning (778 x 16 @ 16 x 12) and per-vertex transform application) run in
ONE Pallas kernel with every intermediate in VMEM; the 16-step forward
kinematics — tiny sequential 3x3 algebra Mosaic cannot vectorize
profitably — stays in XLA, fed by the factorization

    j_rest = (J_regressor @ v_template) + (J_regressor @ shapedirs) . betas

so the FK needs no kernel intermediate. Numerically identical to
models/mano.lbs (tested at 1e-3 f32 tolerance).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from hamer_yolo_tpu.models.mano import ManoModel

V = 778
J = 16


def _mano_blend_skin_kernel(betas_ref, pf_ref, aflat_ref, vt_ref, sd_ref,
                            pd_ref, w_ref, verts_ref):
    i = pl.program_id(0)
    betas = betas_ref[i]  # (nb,)
    pose_feat = pf_ref[i]  # (135,)
    A_flat = aflat_ref[0]  # (J, 12) [R row-major | t_skin]

    v_shaped = vt_ref[:] + jnp.dot(
        sd_ref[:], betas, preferred_element_type=jnp.float32
    ).reshape(V, 3)
    v_posed = v_shaped + jnp.dot(
        pd_ref[:], pose_feat, preferred_element_type=jnp.float32
    ).reshape(V, 3)

    T = jnp.dot(w_ref[:], A_flat, preferred_element_type=jnp.float32)  # (V, 12)
    x, y, z = v_posed[:, 0], v_posed[:, 1], v_posed[:, 2]
    out_x = T[:, 0] * x + T[:, 1] * y + T[:, 2] * z + T[:, 9]
    out_y = T[:, 3] * x + T[:, 4] * y + T[:, 5] * z + T[:, 10]
    out_z = T[:, 6] * x + T[:, 7] * y + T[:, 8] * z + T[:, 11]
    verts_ref[0, :, :] = jnp.stack([out_x, out_y, out_z], axis=-1)


def _fk(model: ManoModel, betas: jax.Array, rotmats: jax.Array
        ) -> Tuple[jax.Array, jax.Array]:
    """XLA forward kinematics -> (A_flat (S, J, 12), joints (S, J, 3))."""
    jr_t = jnp.dot(model.J_regressor, model.v_template)  # (J, 3)
    jr_sd = jnp.einsum("jv,vds->jds", model.J_regressor,
                       model.shapedirs[..., :betas.shape[-1]])
    j_rest = jr_t + jnp.einsum("jds,bs->bjd", jr_sd, betas)  # (S, J, 3)

    rot = [None] * J
    tr = [None] * J
    rot[0] = rotmats[:, 0]
    tr[0] = j_rest[:, 0]
    for k in range(1, J):
        p = model.parents[k]
        t_rel = j_rest[:, k] - j_rest[:, p]
        rot[k] = jnp.einsum("bij,bjk->bik", rot[p], rotmats[:, k])
        tr[k] = jnp.einsum("bij,bj->bi", rot[p], t_rel) + tr[p]
    A_rot = jnp.stack(rot, axis=1)  # (S, J, 3, 3)
    joints = jnp.stack(tr, axis=1)  # (S, J, 3)
    t_skin = joints - jnp.einsum("bkij,bkj->bki", A_rot, j_rest)
    A_flat = jnp.concatenate(
        [A_rot.reshape(A_rot.shape[0], J, 9), t_skin], axis=-1
    )  # (S, J, 12)
    return A_flat, joints


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

    eye = jnp.eye(3, dtype=rotmats.dtype)
    pose_feat = (rotmats[:, 1:] - eye).reshape(S, 135)
    A_flat, joints = _fk(model, betas, rotmats)

    verts = pl.pallas_call(
        _mano_blend_skin_kernel,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((S, nb), lambda i: (0, 0)),
            pl.BlockSpec((S, 135), lambda i: (0, 0)),
            pl.BlockSpec((1, J, 12), lambda i: (i, 0, 0)),
            pl.BlockSpec((V, 3), lambda i: (0, 0)),
            pl.BlockSpec((V * 3, nb), lambda i: (0, 0)),
            pl.BlockSpec((V * 3, 135), lambda i: (0, 0)),
            pl.BlockSpec((V, J), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, V, 3), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((S, V, 3), jnp.float32),
        interpret=interpret,
    )(betas, pose_feat, A_flat, model.v_template, sd, pd, model.weights)
    return verts, joints

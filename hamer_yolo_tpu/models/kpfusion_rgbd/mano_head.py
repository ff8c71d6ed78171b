"""KeypointFusion MANO regression head (model/mano_head.py:177-250).

``mano_regHead``: backbone feature -> LeakyReLU MLP -> 16x6d pose +
10 shape -> rot6d->rotmat->axis-angle -> manopth ManoLayer forward
(flat_hand_mean=True, use_pca=False, right hand, millimeters) -> verts
(778) + 21 joints in the OBMAN order (OBMAN2MANO reorder,
mano_head.py:7-14). Unused by the shipped KPFusion runtime (no importer
in the reference repo), kept for inventory completeness — it is the
mesh-output variant head of the AWR family.

The rotation helpers the reference file carries (batch_rodrigues,
rot6d2mat, mat2aa/quat, mano_head.py:17-175) map onto
``geometry/rotations``.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.core import nn
from hamer_yolo_tpu.geometry.rotations import rot6d_to_rotmat, rotmat_to_aa
from hamer_yolo_tpu.models.mano import ManoModel, mano_forward_manopth

# mano_head.py:7-14 — manolayer joint order -> OBMAN convention
OBMAN2MANO = jnp.asarray([0, 5, 6, 7, 9, 10, 11, 17, 18, 19, 13, 14, 15,
                          1, 2, 3, 8, 12, 20, 16, 4], jnp.int32)
# AWR mesh fingertip vertex ids (mano_head.py:182) — the reference also
# builds a 26-row J_regressor from these; exported for eval tooling.
AWR_FINGERTIP_VERTEX_IDS = (728, 353, 442, 576, 694)


@dataclass(frozen=True)
class ManoRegConfig:
    feature_size: int = 1024
    neurons: Tuple[int, ...] = (1024, 512)  # mano_neurons
    n_pose: int = 16


def init_mano_reg(key: jax.Array, cfg: ManoRegConfig = ManoRegConfig()
                  ) -> Dict[str, Any]:
    dims = (cfg.feature_size,) + tuple(cfg.neurons)
    keys = jax.random.split(key, len(cfg.neurons) + 2)
    return {
        "base": [nn.linear_init(k, i, o)
                 for k, i, o in zip(keys, dims[:-1], dims[1:])],
        "pose_reg": nn.linear_init(keys[-2], dims[-1], cfg.n_pose * 6),
        "shape_reg": nn.linear_init(keys[-1], dims[-1], 10),
    }


def mano_reg_forward(
    params: Dict[str, Any],
    features: jax.Array,
    mano_model: ManoModel,
    cfg: ManoRegConfig = ManoRegConfig(),
) -> Dict[str, jax.Array]:
    """(B, feature_size) -> verts3d (B, 778, 3) mm, joints3d (B, 21, 3)
    OBMAN order, mano_shape (B, 10), mano_pose (B, 16, 3, 3),
    mano_pose_aa (B, 48) — the reference's pred_mano_results dict."""
    x = features
    for lin in params["base"]:
        x = jax.nn.leaky_relu(nn.linear(lin, x), negative_slope=0.01)
    pose6d = nn.linear(params["pose_reg"], x)
    shape = nn.linear(params["shape_reg"], x)
    rotmat = rot6d_to_rotmat(pose6d.reshape(-1, cfg.n_pose, 6))
    aa = rotmat_to_aa(rotmat).reshape(-1, cfg.n_pose * 3)
    out = mano_forward_manopth(mano_model, aa, betas=shape,
                               use_pca=False, flat_hand_mean=True)
    # mano_forward_manopth reproduces the ManoLayer OUTPUT order
    # (manolayer.py:262 reorder included, oracle-tested at 0.02 mm), so
    # OBMAN2MANO applies directly on top exactly as mano_head.py:218.
    return {
        "verts3d": out.vertices,
        "joints3d": out.joints[:, OBMAN2MANO],
        "mano_shape": shape,
        "mano_pose": rotmat,
        "mano_pose_aa": aa,
    }

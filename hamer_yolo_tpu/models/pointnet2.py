"""PointNet++ classification/segmentation models over the JAX point ops.

Representative re-build of the reference's vendored pointNet model zoo
(rootnet/KeypointFusion/pointNet/: PointNet2 ssg/msg classifiers and
part/semantic segmentation nets) on top of ops/pointnet.py. Provides:

- ``SetAbstraction`` (single-scale grouping SA layer);
- ``FeaturePropagation`` (three_nn inverse-distance upsampling);
- ``init_pointnet2_cls`` / ``pointnet2_cls_forward`` — SSG classifier
  (SA(512) -> SA(128) -> global SA -> MLP head);
- ``init_pointnet2_seg`` / ``pointnet2_seg_forward`` — per-point
  segmentation via two FP layers back up the hierarchy.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.core import nn
from hamer_yolo_tpu.ops import pointnet as pn

Params = Dict[str, Any]


def _mlp_stack_init(key, dims: List[int]) -> Params:
    keys = jax.random.split(key, len(dims) - 1)
    return {"layers": [nn.linear_init(keys[i], dims[i], dims[i + 1])
                       for i in range(len(dims) - 1)]}


def _mlp_stack(p: Params, x: jax.Array) -> jax.Array:
    for layer in p["layers"]:
        x = jax.nn.relu(nn.linear(layer, x))
    return x


@dataclass(frozen=True)
class SAConfig:
    npoint: int
    radius: float
    nsample: int
    mlp: Tuple[int, ...]


def sa_init(key, in_dim: int, cfg: SAConfig) -> Params:
    return _mlp_stack_init(key, [in_dim + 3] + list(cfg.mlp))


def set_abstraction(p: Params, xyz: jax.Array, feats: jax.Array,
                    cfg: SAConfig) -> Tuple[jax.Array, jax.Array]:
    """(B, N, 3), (B, N, C) -> (B, npoint, 3), (B, npoint, mlp[-1])."""
    idx = pn.furthest_point_sampling(xyz, cfg.npoint)
    new_xyz = pn.gather_points(xyz, idx)
    grouped = pn.query_and_group(xyz, new_xyz, feats, cfg.radius, cfg.nsample)
    return new_xyz, jnp.max(_mlp_stack(p, grouped), axis=2)


def global_sa(p: Params, xyz: jax.Array, feats: jax.Array) -> jax.Array:
    """Group-all SA: (B, N, 3+C) -> (B, mlp[-1])."""
    x = jnp.concatenate([xyz, feats], axis=-1)
    return jnp.max(_mlp_stack(p, x), axis=1)


def fp_init(key, in_dim: int, mlp: Tuple[int, ...]) -> Params:
    return _mlp_stack_init(key, [in_dim] + list(mlp))


def feature_propagation(p: Params, xyz_dense: jax.Array, xyz_sparse: jax.Array,
                        feats_dense: Optional[jax.Array],
                        feats_sparse: jax.Array) -> jax.Array:
    """Upsample sparse features onto the dense point set (FP layer)."""
    d, idx = pn.three_nn(xyz_dense, xyz_sparse)
    w = pn.interpolation_weights(d)
    interp = pn.three_interpolate(feats_sparse, idx, w)
    if feats_dense is not None:
        interp = jnp.concatenate([feats_dense, interp], axis=-1)
    return _mlp_stack(p, interp)


CLS_SA1 = SAConfig(npoint=512, radius=0.2, nsample=32, mlp=(64, 64, 128))
CLS_SA2 = SAConfig(npoint=128, radius=0.4, nsample=64, mlp=(128, 128, 256))


def init_pointnet2_cls(key, num_classes: int = 40, in_dim: int = 3,
                       sa1: SAConfig = CLS_SA1, sa2: SAConfig = CLS_SA2) -> Params:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return {
        "sa1": sa_init(k1, in_dim, sa1),
        "sa2": sa_init(k2, sa1.mlp[-1], sa2),
        "sa3": _mlp_stack_init(k3, [sa2.mlp[-1] + 3, 256, 512, 1024]),
        "fc1": nn.linear_init(k4, 1024, 256),
        "fc2": nn.linear_init(k5, 256, num_classes),
        "_cfgs": None,
    }


def pointnet2_cls_forward(p: Params, xyz: jax.Array,
                          sa1: SAConfig = CLS_SA1, sa2: SAConfig = CLS_SA2
                          ) -> jax.Array:
    """(B, N, 3) cloud -> (B, num_classes) logits."""
    x1, f1 = set_abstraction(p["sa1"], xyz, xyz, sa1)
    x2, f2 = set_abstraction(p["sa2"], x1, f1, sa2)
    g = global_sa(p["sa3"], x2, f2)
    h = jax.nn.relu(nn.linear(p["fc1"], g))
    return nn.linear(p["fc2"], h)


# --- pointMLP (residual point MLP with geometric affine) -------------------

def geometric_affine_init(dim: int) -> Params:
    return {"alpha": jnp.ones((dim,)), "beta": jnp.zeros((dim,))}


def geometric_affine(p: Params, grouped: jax.Array) -> jax.Array:
    """pointMLP's normalization: center groups by their anchor, scale by the
    group std, then learnable affine. grouped: (B, S, K, C)."""
    anchor = grouped[:, :, :1, :]
    centered = grouped - anchor
    std = jnp.std(centered, axis=(1, 2, 3), keepdims=True) + 1e-5
    return p["alpha"] * (centered / std) + p["beta"]


def _res_block_init(key, dim: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {"fc1": nn.linear_init(k1, dim, dim), "fc2": nn.linear_init(k2, dim, dim)}


def _res_block(p: Params, x: jax.Array) -> jax.Array:
    h = jax.nn.relu(nn.linear(p["fc1"], x))
    return jax.nn.relu(x + nn.linear(p["fc2"], h))


def init_pointmlp_cls(key, num_classes: int = 40, dims: Tuple[int, ...] = (64, 128),
                      npoints: Tuple[int, ...] = (256, 64), nsample: int = 16) -> Params:
    keys = jax.random.split(key, 3 * len(dims) + 2)
    stages = []
    c_in = 3
    for i, d in enumerate(dims):
        stages.append({
            "embed": nn.linear_init(keys[3 * i], c_in + 3, d),
            "affine": geometric_affine_init(c_in + 3),
            "pre": _res_block_init(keys[3 * i + 1], d),
            "pos": _res_block_init(keys[3 * i + 2], d),
        })
        c_in = d
    return {
        "stages": stages,
        "fc1": nn.linear_init(keys[-2], dims[-1], 128),
        "fc2": nn.linear_init(keys[-1], 128, num_classes),
    }


def pointmlp_cls_forward(p: Params, xyz: jax.Array,
                         npoints: Tuple[int, ...] = (256, 64),
                         nsample: int = 16, radius: float = 0.5) -> jax.Array:
    """(B, N, 3) -> (B, num_classes). FPS downsampling + grouped residual
    MLPs with geometric-affine normalization (pointMLP's recipe)."""
    feats = xyz
    pts = xyz
    for stage, npoint in zip(p["stages"], npoints):
        idx = pn.furthest_point_sampling(pts, npoint)
        new_pts = pn.gather_points(pts, idx)
        grouped = pn.query_and_group(pts, new_pts, feats, radius, nsample)
        grouped = geometric_affine(stage["affine"], grouped)
        h = jax.nn.relu(nn.linear(stage["embed"], grouped))
        h = _res_block(stage["pre"], h)
        feats = jnp.max(h, axis=2)
        feats = _res_block(stage["pos"], feats)
        pts = new_pts
    pooled = jnp.max(feats, axis=1)
    return nn.linear(p["fc2"], jax.nn.relu(nn.linear(p["fc1"], pooled)))


# --- DGCNN (edge convolution) ----------------------------------------------

def knn_indices(xyz: jax.Array, k: int) -> jax.Array:
    """(B, N, d) -> (B, N, k) nearest-neighbor indices (incl. self)."""
    d2 = pn.pairwise_sqdist(xyz, xyz)
    _, idx = jax.lax.top_k(-d2, k)
    return idx.astype(jnp.int32)


def edge_conv(p: Params, feats: jax.Array, k: int, graph_xyz: Optional[jax.Array] = None
              ) -> jax.Array:
    """DGCNN EdgeConv: MLP([x_i, x_j - x_i]) max-pooled over kNN.

    feats: (B, N, C); graph built on ``graph_xyz`` (defaults to feats).
    """
    idx = knn_indices(graph_xyz if graph_xyz is not None else feats, k)
    neighbors = pn.group_points(feats, idx)  # (B, N, k, C)
    center = feats[:, :, None, :]
    edge = jnp.concatenate(
        [jnp.broadcast_to(center, neighbors.shape), neighbors - center], axis=-1)
    return jnp.max(_mlp_stack(p, edge), axis=2)


def init_dgcnn_cls(key, num_classes: int = 40, k: int = 20,
                   dims: Tuple[int, ...] = (64, 64, 128, 256)) -> Params:
    keys = jax.random.split(key, len(dims) + 3)
    layers = []
    c_in = 3
    for i, d in enumerate(dims):
        layers.append(_mlp_stack_init(keys[i], [2 * c_in, d]))
        c_in = d
    agg_in = sum(dims)
    return {
        "edges": layers,
        "agg": _mlp_stack_init(keys[-3], [agg_in, 512]),
        "fc1": nn.linear_init(keys[-2], 1024, 256),
        "fc2": nn.linear_init(keys[-1], 256, num_classes),
        "k": None,
    }


def dgcnn_cls_forward(p: Params, xyz: jax.Array, k: int = 20) -> jax.Array:
    """(B, N, 3) -> (B, num_classes) logits (dynamic feature graphs)."""
    feats = xyz
    skips = []
    for i, layer in enumerate(p["edges"]):
        feats = edge_conv(layer, feats, k,
                          graph_xyz=xyz if i == 0 else None)
        skips.append(feats)
    agg = _mlp_stack(p["agg"], jnp.concatenate(skips, axis=-1))  # (B, N, 512)
    pooled = jnp.concatenate([jnp.max(agg, axis=1), jnp.mean(agg, axis=1)], axis=-1)
    h = jax.nn.relu(nn.linear(p["fc1"], pooled))
    return nn.linear(p["fc2"], h)


def init_pointnet2_seg(key, num_classes: int, in_dim: int = 3,
                       sa1: SAConfig = CLS_SA1, sa2: SAConfig = CLS_SA2) -> Params:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return {
        "sa1": sa_init(k1, in_dim, sa1),
        "sa2": sa_init(k2, sa1.mlp[-1], sa2),
        "fp2": fp_init(k3, sa1.mlp[-1] + sa2.mlp[-1], (256, 128)),
        "fp1": fp_init(k4, in_dim + 128, (128, 128)),
        "head": nn.linear_init(k5, 128, num_classes),
    }


def pointnet2_seg_forward(p: Params, xyz: jax.Array,
                          sa1: SAConfig = CLS_SA1, sa2: SAConfig = CLS_SA2
                          ) -> jax.Array:
    """(B, N, 3) -> (B, N, num_classes) per-point logits."""
    x1, f1 = set_abstraction(p["sa1"], xyz, xyz, sa1)
    x2, f2 = set_abstraction(p["sa2"], x1, f1, sa2)
    u1 = feature_propagation(p["fp2"], x1, x2, f1, f2)
    u0 = feature_propagation(p["fp1"], xyz, x1, xyz, u1)
    return nn.linear(p["head"], u0)

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
                        feats_sparse: jax.Array,
                        sq_weights: bool = False) -> jax.Array:
    """Upsample sparse features onto the dense point set (FP layer).

    sq_weights=True uses inverse SQUARED-distance weights — the
    reference's second utils flavor (pointNet/pointnet2_utils.py:296-303
    skips the sqrt) vs the CUDA modules flavor (sqrt'd,
    pointnet2_ops/pointnet2_modules.py:170-175). The squared form takes
    the raw d2 (three_nn_sq), not a re-rounded sqrt-then-square."""
    if sq_weights:
        d, idx = pn.three_nn_sq(xyz_dense, xyz_sparse)
    else:
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


# --- Multi-scale grouping (MSG) + part/semantic segmentation ---------------
# Reference: rootnet/KeypointFusion/pointNet/point2_msg_sem.py
# (PointnetSAModuleMSG stacks) and pointnet2_part_seg_ssg.py (PointNet2
# part-seg with a global SA level + 3 FP layers).

@dataclass(frozen=True)
class MSGConfig:
    """One multi-scale SA level: shared FPS centroids, per-scale ball
    query radii/sample counts/MLPs, channel-concatenated outputs."""
    npoint: int
    radii: Tuple[float, ...]
    nsamples: Tuple[int, ...]
    mlps: Tuple[Tuple[int, ...], ...]

    @property
    def out_dim(self) -> int:
        return sum(m[-1] for m in self.mlps)


def sa_msg_init(key, in_dim: int, cfg: MSGConfig) -> Params:
    keys = jax.random.split(key, len(cfg.mlps))
    return {"scales": [
        _mlp_stack_init(k, [in_dim + 3] + list(mlp))
        for k, mlp in zip(keys, cfg.mlps)
    ]}


def set_abstraction_msg(p: Params, xyz: jax.Array, feats: jax.Array,
                        cfg: MSGConfig) -> Tuple[jax.Array, jax.Array]:
    """(B, N, 3), (B, N, C) -> (B, npoint, 3), (B, npoint, out_dim).

    One FPS pass picks the centroids; each scale ball-queries its own
    radius/nsample neighborhood around them, runs its MLP and max-pools;
    scales concatenate on channels (PointnetSAModuleMSG semantics)."""
    idx = pn.furthest_point_sampling(xyz, cfg.npoint)
    new_xyz = pn.gather_points(xyz, idx)
    outs = []
    for sp, radius, nsample in zip(p["scales"], cfg.radii, cfg.nsamples):
        grouped = pn.query_and_group(xyz, new_xyz, feats, radius, nsample)
        outs.append(jnp.max(_mlp_stack(sp, grouped), axis=2))
    return new_xyz, jnp.concatenate(outs, axis=-1)


def global_feature_propagation(p: Params, feats_dense: jax.Array,
                               global_feat: jax.Array) -> jax.Array:
    """FP from a group-all level: the single global vector broadcasts to
    every dense point (PointNetFeaturePropagation's S==1 repeat branch,
    pointnet2_utils.py)."""
    N = feats_dense.shape[1]
    tiled = jnp.broadcast_to(global_feat[:, None, :],
                             (feats_dense.shape[0], N, global_feat.shape[-1]))
    return _mlp_stack(p, jnp.concatenate([feats_dense, tiled], axis=-1))


PART_SA1 = SAConfig(npoint=512, radius=0.2, nsample=32, mlp=(64, 64, 128))
PART_SA2 = SAConfig(npoint=128, radius=0.4, nsample=64, mlp=(128, 128, 256))


def init_pointnet2_part_seg(key, num_classes: int, in_dim: int = 3,
                            sa1: SAConfig = PART_SA1,
                            sa2: SAConfig = PART_SA2) -> Params:
    """Part segmentation SSG (reference pointnet2_part_seg_ssg.PointNet2):
    sa1 -> sa2 -> group-all sa3 -> fp3 -> fp2 -> fp1 -> per-point head.
    ``in_dim`` counts the extra per-point features beyond xyz (the hand
    variant feeds joint2pcloffset features)."""
    k1, k2, k3, k4, k5, k6, k7, k8 = jax.random.split(key, 8)
    return {
        "sa1": sa_init(k1, 3 + in_dim, sa1),
        "sa2": sa_init(k2, sa1.mlp[-1], sa2),
        "sa3": _mlp_stack_init(k3, [sa2.mlp[-1] + 3, 256, 512, 1024]),
        "fp3": fp_init(k4, sa2.mlp[-1] + 1024, (256, 256)),
        "fp2": fp_init(k5, sa1.mlp[-1] + 256, (256, 128)),
        "fp1": fp_init(k6, 3 + 3 + in_dim + 128, (128, 128, 128)),
        "fc": nn.linear_init(k7, 128, 128),
        "head": nn.linear_init(k8, 128, num_classes),
    }


def pointnet2_part_seg_forward(p: Params, xyz: jax.Array,
                               feats: Optional[jax.Array] = None,
                               sa1: SAConfig = PART_SA1,
                               sa2: SAConfig = PART_SA2) -> jax.Array:
    """(B, N, 3) [+ (B, N, in_dim) feats] -> (B, N, num_classes)."""
    f0 = xyz if feats is None else jnp.concatenate([xyz, feats], axis=-1)
    x1, f1 = set_abstraction(p["sa1"], xyz, f0, sa1)
    x2, f2 = set_abstraction(p["sa2"], x1, f1, sa2)
    g = global_sa(p["sa3"], x2, f2)
    u2 = global_feature_propagation(p["fp3"], f2, g)
    u1 = feature_propagation(p["fp2"], x1, x2, f1, u2)
    u0 = feature_propagation(p["fp1"], xyz, x1,
                             jnp.concatenate([xyz, f0], axis=-1), u1)
    h = jax.nn.relu(nn.linear(p["fc"], u0))
    return nn.linear(p["head"], h)


# The KPFusion point-stream MSG semantic net (point2_msg_sem.py
# PointNet2SemSegMSG): 4 MSG SA levels + 4 FP levels + fc + multi-head
# per-point outputs (default [21*3 offsets, 21 closeness, 21 weights]).
MSG_SEM_LEVELS = (
    MSGConfig(1024, (0.05, 0.1), (16, 32), ((16, 16, 32), (32, 32, 64))),
    MSGConfig(256, (0.1, 0.2), (16, 32), ((64, 64, 128), (64, 96, 128))),
    MSGConfig(64, (0.2, 0.4), (16, 32), ((128, 196, 256), (128, 196, 256))),
    MSGConfig(16, (0.4, 0.8), (16, 32), ((256, 256, 512), (256, 384, 512))),
)


def init_pointnet2_msg_sem(key, in_dim: int = 0,
                           head_dims: Tuple[int, ...] = (63, 21, 21),
                           levels: Tuple[MSGConfig, ...] = MSG_SEM_LEVELS
                           ) -> Params:
    n = len(levels)
    keys = jax.random.split(key, 2 * n + 1 + len(head_dims))
    sas, dims = [], [in_dim]
    for i, lv in enumerate(levels):
        sas.append(sa_msg_init(keys[i], dims[-1], lv))
        dims.append(lv.out_dim)
    # FP mlps per the reference: top-down [c_prev + c_skip, ...]
    fp_mlps = [(256, 128, 128), (256, 256), (512, 512), (512, 512)]
    fps = []
    for i in range(n):  # fp[i] upsamples level i+1 -> level i
        c_up = fp_mlps[i + 1][-1] if i + 1 < n else dims[n]
        fps.append(fp_init(keys[n + i], dims[i] + c_up, fp_mlps[i]))
    fc = _mlp_stack_init(keys[2 * n], [fp_mlps[0][-1], 128])
    heads = [nn.linear_init(keys[2 * n + 1 + j], 128, d)
             for j, d in enumerate(head_dims)]
    return {"sa": sas, "fp": fps, "fc": fc, "heads": heads}


# --- reference-exact zoo forwards ------------------------------------------
# Oracle-parity variants of the vendored zoo's EXACT architectures
# (rootnet/KeypointFusion/pointNet/): BN is folded into the linear
# weights at conversion time (core/convert.convert_pointnet2_*), so
# these pure stacks reproduce the torch eval forward value-for-value
# (tests/test_pointnet2_models.py oracle classes).

# PointNet2ClassificationSSG (point2_ssg_cls.py:50-116): SA(512, r0.2,
# ns64, mlp 3+3->64->64->128) -> SA(128, r0.4, ns64) -> group-all ->
# fc 1024->512->256->40. Input cloud (B, N, 6): xyz + 3 features.
CLS_SSG_REF_CFGS = (SAConfig(512, 0.2, 64, ()), SAConfig(128, 0.4, 64, ()))


def ref_cls_ssg_forward(p: Params, pc: jax.Array) -> jax.Array:
    """(B, N, 6) -> (B, 40) logits (reference eval forward, BN folded)."""
    xyz, feats = pc[..., :3], pc[..., 3:]
    x, f = xyz, feats
    for sp, cfg in zip(p["sa"][:-1], CLS_SSG_REF_CFGS):
        x, f = set_abstraction(sp, x, f, cfg)
    g = global_sa(p["sa"][-1], x, f)
    h = jax.nn.relu(nn.linear(p["fc"][0], g))
    h = jax.nn.relu(nn.linear(p["fc"][1], h))
    return nn.linear(p["fc"][2], h)


# PointNet2SemSegSSG (point2_ssg_sem.py:8-86): 4 SA + 4 FP + conv1d
# head. Input cloud (B, N, 9): xyz + 6 features.
SEM_SSG_REF_CFGS = (SAConfig(1024, 0.1, 32, ()), SAConfig(256, 0.2, 32, ()),
                    SAConfig(64, 0.4, 32, ()), SAConfig(16, 0.8, 32, ()))


def ref_sem_seg_forward(p: Params, pc: jax.Array) -> jax.Array:
    """(B, N, 9) -> (B, N, 13) per-point logits."""
    xyz, feats = pc[..., :3], pc[..., 3:]
    xs, fs = [xyz], [feats]
    for sp, cfg in zip(p["sa"], SEM_SSG_REF_CFGS):
        x, f = set_abstraction(sp, xs[-1], fs[-1], cfg)
        xs.append(x)
        fs.append(f)
    for i in range(len(p["sa"]) - 1, -1, -1):
        fs[i] = feature_propagation(p["fp"][i], xs[i], xs[i + 1],
                                    fs[i], fs[i + 1])
    h = jax.nn.relu(nn.linear(p["head"][0], fs[0]))
    return nn.linear(p["head"][1], h)


def _leaky_mlp_stack(p: Params, x: jax.Array) -> jax.Array:
    for layer in p["layers"]:
        x = jax.nn.leaky_relu(nn.linear(layer, x), 0.2)
    return x


def _knn_ref(x: jax.Array, k: int) -> jax.Array:
    """DGCNN.knn (DGCNN.py:20-26) in the reference's EXACT mm-based
    arithmetic (-xx - 2x.x^T - xx^T, topk largest): the float rounding
    of the mm form can order near-ties differently than the diff^2
    form, and parity means matching the arithmetic. x: (B, N, C)."""
    inner = -2.0 * (x @ jnp.swapaxes(x, 1, 2))
    xx = jnp.sum(x * x, axis=-1, keepdims=True)
    neg_d = -xx - inner - jnp.swapaxes(xx, 1, 2)
    _, idx = jax.lax.top_k(neg_d, k)
    return idx.astype(jnp.int32)


def _graph_feature_ref(feats: jax.Array, graph_src: jax.Array, k: int,
                       idx: Optional[jax.Array] = None) -> jax.Array:
    """get_graph_feature (DGCNN.py:28-56): cat([x_j - x_i, x_i])."""
    if idx is None:
        idx = _knn_ref(graph_src, k)
    nbr = pn.group_points(feats, idx)
    ctr = feats[:, :, None, :]
    return jnp.concatenate(
        [nbr - ctr, jnp.broadcast_to(ctr, nbr.shape)], axis=-1)


def ref_dgcnn_semseg_forward(p: Params, pc: jax.Array, k: int = 40,
                             stage1_idx: Optional[jax.Array] = None):
    """DGCNN_semseg.forward (DGCNN.py:231-309): cloud -> per-point head
    cat (B, N, 5*J).

    Stage-1 graph is built on channels 6: (dim9=True); later graphs on
    the running features. Leaky-ReLU 0.2 everywhere; conv9 and the
    per-head finals are affine only.

    NOTE on the reference's actual usage (its own smoke main,
    DGCNN.py:389-391, feeds a (B, 3, N) cloud): channels 6: are then an
    EMPTY slice, all pairwise distances are zero, and torch.topk's tie
    order — implementation-defined — picks the stage-1 neighbor sets.
    ``stage1_idx`` lets a caller pin that graph (e.g. to the torch run's
    own pick, as the oracle test does); unset, ties resolve to the
    lowest indices (jax.lax.top_k stable order)."""
    x = _graph_feature_ref(pc, pc[..., 6:], k, idx=stage1_idx)
    x = _leaky_mlp_stack(p["conv12"], x)
    x1 = jnp.max(x, axis=2)
    x = _graph_feature_ref(x1, x1, k)
    x = _leaky_mlp_stack(p["conv34"], x)
    x2 = jnp.max(x, axis=2)
    x = _graph_feature_ref(x2, x2, k)
    x = _leaky_mlp_stack(p["conv5"], x)
    x3 = jnp.max(x, axis=2)
    cat = jnp.concatenate([x1, x2, x3], axis=-1)
    emb = _leaky_mlp_stack(p["conv6"], cat)                 # (B, N, emb)
    g = jnp.max(emb, axis=1, keepdims=True)
    gN = jnp.broadcast_to(g, (emb.shape[0], emb.shape[1], g.shape[-1]))
    h = jnp.concatenate([gN, x1, x2, x3], axis=-1)
    h = _leaky_mlp_stack(p["conv7"], h)
    h = _leaky_mlp_stack(p["conv8"], h)
    pf = nn.linear(p["conv9"], h)
    return jnp.concatenate([nn.linear(head, pf) for head in p["finals"]],
                           axis=-1)


# PointNet2 part-seg (pointnet2_part_seg_ssg.py:7-40) and
# PointNet2_MSG_large (:81-128) use the SECOND utils flavor
# (pointNet/pointnet2_utils.py, pure torch): squared-distance FP
# weights, skip-first FP concat, MSG grouping with feats BEFORE rel-xyz,
# and FPS seeded by torch.randint (pinned to start-0 in the oracle).

def joint2pcloffset_ref(joint: jax.Array, pcl: jax.Array,
                        kernel_size: float) -> jax.Array:
    """joint2pcloffset (pointnet2_part_seg_ssg.py:131-148):
    (B, J, 3), (B, N, 3) -> (B, N, 4J) [unit offsets * mask, closeness].
    """
    B, J, _ = joint.shape
    N = pcl.shape[1]
    offset = joint[:, :, None, :] - pcl[:, None, :, :]      # (B, J, N, 3)
    dis = jnp.sqrt(jnp.sum(offset * offset, axis=-1))       # (B, J, N)
    offset_norm = offset / dis[..., None]
    on = jnp.transpose(offset_norm, (0, 1, 3, 2)).reshape(B, J * 3, N)
    closeness = (kernel_size - dis) / kernel_size
    mask = (closeness >= 0).astype(pcl.dtype)
    closeness = closeness * mask
    mask3 = jnp.repeat(mask[:, :, None, :], 3, axis=2).reshape(B, J * 3, N)
    out = jnp.concatenate([on * mask3, closeness], axis=1)  # (B, 4J, N)
    return jnp.transpose(out, (0, 2, 1))


PART_REF_SA1 = SAConfig(512, 0.2, 32, ())
PART_REF_SA2 = SAConfig(128, 0.4, 64, ())


def ref_part_seg_forward(p: Params, xyz: jax.Array, joint: jax.Array,
                         kernel_size: float = 0.8) -> jax.Array:
    """PointNet2.forward (pointnet2_part_seg_ssg.py:22-40):
    (B, N, 3) cloud + (B, J, 3) joints -> (B, N, num_classes)."""
    feat = joint2pcloffset_ref(joint, xyz, kernel_size)
    l0 = jnp.concatenate([xyz, feat], axis=-1)
    x1, f1 = set_abstraction(p["sa1"], xyz, l0, PART_REF_SA1)
    x2, f2 = set_abstraction(p["sa2"], x1, f1, PART_REF_SA2)
    g = global_sa(p["sa3"], x2, f2)
    u2 = global_feature_propagation(p["fp3"], f2, g)
    u1 = feature_propagation(p["fp2"], x1, x2, f1, u2, sq_weights=True)
    u0 = feature_propagation(p["fp1"], xyz, x1,
                             jnp.concatenate([xyz, l0], axis=-1), u1,
                             sq_weights=True)
    h = jax.nn.relu(nn.linear(p["fc"], u0))
    return nn.linear(p["head"], h)


MSG_LARGE_LEVELS = (
    MSGConfig(512, (0.05, 0.1), (16, 32), ((16, 16, 32), (32, 32, 64))),
    MSGConfig(256, (0.1, 0.2), (16, 32), ((64, 64, 128), (64, 96, 128))),
    MSGConfig(64, (0.2, 0.4), (16, 32), ((128, 196, 256), (128, 196, 256))),
    MSGConfig(16, (0.4, 0.8), (16, 32), ((256, 256, 512), (256, 384, 512))),
)


def _set_abstraction_msg_ref(p: Params, xyz: jax.Array, feats: jax.Array,
                             cfg: MSGConfig) -> Tuple[jax.Array, jax.Array]:
    """yanx27 PointNetSetAbstractionMsg: grouped = cat([feats, rel_xyz])
    — feats FIRST (pointnet2_utils.py:247), the opposite of the CUDA
    QueryAndGroup order."""
    idx = pn.furthest_point_sampling(xyz, cfg.npoint)
    new_xyz = pn.gather_points(xyz, idx)
    outs = []
    for sp, radius, nsample in zip(p["scales"], cfg.radii, cfg.nsamples):
        bidx = pn.ball_query(new_xyz, xyz, radius, nsample)
        rel = pn.group_points(xyz, bidx) - new_xyz[:, :, None, :]
        gf = pn.group_points(feats, bidx)
        grouped = jnp.concatenate([gf, rel], axis=-1)
        outs.append(jnp.max(_mlp_stack(sp, grouped), axis=2))
    return new_xyz, jnp.concatenate(outs, axis=-1)


def ref_msg_large_forward(p: Params, xyz: jax.Array) -> jax.Array:
    """PointNet2_MSG_large.forward (pointnet2_part_seg_ssg.py:107-128):
    (B, N, 3) -> (B, N, 5J) per-point head concat (the KPFusion-style
    offsets/closeness/weights heads)."""
    xs, fs = [xyz], [xyz]
    for sp, cfg in zip(p["sa"], MSG_LARGE_LEVELS):
        x, f = _set_abstraction_msg_ref(sp, xs[-1], fs[-1], cfg)
        xs.append(x)
        fs.append(f)
    up = fs[4]
    for i in range(3, 0, -1):
        up = feature_propagation(p["fp"][i], xs[i], xs[i + 1], fs[i], up,
                                 sq_weights=True)
    up = feature_propagation(p["fp"][0], xs[0], xs[1], None, up,
                             sq_weights=True)
    h = jax.nn.relu(nn.linear(p["fc"], up))
    return jnp.concatenate([nn.linear(head, h) for head in p["finals"]],
                           axis=-1)


def ref_pointnet_cls_forward(p: Params, pc: jax.Array) -> jax.Array:
    """PointNet (DGCNN.py:58-88): 5 conv-BN-relu, global max, fc head.
    (B, N, 3) -> (B, 40) logits; dropout eval-inert, BN folded."""
    h = _mlp_stack(p["convs"], pc)
    g = jnp.max(h, axis=1)
    h = jax.nn.relu(nn.linear(p["fc1"], g))
    return nn.linear(p["fc2"], h)


def ref_transform_net(p: Params, x0: jax.Array) -> jax.Array:
    """Transform_Net (DGCNN.py:90-135): (B, N, k, 6) graph features ->
    (B, 3, 3) learned alignment."""
    h = _leaky_mlp_stack(p["conv12"], x0)
    h = jnp.max(h, axis=2)                        # over k
    h = _leaky_mlp_stack(p["conv3"], h)
    g = jnp.max(h, axis=1)                        # over N
    g = jax.nn.leaky_relu(nn.linear(p["fc1"], g), 0.2)
    g = jax.nn.leaky_relu(nn.linear(p["fc2"], g), 0.2)
    t = nn.linear(p["transform"], g)
    return t.reshape(t.shape[0], 3, 3)


def ref_dgcnn_partseg_forward(p: Params, pc: jax.Array,
                              k: int = 40) -> jax.Array:
    """DGCNN_partseg.forward (DGCNN.py:137-226): (B, N, 3) ->
    (B, N, seg_num_all). Transform-net alignment, then the 3-stage
    edge-conv trunk with a global embedding broadcast."""
    x0 = _graph_feature_ref(pc, pc, k)
    t = ref_transform_net(p["tnet"], x0)
    x = jnp.einsum("bnd,bde->bne", pc, t)
    h = _graph_feature_ref(x, x, k)
    h = _leaky_mlp_stack(p["conv12"], h)
    x1 = jnp.max(h, axis=2)
    h = _graph_feature_ref(x1, x1, k)
    h = _leaky_mlp_stack(p["conv34"], h)
    x2 = jnp.max(h, axis=2)
    h = _graph_feature_ref(x2, x2, k)
    h = _leaky_mlp_stack(p["conv5"], h)
    x3 = jnp.max(h, axis=2)
    emb = _leaky_mlp_stack(p["conv6"],
                           jnp.concatenate([x1, x2, x3], axis=-1))
    g = jnp.max(emb, axis=1, keepdims=True)
    gN = jnp.broadcast_to(g, (emb.shape[0], emb.shape[1], g.shape[-1]))
    h = jnp.concatenate([gN, x1, x2, x3], axis=-1)
    h = _leaky_mlp_stack(p["conv8"], h)
    h = _leaky_mlp_stack(p["conv9"], h)
    h = _leaky_mlp_stack(p["conv10"], h)
    return nn.linear(p["conv11"], h)


# pointMLP (pointMLP.py:334-451): the full joint-regression PointMLP —
# embedding -> 4x (LocalGrouper anchor-normalized knn grouping +
# PreExtraction residual MLPs + max-pool + PosExtraction) -> 4 FP
# decoders -> global-max-pool context -> conv head + 3 finals.
# ConvBNReLU/ConvBNReLURes1D BN folded at conversion
# (core/convert.convert_pointmlp).

def _res_block_ref(p: Params, x: jax.Array) -> jax.Array:
    """ConvBNReLURes1D, groups=1 (pointMLP.py:197-226):
    relu(net2(relu(net1(x))) + x), BN folded."""
    h = jax.nn.relu(nn.linear(p["net1"], x))
    return jax.nn.relu(nn.linear(p["net2"], h) + x)


def _res_stack_ref(blocks, x: jax.Array) -> jax.Array:
    for b in blocks:
        x = _res_block_ref(b, x)
    return x


def _local_grouper_ref(p: Params, xyz: jax.Array, feats: jax.Array,
                       groups: int, k: int):
    """LocalGrouper, use_xyz=True normalize='anchor' (pointMLP.py:128-180).

    knn_point uses topk(sorted=False) — an unordered neighbor SET; all
    downstream use is max-pooled over k, so our sorted top_k is
    equivalent. std is torch.std's UNBIASED (n-1) over the whole
    (B, -1) flatten per batch element."""
    fps_idx = pn.furthest_point_sampling(xyz, groups)
    new_xyz = pn.gather_points(xyz, fps_idx)
    new_points = pn.gather_points(feats, fps_idx)
    d2 = pn.pairwise_sqdist(new_xyz, xyz)
    _, idx = jax.lax.top_k(-d2, k)
    idx = idx.astype(jnp.int32)
    grouped = jnp.concatenate(
        [pn.group_points(feats, idx), pn.group_points(xyz, idx)], axis=-1)
    anchor = jnp.concatenate([new_points, new_xyz], axis=-1)[:, :, None, :]
    B = xyz.shape[0]
    centered = grouped - anchor
    flat = centered.reshape(B, -1)
    n = flat.shape[1]
    var = jnp.sum((flat - flat.mean(axis=1, keepdims=True)) ** 2,
                  axis=1) / (n - 1)
    std = jnp.sqrt(var)[:, None, None, None]
    normed = p["alpha"] * (centered / (std + 1e-5)) + p["beta"]
    anchor_rep = jnp.broadcast_to(
        new_points[:, :, None, :],
        new_points.shape[:2] + (k, new_points.shape[-1]))
    return new_xyz, jnp.concatenate([normed, anchor_rep], axis=-1)


def _fp_pointmlp_ref(p: Params, xyz_dense, xyz_sparse, skip, up) -> jax.Array:
    """pointMLP PointNetFeaturePropagation (pointMLP.py:278-324):
    squared-dist 3nn interp, cat([skip, interp]), fuse conv, res blocks."""
    d2, idx = pn.three_nn_sq(xyz_dense, xyz_sparse)
    w = pn.interpolation_weights(d2)
    interp = pn.three_interpolate(up, idx, w)
    h = jnp.concatenate([skip, interp], axis=-1)
    h = jax.nn.relu(nn.linear(p["fuse"], h))
    return _res_stack_ref(p["extraction"], h)


POINTMLP_REDUCERS = (4, 4, 4, 4)
POINTMLP_K = (16, 16, 16, 16)


def ref_pointmlp_forward(p: Params, xyz: jax.Array,
                         points: int = 1024) -> jax.Array:
    """PointMLP.forward (pointMLP.py:412-451): (B, N, 3) -> (B, N, 5J).

    ``points`` must match the constructor's `points` (the per-stage
    group counts are derived from it, not from the runtime N)."""
    x = jax.nn.relu(nn.linear(p["embedding"], xyz))     # (B, N, embed)
    return _pointmlp_trunk(p, xyz, x, points)


def ref_pointmlp_refine_forward(p: Params, xyz: jax.Array, feats: jax.Array,
                                points: int = 1024) -> jax.Array:
    """PointMLP_refine.forward (pointMLP.py:529-563): identical trunk,
    PRE-EMBEDDED per-point features (B, N, embed) instead of the
    embedding conv."""
    return _pointmlp_trunk(p, xyz, feats, points)


def _pointmlp_trunk(p: Params, xyz: jax.Array, x: jax.Array,
                    points: int) -> jax.Array:
    xyz_list, x_list = [xyz], [x]
    anchor_points = points
    cur_xyz = xyz
    for i, (reduce, k) in enumerate(zip(POINTMLP_REDUCERS, POINTMLP_K)):
        anchor_points //= reduce
        cur_xyz, grouped = _local_grouper_ref(
            p["groupers"][i], cur_xyz, x_list[-1], anchor_points, k)
        # PreExtraction: transfer + res blocks per (group, k), max over k
        h = jax.nn.relu(nn.linear(p["pre"][i]["transfer"], grouped))
        h = _res_stack_ref(p["pre"][i]["blocks"], h)
        h = jnp.max(h, axis=2)                          # (B, g, out)
        h = _res_stack_ref(p["pos"][i], h)
        xyz_list.append(cur_xyz)
        x_list.append(h)
    xyz_rev = xyz_list[::-1]
    x_rev = x_list[::-1]
    h = x_rev[0]
    for i, dp in enumerate(p["decode"]):
        h = _fp_pointmlp_ref(dp, xyz_rev[i + 1], xyz_rev[i],
                             x_rev[i + 1], h)
    gmps = []
    for gp, xl in zip(p["gmp_map"], x_rev):
        gmps.append(jnp.max(jax.nn.relu(nn.linear(gp, xl)), axis=1))
    gctx = jax.nn.relu(nn.linear(p["gmp_end"],
                                 jnp.concatenate(gmps, axis=-1)))  # (B, gmp)
    gctx = jnp.broadcast_to(gctx[:, None, :],
                            (h.shape[0], h.shape[1], gctx.shape[-1]))
    h = jnp.concatenate([h, gctx], axis=-1)
    pf = jax.nn.relu(nn.linear(p["conv"], h))
    return jnp.concatenate([nn.linear(head, pf) for head in p["finals"]],
                           axis=-1)


def pointnet2_msg_sem_forward(p: Params, xyz: jax.Array,
                              feats: Optional[jax.Array] = None,
                              levels: Tuple[MSGConfig, ...] = MSG_SEM_LEVELS
                              ) -> List[jax.Array]:
    """(B, N, 3) [+ feats (B, N, in_dim)] -> [per-point head outputs]."""
    n = len(levels)
    xs = [xyz]
    fs = [feats if feats is not None
          else jnp.zeros(xyz.shape[:2] + (0,), xyz.dtype)]
    for i, lv in enumerate(levels):
        x, f = set_abstraction_msg(p["sa"][i], xs[-1], fs[-1], lv)
        xs.append(x)
        fs.append(f)
    up = fs[n]
    for i in range(n - 1, -1, -1):
        up = feature_propagation(p["fp"][i], xs[i], xs[i + 1], fs[i], up)
    h = _mlp_stack(p["fc"], up)
    return [nn.linear(head, h) for head in p["heads"]]

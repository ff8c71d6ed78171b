"""PointNet++ ops: TPU-native equivalents of the reference CUDA kernels.

Replaces rootnet/KeypointFusion/pointNet/pointnet2_ops_lib/pointnet2_ops/
_ext-src/src/*.cu (SURVEY.md 2.5 item 2):
- ``furthest_point_sampling`` (sampling_gpu.cu:70) — sequential max-min
  scan, expressed as a lax.scan over sample steps with dense (B, N)
  distance updates (VPU-friendly; no data-dependent shapes);
- ``ball_query`` (ball_query_gpu.cu) — radius neighborhood with
  first-K-in-index-order semantics incl. the reference's pad-with-first
  behavior;
- ``gather_points`` / ``group_points`` (sampling_gpu.cu, group_points_gpu.cu)
  — pure take_along_axis (differentiable for free, unlike the hand-written
  CUDA grads);
- ``three_nn`` / ``three_interpolate`` (interpolate_gpu.cu) — top-3
  neighbor search + inverse-distance weighting.

All functions are batched, jittable, differentiable, and shard under vmap/
pjit. Coordinates are (B, N, 3) point-last (the torch wrappers transpose
around the CUDA calls; here there is nothing to transpose for).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def pairwise_sqdist(a: jax.Array, b: jax.Array) -> jax.Array:
    """(..., N, 3) x (..., M, 3) -> (..., N, M) squared distances."""
    diff = a[..., :, None, :] - b[..., None, :, :]
    return jnp.sum(diff * diff, axis=-1)


@partial(jax.jit, static_argnames=("npoint",))
def furthest_point_sampling(xyz: jax.Array, npoint: int) -> jax.Array:
    """(B, N, 3) -> (B, npoint) int32 indices; starts from point 0
    (matching the CUDA kernel's seed)."""
    B, N, _ = xyz.shape

    def body(carry, _):
        min_dist, last_idx = carry
        last = jnp.take_along_axis(xyz, last_idx[:, None, None], axis=1)  # (B,1,3)
        d = jnp.sum((xyz - last) ** 2, axis=-1)  # (B, N)
        min_dist = jnp.minimum(min_dist, d)
        nxt = jnp.argmax(min_dist, axis=-1).astype(jnp.int32)
        return (min_dist, nxt), last_idx

    init = (jnp.full((B, N), jnp.inf), jnp.zeros((B,), jnp.int32))
    (_, _), idxs = jax.lax.scan(body, init, None, length=npoint)
    return jnp.transpose(idxs)  # (B, npoint)


@partial(jax.jit, static_argnames=("nsample",))
def ball_query(
    new_xyz: jax.Array, xyz: jax.Array, radius: float, nsample: int
) -> jax.Array:
    """(B, S, 3) centers, (B, N, 3) points -> (B, S, nsample) indices.

    Reference semantics: the first ``nsample`` points (in index order)
    within ``radius``; remaining slots repeat the FIRST in-radius index.
    Centers with no in-radius point return all zeros (CUDA behavior:
    untouched output buffer; torch wrapper zero-inits).
    """
    B, S, _ = new_xyz.shape
    N = xyz.shape[1]
    d2 = pairwise_sqdist(new_xyz, xyz)  # (B, S, N)
    in_r = d2 < radius * radius
    order_key = jnp.where(in_r, jnp.arange(N)[None, None, :], N)
    # smallest keys = first in-radius indices
    neg_key, idx = jax.lax.top_k(-order_key, nsample)  # (B, S, nsample)
    valid = (-neg_key) < N
    first = idx[..., :1]
    any_valid = valid[..., :1]
    idx = jnp.where(valid, idx, first)
    idx = jnp.where(any_valid, idx, 0)
    return idx.astype(jnp.int32)


def gather_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """(B, N, C), (B, S) -> (B, S, C)."""
    return jnp.take_along_axis(points, idx[..., None].astype(jnp.int32), axis=1)


def group_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """(B, N, C), (B, S, K) -> (B, S, K, C)."""
    B, S, K = idx.shape
    flat = gather_points(points, idx.reshape(B, S * K))
    return flat.reshape(B, S, K, -1)


@jax.jit
def three_nn(unknown: jax.Array, known: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(B, n, 3), (B, m, 3) -> (dists (B, n, 3), idx (B, n, 3))."""
    d2, idx = three_nn_sq(unknown, known)
    return jnp.sqrt(d2), idx


def three_nn_sq(unknown: jax.Array, known: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """three_nn returning SQUARED distances — the pure-torch utils
    flavor's FP weights consume raw d2 (pointNet/pointnet2_utils.py:
    296-303, no sqrt); exposing it avoids the sqrt->square re-rounding
    a sq-of-three_nn would add."""
    d2 = pairwise_sqdist(unknown, known)
    neg, idx = jax.lax.top_k(-d2, 3)
    return jnp.maximum(-neg, 0.0), idx.astype(jnp.int32)


@jax.jit
def three_interpolate(points: jax.Array, idx: jax.Array, weight: jax.Array) -> jax.Array:
    """(B, m, C) features, (B, n, 3) idx, (B, n, 3) weights -> (B, n, C)."""
    gathered = group_points(points, idx)  # (B, n, 3, C)
    return jnp.sum(gathered * weight[..., None], axis=2)


def interpolation_weights(dists: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Inverse-distance weights (pointnet2_utils FeaturePropagation)."""
    recip = 1.0 / (dists + eps)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)


def query_and_group(
    xyz: jax.Array,
    new_xyz: jax.Array,
    features: jax.Array,
    radius: float,
    nsample: int,
    use_xyz: bool = True,
) -> jax.Array:
    """QueryAndGroup (pointnet2_utils.py): ball query + relative-xyz concat.

    xyz (B, N, 3), new_xyz (B, S, 3), features (B, N, C)
    -> (B, S, nsample, 3 + C) (or C only if not use_xyz).
    """
    idx = ball_query(new_xyz, xyz, radius, nsample)
    grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
    grouped_feat = group_points(features, idx)
    if use_xyz:
        return jnp.concatenate([grouped_xyz, grouped_feat], axis=-1)
    return grouped_feat

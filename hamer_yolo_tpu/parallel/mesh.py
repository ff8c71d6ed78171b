"""Device mesh + sharding rules (TPU-native parallelism).

The reference's distribution story is NCCL DDP (yolov7/train.py:600,
PL `strategy: ddp`); none of that survives as user code here. Instead:

- one ``jax.sharding.Mesh`` with axes ("data", "model");
- data parallelism = batch sharded over "data" (the reference's DDP and
  the BASELINE "multi-hand batches over ICI" config);
- tensor parallelism = ViT-H attention heads / MLP hidden sharded over
  "model" (latency headroom beyond reference parity — the reference has
  no TP at all, SURVEY.md 2.6);
- gradient reduction / BN-stat sync fall out of XLA's partitioner
  (psum over "data") instead of explicit NCCL allreduce.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (n_data, n_model, len(devices))
    grid = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dim over "data"."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def _tp_spec_for_path(path: str, ndim: int) -> P:
    """Tensor-parallel PartitionSpec for a ViT/HaMeR param by its tree path.

    Megatron-style: qkv & mlp-up shard the output dim; proj & mlp-down
    shard the input dim (so the pair needs one all-reduce, inserted by
    XLA's SPMD partitioner automatically).
    """
    if ndim != 2:
        return P()
    if any(k in path for k in ("qkv", "to_q", "to_kv", "fc1", "pw1")):
        return P(None, "model")
    if any(k in path for k in ("proj", "fc2", "pw2")):
        return P("model", None)
    return P()


def vit_tp_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for model params: attention/MLP matrices
    sharded over "model", everything else replicated."""

    def one(path, leaf):
        pstr = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        ndim = getattr(leaf, "ndim", 0)
        return NamedSharding(mesh, _tp_spec_for_path(pstr, ndim))

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(params: Any, shardings: Any) -> Any:
    return jax.device_put(params, shardings)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    def one(x):
        return jax.device_put(x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1)))))

    return jax.tree_util.tree_map(one, batch)

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
    n_replica: int = 1,
) -> Mesh:
    """("data", "model") mesh, optionally with an outer "replica" axis.

    "replica" models the DCN (cross-host) dimension of a multi-pod/
    multi-host topology: pure data parallelism whose gradient all-reduce
    is the only cross-axis collective, so it tolerates DCN bandwidth,
    while "data"/"model" collectives stay on ICI. On a real multi-host
    run use ``make_hybrid_mesh`` so the axis order matches the physical
    DCN/ICI split; on a single host (or the virtual CPU mesh) the same
    axes are emulated by reshaping the device list.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // (n_model * n_replica)
    need = n_data * n_model * n_replica
    assert need <= len(devices), (n_replica, n_data, n_model, len(devices))
    if n_replica == 1:
        grid = np.array(devices[:need]).reshape(n_data, n_model)
        return Mesh(grid, ("data", "model"))
    grid = np.array(devices[:need]).reshape(n_replica, n_data, n_model)
    return Mesh(grid, ("replica", "data", "model"))


def make_hybrid_mesh(n_model: int = 1) -> Mesh:
    """Multi-host mesh with the DCN dimension as the outer "replica" axis.

    Uses mesh_utils.create_hybrid_device_mesh so "replica" spans hosts
    (DCN) and "data"/"model" stay within a host's ICI domain. Requires a
    jax.distributed-initialized multi-process runtime; falls back to
    make_mesh on a single process.
    """
    n_proc = jax.process_count()
    if n_proc == 1:
        return make_mesh(n_model=n_model)
    from jax.experimental import mesh_utils

    per_host = len(jax.local_devices())
    grid = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(1, per_host // n_model, n_model),
        dcn_mesh_shape=(n_proc, 1, 1),
    )
    return Mesh(grid, ("replica", "data", "model"))


def data_axes(mesh: Mesh) -> Tuple[str, ...]:
    """Mesh axes the batch dim is sharded over (replica+data when present)."""
    return tuple(a for a in ("replica", "data") if a in mesh.shape)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dim over the data axes (replica+data)."""
    return NamedSharding(mesh, P(data_axes(mesh), *([None] * (ndim - 1))))


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
    axes = data_axes(mesh)

    def one(x):
        return jax.device_put(x, NamedSharding(mesh, P(axes, *([None] * (x.ndim - 1)))))

    return jax.tree_util.tree_map(one, batch)

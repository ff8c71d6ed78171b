"""Checkpointing (orbax) + parameter bootstrapping.

Replaces the reference's torch .pt/.pth/.ckpt files (SURVEY.md 5) with
orbax pytree checkpoints. Weight converters from the reference's torch
checkpoints live in core/convert.py and are gated on file availability.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

from hamer_yolo_tpu.models.hamer import HamerConfig, init_hamer
from hamer_yolo_tpu.models.mano import ManoModel
from hamer_yolo_tpu.models.sar import SarConfig, init_sar
from hamer_yolo_tpu.models.yolov7 import YoloConfig, init_yolov7


def init_pipeline_params(
    key: jax.Array,
    mano_model: ManoModel,
    yolo_cfg: Optional[YoloConfig] = None,
    hamer_cfg: Optional[HamerConfig] = None,
    sar_cfg: Optional[SarConfig] = None,
    with_sar: bool = True,
) -> Dict[str, Any]:
    """Random-init parameter set for the full pipeline."""
    k1, k2, k3 = jax.random.split(key, 3)
    params: Dict[str, Any] = {
        "yolo": init_yolov7(k1, yolo_cfg or YoloConfig()),
        "hamer": init_hamer(k2, hamer_cfg or HamerConfig()),
    }
    if with_sar:
        params["sar"] = init_sar(k3, mano_model.v_template, sar_cfg or SarConfig())
    return params


def save_checkpoint(path: str, params: Any) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)


def load_checkpoint(path: str, template: Optional[Any] = None) -> Any:
    """Restore an orbax checkpoint.

    With a template, values land on the template's shardings. Without
    one, a plain restore replays the shardings RECORDED AT SAVE TIME,
    which fails cross-device (e.g. evaluating a TPU-trained checkpoint
    on a CPU host) — fall back to restoring raw numpy arrays, which any
    later device_put/jit re-shards as needed.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(path, template)
        try:
            return ckptr.restore(path)
        except ValueError:
            pass  # saved shardings name devices this host doesn't have
    ckptr2 = ocp.PyTreeCheckpointer()
    item = ckptr2.metadata(path).item_metadata
    tree = item.tree if hasattr(item, "tree") else item
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
    return ckptr2.restore(path, restore_args=restore_args)


def latest_checkpoint(run_dir: str) -> Optional[str]:
    """Newest ``ckpt_*`` under a run dir (reference get_latest_run,
    yolov7/utils/general.py:58: wandb auto-resume picks last.pt of the
    most recent run). ``ckpt_final`` wins over any numbered step; else
    the highest ``ckpt_<step>``.
    """
    if not os.path.isdir(run_dir):
        return None
    final = os.path.join(run_dir, "ckpt_final")
    if os.path.isdir(final):
        return final
    best: Optional[str] = None
    best_step = -1
    for name in os.listdir(run_dir):
        if name.startswith("ckpt_"):
            try:
                step = int(name[5:])
            except ValueError:
                continue
            if step > best_step:
                best_step, best = step, os.path.join(run_dir, name)
    return best

"""OBJ reconstruction from saved .npy MANO params + overlay projection.

Parity targets:
- reconstruct_and_save_obj_with_wrapper (reference infer.py:1321-1436):
  axis-angle -> rotmat (hand-rolled Rodrigues, infer.py:65-83) -> MANO
  forward (pose2rot=False) -> cam_t offset -> left-hand mirror (vertex
  x-negate + face winding flip) -> concatenated two-hand OBJ.
- project_and_draw (reference reconstruct.py:50-86): painter's-algorithm
  vertex projection overlay, pure numpy (no GL dependency).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hamer_yolo_tpu.geometry.rotations import aa_to_rotmat
from hamer_yolo_tpu.io.writers import combine_hand_meshes, mano_faces_for_side, write_obj
from hamer_yolo_tpu.models.mano import ManoModel, mano_forward_rotmat


_MANO_FROM_AA_CACHE: dict = {}


def _mano_from_aa_fn(mano_model: ManoModel):
    """Jitted (theta, betas) -> model-frame vertices, cached per model."""
    key = id(mano_model)
    if key not in _MANO_FROM_AA_CACHE:
        @jax.jit
        def fn(theta, betas):
            rotmats = aa_to_rotmat(theta.reshape(16, 3))[None]
            out = mano_forward_rotmat(
                mano_model, rotmats[:, :1], rotmats[:, 1:], betas[None]
            )
            return out.vertices[0]

        _MANO_FROM_AA_CACHE[key] = fn
    return _MANO_FROM_AA_CACHE[key]


def reconstruct_hand_mesh(
    mano_model: ManoModel,
    hand: Dict[str, np.ndarray],
    watertight: bool = True,
) -> Dict[str, np.ndarray]:
    """One saved hand dict -> {'vertices', 'faces'} with left-hand mirror."""
    verts = np.asarray(
        _mano_from_aa_fn(mano_model)(
            jnp.asarray(hand["theta"], jnp.float32),
            jnp.asarray(hand["betas"], jnp.float32),
        )
    ).copy()
    is_right = bool(hand["is_right"])
    if not is_right:
        # Mirror the MODEL-frame x BEFORE the camera translation
        # (infer.py:1413-1418: vertices[:,0] negated, then += cam_t with
        # tx unchanged) — mirroring after translation would flip tx too.
        verts[:, 0] *= -1.0
    verts += np.asarray(hand["cam_t"], np.float32)
    faces = mano_faces_for_side(np.asarray(mano_model.faces), is_right, watertight)
    return {"vertices": verts, "faces": faces}


def reconstruct_and_save_obj(
    mano_model: ManoModel,
    results: Dict[str, Optional[dict]],
    obj_path: str,
    watertight: bool = True,
) -> Optional[Dict[str, np.ndarray]]:
    """Both hands of one frame -> single concatenated OBJ file.

    Hand order matches the reference scene build (infer.py:1353:
    right first, then left)."""
    hands = [
        reconstruct_hand_mesh(mano_model, results[side], watertight)
        for side in ("right", "left")
        if results.get(side) is not None
    ]
    if not hands:
        return None
    mesh = combine_hand_meshes(hands)
    write_obj(obj_path, mesh["vertices"], mesh["faces"])
    return mesh


def project_overlay(
    image_bgr: np.ndarray,
    vertices: np.ndarray,
    faces: np.ndarray,
    K: np.ndarray,
    color=(80, 200, 80),
) -> np.ndarray:
    """Painter's-algorithm mesh overlay (reference reconstruct.py:50-86).

    Back-to-front triangle fill by mean depth; pure numpy + cv2.fillPoly.
    """
    import cv2

    uv = vertices @ K.T
    uv = uv[:, :2] / np.maximum(uv[:, 2:3], 1e-9)
    tri_depth = vertices[faces][..., 2].mean(axis=1)
    order = np.argsort(-tri_depth)  # far first
    out = image_bgr.copy()
    tris = uv[faces[order]].astype(np.int32)
    for t in tris:
        cv2.fillPoly(out, [t], color)
    return out

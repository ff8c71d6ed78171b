"""Left-hand flip algebra, centralized.

The reference scatters left-hand handling across four sites
(infer.py:229-231 crop flip, :391-392 keypoint x-scaling, :402-409 pred_cam
tx correction, :1402-1417 mesh mirror + face rewind). This module encodes
each as a tested pure function; the pipeline composes them.

NOTE on ``flip_keypoints3d_reference``: the reference multiplies kp3d x by
``do_flip`` itself (infer.py:391: ``x * do_flip``), which ZEROES the x
coordinate of right hands (do_flip == 0) and leaves left hands unmirrored.
That is a reference bug, documented here and reproduced only behind
``reference_compat=True``; the correct transform multiplies by
(1 - 2*do_flip).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def flip_correction_factor(do_flip: jax.Array) -> jax.Array:
    """1.0 for right hands (do_flip=0), -1.0 for left hands (do_flip=1)."""
    return 1.0 - 2.0 * jnp.reshape(do_flip, (-1,))


def correct_pred_cam(pred_cam: jax.Array, do_flip: jax.Array) -> jax.Array:
    """Negate the weak-perspective tx for flipped (left) hands.

    Reference infer.py:402-409: only cam[:, 1] is corrected.
    """
    f = flip_correction_factor(do_flip)
    return pred_cam.at[:, 1].multiply(f)


def flip_keypoints3d(kp3d: jax.Array, do_flip: jax.Array, reference_compat: bool = False) -> jax.Array:
    """Mirror 3D keypoints' x for flipped hands.

    kp3d: (B, N, 3); do_flip: (B,) or (B, 1).
    reference_compat=True reproduces infer.py:391's ``x * do_flip``
    (zeroing right-hand x) bit-for-bit; the default applies the correct
    (1 - 2*do_flip) mirror.
    """
    d = jnp.reshape(do_flip, (-1, 1))
    factor = d if reference_compat else (1.0 - 2.0 * d)
    return kp3d.at[:, :, 0].multiply(factor)


def mirror_mesh(vertices: jax.Array, is_left: jax.Array) -> jax.Array:
    """Negate vertex x for left hands (MANO_RIGHT -> left-hand mesh).

    Reference infer.py:1402-1405. vertices: (..., V, 3);
    is_left broadcastable to the batch dims.
    """
    factor = jnp.where(jnp.reshape(is_left, is_left.shape + (1, 1)) > 0.5, -1.0, 1.0)
    return vertices.at[..., 0].multiply(factor[..., 0])


def rewind_faces(faces: jax.Array) -> jax.Array:
    """Flip triangle winding ([0, 2, 1]) so mirrored meshes stay outward-facing.

    Reference infer.py:1412-1417 / renderer.py:220.
    """
    return faces[..., [0, 2, 1]]

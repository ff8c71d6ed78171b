"""hamer_yolo_tpu — TPU-native multi-hand 3D mesh recovery framework.

A ground-up JAX/XLA/Pallas re-design of the `hamer-yolo` pipeline
(YOLOv7 hand detector -> HaMeR ViT-H MANO regressor -> RootNet absolute
depth -> MANO mesh export), built for TPU hardware:

- every model is a pure function over a parameter pytree, jit-compiled
  into a single XLA program (detector + NMS + crop + ViT + MANO LBS fused);
- dynamic shapes of the reference (variable hand counts, per-hand Python
  loops) are replaced with fixed-capacity masked lanes;
- hot ops (NMS, warp-affine crop, flash attention) have Pallas TPU kernels
  with pure-XLA fallbacks;
- multi-chip scaling uses `jax.sharding.Mesh` + collectives over ICI.

Layers (bottom-up): geometry -> ops -> models -> pipeline -> cli,
with core (params/dtypes/checkpoint/convert), parallel (mesh/sharding),
io (npy/obj/image), training (optax loops), utils (metrics/profiling).
"""

__version__ = "0.1.0"

# Honor JAX_PLATFORMS even when a sitecustomize pre-registered a default
# backend before user code ran (the axon TPU environment does this; the
# env var alone is then silently ignored). config.update works as long as
# no backend has been initialized yet.
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass  # backend already initialized; leave it be

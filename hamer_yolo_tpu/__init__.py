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

    _plats = _os.environ["JAX_PLATFORMS"]
    if "cpu" not in _plats.split(","):
        # Keep the host backend registered behind the accelerator:
        # eager host-side passes (int8 calibration, converters) run on
        # jax.devices("cpu") — on the axon tunnel they would cost
        # ~28 ms PER OP. First entry stays the default platform.
        _plats += ",cpu"
    try:
        _jax.config.update("jax_platforms", _plats)
    except Exception:
        pass  # backend already initialized; leave it be


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (HYT_JAX_CACHE=0 disables).

    On the axon tunnel a full-pipeline compile costs minutes (BENCH_r02
    recorded 577 s for one b64 program); the cache makes every rerun of
    bench.py / tools / the driver's benchmark skip those compiles
    entirely. Keyed on HLO + backend, so CPU test compiles and TPU bench
    compiles coexist. min_compile_time 4 s keeps tiny test programs from
    spamming the disk.
    """
    import jax as _jax

    cache = _os.environ.get("HYT_JAX_CACHE")
    if cache == "0":
        return
    cache = cache or _os.path.expanduser("~/.cache/hamer_yolo_tpu/jax_cache")
    try:
        _os.makedirs(cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 4)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax without these flags — cache is best-effort


_enable_compilation_cache()


def load_pipeline(checkpoint: str | None = None, mano_dir: str | None = None,
                  max_hands: int = 4, **config_overrides):
    """One-call pipeline constructor (the torch.hub / hubconf equivalent).

    Returns (program, params, mano_model, cfg) where ``program(image_bgr
    ndarray, K 3x3)`` -> dict of per-slot outputs (see pipeline.frame).

        import hamer_yolo_tpu, cv2, numpy as np
        program, *_ = hamer_yolo_tpu.load_pipeline()
        out = program(cv2.imread("hand.jpg").astype(np.float32), K)
    """
    import jax

    from hamer_yolo_tpu.core.checkpoint import init_pipeline_params, load_checkpoint
    from hamer_yolo_tpu.core.config import apply_overrides
    from hamer_yolo_tpu.core.mano_assets import load_mano_model, synthetic_mano_model
    from hamer_yolo_tpu.models.mano import ManoModel
    from hamer_yolo_tpu.pipeline.frame import PipelineConfig
    from hamer_yolo_tpu.pipeline.runner import FrameProgram

    try:
        mano = ManoModel.from_arrays(load_mano_model("right", mano_dir))
    except Exception:
        mano = ManoModel.from_arrays(synthetic_mano_model())
    cfg = PipelineConfig(max_hands=max_hands)
    if config_overrides:
        cfg = apply_overrides(cfg, config_overrides)
    if checkpoint and _os.path.exists(checkpoint):
        params = load_checkpoint(checkpoint)
    else:
        params = init_pipeline_params(jax.random.PRNGKey(0), mano,
                                      yolo_cfg=cfg.yolo, hamer_cfg=cfg.hamer,
                                      sar_cfg=cfg.sar)
    return FrameProgram(params, mano, cfg), params, mano, cfg

from hamer_yolo_tpu.core import nn
from hamer_yolo_tpu.core.mano_assets import load_mano_model, synthetic_mano_model

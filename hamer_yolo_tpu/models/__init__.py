from hamer_yolo_tpu.models import mano
from hamer_yolo_tpu.models.mano import ManoModel, mano_forward_rotmat, mano_forward_manopth

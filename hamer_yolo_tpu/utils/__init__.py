from hamer_yolo_tpu.utils import metrics, profiling, viz, autoanchor
from hamer_yolo_tpu.utils.logging import MetricLogger

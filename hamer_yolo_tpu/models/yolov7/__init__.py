from hamer_yolo_tpu.models.yolov7.model import (
    YoloConfig,
    init_yolov7,
    yolov7_forward,
    yolov7_ensemble_forward,
    yolov7_backbone_forward,
    decode_detections,
    yolov7_spec,
    YOLOV7_ANCHORS,
    YOLOV7_STRIDES,
)

from hamer_yolo_tpu.ops.nms import non_max_suppression, NmsOutput

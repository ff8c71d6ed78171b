from hamer_yolo_tpu.pipeline.frame import PipelineConfig, infer_frame, detect_hands, recover_hands, estimate_depths
from hamer_yolo_tpu.pipeline.runner import FrameProgram, process_image_dir, pick_bucket
from hamer_yolo_tpu.pipeline.reconstruct import reconstruct_and_save_obj, reconstruct_hand_mesh, project_overlay

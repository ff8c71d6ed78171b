from hamer_yolo_tpu.io.writers import (
    load_intrinsics,
    save_hand_npy,
    load_hand_npy,
    frame_outputs_to_hand_dicts,
    write_obj,
    combine_hand_meshes,
    mano_faces_for_side,
    list_images,
)

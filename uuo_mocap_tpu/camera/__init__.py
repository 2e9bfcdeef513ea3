from uuo_mocap_tpu.camera.hmr import (  # noqa: F401
    convert_hmr_pos_to_mocap_pos,
    convert_mocap_pos_to_hmr_pos,
    get_3d_parameters,
    perspective_projection,
)

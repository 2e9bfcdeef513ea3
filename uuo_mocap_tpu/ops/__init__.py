from uuo_mocap_tpu.ops import rotations  # noqa: F401

from uuo_mocap_tpu.data.config import load_config  # noqa: F401

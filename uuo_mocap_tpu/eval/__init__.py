from uuo_mocap_tpu.eval import metrics  # noqa: F401

from uuo_mocap_tpu.pipeline.stages import MarkerAttachment, SmplParams, SolveStages  # noqa: F401

from uuo_mocap_tpu.body.model import BodyModel, lbs_forward, load_body_model  # noqa: F401
from uuo_mocap_tpu.body.smpl import SmplInference, SmplInferenceGender  # noqa: F401

from uuo_mocap_tpu.models.marker_segmenter import MarkerSegmenter  # noqa: F401
from uuo_mocap_tpu.models.marker_segmenter_multimodal import MarkerSegmenterMultimodal  # noqa: F401
from uuo_mocap_tpu.models.pos2bc import Pos2BC  # noqa: F401
from uuo_mocap_tpu.models.pos_diff import PosDiff  # noqa: F401
from uuo_mocap_tpu.models.foot_contact_model import FootContactModel  # noqa: F401
from uuo_mocap_tpu.models.motion_embedding import (  # noqa: F401
    JointEmbedding,
    MarkerEmbedding,
    TemporalAlignmentModel,
)
from uuo_mocap_tpu.models.marker_tracking import (  # noqa: F401
    MarkerTrackingAttention,
    PermutationLearningModel,
)

from imatch_tpu.models.u2net.configs import (
    TINY_U2,
    U2NET,
    U2NETP,
    U2NetConfig,
    get_u2_config,
)
from imatch_tpu.models.u2net.model import init_u2_params, u2net_forward
from imatch_tpu.models.u2net.runtime import U2NetSegmenter, get_segmenter

__all__ = [
    "TINY_U2",
    "U2NET",
    "U2NETP",
    "U2NetConfig",
    "get_u2_config",
    "init_u2_params",
    "u2net_forward",
    "U2NetSegmenter",
    "get_segmenter",
]

from imatch_tpu.models.clip.configs import (
    CLIPConfig,
    TextConfig,
    VisionConfig,
    CONFIGS,
    get_config,
)
from imatch_tpu.models.clip.model import (
    init_params,
    encode_image,
    encode_text,
    clip_forward,
)

__all__ = [
    "CLIPConfig",
    "TextConfig",
    "VisionConfig",
    "CONFIGS",
    "get_config",
    "init_params",
    "encode_image",
    "encode_text",
    "clip_forward",
]

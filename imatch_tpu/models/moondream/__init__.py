from imatch_tpu.models.moondream.configs import (
    MD_CONFIGS,
    MOONDREAM2,
    TINY_MD,
    MoondreamConfig,
    get_md_config,
)
from imatch_tpu.models.moondream.model import (
    KVCache,
    decoder_forward,
    embed_tokens,
    encode_image_features,
    init_cache,
    init_md_params,
    lm_logits,
)
from imatch_tpu.models.moondream.generate import (
    GenResult,
    greedy_generate,
    prefill,
    vqa_yes_no,
)

__all__ = [
    "MD_CONFIGS",
    "MOONDREAM2",
    "TINY_MD",
    "MoondreamConfig",
    "get_md_config",
    "KVCache",
    "decoder_forward",
    "embed_tokens",
    "encode_image_features",
    "init_cache",
    "init_md_params",
    "lm_logits",
    "GenResult",
    "greedy_generate",
    "prefill",
    "vqa_yes_no",
]

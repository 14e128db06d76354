"""First-party Pallas TPU kernels for the hot ops.

- flash_attention.py — blockwise streaming-softmax MHA for the CLIP
  towers (and any longer-context swap-in).
- topk.py — fused cosine-score + tile-reduce kernel for the
  latency-critical index query; no (Q, N) score materialization and no
  sorts in the HBM streaming loop.
- quantize.py — single-pass dynamic int8 row quantize (+ fused
  LayerNorm variant) feeding the W8A8 tiers; replaces XLA's two HBM
  passes (amax reduce, then rescale/cast) with one.

All kernels run compiled on TPU and in Pallas interpreter mode on CPU
(the test path).
"""

from imatch_tpu.ops.pallas.flash_attention import flash_mha
from imatch_tpu.ops.pallas.quantize import (
    ln_quant_rows_pallas,
    quant_rows_pallas,
)
from imatch_tpu.ops.pallas.topk import (
    PreparedCorpus,
    pallas_cosine_topk,
    pallas_topk_prepared,
    prepare_corpus,
)

__all__ = [
    "flash_mha",
    "ln_quant_rows_pallas",
    "quant_rows_pallas",
    "pallas_cosine_topk",
    "pallas_topk_prepared",
    "prepare_corpus",
    "PreparedCorpus",
]

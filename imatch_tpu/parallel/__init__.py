"""Multi-chip parallelism: mesh construction, sharding rules, the
contrastive training step, and the distributed sharded index search.

The reference has no distributed layer at all (SURVEY.md §2.3 — one
process, no collectives). Here scale-out is first-class and TPU-native:
a ``jax.sharding.Mesh`` with ``data`` and ``model`` axes, parameter/batch
PartitionSpecs handed to ``jax.jit`` (XLA SPMD inserts the collectives
over ICI), and ``shard_map`` for the corpus-sharded top-k search where we
want explicit control of the all-gather/merge.
"""

from imatch_tpu.parallel.mesh import make_mesh, mesh_shape_for
from imatch_tpu.parallel.sharding import (
    clip_param_specs,
    data_spec,
    replicated,
)
from imatch_tpu.parallel.dist_ivf import (
    prepare_sharded_ivf,
    prepare_sharded_ivf_incremental,
    sharded_ivf_topk,
)
from imatch_tpu.parallel.dist_search import (
    pad_corpus_for_mesh,
    prepare_sharded_corpus,
    sharded_cosine_topk,
    sharded_topk_prepared,
)
from imatch_tpu.parallel.pipeline import gpipe_scan
from imatch_tpu.parallel.ring_attention import ring_attention
from imatch_tpu.parallel.train import (
    TrainState,
    clip_loss,
    make_train_step,
    init_train_state,
)

__all__ = [
    "make_mesh",
    "mesh_shape_for",
    "clip_param_specs",
    "data_spec",
    "replicated",
    "pad_corpus_for_mesh",
    "prepare_sharded_corpus",
    "prepare_sharded_ivf",
    "prepare_sharded_ivf_incremental",
    "sharded_cosine_topk",
    "sharded_ivf_topk",
    "sharded_topk_prepared",
    "gpipe_scan",
    "ring_attention",
    "TrainState",
    "clip_loss",
    "make_train_step",
    "init_train_state",
]

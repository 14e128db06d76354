"""imatch_tpu — TPU-native multimodal image similarity search framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``parsakhaz/multimodal-image-similarity-search`` ("ImageMatch",
reference at /root/reference):

- ``models``   — CLIP (ViT-B/32, ViT-L/14, LongCLIP-248), U^2-Net background
                 removal, Moondream-class captioner/VQA — all pure JAX,
                 jit-compiled for TPU, with HF-torch weight converters.
- ``ops``      — Pallas TPU kernels + XLA fallbacks: fused image preprocess,
                 flash-style blockwise attention, tiled matmul + fused top-k,
                 DCT perceptual hash, CLIP BPE tokenizer.
- ``index``    — in-HBM vector index (exact cosine scoring, tombstones,
                 durable snapshots) replacing ChromaDB/hnswlib, sharded over a
                 device mesh for million-vector collections.
- ``pipeline`` — batched ingest (decode -> preprocess -> embed -> index),
                 pHash dedup, metadata store, natural-language yes/no filter
                 subsystem with background back-fill.
- ``parallel`` — mesh construction and sharding rules (DP/TP for the towers,
                 index sharding with all-gather candidate merge).
- ``serving``  — the reference's REST contract (upload, search by
                 image/text/multimodal, filters, metadata CRUD, reset) on a
                 first-party ASGI micro-framework.
- ``train``    — contrastive CLIP fine-tuning step, sharded over the mesh.

Reference behavioral contract: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"

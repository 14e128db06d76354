"""CLIP embedding service — the ``generate_clip_embedding`` equivalent.

Reference: /root/reference/utils.py:27-102 (singleton model cache, image
and text towers, L2-normalized outputs). Differences by design:

- batched-first: both towers take batches; single-item calls are batches
  of one (the reference embeds one image per HTTP request — the
  anti-pattern BASELINE.md calls out);
- text tokenization pads to the 248-token LongCLIP context
  (utils.py:88) through the first-party BPE tokenizer;
- weights: a real converted HF checkpoint when IMATCH_CLIP_CHECKPOINT is
  set, else deterministic random init (seed 0) so embeddings are stable
  across restarts against a persisted index.
"""

from __future__ import annotations

import functools
import logging
import os
import threading
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from imatch_tpu.models.clip import (
    CLIPConfig,
    encode_image,
    encode_text,
    get_config,
    init_params,
)
from imatch_tpu.ops.preprocess import preprocess_images
from imatch_tpu.ops.tokenizer import default_tokenizer
from imatch_tpu.utils.metrics import METRICS

logger = logging.getLogger("imatch.embedder")

_DEFAULT_CONFIG = os.environ.get("IMATCH_CLIP_CONFIG", "vit-b32")


class ClipEmbedder:
    """Owns CLIP params + jitted tower functions; thread-safe."""

    def __init__(
        self,
        config: str | CLIPConfig = _DEFAULT_CONFIG,
        checkpoint: Optional[str] = None,
        compute_dtype=None,
        data_parallel: Optional[int] = None,
    ):
        """data_parallel: shard embed batches over this many local devices
        (params replicated, batch split — XLA SPMD over ICI). Default from
        IMATCH_EMBED_DP; 0/unset = single device. Batches are padded up to
        a multiple of the mesh size."""
        self.cfg = get_config(config) if isinstance(config, str) else config
        checkpoint = checkpoint or os.environ.get("IMATCH_CLIP_CHECKPOINT")
        t0 = time.time()
        if checkpoint:
            from imatch_tpu.models.clip.convert import load_hf_checkpoint

            logger.info("loading CLIP checkpoint from %s", checkpoint)
            self.params = jax.tree.map(
                jnp.asarray, load_hf_checkpoint(checkpoint, self.cfg)
            )
        else:
            logger.info(
                "no checkpoint configured; deterministic random init (%s)",
                self.cfg.name,
            )
            self.params = init_params(jax.random.key(0), self.cfg)
        if compute_dtype is None:
            compute_dtype = (
                jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
            )
        self.compute_dtype = compute_dtype
        self.tokenizer = default_tokenizer()
        self._lock = threading.Lock()

        cfg = self.cfg
        dt = self.compute_dtype
        # Pool at the *tokenizer's* eos id (differs from the model config
        # when running the offline byte-fallback vocab). When the tokenizer
        # vocab exceeds the model's (byte fallback vs a tiny config), ids
        # are folded into [0, vocab-2] with the model's top id reserved for
        # eos — a blind clamp would alias regular tokens onto the eos id
        # and pool at the wrong position.
        if self.tokenizer.vocab_size > self.cfg.text.vocab_size:
            self._fold_vocab = True
            eos_id = self.cfg.text.vocab_size - 1
        else:
            self._fold_vocab = False
            eos_id = self.tokenizer.eos_id
        self._model_eos = eos_id

        if data_parallel is None:
            data_parallel = int(os.environ.get("IMATCH_EMBED_DP", "0"))
        self.dp = 0
        shardings = {}
        if data_parallel and data_parallel > 1:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

            devices = jax.devices()[:data_parallel]
            if len(devices) < data_parallel:
                logger.warning(
                    "requested dp=%d but only %d devices; using %d",
                    data_parallel,
                    len(devices),
                    len(devices),
                )
            mesh = Mesh(
                __import__("numpy").asarray(devices, object), ("data",)
            )
            self.dp = len(devices)
            shardings = dict(
                in_shardings=(None, NamedSharding(mesh, P("data"))),
            )
            self.params = jax.tree.map(
                lambda x: jax.device_put(x, NamedSharding(mesh, P())),
                self.params,
            )

        @functools.partial(jax.jit, **shardings)
        def _img_fn(params, pixels):
            return encode_image(params, pixels, cfg, dtype=dt)

        @functools.partial(jax.jit, **shardings)
        def _txt_fn(params, tokens):
            return encode_text(params, tokens, cfg, dtype=dt, eos_token_id=eos_id)

        self._img_fn = _img_fn
        self._txt_fn = _txt_fn
        logger.info(
            "embedder ready in %.2fs (dp=%d)", time.time() - t0, self.dp or 1
        )

    def _pad_dp(self, n: int) -> int:
        """Rows of padding needed to split a batch over the dp mesh."""
        return 0 if self.dp <= 1 else (-n) % self.dp

    @property
    def dim(self) -> int:
        return self.cfg.projection_dim

    def embed_images(self, images: Sequence[np.ndarray]) -> np.ndarray:
        """uint8 HWC RGB arrays (any geometries) -> (N, proj) unit fp32."""
        if len(images) == 0:
            return np.zeros((0, self.dim), dtype=np.float32)
        METRICS.inc("images_embedded", len(images))
        pixels = preprocess_images(
            images,
            out_size=self.cfg.vision.image_size,
            dtype=self.compute_dtype,
        )
        pad = self._pad_dp(pixels.shape[0])
        if pad:
            pixels = jnp.concatenate(
                [pixels, jnp.tile(pixels[-1:], (pad, 1, 1, 1))]
            )
        with self._lock, METRICS.timer("embed.image"):
            out = self._img_fn(self.params, pixels)
        return np.asarray(out)[: len(images)]

    def embed_texts(self, texts: Sequence[str]) -> np.ndarray:
        """Strings -> (N, proj) unit fp32, 248-token padded tokenization."""
        if len(texts) == 0:
            return np.zeros((0, self.dim), dtype=np.float32)
        max_len = self.cfg.text.max_positions
        tokens = np.asarray(
            self.tokenizer.encode_batch(texts, max_length=max_len)
        )
        if self._fold_vocab:
            is_eos = tokens == self.tokenizer.eos_id
            tokens = np.where(
                is_eos,
                self._model_eos,
                tokens % (self.cfg.text.vocab_size - 1),
            )
        pad = self._pad_dp(len(tokens))
        if pad:
            tokens = np.concatenate([tokens, np.tile(tokens[-1:], (pad, 1))])
        with self._lock, METRICS.timer("embed.text"):
            out = self._txt_fn(self.params, jnp.asarray(tokens))
        return np.asarray(out)[: len(texts)]

    def embed_image(self, image: np.ndarray) -> np.ndarray:
        return self.embed_images([image])[0]

    def embed_text(self, text: str) -> np.ndarray:
        return self.embed_texts([text])[0]


@functools.lru_cache()
def get_embedder() -> ClipEmbedder:
    """Process-wide singleton, mirroring utils.load_clip_model caching."""
    return ClipEmbedder()

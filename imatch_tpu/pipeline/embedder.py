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
from collections import OrderedDict
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
from imatch_tpu.runtime.scheduler import GATE
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
        # Opt-in W8A8 image tower (IMATCH_EMBED_QUANT=int8): encoder
        # matmuls run int8 x int8 -> int32 on the MXU (rated 2x bf16 on
        # v5e). Measured (scripts/exp_w8a8_vit.py, TPU v5e, 2026-08-18):
        # ViT-B/32 B=512 1.11x (10.2k -> 11.2k img/s), ViT-L/14 B=32
        # 1.27x (798 -> 1012 img/s); cosine vs fp32 >= 0.9995 on random
        # init. Stays opt-in until the real-weights gate blesses recall
        # (WEIGHTS.md par. 5). Text tower is untouched — queries keep
        # full bf16 fidelity.
        self.quant = os.environ.get("IMATCH_EMBED_QUANT", "").strip().lower()
        if self.quant not in ("", "none", "int8"):
            raise ValueError(
                f"IMATCH_EMBED_QUANT={self.quant!r}: expected 'int8' or unset"
            )
        self._qvision = None
        if self.quant == "int8":
            from imatch_tpu.models.clip.quant import quantize_vision_tower

            self._qvision = quantize_vision_tower(self.params["vision"])
            # Drop the now-dead fp32/bf16 encoder matrices from the
            # master tree: the W8A8 path reads only LN/bias/stem/proj
            # from it, and keeping both copies resident costs ~1.2 GB
            # HBM at ViT-L/14 — exactly what the capacity profile
            # (largest corpus per chip) cannot afford.
            vl = self.params["vision"]["layers"]
            self.params = {
                **self.params,
                "vision": {
                    **self.params["vision"],
                    "layers": {
                        "ln1": vl["ln1"],
                        "ln2": vl["ln2"],
                        "attn": {
                            k: vl["attn"][k]
                            for k in ("bq", "bk", "bv", "bo")
                        },
                        "mlp": {
                            "b1": vl["mlp"]["b1"],
                            "b2": vl["mlp"]["b2"],
                        },
                    },
                },
            }
            logger.info("image tower quantized: W8A8 int8 (opt-in)")
        self.tokenizer = default_tokenizer()
        self._lock = threading.Lock()
        # Query-embedding LRU: repeated text queries skip the tokenizer
        # and the text tower entirely and reuse the device-resident
        # (proj,) vector (~3 KB/entry; embeddings are deterministic per
        # text for fixed params, and jax arrays are immutable so one
        # buffer can feed concurrent queries). The reference re-embeds
        # every request (/root/reference/utils.py:83-100). Capacity
        # IMATCH_TEXT_CACHE entries, default 1024; 0 disables.
        self._text_cache_cap = int(os.environ.get("IMATCH_TEXT_CACHE", "1024"))
        self._text_cache: "OrderedDict[str, jax.Array]" = OrderedDict()

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
            # the fused bulk-ingest step shards its frame batch the same
            # way (resample-matrix constants replicated) — without this
            # the highest-throughput path would replicate every frame to
            # all dp devices and compute the full batch dp times
            fused_shardings = dict(
                in_shardings=(
                    None,
                    NamedSharding(mesh, P("data")),
                    None,
                    None,
                    None,
                    None,
                ),
            )
            self.params = jax.tree.map(
                lambda x: jax.device_put(x, NamedSharding(mesh, P())),
                self.params,
            )
            if self._qvision is not None:
                self._qvision = jax.tree.map(
                    lambda x: jax.device_put(x, NamedSharding(mesh, P())),
                    self._qvision,
                )

        # The image-tower jitted fns take ONE weights arg: the params
        # tree (bf16 path) or a (params, qvision) tuple (int8 path) —
        # weights are jit ARGUMENTS, never closure captures (closed-over
        # device arrays become HLO literals; a ViT tower's literals
        # overflow remote-compile request limits).
        if self._qvision is not None:
            from imatch_tpu.models.clip.quant import encode_image_w8a8

            self._img_weights = (self.params, self._qvision)

            def _img_core(weights, pixels):
                return encode_image_w8a8(
                    weights[0], weights[1], pixels, cfg, dtype=dt
                )

        else:
            self._img_weights = self.params

            def _img_core(weights, pixels):
                return encode_image(weights, pixels, cfg, dtype=dt)

        @functools.partial(jax.jit, **shardings)
        def _img_fn(weights, pixels):
            return _img_core(weights, pixels)

        @functools.partial(jax.jit, **shardings)
        def _txt_fn(params, tokens):
            return encode_text(params, tokens, cfg, dtype=dt, eos_token_id=eos_id)

        if not (data_parallel and data_parallel > 1):
            fused_shardings = {}

        @functools.partial(jax.jit, **fused_shardings)
        def _fused_fn(weights, frames_u8, a_v_c, a_h_c, a_v_p, a_h_p):
            """Fused bulk-ingest step: the uint8 frames are uploaded to
            HBM ONCE and both consumers read them there — CLIP preprocess
            + tower AND the pHash dedup bits (+ the exact 32x32 grids
            for the cheap host fallback). The separate-path alternative
            uploads every frame twice (and the host<->device link, PCIe
            or tunnel, is the ingest bottleneck long before the MXU
            is)."""
            from imatch_tpu.ops.phash import phash_core
            from imatch_tpu.ops.preprocess import preprocess_core

            pixels = preprocess_core(frames_u8, a_v_c, a_h_c, dtype=dt)
            emb = _img_core(weights, pixels)
            bits, conf, small = phash_core(frames_u8, a_v_p, a_h_p)
            return emb, bits, conf, small

        self._img_fn = _img_fn
        self._txt_fn = _txt_fn
        self._fused_fn = _fused_fn
        logger.info(
            "embedder ready in %.2fs (dp=%d)", time.time() - t0, self.dp or 1
        )

    @property
    def dim(self) -> int:
        return self.cfg.projection_dim

    def _chunk_bounds(self, n: int, chunk: int):
        """Split n rows into device batches: each chunk is padded up to a
        power of two, then to a multiple of the dp mesh (sharding over
        'data' requires batch % dp == 0 for ANY dp, not just powers of
        two). Distinct folder sizes reuse at most ~log2(chunk) compiled
        variants instead of one per size, and huge uploads stream through
        the tower in bounded-HBM pieces. (utils/batching.pow2_bucket is
        the one shared policy.)"""
        from imatch_tpu.utils.batching import pow2_bucket

        d = self.dp or 1
        for s in range(0, n, chunk):
            b = min(chunk, n - s)
            yield s, b, pow2_bucket(b, max(chunk, d), multiple=d)

    def _embed_pixels(self, pixels) -> jax.Array:
        chunk = int(os.environ.get("IMATCH_EMBED_CHUNK", "512"))
        n = pixels.shape[0]
        outs = []
        with self._lock, METRICS.timer("embed.image"):
            for s, b, bp in self._chunk_bounds(n, chunk):
                part = pixels[s : s + b]
                if bp > b:
                    part = jnp.concatenate(
                        [part, jnp.tile(part[-1:], (bp - b, 1, 1, 1))]
                    )
                outs.append(self._img_fn(self._img_weights, part)[:b])
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs)

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
        return np.asarray(self._embed_pixels(pixels))

    def _embed_tokens(self, tokens: np.ndarray) -> jax.Array:
        chunk = int(os.environ.get("IMATCH_EMBED_CHUNK", "512"))
        n = len(tokens)
        outs = []
        with self._lock, METRICS.timer("embed.text"):
            for s, b, bp in self._chunk_bounds(n, chunk):
                part = tokens[s : s + b]
                if bp > b:
                    part = np.concatenate(
                        [part, np.tile(part[-1:], (bp - b, 1))]
                    )
                outs.append(self._txt_fn(self.params, jnp.asarray(part))[:b])
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs)

    def _tokenize(self, texts: Sequence[str]) -> np.ndarray:
        tokens = np.asarray(
            self.tokenizer.encode_batch(
                texts, max_length=self.cfg.text.max_positions
            )
        )
        if self._fold_vocab:
            is_eos = tokens == self.tokenizer.eos_id
            tokens = np.where(
                is_eos,
                self._model_eos,
                tokens % (self.cfg.text.vocab_size - 1),
            )
        return tokens

    def embed_texts(self, texts: Sequence[str]) -> np.ndarray:
        """Strings -> (N, proj) unit fp32, 248-token padded tokenization."""
        if len(texts) == 0:
            return np.zeros((0, self.dim), dtype=np.float32)
        return np.asarray(self._embed_tokens(self._tokenize(texts)))

    def embed_image(self, image: np.ndarray) -> np.ndarray:
        return self.embed_images([image])[0]

    def embed_text(self, text: str) -> np.ndarray:
        return self.embed_texts([text])[0]

    def embed_text_device(self, text: str) -> jax.Array:
        """Like embed_text but returns the (proj,) embedding WITHOUT
        materializing to host. Feeding this straight into
        VectorStore.query chains the text tower and the index matmul on
        device — the whole text-search request then pays exactly one
        blocking device->host transfer (the top-k result) instead of two.

        Repeated query texts are served from the embedder's LRU (see
        __init__): a cache hit costs no dispatch at all, so a hot query
        pays only the index round-trip."""
        if self._text_cache_cap > 0:
            with self._lock:
                emb = self._text_cache.get(text)
                if emb is not None:
                    self._text_cache.move_to_end(text)
                    METRICS.inc("embed.text_cache_hit")
                    return emb
        emb = self._embed_tokens(self._tokenize([text]))[0]
        if self._text_cache_cap > 0:
            with self._lock:
                self._text_cache[text] = emb
                self._text_cache.move_to_end(text)
                while len(self._text_cache) > self._text_cache_cap:
                    self._text_cache.popitem(last=False)
        return emb

    def embed_texts_device(self, texts: Sequence[str]) -> jax.Array:
        """Batch variant of embed_text_device: (Q, proj) embeddings left
        on device. One text-tower dispatch for all Q queries; chained into
        VectorStore.query the whole batch pays one blocking transfer, so
        the per-query cost amortizes the host<->device round-trip Q ways
        (the batched-search serving path)."""
        if len(texts) == 0:
            return jnp.zeros((0, self.dim), jnp.float32)
        return self._embed_tokens(self._tokenize(list(texts)))

    def embed_image_device(self, image: np.ndarray) -> jax.Array:
        """Device-resident single-image embedding (see embed_text_device)."""
        pixels = preprocess_images(
            [image],
            out_size=self.cfg.vision.image_size,
            dtype=self.compute_dtype,
        )
        return self._embed_pixels(pixels)[0]

    def embed_images_device(self, images: Sequence[np.ndarray]) -> jax.Array:
        """Batch variant of embed_image_device: (N, proj) embeddings left
        on device. Chained into VectorStore.query the whole image batch
        pays one blocking device->host transfer (the batched image-search
        path). Like embed_image_device, does NOT count toward the
        ``images_embedded`` ingest metric — these are query images.

        Query images arrive at arbitrary resolution and preprocess
        materializes each frame as fp32 on device BEFORE the resize, so
        a full 256-image batch of camera photos would be tens of GB of
        transient HBM. Chunked by a source-pixel budget
        (IMATCH_QUERY_PIXEL_BUDGET, default 2^26 px ~= 0.8 GB fp32):
        transient memory stays bounded regardless of batch size, while
        small/low-res batches still go through in one dispatch. The
        post-resize tower is chunked separately by _embed_pixels."""
        budget = int(
            os.environ.get("IMATCH_QUERY_PIXEL_BUDGET", str(1 << 26))
        )
        n = len(images)
        if n == 0:
            return jnp.zeros((0, self.dim), jnp.float32)
        outs = []
        start = 0
        while start < n:
            end, px = start, 0
            while end < n:
                im_px = images[end].shape[0] * images[end].shape[1]
                if end > start and px + im_px > budget:
                    break
                px += im_px
                end += 1
            pixels = preprocess_images(
                images[start:end],
                out_size=self.cfg.vision.image_size,
                dtype=self.compute_dtype,
            )
            outs.append(self._embed_pixels(pixels))
            start = end
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs)

    def ids_and_embed_images_stream(
        self,
        images: Sequence[np.ndarray],
        pool=None,
        max_in_flight: int = 4,
        device_embeddings: bool = False,
    ):
        """Bulk-ingest fast path, streamed: pHash ids AND CLIP embeddings
        from one device upload per geometry chunk (the fused _fused_fn
        step), yielded per chunk so the CALLER's host stages (dup check,
        PNG encode, store insert) overlap the device work of later
        chunks — the reference runs this whole chain serially per image
        (/root/reference/backend/app/main.py:613-746).

        Up to ``max_in_flight`` device chunks are dispatched ahead of the
        consumer (bounding frames resident in HBM); each yield is one
        blocking fetch of an already-dispatched chunk, so the device and
        the host<->device link stay busy while the consumer works.

        Same-geometry runs of >= phash.DEVICE_BUCKET_MIN images go
        through the fused kernel; margin-confident device hashes are
        used directly (provably the host id — ops/phash.py), the rest
        take the fp64 small-grid tail, and small buckets fall back to
        the threaded host hash (see image_ids_batch for the one
        measured-rare divergence case). None entries (failed decodes)
        are not yielded.

        Yields (indices, ids, embeddings (len(indices), proj) fp32).

        With ``device_embeddings=True`` the big-bucket chunks yield
        their embeddings as jax.Arrays still ON DEVICE (only the hash
        bits/confidence cross the link per chunk) — for consumers that
        insert device-resident (store.add with a jax.Array scatters d2d,
        index/patch.py) so the embedding matrix never round-trips the
        host. The small-bucket tail still yields numpy; consumers must
        accept either.
        """
        from PIL import Image as _Image

        from imatch_tpu.ops.phash import (
            DEVICE_BUCKET_MIN,
            bits_to_hex,
            host_bits_from_small,
            image_id as _host_image_id,
        )
        from imatch_tpu.ops.resize import resample_matrix, resize_crop_matrices

        buckets: dict = {}
        for i, im in enumerate(images):
            if im is not None:
                buckets.setdefault(im.shape[:2], []).append(i)

        chunk = int(os.environ.get("IMATCH_EMBED_CHUNK", "512"))
        # small geometry buckets: host hash + normal embed path
        small_idx: list = []
        out_size = self.cfg.vision.image_size

        # Phase 1: dispatch device chunks for every big bucket, yielding
        # finished chunks once the in-flight window fills. The lock is
        # held only around each dispatch — fetches happen outside it, so
        # concurrent embed calls interleave instead of serializing behind
        # a whole-batch critical section.
        in_flight: list = []  # (idxs_chunk, device (e, bits, conf))

        def _drain_one():
            idxs_chunk, handles = in_flight.pop(0)
            if device_embeddings:
                e = handles[0]  # stays on device for a d2d store insert
                bits, conf, small = jax.device_get(handles[1:])
            else:
                e, bits, conf, small = jax.device_get(handles)
            # metric counted per FINISHED chunk: a stream that dies
            # mid-bucket must not pre-count work the caller's fallback
            # (embed_images, which counts too) will redo
            METRICS.inc("images_embedded", len(idxs_chunk))
            ids_c: list = [None] * len(idxs_chunk)
            for j in range(len(idxs_chunk)):
                if conf[j]:
                    ids_c[j] = f"img_{bits_to_hex(bits[j])}"
                else:
                    # exact fp64 DCT on the fetched 32x32 grid (~60 us)
                    # instead of a full host re-hash (~5 ms) — keeps the
                    # fallback off the critical path entirely
                    ids_c[j] = f"img_{host_bits_from_small(small[j])}"
            return idxs_chunk, ids_c, e

        for (h, w), idxs in buckets.items():
            if len(idxs) < DEVICE_BUCKET_MIN:
                small_idx.extend(idxs)
                continue
            a_v_c, a_h_c = resize_crop_matrices(h, w, out_size)
            a_v_p = resample_matrix(h, 32, "lanczos", quantize_8bpc=True)
            a_h_p = resample_matrix(w, 32, "lanczos", quantize_8bpc=True)
            consts = tuple(
                jnp.asarray(m) for m in (a_v_c, a_h_c, a_v_p, a_h_p)
            )
            for s, b, bp in self._chunk_bounds(len(idxs), chunk):
                GATE.checkpoint()  # bulk ingest yields to live searches
                part = np.stack([images[i] for i in idxs[s : s + b]])
                with self._lock, METRICS.timer("ingest.fused"):
                    dev = jnp.asarray(part)
                    if bp > b:
                        dev = jnp.concatenate(
                            [dev, jnp.tile(dev[-1:], (bp - b, 1, 1, 1))]
                        )
                    e, bits, conf, small = self._fused_fn(
                        self._img_weights, dev, *consts
                    )
                in_flight.append(
                    (
                        idxs[s : s + b],
                        (e[:b], bits[:b], conf[:b], small[:b]),
                    )
                )
                if len(in_flight) >= max_in_flight:
                    yield _drain_one()
        while in_flight:
            yield _drain_one()

        # Phase 2: the leftovers (small geometry buckets) — plain embed
        # path plus threaded host hashes, one final yield.
        if small_idx:
            rest = self.embed_images([images[i] for i in small_idx])
            ids_r: list = [None] * len(small_idx)
            order = {i: j for j, i in enumerate(small_idx)}

            def host_one(i):
                return i, _host_image_id(_Image.fromarray(images[i]))

            if pool is not None and len(small_idx) > 1:
                for i, id_ in pool.map(host_one, small_idx):
                    ids_r[order[i]] = id_
            else:
                for i in small_idx:
                    ids_r[order[i]] = host_one(i)[1]
            yield small_idx, ids_r, rest

    def ids_and_embed_images(self, images: Sequence[np.ndarray], pool=None):
        """Whole-batch form of ids_and_embed_images_stream: returns
        (ids: List[Optional[str]], embeddings: (N, proj) fp32) with None
        ids / zero rows for None entries (failed decodes)."""
        n = len(images)
        ids: list = [None] * n
        emb = np.zeros((n, self.dim), np.float32)
        for idxs, ids_c, e in self.ids_and_embed_images_stream(images, pool):
            for j, i in enumerate(idxs):
                ids[i] = ids_c[j]
                emb[i] = e[j]
        return ids, emb


@functools.lru_cache()
def get_embedder() -> ClipEmbedder:
    """Process-wide singleton, mirroring utils.load_clip_model caching."""
    return ClipEmbedder()

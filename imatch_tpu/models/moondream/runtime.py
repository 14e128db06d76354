"""MoondreamJax — the in-process captioner/VQA service.

Drop-in for the reference's moondream handle
(/root/reference/backend/app/main.py:99-115 ``md.vl()``):
``encode_image`` / ``caption`` / ``query`` with dict results. All compute
is jitted JAX on the default backend; the vision encoding is cached per
image (the reference persists it as a .pt file, main.py:647-651 — here
it's an (P, D) fp32 array in an .npz via pipeline/captioner.py).

Yes/no questions ("Yes or No: ..." — the filter subsystem's entire
traffic, main.py:905-913) short-circuit generation: one prefill and a
yes-vs-no logit comparison (generate.vqa_yes_no).

Config/weights: IMATCH_MD_CONFIG selects the geometry (default tiny-md
offline, moondream2 when IMATCH_MD_CHECKPOINT is set);
IMATCH_MD_VOCAB/IMATCH_MD_MERGES load a real GPT-2 vocab, else the
deterministic byte-fallback vocab.

Static-shape note: prompts are tokenized to their exact length, so each
distinct (batch, prompt_len) pair compiles once; the caption prompt is
constant and filter queries are short and few, keeping the compile set
small.
"""

from __future__ import annotations

import functools
import os
import threading
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from imatch_tpu.models.moondream.configs import get_md_config
from imatch_tpu.models.moondream.generate import (
    finish_gen,
    gen_segment,
    greedy_generate,
    init_gen_state,
    prefill,
    vqa_yes_no,
)
from imatch_tpu.models.moondream.model import (
    encode_image_features,
    init_md_params,
)
from imatch_tpu.ops.resize import resample_matrix
from imatch_tpu.ops.tokenizer_gpt2 import GPT2Tokenizer
from imatch_tpu.utils.batching import pad_rows, pow2_bucket, to_rgb
from imatch_tpu.utils.metrics import METRICS

CAPTION_PROMPT = "\n\nQuestion: Describe this image.\n\nAnswer:"


def _is_yes_no(question: str) -> bool:
    ql = question.lower()
    return "yes or no:" in ql or "yes/no:" in ql


class MoondreamJax:
    available = True

    def __init__(self, config: Optional[str] = None, checkpoint: Optional[str] = None):
        checkpoint = checkpoint or os.environ.get("IMATCH_MD_CHECKPOINT")
        config = config or os.environ.get(
            "IMATCH_MD_CONFIG", "moondream2" if checkpoint else "tiny-md"
        )
        self.cfg = get_md_config(config)
        if checkpoint:
            from imatch_tpu.models.moondream.convert import load_md_checkpoint

            self.params = jax.tree.map(
                jnp.asarray, load_md_checkpoint(checkpoint, self.cfg)
            )
        else:
            self.params = init_md_params(jax.random.key(0), self.cfg)
        on_tpu = jax.default_backend() == "tpu"
        # Param storage dtype: decode streams every weight each step, so
        # fp32 storage doubles the HBM traffic AND the footprint
        # (moondream2: 7.4 GB fp32 -> 3.7 GB bf16). bf16 storage is the
        # TPU default; IMATCH_MD_PARAM_DTYPE=fp32 opts out.
        pdt = os.environ.get(
            "IMATCH_MD_PARAM_DTYPE", "bf16" if on_tpu else "fp32"
        )
        if pdt not in ("bf16", "bfloat16", "fp32", "float32"):
            raise ValueError(
                f"unknown IMATCH_MD_PARAM_DTYPE {pdt!r}; valid: bf16, fp32"
                " (int8 decode is IMATCH_MD_QUANT=int8)"
            )
        if pdt in ("bf16", "bfloat16"):
            self.params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32
                else x,
                self.params,
            )
        # Packed QKV+MLP projection: one matmul dispatch instead of four
        # per decoder layer per step (model.pack_text_layers).
        if os.environ.get("IMATCH_MD_PACKED", "1") != "0":
            from imatch_tpu.models.moondream.model import pack_text_layers

            self.params = pack_text_layers(self.params)
        # Opt-in int8 weight-only storage for the decoder + lm_head:
        # halves decode's weight streaming vs bf16 (model.quantize_int8).
        # Off by default pending a real-weights caption-quality check.
        if os.environ.get("IMATCH_MD_QUANT", "") == "int8":
            from imatch_tpu.models.moondream.model import quantize_int8

            self.params = quantize_int8(self.params)
        # Opt-in W8A8 prefill (IMATCH_MD_ACT=int8): prefill/VQA matmuls
        # run int8 x int8 on the MXU (compute-bound surfaces); decode
        # steps stay weight-only (Sq=1 is weight-streaming-bound).
        # Needs the int8 weights above — fail loudly, not silently slow.
        md_act = os.environ.get("IMATCH_MD_ACT", "").strip().lower()
        if md_act not in ("", "none", "int8"):
            raise ValueError(
                f"IMATCH_MD_ACT={md_act!r}: expected 'int8' or unset"
            )
        self.act_quant = md_act == "int8"
        if self.act_quant and os.environ.get("IMATCH_MD_QUANT", "") != "int8":
            raise ValueError(
                "IMATCH_MD_ACT=int8 (W8A8 prefill) requires "
                "IMATCH_MD_QUANT=int8 (the int8 weights it contracts with)"
            )
        vocab = os.environ.get("IMATCH_MD_VOCAB")
        merges = os.environ.get("IMATCH_MD_MERGES")
        if vocab and merges:
            self.tokenizer = GPT2Tokenizer.from_files(vocab, merges)
        else:
            if checkpoint and os.environ.get(
                "IMATCH_MD_ALLOW_BYTE_VOCAB", ""
            ) != "1":
                # Real weights + the offline byte-fallback vocab produce
                # silently-garbage captions/VQA (byte ids mean nothing to
                # the model; its eos id isn't in the byte table). Refuse
                # loudly instead — see WEIGHTS.md for the vocab files.
                raise RuntimeError(
                    "IMATCH_MD_CHECKPOINT is set but IMATCH_MD_VOCAB/"
                    "IMATCH_MD_MERGES are not: real moondream weights "
                    "need the real GPT-2 vocab (WEIGHTS.md). Set "
                    "IMATCH_MD_ALLOW_BYTE_VOCAB=1 to override."
                )
            self.tokenizer = GPT2Tokenizer.byte_fallback(
                bos_id=min(256, self.cfg.text.vocab_size - 2),
                eos_id=min(257, self.cfg.text.vocab_size - 1),
            )
        self.dtype = (
            jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        )
        self._lock = threading.Lock()
        size = self.cfg.vision.image_size
        self._resize_cache: Dict[tuple, tuple] = {}
        self._size = size

        cfg, dt = self.cfg, self.dtype
        aq = self.act_quant

        @jax.jit
        def _encode(params, pixels):
            return encode_image_features(params, pixels, cfg, dtype=dt)

        # int8 KV cache (opt-in): decode streams the whole cache every
        # step, so halving its bytes is decode time at batch >= 8.
        cache_dt = (
            jnp.int8
            if os.environ.get("IMATCH_MD_CACHE", "") == "int8"
            else None
        )

        @functools.partial(jax.jit, static_argnames=("max_new",))
        def _generate(params, feats, tokens, max_new):
            logits, cache, pos = prefill(
                params, cfg, feats, tokens, dtype=dt, max_new=max_new,
                cache_dtype=cache_dt, act_quant=aq,
            )
            return greedy_generate(
                params, cfg, logits, cache, pos, max_new=max_new, dtype=dt
            )

        # Segmented decode (IMATCH_MD_SEG > 0): prefill + decode split
        # into bounded dispatches so index queries can slot between
        # segments instead of waiting out a whole caption batch
        # (runtime/scheduler.py; measured 12.7x search-p50 inflation
        # behind the monolithic dispatch, docs/DESIGN.md).
        @functools.partial(jax.jit, static_argnames=("max_new",))
        def _gen_prefill(params, feats, tokens, max_new):
            logits, cache, pos = prefill(
                params, cfg, feats, tokens, dtype=dt, max_new=max_new,
                cache_dtype=cache_dt, act_quant=aq,
            )
            return init_gen_state(cfg, logits, cache, pos, max_new=max_new)

        # donate the carried state: without it, XLA cannot alias the KV
        # cache across segment dispatches and segmented decode would
        # transiently hold ~3 full caches (prev + input + output) — a
        # pure HBM regression vs the monolithic while_loop's in-place
        # aliasing. The separate `i` output gives the driver a tiny
        # fetchable tick that is NOT part of the donated buffers.
        @functools.partial(
            jax.jit,
            static_argnames=("steps", "max_new"),
            donate_argnums=(1,),
        )
        def _gen_segment(params, state, steps, max_new):
            nxt = gen_segment(
                params, cfg, state, steps=steps, max_new=max_new, dtype=dt
            )
            return nxt, nxt.i

        self._encode_fn = _encode
        self._generate_fn = _generate
        self._gen_prefill_fn = _gen_prefill
        self._gen_segment_fn = _gen_segment

        tok = self.tokenizer
        yes_ids = tok.token_ids_for_word("yes") or [
            tok.encode("Y")[0],
            tok.encode("y")[0],
        ]
        no_ids = tok.token_ids_for_word("no") or [
            tok.encode("N")[0],
            tok.encode("n")[0],
        ]
        self._yes_ids = tuple(yes_ids)
        self._no_ids = tuple(no_ids)

        @jax.jit
        def _vqa(params, feats, tokens):
            return vqa_yes_no(
                params, cfg, feats, tokens, self._yes_ids, self._no_ids,
                dtype=dt, act_quant=aq,
            )

        self._vqa_fn = _vqa

    # -- image encoding -------------------------------------------------

    def _preprocess(self, image) -> jnp.ndarray:
        """PIL image or HWC uint8 array -> (1, S, S, 3) in [-1, 1].

        Full-frame SQUASH resize to (S, S), not shortest-edge + center
        crop: moondream2's trained preprocessing resizes the whole frame
        (378x378 bicubic), so a crop would silently discard the edges of
        non-square images — content a caption or a yes/no filter answer
        must still see."""
        arr = to_rgb(image)
        h, w = arr.shape[:2]
        key = (h, w)
        if key not in self._resize_cache:
            if len(self._resize_cache) >= 64:  # bound device-array growth
                self._resize_cache.pop(next(iter(self._resize_cache)))
            a_v = resample_matrix(h, self._size, "bicubic")
            a_h = resample_matrix(w, self._size, "bicubic")
            self._resize_cache[key] = (jnp.asarray(a_v), jnp.asarray(a_h))
        a_v, a_h = self._resize_cache[key]
        # native-dtype upload (uint8 normally), device-side cast: bit-
        # equal float values at a quarter of the h2d bytes
        x = jnp.asarray(arr)[None].astype(jnp.float32)
        x = jnp.einsum("xw,bhwc->bhxc", a_h, x)
        x = jnp.einsum("yh,bhxc->byxc", a_v, x)
        return x * (2.0 / 255.0) - 1.0  # SigLIP normalization (mean=std=.5)

    def encode_image(self, image) -> Dict[str, np.ndarray]:
        with self._lock, METRICS.timer("vlm.encode"):
            pixels = self._preprocess(image)
            feats = self._encode_fn(self.params, pixels)
            return {"features": np.asarray(feats[0], np.float32)}

    def _feats(self, encoded: Any) -> jnp.ndarray:
        if isinstance(encoded, dict):
            f = encoded["features"]
        else:
            f = encoded
        f = jnp.asarray(f, jnp.float32)
        return f[None] if f.ndim == 2 else f

    # -- generation -------------------------------------------------------

    def _prompt_id_list(self, text: str, max_new: int = 0) -> list:
        """Tokenize, truncated so prompt + image patches + max_new decode
        steps all fit max_seq — otherwise decode would write past the KV
        cache end (dynamic_update_slice rejects the oversized update).
        EVERY prompt entering prefill — single or batched — must pass
        through this budget."""
        ids = [self.tokenizer.bos_id] + self.tokenizer.encode(text)
        budget = (
            self.cfg.text.max_seq - self.cfg.vision.num_patches - max_new - 1
        )
        return ids[: max(budget, 1)]

    def _prompt_ids(self, text: str, max_new: int = 0) -> jnp.ndarray:
        return jnp.asarray([self._prompt_id_list(text, max_new)], jnp.int32)

    def caption(self, encoded: Any, max_new: int = 48) -> Dict[str, str]:
        seg = int(os.environ.get("IMATCH_MD_SEG", "8"))
        with self._lock, METRICS.timer("vlm.caption"):
            feats = self._feats(encoded)
            tokens = self._prompt_ids(CAPTION_PROMPT, max_new=max_new)
            if seg > 0 and seg < max_new:
                result = self._generate_segmented(feats, tokens, max_new, seg)
            else:
                result = self._generate_fn(self.params, feats, tokens, max_new)
            text = self.tokenizer.decode(
                np.asarray(result.tokens[0])[: int(result.lengths[0])]
            )
            return {"caption": text.strip()}

    def query(self, encoded: Any, question: str, max_new: int = 32) -> Dict[str, str]:
        with self._lock, METRICS.timer("vlm.query"):
            feats = self._feats(encoded)
            prompt = f"\n\nQuestion: {question}\n\nAnswer:"
            tokens = self._prompt_ids(prompt, max_new=max_new)
            if _is_yes_no(question):
                is_yes = self._vqa_fn(self.params, feats, tokens)
                return {"answer": "Yes" if bool(is_yes[0]) else "No"}
            seg = int(os.environ.get("IMATCH_MD_SEG", "8"))
            if seg > 0 and seg < max_new:
                result = self._generate_segmented(feats, tokens, max_new, seg)
            else:
                result = self._generate_fn(self.params, feats, tokens, max_new)
            text = self.tokenizer.decode(
                np.asarray(result.tokens[0])[: int(result.lengths[0])]
            )
            return {"answer": text.strip()}

    # -- batched paths (the TPU-native win over the reference) ------------
    #
    # Every batch streams through FIXED-size device chunks (last chunk
    # padded by repeating a row): a whole-folder batch would both blow
    # HBM (the KV cache is ~200 MB/row at moondream2 geometry — 2048
    # captions at once is a ~400 GB cache) and compile one XLA variant
    # per distinct folder size. Chunking bounds both: one compiled
    # variant per path, cache/activations capped at chunk rows.

    def encode_image_batch(self, images) -> list:
        """Vision-encode a batch in fixed chunks (IMATCH_VLM_ENC_CHUNK,
        default 16). _preprocess maps every geometry to the same
        (S, S, 3) input, so chunks span the WHOLE batch in order —
        grouping by raw size would fragment mixed-size uploads into
        singleton dispatches for nothing."""
        chunk = int(os.environ.get("IMATCH_VLM_ENC_CHUNK", "16"))
        arrs = [to_rgb(im) for im in images]
        out: list = [None] * len(arrs)
        from imatch_tpu.runtime.scheduler import GATE

        with self._lock, METRICS.timer("vlm.encode_batch"):
            for s in range(0, len(arrs), chunk):
                # bulk stream: park between chunks while live searches
                # are in flight (every other bulk device path does)
                GATE.checkpoint()
                part = list(range(s, min(s + chunk, len(arrs))))
                pix = jnp.concatenate(
                    [self._preprocess(arrs[i]) for i in part], axis=0
                )
                pix = pad_rows(pix, pow2_bucket(len(part), chunk))
                feats = self._encode_fn(self.params, pix)
                feats = np.asarray(feats, np.float32)
                for j, i in enumerate(part):
                    out[i] = {"features": feats[j]}
        return out

    def caption_batch(self, encoded_list, max_new: int = 48) -> list[str]:
        """Batched prefill + shared decode loops for N captions, in
        fixed-size chunks (IMATCH_VLM_CAP_CHUNK, default 16 — the
        decode KV cache is the HBM budget; prefill no longer double-
        materializes it, see generate.prefill). The reference decodes
        captions one network call at a time."""
        if not encoded_list:
            return []
        chunk = int(os.environ.get("IMATCH_VLM_CAP_CHUNK", "16"))
        seg = int(os.environ.get("IMATCH_MD_SEG", "8"))
        ids = self._prompt_id_list(CAPTION_PROMPT, max_new=max_new)
        n = len(encoded_list)
        texts: list = []
        with self._lock, METRICS.timer("vlm.caption_batch"):
            for s in range(0, n, chunk):
                part = encoded_list[s : s + chunk]
                b = pow2_bucket(len(part), chunk)
                feats = pad_rows(
                    jnp.concatenate([self._feats(e) for e in part], axis=0),
                    b,
                )
                tokens = jnp.asarray([ids] * b, jnp.int32)
                if seg > 0 and seg < max_new:
                    result = self._generate_segmented(
                        feats, tokens, max_new, seg
                    )
                else:
                    result = self._generate_fn(
                        self.params, feats, tokens, max_new
                    )
                toks = np.asarray(result.tokens)
                lens = np.asarray(result.lengths)
                texts.extend(
                    self.tokenizer.decode(toks[i][: int(lens[i])]).strip()
                    for i in range(len(part))
                )
        return texts

    def _generate_segmented(self, feats, tokens, max_new: int, seg: int):
        """Prefill + decode as bounded dispatches with yield points.

        Between segments: GATE.checkpoint() parks this bulk stream while
        any index query is in flight (runtime/scheduler.py), and the
        PREVIOUS segment's tick (a scalar OUTPUT, not part of the
        donated state) is fetched after the next one is dispatched —
        the fetch overlaps the in-flight segment, so the device never
        idles, while the enqueue depth stays at ~1 segment. A search
        therefore waits at most one running + one queued segment
        (~2*seg decode steps) instead of prefill + max_new. The carry
        itself is donated (see _gen_segment), so HBM holds ~one cache
        like the monolithic loop."""
        from imatch_tpu.runtime.scheduler import GATE

        state = self._gen_prefill_fn(self.params, feats, tokens, max_new)
        prev_tick = None
        for _ in range(-(-max_new // seg)):
            GATE.checkpoint()
            state, tick = self._gen_segment_fn(self.params, state, seg, max_new)
            if prev_tick is not None:
                np.asarray(prev_tick)  # drain to depth ~1 (overlapped)
            prev_tick = tick
        return finish_gen(
            state, eos=self.cfg.text.eos_token_id, max_new=max_new
        )

    def query_yes_no_batch(self, encoded_list, question: str) -> list[bool]:
        """Prefill-only yes/no for a batch of images x one question, in
        fixed-size chunks (IMATCH_VLM_VQA_CHUNK, default 64; the
        prefill is CACHE-FREE — generate.vqa_yes_no — so the chunk is
        bounded by activations/attention scores, not a KV cache; 128
        measured fastest on v5e at moondream2 geometry, 64 leaves
        headroom for concurrent caption batches)."""
        if not encoded_list:
            return []
        chunk = int(os.environ.get("IMATCH_VLM_VQA_CHUNK", "64"))
        # max_new=1: prefill-only, but the prompt must still fit the
        # budget or the cache update itself overflows (a long filter
        # question crashed this path before the shared truncation).
        ids = self._prompt_id_list(
            f"\n\nQuestion: {question}\n\nAnswer:", max_new=1
        )
        n = len(encoded_list)
        out: list = []
        from imatch_tpu.runtime.scheduler import GATE

        with self._lock, METRICS.timer("vlm.query_batch"):
            for s in range(0, n, chunk):
                GATE.checkpoint()  # backfill yields to live searches
                part = encoded_list[s : s + chunk]
                b = pow2_bucket(len(part), chunk)
                feats = pad_rows(
                    jnp.concatenate([self._feats(e) for e in part], axis=0),
                    b,
                )
                tokens = jnp.asarray([ids] * b, jnp.int32)
                ans = self._vqa_fn(self.params, feats, tokens)
                out.extend(bool(a) for a in np.asarray(ans)[: len(part)])
        return out

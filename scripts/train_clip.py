"""Fine-tune CLIP on the indexed library — the framework's training CLI.

The reference serves a frozen checkpoint; production similarity search
wants domain adaptation, so this CLI contrastively fine-tunes the CLIP
towers on (processed image, description+caption) pairs straight out of
the app's own state directory, with DP+TP sharding over every local
device and checkpoint/resume.

Usage:
  python scripts/train_clip.py --root /path/to/app/root \\
      --config vit-b32 --steps 1000 --batch 64 --mp 1 \\
      --ckpt-dir ckpt [--resume] [--lr 1e-5] [--synthetic N]

--synthetic N trains on N random pairs (pipeline smoke-testing without
an indexed library).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
logger = logging.getLogger("imatch.train")


def load_library(root: str):
    """(image paths, texts) from an app state directory."""
    from imatch_tpu.index.store import VectorStore

    data_dir = os.path.join(
        root, os.environ.get("IMATCH_DATA_DIR", "index_data")
    )
    store = VectorStore.load(data_dir)
    got = store.get(include=["metadatas"])
    paths, texts = [], []
    for md in got["metadatas"]:
        md = md or {}
        p = md.get("processed_url") or ""
        if not os.path.exists(p):
            p = os.path.join(root, "static", "processed", f"{md.get('id')}.png")
        if not os.path.exists(p):
            continue
        text = " ".join(
            t for t in (md.get("description"), md.get("custom_metadata")) if t
        )
        paths.append(p)
        texts.append(text or md.get("filename", ""))
    return paths, texts


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=".")
    ap.add_argument("--config", default="vit-b32")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--mp", type=int, default=1, help="model-parallel size")
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--ckpt-dir", default="ckpt")
    ap.add_argument("--ckpt-every", type=int, default=100)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    # the axon TPU plugin ignores the JAX_PLATFORMS env var; honor it here
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from imatch_tpu.models.clip import get_config
    from imatch_tpu.ops.preprocess import preprocess_images
    from imatch_tpu.ops.tokenizer import default_tokenizer
    from imatch_tpu.parallel import (
        clip_param_specs,
        init_train_state,
        make_mesh,
        make_train_step,
    )
    from imatch_tpu.parallel.checkpoint import (
        latest_step,
        restore_checkpoint,
        save_checkpoint,
    )
    from imatch_tpu.parallel.train import make_optimizer
    from imatch_tpu.runtime.loader import default_loader

    cfg = get_config(args.config)
    mesh = make_mesh(model_parallel=args.mp)
    logger.info(
        "mesh: data=%d model=%d (%s)",
        mesh.shape["data"],
        mesh.shape["model"],
        jax.default_backend(),
    )

    dp = mesh.shape["data"]
    if args.batch % dp:
        new_batch = -(-args.batch // dp) * dp
        logger.warning(
            "batch %d not divisible by data-parallel size %d; using %d",
            args.batch,
            dp,
            new_batch,
        )
        args.batch = new_batch

    tx = make_optimizer(lr=args.lr)
    state, tx = init_train_state(jax.random.key(args.seed), cfg, tx, mesh=mesh)
    if args.resume and latest_step(args.ckpt_dir) is not None:
        state = restore_checkpoint(
            args.ckpt_dir, state, mesh=mesh, param_specs=clip_param_specs()
        )
        logger.info("resumed from step %d", int(state.step))
    step_fn = make_train_step(
        cfg,
        tx,
        mesh=mesh,
        dtype=jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32,
    )

    rng = np.random.default_rng(args.seed)
    tok = default_tokenizer()
    size = cfg.vision.image_size

    if args.synthetic:
        n = args.synthetic
        frames = rng.integers(0, 256, (n, size, size, 3), dtype=np.uint8)
        texts = [f"synthetic sample {i}" for i in range(n)]

        def sample_batch():
            idx = rng.integers(0, n, args.batch)
            return [frames[i] for i in idx], [texts[i] for i in idx]

    else:
        paths, texts_all = load_library(args.root)
        if len(paths) < 2:
            logger.error(
                "library at %s has %d usable records; need >= 2 "
                "(or use --synthetic N)",
                args.root,
                len(paths),
            )
            return 2
        logger.info("library: %d image-text pairs", len(paths))
        loader = default_loader()

        def sample_batch():
            idx = rng.integers(0, len(paths), args.batch)
            imgs = loader.decode_batch([paths[i] for i in idx])
            # failed decodes (None) are replaced with the first good
            # image so the step's static batch shape holds
            good = next((g for g in imgs if g is not None), None)
            if good is None:
                raise RuntimeError(
                    "every image in the sampled batch failed to decode"
                )
            imgs = [g if g is not None else good for g in imgs]
            return imgs, [texts_all[i] for i in idx]

    t_log = time.time()
    start = int(state.step)
    for _ in range(start, args.steps):
        imgs, txts = sample_batch()
        pixels = preprocess_images(imgs, out_size=size)
        tokens = np.asarray(
            tok.encode_batch(txts, max_length=cfg.text.max_positions)
        )
        if tok.vocab_size > cfg.text.vocab_size:
            # Fold oversized tokenizer vocabs like the embedder does
            # (pipeline/embedder.py): eos maps to the model's eos id so
            # pooling stays at the true first-eos position; other ids fold
            # into [0, vocab-2] (configs keep eos at vocab-1, so folded
            # ids never alias eos — a blind clamp did, pooling at the
            # first clamped token instead).
            tokens = np.where(
                tokens == tok.eos_id,
                cfg.text.eos_token_id,
                tokens % (cfg.text.vocab_size - 1),
            )
        state, loss = step_fn(state, pixels, jnp.asarray(tokens))
        step = int(state.step)
        if step % 10 == 0 or time.time() - t_log > 30:
            logger.info("step %d loss %.4f", step, float(loss))
            t_log = time.time()
        if step % args.ckpt_every == 0 or step == args.steps:
            path = save_checkpoint(args.ckpt_dir, state)
            logger.info("checkpoint -> %s", path)
    if int(state.step) % args.ckpt_every != 0:
        save_checkpoint(args.ckpt_dir, state)
    logger.info("done at step %d", int(state.step))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

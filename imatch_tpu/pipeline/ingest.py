"""Ingest pipeline: the reference's ``process_image`` chain, batched.

Reference serial chain (/root/reference/backend/app/main.py:613-746):
phash -> dup check -> caption+encode -> save encoded -> optional rembg ->
save processed png -> description fallback -> caption into custom_metadata
-> CLIP embed -> apply existing filters -> collection.add -> cache.

``process_image`` preserves those semantics per image (including the
(metadata, is_new) return and dup short-circuit). ``process_batch`` is the
TPU-shaped path: it runs dedup + segmentation + preprocessing + CLIP
embedding for a whole upload batch in device-sized chunks, which is where
the >=5k img/s/chip BASELINE.md target comes from.
"""

from __future__ import annotations

import datetime
import io
import json
import logging
import os
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from imatch_tpu.ops.phash import image_id as phash_image_id
from imatch_tpu.ops.phash import image_ids_batch
from imatch_tpu.pipeline.captioner import save_encoded
from imatch_tpu.pipeline.filters import format_filter_query
from imatch_tpu.pipeline.state import AppState
from imatch_tpu.utils.batching import to_rgb
from imatch_tpu.utils.metrics import METRICS

logger = logging.getLogger("imatch.ingest")

# Host-side fan-out pools for bulk ingest (PIL and scipy release the GIL
# in their hot loops). TWO pools on purpose: pHash fallback hashing is on
# the CRITICAL path (the dup decision gates everything downstream), while
# PNG encodes are deferrable background work — sharing one FIFO pool put
# each chunk's hash fan-out behind the previous chunk's hundreds of
# queued saves (measured 3x e2e regression on a 1-core host).
_HOST_POOL: Optional[ThreadPoolExecutor] = None
_SAVE_POOL: Optional[ThreadPoolExecutor] = None
_POOL_LOCK = threading.Lock()


def _host_pool() -> ThreadPoolExecutor:
    global _HOST_POOL
    if _HOST_POOL is None:
        with _POOL_LOCK:  # two first-uploads must not race two pools
            if _HOST_POOL is None:
                _HOST_POOL = ThreadPoolExecutor(
                    max_workers=min(16, (os.cpu_count() or 4)),
                    thread_name_prefix="imatch-ingest",
                )
    return _HOST_POOL


def _save_pool() -> ThreadPoolExecutor:
    global _SAVE_POOL
    if _SAVE_POOL is None:
        with _POOL_LOCK:
            if _SAVE_POOL is None:
                _SAVE_POOL = ThreadPoolExecutor(
                    max_workers=min(8, (os.cpu_count() or 4)),
                    thread_name_prefix="imatch-save",
                )
    return _SAVE_POOL


def _now_iso() -> str:
    return datetime.datetime.now().isoformat()


def _gather_device_rows(chunks, pairs):
    """Assemble the (chunk_no, row) pairs of the device-resident ingest
    path into ONE device array in pair order — a gather per source
    chunk plus one permutation, all d2d, no host round-trip."""
    import jax.numpy as jnp

    ks = np.asarray([p[0] for p in pairs])
    js = np.asarray([p[1] for p in pairs])
    parts, order = [], []
    for k in np.unique(ks):
        sel = np.nonzero(ks == k)[0]
        parts.append(jnp.take(chunks[int(k)], jnp.asarray(js[sel]), axis=0))
        order.append(sel)
    order = np.concatenate(order)
    out = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    if np.array_equal(order, np.arange(order.size)):
        return out
    inv = np.empty_like(order)
    inv[order] = np.arange(order.size)
    return jnp.take(out, jnp.asarray(inv), axis=0)


def _materialize_rows(chunks, vals):
    """Mixed-path fallback: replace (chunk_no, row) pairs with host
    rows (one fetch per referenced chunk), pass numpy rows through."""
    cache: Dict[int, np.ndarray] = {}
    out = []
    for v in vals:
        if isinstance(v, tuple):
            k, j = v
            if k not in cache:
                cache[k] = np.asarray(chunks[k], np.float32)
            out.append(cache[k][j])
        else:
            out.append(v)
    return out


def _caption_and_encode(state: AppState, image_np: np.ndarray):
    """generate_image_caption equivalent (main.py:587-611)."""
    cap = state.captioner
    if not getattr(cap, "available", False):
        return None, None
    try:
        encoded = cap.encode_image(image_np)
        caption = cap.caption(encoded)["caption"]
        return caption, encoded
    except Exception as e:
        logger.error("error generating caption: %s", e)
        return None, None


def _apply_existing_filters(state: AppState, encoded) -> Optional[Dict[str, str]]:
    """Apply all saved filters to a new image (main.py:707-731)."""
    if encoded is None or not getattr(state.captioner, "available", False):
        return None
    filters = state.load_filters()
    if not filters:
        return None
    results: Dict[str, str] = {}
    for fq in filters:
        try:
            ans = state.captioner.query(encoded, format_filter_query(fq))["answer"]
            results[fq] = ans.strip() if isinstance(ans, str) else ans
        except Exception as e:
            logger.error("error applying filter %r: %s", fq, e)
            results[fq] = "error"
    return results


def process_image(
    state: AppState,
    image: Image.Image,
    filename: str,
    description: Optional[str] = None,
    custom_metadata: Optional[str] = None,
    remove_bg: bool = False,
) -> Tuple[dict, bool]:
    """Single-image ingest with reference semantics. Returns
    (metadata, is_new_upload); duplicates return the stored metadata."""
    image = image.convert("RGB") if image.mode != "RGB" else image
    img_id = phash_image_id(image)

    existing = state.store.get(ids=[img_id], include=["metadatas"])
    if existing["ids"]:
        logger.info("image %s already exists, skipping", img_id)
        return existing["metadatas"][0], False

    image_np = np.asarray(image)
    caption, encoded = _caption_and_encode(state, image_np)
    if encoded is not None:
        save_encoded(state.encoded_dir, img_id, encoded)

    clean_np = image_np
    if remove_bg and state.segmenter is not None:
        try:
            with METRICS.timer("segment"):
                clean_np = state.segmenter.remove_background(image_np)
        except Exception as e:
            logger.error("background removal error: %s", e)
            clean_np = image_np

    processed_path = os.path.join(state.processed_dir, f"{img_id}.png")
    Image.fromarray(clean_np).save(processed_path)

    if not description:
        description = os.path.splitext(filename)[0]

    processed_custom = custom_metadata or ""
    if caption:
        if processed_custom:
            processed_custom += "\n\n"
        processed_custom += caption

    # RGB for embedding even if the segmenter produced RGBA
    embed_np = to_rgb(clean_np)
    embedding = state.get_embedder().embed_image(embed_np)

    url = f"/static/processed/{img_id}.png"
    metadata = {
        "id": img_id,
        "filename": filename,
        "description": description,
        "custom_metadata": processed_custom,
        "url": url,
        "thumbnail_url": url,
        "processed_url": processed_path,
        "created_at": _now_iso(),
    }
    filter_results = _apply_existing_filters(state, encoded)
    if filter_results:
        metadata["filter_results_json"] = json.dumps(filter_results)

    with state.lock:
        try:
            state.store.add(
                ids=[img_id],
                embeddings=[embedding],
                metadatas=[metadata],
                documents=[description],
            )
        except ValueError:
            # lost a dup race: another thread added this id between the
            # early dup check and here (handlers run on a thread pool) —
            # return the stored duplicate instead of a 500
            existing = state.store.get(ids=[img_id], include=["metadatas"])
            return existing["metadatas"][0], False
        state.image_metadata[img_id] = metadata
    return metadata, True


# formats browsers render natively: safe to store the original bytes
# verbatim instead of re-encoding a PNG of the identical pixels
_RAW_EXTS = {".jpg", ".jpeg", ".png", ".webp", ".avif", ".gif"}


def _raw_bytes_render_identical(data: bytes) -> bool:
    """True when storing the encoded file verbatim renders the SAME
    image a re-encoded PNG of the decoded frame would: no EXIF
    orientation (browsers auto-rotate raw JPEGs; the decoded array we
    hashed/embedded — and the reference's re-encoded PNG — are
    unrotated) and not animated (only frame 1 was embedded). Header
    parse only, ~100 us — far cheaper than the PNG encode it avoids."""
    try:
        with Image.open(io.BytesIO(data)) as im:
            if getattr(im, "n_frames", 1) > 1:
                return False
            exif = im.getexif()
            if exif and exif.get(0x0112, 1) not in (None, 1):
                return False
    except Exception:
        return False
    return True


def _reap_orphan_saves(state, results, ids, save_futs, save_ext):
    """Delete processed files written for items later demoted to
    error/skipped (embed failure, add-race collision, failed save) —
    otherwise repeated failing bulk ingests accumulate unbounded orphan
    files. A path another record actually points at (the collision
    winner's) is kept."""
    keep = set()
    for i in save_futs:
        r = results[i]
        if r is not None and r.get("status") == "success":
            keep.add(os.path.join(state.processed_dir, f"{ids[i]}{save_ext[i]}"))
    for i in list(save_futs):
        r = results[i]
        if r is None or r.get("status") == "success":
            continue
        try:
            save_futs[i].result()
        except Exception:
            pass
        path = os.path.join(state.processed_dir, f"{ids[i]}{save_ext[i]}")
        if path in keep:
            continue
        with state.lock:
            winner = state.image_metadata.get(ids[i])
        if winner and winner.get("processed_url") == path:
            continue  # a concurrent winner owns this exact file
        try:
            os.unlink(path)
        except OSError:
            pass


def process_batch(
    state: AppState,
    images: Sequence[Image.Image],
    filenames: Sequence[str],
    remove_bg: bool = False,
    raw_bytes: Optional[Sequence[Optional[bytes]]] = None,
) -> List[dict]:
    """Batched ingest: one device pass for embeddings instead of the
    reference's per-file serial loop (main.py:1124-1188).

    ``images`` entries may be PIL Images or decoded RGB uint8 numpy
    arrays (the native loader's output — passing those directly skips a
    full-frame PIL->numpy copy per image).

    ``raw_bytes``: the original encoded files, when the caller has them.
    Without background removal the processed image IS the upload, so
    (IMATCH_SAVE_ORIGINAL=1, the default) the original bytes are stored
    verbatim under their own extension instead of re-encoding a PNG of
    identical pixels — the display contract (metadata ``url`` ->
    renderable image, main.py:665-668) is unchanged and the PNG encode
    CPU disappears from bulk ingest. IMATCH_SAVE_ORIGINAL=0 restores
    the reference's always-PNG behavior.

    Returns per-file results: {"filename", "status": success|skipped|error,
    "id"?, "metadata"?, "error"?}.

    Known divergence: when one batch contains pHash-identical duplicates
    in DIFFERENT geometry buckets, the kept copy's metadata follows
    stream-yield order (big buckets first), not strict file order as the
    reference's serial loop would — the stored pixels are
    pHash-equivalent either way, only filename/description can differ.
    """
    n = len(images)
    results: List[dict] = [None] * n
    fresh: List[int] = []
    ids: List[Optional[str]] = [None] * n
    arrays: List[Optional[np.ndarray]] = [None] * n
    pool = _host_pool()

    with METRICS.timer("ingest.to_array"):
        for i, (im, name) in enumerate(zip(images, filenames)):
            try:
                if isinstance(im, np.ndarray):
                    # native-loader output (RGB uint8 HWC) — no PIL
                    # round-trip copy; RGBA/grayscale normalized by the
                    # shared helper
                    arrays[i] = to_rgb(im)
                else:
                    im = im.convert("RGB") if im.mode != "RGB" else im
                    arrays[i] = np.asarray(im)
            except Exception as e:
                results[i] = {
                    "filename": name,
                    "status": "error",
                    "error": str(e),
                }

    # PNG encodes fan out over the host pool (zlib/PIL release the GIL);
    # reference anchor: one serial clean_image.save per upload
    # (main.py:665-668). IMATCH_PNG_COMPRESS (default 1): zlib level for
    # bulk ingest — level 1 encodes ~4x faster than PIL's default 6 for
    # ~15% larger files, and PNG encode is pure host CPU, the scarcest
    # resource at multi-k-img/s ingest rates.
    png_level = int(os.environ.get("IMATCH_PNG_COMPRESS", "1"))
    save_original = (
        os.environ.get("IMATCH_SAVE_ORIGINAL", "1") != "0"
        and not remove_bg
        and raw_bytes is not None
    )
    save_futs: Dict[int, object] = {}
    save_ext: Dict[int, str] = {}  # chosen stored extension per index

    def _ext_for(i) -> str:
        if save_original and raw_bytes[i] is not None:
            ext = os.path.splitext(filenames[i])[1].lower()
            if ext in _RAW_EXTS and _raw_bytes_render_identical(
                raw_bytes[i]
            ):
                return ext
        return ".png"

    def _save(i):
        if save_ext[i] != ".png":
            with open(
                os.path.join(state.processed_dir, f"{ids[i]}{save_ext[i]}"),
                "wb",
            ) as f:
                f.write(raw_bytes[i])
            return
        Image.fromarray(arrays[i]).save(
            os.path.join(state.processed_dir, f"{ids[i]}.png"),
            compress_level=png_level,
        )

    seen_batch = set()
    checked = [False] * n  # dup-checked yet?

    def _dup_check(idx_list, submit_saves: bool):
        """Classify a run of hashed images as fresh vs duplicate; fresh
        files' PNG saves start immediately when ``submit_saves`` (their
        frames are final — no segmentation pending), overlapping the
        device work of later chunks."""
        with METRICS.timer("ingest.dup"):
            todo = []
            for i in idx_list:
                checked[i] = True
                if results[i] is None:
                    todo.append(i)
            # ONE batched store.get per chunk: the per-image form took
            # the store lock (the same lock queries and adds contend
            # on) once per file on the stage that gates everything
            # downstream
            q_ids = [ids[i] for i in todo if ids[i] is not None]
            present = (
                set(state.store.get(ids=q_ids, include=[])["ids"])
                if q_ids
                else set()
            )
            for i in todo:
                img_id = ids[i]
                if img_id in seen_batch or img_id in present:
                    results[i] = {
                        "filename": filenames[i],
                        "status": "skipped",
                        "id": img_id,
                        "message": "Duplicate image detected",
                    }
                    arrays[i] = None
                    continue
                seen_batch.add(img_id)
                fresh.append(i)
                if submit_saves:
                    save_ext[i] = _ext_for(i)
                    save_futs[i] = _save_pool().submit(_save, i)

    # Dedup ids: device MXU hashes for same-geometry runs, threaded host
    # hashes for the rest — bit-identical either way. Without background
    # removal the embedding input IS the original frame, so hash +
    # embedding come from ONE device upload (the fused step), consumed as
    # a STREAM: each finished chunk is dup-checked and its PNG saves are
    # submitted while the device runs the next chunks — the two-deep
    # producer/consumer the reference's serial per-image chain never has
    # (main.py:613-746,1124-1188). With background removal the embedding
    # happens after segmentation, so only the hash runs now.
    def _host_hash_into(target, idxs):
        """Per-image host phash with per-file error isolation — ONE
        definition for both fallback paths below (they differed only in
        the output list, inviting silent divergence)."""

        def _hash_one(i):
            try:
                target[i] = phash_image_id(Image.fromarray(arrays[i]))
            except Exception as ee:
                results[i] = {
                    "filename": filenames[i],
                    "status": "error",
                    "error": str(ee),
                }

        list(pool.map(_hash_one, idxs))

    use_fused = not (remove_bg and state.segmenter is not None)
    emb_by_idx: Dict[int, np.ndarray] = {}
    # Device-resident ingest (IMATCH_DEVICE_INGEST=1, throughput
    # profile): big-bucket chunks keep their embeddings ON DEVICE — the
    # stream fetches only hash bits per chunk, and the final store.add
    # gets a jax.Array that scatters d2d into the index buffers
    # (index/patch.py) instead of round-tripping the embedding matrix
    # through the host. emb_by_idx then holds (chunk_no, row) pairs
    # into emb_chunks for those rows; numpy rows otherwise (small-
    # bucket tail, fallback paths) — both forms compose below.
    device_mode = use_fused and os.environ.get(
        "IMATCH_DEVICE_INGEST", "0"
    ).lower() in ("1", "true", "yes", "on")
    emb_chunks: List = []
    if use_fused:
        try:
            with METRICS.timer("ingest.stream"):
                for idxs, ids_c, e in state.get_embedder().ids_and_embed_images_stream(
                    arrays, pool=pool, device_embeddings=device_mode
                ):
                    if device_mode and not isinstance(e, np.ndarray):
                        k = len(emb_chunks)
                        emb_chunks.append(e)
                        for j, i in enumerate(idxs):
                            ids[i] = ids_c[j]
                            emb_by_idx[i] = (k, j)
                    else:
                        for j, i in enumerate(idxs):
                            ids[i] = ids_c[j]
                            emb_by_idx[i] = e[j]
                    _dup_check(idxs, submit_saves=True)
        except Exception as e:
            # The fused stream died mid-flight (device error, corrupt
            # frame in the fan-out). Items already streamed keep their
            # ids/embeddings; the rest degrade to threaded host hashing
            # + the plain embed path, so one bad file costs only itself —
            # the reference's per-file isolation contract
            # (main.py:1180-1187).
            logger.error("fused ingest stream failed, host fallback: %s", e)
            _host_hash_into(
                ids,
                [
                    i
                    for i, a in enumerate(arrays)
                    if a is not None and results[i] is None and ids[i] is None
                ],
            )
    else:
        with METRICS.timer("ingest.phash"):
            try:
                batch_ids = image_ids_batch(arrays, pool=pool)
            except Exception as e:
                logger.error(
                    "batched hash failed, per-image fallback: %s", e
                )
                batch_ids = [None] * n
                _host_hash_into(
                    batch_ids,
                    [
                        i
                        for i, a in enumerate(arrays)
                        if a is not None and results[i] is None
                    ],
                )
            for i in range(n):
                if results[i] is None and ids[i] is None:
                    ids[i] = batch_ids[i]

    # anything the stream never reached (fallback path / non-fused path):
    # dup-check in file order now
    _dup_check(
        [i for i in range(n) if not checked[i] and results[i] is None],
        submit_saves=use_fused,
    )

    if not fresh:
        return results

    # captions + existing-filter application, batched on device when the
    # captioner supports it (MoondreamJax: one vision pass per geometry
    # bucket, one shared decode loop, one yes/no prefill per filter —
    # the reference pays per-image network calls for each).
    captions: Dict[int, str] = {}
    filter_results: Dict[int, Dict[str, str]] = {}
    cap = state.captioner
    if getattr(cap, "available", False):
        try:
            if hasattr(cap, "encode_image_batch"):
                encs = cap.encode_image_batch([arrays[i] for i in fresh])
                caps = (
                    cap.caption_batch(encs)
                    if hasattr(cap, "caption_batch")
                    else [cap.caption(e)["caption"] for e in encs]
                )
                for i, enc, text in zip(fresh, encs, caps):
                    save_encoded(state.encoded_dir, ids[i], enc)
                    if text:
                        captions[i] = text
                saved_filters = state.load_filters()
                if saved_filters and hasattr(cap, "query_yes_no_batch"):
                    for fq in saved_filters:
                        answers = cap.query_yes_no_batch(
                            encs, format_filter_query(fq)
                        )
                        for i, yes in zip(fresh, answers):
                            filter_results.setdefault(i, {})[fq] = (
                                "Yes" if yes else "No"
                            )
            else:
                for i in fresh:
                    caption, encoded = _caption_and_encode(state, arrays[i])
                    if encoded is not None:
                        save_encoded(state.encoded_dir, ids[i], encoded)
                        fr = _apply_existing_filters(state, encoded)
                        if fr:
                            filter_results[i] = fr
                    if caption:
                        captions[i] = caption
        except Exception as e:
            logger.error("batched caption/filter error: %s", e)

    if remove_bg and state.segmenter is not None:
        try:
            with METRICS.timer("ingest.segment"):
                # geometry-bucketed: one device call per (H, W) bucket
                cut = state.segmenter.remove_background_batch(
                    [arrays[i] for i in fresh]
                )
            for i, rgba in zip(fresh, cut):
                arrays[i] = rgba
        except Exception as e:
            logger.error("background removal error: %s", e)

    # embeddings for fresh rows the stream did not cover (non-fused path,
    # or the tail of a failed stream)
    missing = [i for i in fresh if i not in emb_by_idx]
    if missing:
        embed_inputs = [to_rgb(arrays[i]) for i in missing]
        try:
            with METRICS.timer("ingest.embed"):
                more = state.get_embedder().embed_images(embed_inputs)
            for j, i in enumerate(missing):
                emb_by_idx[i] = more[j]
        except Exception as e:
            # embed died for the whole chunk: demote the still-pending
            # files to per-file errors instead of 500ing the request and
            # losing the dup/error classifications already made.
            logger.error("batch embed failed: %s", e)
            for i in missing:
                results[i] = {
                    "filename": filenames[i],
                    "status": "error",
                    "error": f"embedding failed: {e}",
                }
            fresh = [i for i in fresh if i not in set(missing)]
            if not fresh:
                _reap_orphan_saves(state, results, ids, save_futs, save_ext)
                return results

    # saves not yet submitted by the stream consumer (segmented frames,
    # fallback-path files) go out now
    with METRICS.timer("ingest.save"):
        for i in fresh:
            if i not in save_futs:
                save_ext[i] = _ext_for(i)
                save_futs[i] = _save_pool().submit(_save, i)

    # saves must land before results return (the metadata URLs point at
    # them); a failed save demotes that file to an error result
    save_failed = set()
    with METRICS.timer("ingest.save_wait"):
        for i in fresh:
            try:
                save_futs[i].result()
            except Exception as e:
                logger.error("processed save failed for %s: %s", ids[i], e)
                save_failed.add(i)
                results[i] = {
                    "filename": filenames[i],
                    "status": "error",
                    "error": f"save failed: {e}",
                }

    add_ids, add_embs, add_mds, add_docs = [], [], [], []
    for i in fresh:
        if i in save_failed:
            continue
        img_id = ids[i]
        name = filenames[i]
        description = os.path.splitext(name)[0]
        ext = save_ext.get(i, ".png")
        url = f"/static/processed/{img_id}{ext}"
        metadata = {
            "id": img_id,
            "filename": name,
            "description": description,
            "custom_metadata": captions.get(i, ""),
            "url": url,
            "thumbnail_url": url,
            "processed_url": os.path.join(
                state.processed_dir, f"{img_id}{ext}"
            ),
            "created_at": _now_iso(),
        }
        if i in filter_results:
            metadata["filter_results_json"] = json.dumps(filter_results[i])
        add_ids.append(img_id)
        add_embs.append(emb_by_idx[i])
        add_mds.append(metadata)
        add_docs.append(description)
        results[i] = {
            "filename": name,
            "status": "success",
            "id": img_id,
            "metadata": metadata,
        }

    if not add_ids:
        # every fresh file was demoted to an error: nothing to insert
        # (store.add raises on empty ids, chroma parity)
        _reap_orphan_saves(state, results, ids, save_futs, save_ext)
        return results

    # device-resident rows: all-device batches assemble into ONE jax
    # array (d2d gathers) so store.add scatters without a host round
    # trip; mixed batches (fallback tail, small buckets) materialize
    if any(isinstance(v, tuple) for v in add_embs):
        if all(isinstance(v, tuple) for v in add_embs):
            add_embs = _gather_device_rows(emb_chunks, add_embs)
        else:
            add_embs = _materialize_rows(emb_chunks, add_embs)

    with state.lock, METRICS.timer("ingest.add"):
        inserted = set(add_ids)
        try:
            state.store.add(
                ids=add_ids,
                embeddings=add_embs,
                metadatas=add_mds,
                documents=add_docs,
            )
        except ValueError:
            # a concurrent upload added one of these ids after our dup
            # check; fall back to per-id adds, reclassifying collisions
            if not isinstance(add_embs, list):
                add_embs = list(np.asarray(add_embs, np.float32))
            inserted = set()
            for j, img_id in enumerate(add_ids):
                try:
                    state.store.add(
                        ids=[img_id],
                        embeddings=[add_embs[j]],
                        metadatas=[add_mds[j]],
                        documents=[add_docs[j]],
                    )
                    inserted.add(img_id)
                except ValueError:
                    for r in results:
                        if r and r.get("id") == img_id:
                            r["status"] = "skipped"
                            r["message"] = "Duplicate image detected"
        # Only mirror metadata for rows that actually inserted — a
        # collision must not overwrite the surviving image's record.
        for md in add_mds:
            if md["id"] in inserted:
                state.image_metadata[md["id"]] = md
    if device_mode and os.environ.get(
        "IMATCH_DEVICE_INGEST_FLUSH", "1"
    ) != "0":
        # keep chroma-grade per-request durability: the deferred host
        # mirror + journal entries land before the HTTP response. The
        # d2h copy started at add() and overlapped everything above, so
        # this is a completion wait, not a fresh transfer — and the h2d
        # re-upload the host path would have paid never happens.
        # IMATCH_DEVICE_INGEST_FLUSH=0 defers fully to the next drain
        # point for maximum throughput (crash window: rows since the
        # last drain).
        with METRICS.timer("ingest.flush"):
            state.store.flush()
    _reap_orphan_saves(state, results, ids, save_futs, save_ext)
    return results

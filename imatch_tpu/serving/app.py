"""REST API application — the reference's v2 backend contract.

Route-for-route port of /root/reference/backend/app/main.py:124-545,
1100-1243 (see SURVEY.md §2.4), plus the legacy-only capabilities worth
preserving (§2.4 tail): unified /search dispatch (app.py:3118),
/upload-samples bulk ingest (app.py:1190), comma-separated batch filter
add (app.py:2490).

Response shapes, status codes (409 duplicate, 404s), empty-query+filters
semantics, limit=0 behavior, and the AND filter post-pass match the
reference; contract tests in tests/test_api.py pin them.
"""

from __future__ import annotations

import json
import logging
import os
from typing import List, Optional

import numpy as np
from PIL import Image

from imatch_tpu.pipeline import search as search_mod
from imatch_tpu.pipeline.backfill import process_filter_on_all_images
from imatch_tpu.pipeline.filters import passes_filters
from imatch_tpu.pipeline.ingest import process_batch, process_image
from imatch_tpu.pipeline.state import AppState
from imatch_tpu.runtime.loader import decode_image_bytes, default_loader
from imatch_tpu.serving.asgi import App, JSONResponse, UploadFile

logger = logging.getLogger("imatch.api")

CORS_ORIGINS = [
    "http://localhost:3000",
    "http://127.0.0.1:3000",
    "http://localhost:8000",
    "*",
]


def _form_str(form, key: str, default=None):
    """String form field: multipart clients can send any field as a FILE
    part; .strip() on an UploadFile was an opaque 500. Returns default
    when absent, raises _FieldTypeError when present but not a string."""
    v = form.get(key)
    if v is None:
        return default
    if isinstance(v, str):
        return v
    raise _FieldTypeError(key)


class _FieldTypeError(ValueError):
    def __init__(self, field: str):
        super().__init__(f"field {field!r} must be a string")
        self.field = field


def _parse_bool(v, default=False) -> bool:
    if v is None:
        return default
    if isinstance(v, bool):
        return v
    return str(v).strip().lower() in ("true", "1", "yes", "on")


def _parse_int(v, default: int) -> int:
    try:
        return int(v)
    except (TypeError, ValueError):
        return default


def _parse_float(v, default: float) -> float:
    try:
        return float(v)
    except (TypeError, ValueError):
        return default


def _open_upload(file: UploadFile) -> Image.Image:
    """Decode through the native C++ pool (runtime/loader.py; libjpeg-turbo
    + zero-copy — measured ~1.8x PIL single-core). Falls back to PIL
    inside the loader for AVIF and when no toolchain exists."""
    arr = decode_image_bytes(file.content)
    return Image.fromarray(arr)


def _maybe_remove_query_bg(state, image):
    """Legacy v1 option: rembg the QUERY image before embedding
    (app.py:989-994,396-401); opt-in via the remove_bg form flag."""
    if state.segmenter is None:
        return image
    try:
        arr = state.segmenter.remove_background(np.asarray(image))
        return Image.fromarray(arr[..., :3])
    except Exception as e:
        logger.error("query background removal failed: %s", e)
        return image


def apply_search_filters(results: List[dict], filters: List[str]) -> List[dict]:
    """Route-level AND post-pass (backend/app/main.py:202-222) — one
    semantics definition, shared with ingest/backfill
    (pipeline/filters.passes_filters)."""
    if not filters:
        return results
    return [r for r in results if passes_filters(r, filters)]


def _warmup(state: AppState):
    """Pre-compile the hot request shapes on a background thread so first
    user requests don't pay the jit compiles (minutes for the towers).
    Covers: single text embed (text search), single image embed
    (upload/image search), and the index query path."""
    import time

    t0 = time.time()
    try:
        emb = state.get_embedder()
        emb.embed_texts(["warmup"])
        img = np.zeros((64, 64, 3), np.uint8)
        emb.embed_images([img])
        if state.store.count():
            # compile every k bucket the UI's limit select can hit
            # (10/25/50/100/All) so no user search pays a jit compile
            state.store.warm()
            state.store.query([emb.embed_text("warmup")], n_results=1)
            # one representative batched-route shape (Q=16 text tower +
            # Q-bucketed engine); other pow2 Q-buckets compile on first
            # use
            state.store.query(
                emb.embed_texts_device(["warmup"] * 16), n_results=10
            )
            coal = getattr(state.store, "_coalescer", None)  # single read
            if coal is not None:
                # pre-compile every pow2 Q bucket up to the coalescer's
                # max batch at the default limit; non-default limits
                # with Q>1 still compile (once, cached) on first use
                qc = [b for b in (2, 4, 8, 16, 32, 64) if b <= coal.max_batch]
                state.store.warm(n_results_list=(10,), q_counts=qc)
        logger.info("warmup done in %.1fs", time.time() - t0)
    except Exception as e:
        logger.warning("warmup failed: %s", e)


def create_app(state: Optional[AppState] = None, root: str = ".") -> App:
    if state is None:
        state = AppState(root=root)
    app = App(cors_origins=CORS_ORIGINS)
    app.state = state
    app.mount_static("/static", state.static_dir)

    if _parse_bool(os.environ.get("IMATCH_WARMUP"), default=True):
        app.add_background_task(_warmup, state)

    # -- upload ------------------------------------------------------------

    @app.post("/api/upload")
    def upload(req):
        form = req.form()
        file = form.get("file")
        if not isinstance(file, UploadFile):
            return JSONResponse(
                {"success": False, "error": "file field required"}, 422
            )
        try:
            # description/custom_metadata sent as FILE parts would ride
            # into store metadata as UploadFile objects and break every
            # later journal/snapshot json.dumps — reject as 422 like the
            # search routes do
            description = _form_str(form, "description")
            custom_metadata = _form_str(form, "custom_metadata")
        except _FieldTypeError as e:
            return JSONResponse({"success": False, "error": str(e)}, 422)
        try:
            image = _open_upload(file)
            metadata, is_new = process_image(
                state,
                image=image,
                filename=file.filename,
                description=description,
                custom_metadata=custom_metadata,
                remove_bg=_parse_bool(form.get("remove_bg")),
            )
        except Exception as e:
            logger.error("upload error: %s", e)
            return JSONResponse({"success": False, "error": str(e)}, 500)
        if is_new:
            state.snapshot()
            return {"success": True, "metadata": metadata}
        return JSONResponse(
            {
                "success": False,
                "error": "Duplicate image",
                "message": "This image already exists in the database",
                "metadata": metadata,
            },
            409,
        )

    @app.post("/api/upload-folder")
    def upload_folder(req):
        form = req.form()
        files = [f for f in form.getlist("files") if isinstance(f, UploadFile)]
        remove_bg = _parse_bool(form.get("remove_bg"))
        results = []
        images, names = [], []
        loader = default_loader()
        tickets = []
        for i, f in enumerate(files):
            if not f.content:
                results.append(
                    {
                        "filename": f.filename,
                        "status": "skipped",
                        "reason": "Empty file",
                    }
                )
                continue
            # submit everything first: the C++ pool decodes concurrently
            tickets.append((i, f, loader.submit_bytes(f.content)))
        raws = []
        for i, f, t in tickets:
            try:
                # raw arrays straight into process_batch — no PIL wrap
                images.append(loader.wait(t))
                names.append(f.filename)
                raws.append(f.content)
            except Exception as e:
                results.append(
                    {
                        "filename": f.filename,
                        "status": "error",
                        "reason": f"Cannot open image: {e}",
                    }
                )
        batch = process_batch(
            state, images, names, remove_bg=remove_bg, raw_bytes=raws
        )
        for r in batch:
            entry = {"filename": r["filename"], "status": r["status"]}
            if r["status"] == "success":
                entry["id"] = r["id"]
            elif r["status"] == "skipped":
                entry["reason"] = r.get("message", "Duplicate image")
                entry["id"] = r.get("id")
            else:
                entry["reason"] = r.get("error", "error")
            results.append(entry)
        successful = sum(1 for r in results if r["status"] == "success")
        skipped = sum(1 for r in results if r["status"] == "skipped")
        failed = sum(1 for r in results if r["status"] == "error")
        if successful:
            state.snapshot()
        return {
            "success": True,
            "total": len(files),
            "successful": successful,
            "skipped": skipped,
            "failed": failed,
            "results": results,
        }

    # -- search ------------------------------------------------------------

    @app.post("/api/search/image")
    def search_image(req):
        form = req.form()
        file = form.get("file")
        if not isinstance(file, UploadFile):
            return JSONResponse(
                {"success": False, "error": "file field required"}, 422
            )
        filters = form.getlist("filters")
        limit = _parse_int(form.get("limit"), 10)
        image = _open_upload(file)
        if _parse_bool(form.get("remove_bg")):
            image = _maybe_remove_query_bg(state, image)
        results = search_mod.search_by_image(state, image, limit=limit)
        return {"results": apply_search_filters(results, filters)}

    @app.post("/api/search/text")
    def search_text(req):
        form = req.form()
        try:
            query = _form_str(form, "query", "")
        except _FieldTypeError as e:
            return JSONResponse({"success": False, "error": str(e)}, 422)
        filters = form.getlist("filters")
        limit = _parse_int(form.get("limit"), 10)
        if not query.strip() and filters:
            # empty query + filters -> list all, newest first (main.py:245)
            results = search_mod.get_all_images_with_limit(state, limit=limit)
        else:
            results = search_mod.search_by_text(state, query, limit=limit)
        return {"results": apply_search_filters(results, filters)}

    @app.get("/api/search/text")
    def search_text_get(req):
        """GET variant with query params — the reference's README documents
        text search as GET (README.md:105-121) though its code is POST;
        support both."""
        query = req.query_param("query", "")
        filters = req.query.get("filters", [])
        limit = _parse_int(req.query_param("limit"), 10)
        if not query.strip() and filters:
            results = search_mod.get_all_images_with_limit(state, limit=limit)
        else:
            results = search_mod.search_by_text(state, query, limit=limit)
        return {"results": apply_search_filters(results, filters)}

    @app.post("/api/search/multimodal")
    def search_multimodal(req):
        form = req.form()
        file = form.get("file")
        if not isinstance(file, UploadFile):
            return JSONResponse(
                {"success": False, "error": "file field required"}, 422
            )
        try:
            query = _form_str(form, "query", "")
        except _FieldTypeError as e:
            return JSONResponse({"success": False, "error": str(e)}, 422)
        weight_image = _parse_float(form.get("weight_image"), 0.5)
        filters = form.getlist("filters")
        limit = _parse_int(form.get("limit"), 10)
        image = _open_upload(file)
        if _parse_bool(form.get("remove_bg")):
            image = _maybe_remove_query_bg(state, image)
        results = search_mod.search_multimodal(
            state, image, query, weight_image=weight_image, limit=limit
        )
        return {"results": apply_search_filters(results, filters)}

    @app.post("/api/search/batch")
    def search_batch(req):
        """Batched text search (no reference equivalent): JSON body
        ``{"queries": [...], "limit": 10, "filters": [...]}`` ->
        ``{"results": [[...], ...]}``, one row per query, each row shaped
        exactly like /api/search/text's results. ONE device dispatch for
        all queries — on links where the per-request round-trip is the
        latency floor this is how per-query cost beats it (bench.py
        ``search_http_batch16_per_query_ms``)."""
        try:
            body = req.json()
        except Exception:
            return JSONResponse(
                {"success": False, "error": "JSON body required"}, 422
            )
        queries = body.get("queries") if isinstance(body, dict) else None
        if not isinstance(queries, list) or not all(
            isinstance(s, str) for s in queries
        ):
            return JSONResponse(
                {"success": False, "error": "queries must be a list of strings"},
                422,
            )
        if len(queries) > 256:
            return JSONResponse(
                {"success": False, "error": "at most 256 queries per batch"},
                422,
            )
        filters = body.get("filters") or []
        if not isinstance(filters, list) or not all(
            isinstance(f, str) for f in filters
        ):
            return JSONResponse(
                {"success": False, "error": "filters must be a list of strings"},
                422,
            )
        limit = _parse_int(body.get("limit"), 10)
        # same per-query semantics as /api/search/text: an empty query
        # WITH filters lists all images newest-first (main.py:245) —
        # non-empty queries still share one batched dispatch
        rows: list = [None] * len(queries)
        embed_idx = [
            i
            for i, q in enumerate(queries)
            if q.strip() or not filters
        ]
        embedded = search_mod.search_by_text_batch(
            state, [queries[i] for i in embed_idx], limit=limit
        )
        for i, r in zip(embed_idx, embedded):
            rows[i] = r
        listing = None
        for i in range(len(queries)):
            if rows[i] is None:
                if listing is None:
                    # one lock + sort for ALL empty queries, not per row
                    listing = search_mod.get_all_images_with_limit(
                        state, limit=limit
                    )
                rows[i] = [dict(md) for md in listing]
        return {
            "results": [apply_search_filters(r, filters) for r in rows]
        }

    @app.post("/api/search/image-batch")
    def search_image_batch(req):
        """Batched image search (no reference equivalent): multipart
        ``files`` (repeated, like /api/upload-folder), ``limit``,
        ``filters``, ``remove_bg`` -> ``{"results": [[...], ...]}``, one
        row per file in order, each row shaped like /api/search/image's
        results. The vision tower runs the whole batch in chunked device
        dispatches and the index scores all queries in one top-k — N
        searches for roughly the round-trip cost of one."""
        form = req.form()
        files = [f for f in form.getlist("files") if isinstance(f, UploadFile)]
        if not files:
            return JSONResponse(
                {"success": False, "error": "files field required"}, 422
            )
        if len(files) > 256:
            return JSONResponse(
                {"success": False, "error": "at most 256 files per batch"},
                422,
            )
        filters = form.getlist("filters")
        limit = _parse_int(form.get("limit"), 10)
        remove_bg = _parse_bool(form.get("remove_bg"))
        # decode concurrently on the C++ pool (submit all, then wait) —
        # the serial per-file decode made batch latency N x single-decode
        loader = default_loader()
        tickets = [loader.submit_bytes(f.content) for f in files]
        images = []
        for f, t in zip(files, tickets):
            try:
                image = Image.fromarray(loader.wait(t))
            except Exception as e:
                return JSONResponse(
                    {
                        "success": False,
                        "error": f"Cannot open image {f.filename!r}: {e}",
                    },
                    422,
                )
            if remove_bg:
                image = _maybe_remove_query_bg(state, image)
            images.append(image)
        rows = search_mod.search_by_image_batch(state, images, limit=limit)
        return {
            "results": [apply_search_filters(r, filters) for r in rows]
        }

    # -- listing / metadata --------------------------------------------------

    @app.get("/api/images")
    def get_images(req):
        with state.lock:  # list() iterates; concurrent ingest mutates
            return {"images": list(state.image_metadata.values())}

    @app.get("/api/image/{image_id}")
    def get_image(req, image_id):
        md = state.image_metadata.get(image_id)
        if md is None:
            return JSONResponse(
                {"success": False, "error": "Image not found"}, 404
            )
        return {"success": True, "image": md}

    @app.put("/api/metadata/{image_id}")
    def update_metadata(req, image_id):
        form = req.form()
        description = form.get("description")
        if description is None:
            # description is Form(...) — required — in the reference
            # (backend/app/main.py:479); FastAPI rejects its absence with
            # 422 before any handler logic runs. Without this, a partial
            # PUT would silently null the stored description.
            return JSONResponse(
                {"success": False, "error": "description field required"},
                422,
            )
        if not isinstance(description, str):
            return JSONResponse(
                {"success": False, "error": "description must be a string"},
                422,
            )
        custom_metadata = form.get("custom_metadata")
        if custom_metadata is not None and not isinstance(
            custom_metadata, str
        ):
            return JSONResponse(
                {"success": False, "error": "custom_metadata must be a string"},
                422,
            )
        with state.lock:
            # existence check INSIDE the lock (a concurrent reset between
            # check and write used to 500), and store-first ordering so a
            # vanished id cannot leave a ghost mirror record
            current = state.image_metadata.get(image_id)
            if current is None:
                return JSONResponse(
                    {"success": False, "error": "Image not found"}, 404
                )
            metadata = dict(current)
            metadata["description"] = description
            # reference parity: Form(None) overwrites — an omitted
            # custom_metadata clears the stored one (main.py:479,503)
            metadata["custom_metadata"] = custom_metadata
            try:
                # Unlike the reference (which overwrites the stored
                # metadata with a 3-field subset, main.py:503-510 —
                # losing id/url on restart), persist the full record.
                state.store.update(ids=[image_id], metadatas=[metadata])
            except KeyError:
                return JSONResponse(
                    {"success": False, "error": "Image not found"}, 404
                )
            state.image_metadata[image_id] = metadata
        state.snapshot()
        return {"success": True, "metadata": metadata}

    # -- filters -------------------------------------------------------------

    @app.get("/api/filters")
    def get_filters(req):
        return {"filters": state.load_filters()}

    @app.post("/api/filters")
    def add_filter(req):
        form = req.form()
        try:
            # a file-part filter_query would be appended into
            # filters.json (json.dump TypeError -> 500) and handed to
            # the backfill as a non-string
            filter_query = _form_str(form, "filter_query")
        except _FieldTypeError as e:
            return JSONResponse({"success": False, "error": str(e)}, 422)
        if not filter_query:
            return JSONResponse(
                {"success": False, "error": "filter_query required"}, 422
            )
        # handlers run concurrently on the thread pool: the
        # load -> append -> save RMW must be atomic or one of two
        # simultaneous adds is silently lost
        with state.lock:
            filters = state.load_filters()
            if filter_query in filters:
                return {
                    "success": True,
                    "message": "Filter already exists",
                    "filters": filters,
                }
            filters.append(filter_query)
            state.save_filters(filters)
        app.add_background_task(
            process_filter_on_all_images, state, filter_query
        )
        return {"success": True, "filters": filters}

    @app.post("/api/filters/batch")
    def add_filters_batch(req):
        """Legacy capability: comma-separated batch add (app.py:2489-2515)."""
        form = req.form()
        try:
            raw = _form_str(form, "filter_queries", "")
        except _FieldTypeError as e:
            return JSONResponse({"success": False, "error": str(e)}, 422)
        queries = [q.strip() for q in raw.split(",") if q.strip()]
        with state.lock:
            filters = state.load_filters()
            added = []
            for q in queries:
                if q not in filters:
                    filters.append(q)
                    added.append(q)
            state.save_filters(filters)
        for q in added:
            app.add_background_task(process_filter_on_all_images, state, q)
        return {"success": True, "added": added, "filters": filters}

    @app.delete("/api/filters/{filter_query}")
    def delete_filter(req, filter_query):
        with state.lock:
            filters = state.load_filters()
            if filter_query in filters:
                filters.remove(filter_query)
                state.save_filters(filters)
                return {"success": True, "filters": filters}
        return JSONResponse(
            {"success": False, "error": "Filter not found"}, 404
        )

    @app.get("/api/filter-progress")
    def filter_progress(req):
        q = req.query_param("filter_query")
        if q not in state.filter_progress:
            return {"status": "not_found"}
        return state.filter_progress[q]

    # -- admin ---------------------------------------------------------------

    @app.post("/api/reset")
    def reset(req):
        try:
            state.reset()
        except Exception as e:
            return JSONResponse({"success": False, "error": str(e)}, 500)
        return {"success": True}

    # -- legacy capabilities -------------------------------------------------

    @app.post("/search")
    def unified_search(req):
        """Legacy v1 auto-dispatch (app.py:3118-3574): text / image /
        multimodal chosen by which inputs are present; optional
        caption-enhancement of the query (app.py:2583-2691)."""
        form = req.form()
        file = form.get("file")
        try:
            query = (_form_str(form, "query") or "").strip()
        except _FieldTypeError as e:
            return JSONResponse({"success": False, "error": str(e)}, 422)
        weight_image = _parse_float(form.get("weight_image"), 0.5)
        limit = _parse_int(form.get("limit"), 10)
        filters = form.getlist("filters")
        enhance = _parse_bool(form.get("enhance_with_caption"))
        has_image = isinstance(file, UploadFile) and file.content
        if has_image and query:
            image = _open_upload(file)
            if enhance:
                query = search_mod.enhance_query_with_caption(
                    state, image, query
                )
            results = search_mod.search_multimodal(
                state, image, query, weight_image=weight_image, limit=limit
            )
            mode = "multimodal"
        elif has_image:
            image = _open_upload(file)
            results = search_mod.search_by_image(state, image, limit=limit)
            mode = "image"
        elif query:
            results = search_mod.search_by_text(state, query, limit=limit)
            mode = "text"
        else:
            return JSONResponse(
                {"success": False, "error": "provide a query or an image"},
                422,
            )
        return {
            "mode": mode,
            "results": apply_search_filters(results, filters),
        }

    @app.post("/upload-samples")
    def upload_samples(req):
        """Legacy sample-corpus ingest (app.py:1190-1281). Samples dir from
        IMATCH_SAMPLES_DIR or ./images under the app root."""
        samples_dir = os.environ.get(
            "IMATCH_SAMPLES_DIR", os.path.join(state.root, "images")
        )
        if not os.path.isdir(samples_dir):
            return JSONResponse(
                {"success": False, "error": "no samples directory"}, 404
            )
        images, names = [], []
        loader = default_loader()
        files = sorted(os.listdir(samples_dir))
        # submit everything first so the C++ pool decodes concurrently
        tickets = [
            (f, loader.submit_path(os.path.join(samples_dir, f)))
            for f in files
        ]
        failed_decode = []
        for f, t in tickets:
            try:
                images.append(loader.wait(t))
                names.append(f)
            except Exception as e:
                # report undecodable files instead of silently dropping
                # them from a response that claims success
                failed_decode.append(
                    {"filename": f, "status": "error", "error": str(e)}
                )
        results = process_batch(state, images, names) + failed_decode
        state.snapshot()
        return {
            "success": True,
            "total": len(files),
            "successful": sum(1 for r in results if r["status"] == "success"),
            "skipped": sum(1 for r in results if r["status"] == "skipped"),
            "failed": sum(1 for r in results if r["status"] == "error"),
            "results": results,
        }

    @app.get("/api/health")
    def health(req):
        return {
            "status": "ok",
            "images": state.store.count(),
            "captioner": getattr(state.captioner, "available", False),
            "model": state.embedder.cfg.name if state.embedder else None,
        }

    # -- observability (SURVEY.md §5) ----------------------------------------

    @app.get("/api/metrics")
    def metrics(req):
        from imatch_tpu.utils.metrics import METRICS

        snap = METRICS.snapshot()
        snap["index_count"] = state.store.count()
        snap["index"] = state.store.stats()
        return snap

    @app.post("/api/profile/start")
    def profile_start(req):
        from imatch_tpu.utils import profiler

        try:
            d = profiler.start_trace(req.form().get("log_dir"))
            return {"success": True, "trace_dir": d}
        except RuntimeError as e:
            return JSONResponse({"success": False, "error": str(e)}, 409)

    @app.post("/api/profile/stop")
    def profile_stop(req):
        from imatch_tpu.utils import profiler

        try:
            return {"success": True, "trace_dir": profiler.stop_trace()}
        except RuntimeError as e:
            return JSONResponse({"success": False, "error": str(e)}, 409)

    # -- web UI (serving/ui.py): / search page, /manage admin page -----------
    from imatch_tpu.serving.ui import register_ui

    register_ui(app)

    return app

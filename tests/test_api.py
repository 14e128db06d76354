"""REST contract tests, in-process via httpx.ASGITransport.

Pins the v2 behavioral contract from SURVEY.md §2.4: 409 duplicates,
empty-query+filters semantics, limit=0, result shapes, 404s, reset, plus
legacy capabilities (unified /search, /upload-samples, batch filter add).
"""

import asyncio
import io
import json
import os
import time

import httpx
import numpy as np
import pytest
from PIL import Image

from imatch_tpu.models.clip.configs import TINY
from imatch_tpu.pipeline.captioner import NullCaptioner
from imatch_tpu.pipeline.embedder import ClipEmbedder
from imatch_tpu.pipeline.state import AppState
from imatch_tpu.serving.app import create_app

CORPUS = "/root/reference/images"


class FakeCaptioner:
    """Deterministic VLM stand-in: exercises caption + filter plumbing."""

    available = True

    def encode_image(self, image_np):
        return {"feat": np.asarray(image_np, dtype=np.float32).mean(axis=(0, 1))}

    def caption(self, encoded):
        return {"caption": "a power drill on a table"}

    def query(self, encoded, question):
        return {"answer": "Yes" if "drill" in question.lower() else "No"}


@pytest.fixture(scope="module")
def embedder():
    return ClipEmbedder(config=TINY)


@pytest.fixture()
def client(tmp_path, embedder):
    state = AppState(
        root=str(tmp_path), embedder=embedder, captioner=FakeCaptioner()
    )
    app = create_app(state)
    transport = httpx.ASGITransport(app=app)
    c = httpx.AsyncClient(transport=transport, base_url="http://test")

    class Sync:
        def __init__(self):
            self.state = state
            self.app = app

        def request(self, method, url, **kw):
            return asyncio.run(c.request(method, url, **kw))

        def get(self, url, **kw):
            return self.request("GET", url, **kw)

        def post(self, url, **kw):
            return self.request("POST", url, **kw)

        def put(self, url, **kw):
            return self.request("PUT", url, **kw)

        def delete(self, url, **kw):
            return self.request("DELETE", url, **kw)

    return Sync()



def _rand_img(seed, h=24, w=32):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), np.uint8)


def _png_bytes(arr):
    b = io.BytesIO()
    Image.fromarray(arr).save(b, "PNG")
    return b.getvalue()


def jpg_bytes(name="red drill.jpg"):
    with open(os.path.join(CORPUS, name), "rb") as f:
        return f.read()


def upload(client, name="red drill.jpg", **data):
    return client.post(
        "/api/upload",
        files={"file": (name, jpg_bytes(name), "image/jpeg")},
        data=data,
    )


def test_upload_and_duplicate_409(client):
    r = upload(client, description="my drill", custom_metadata="note")
    assert r.status_code == 200
    body = r.json()
    assert body["success"] is True
    md = body["metadata"]
    assert md["id"].startswith("img_")
    assert md["description"] == "my drill"
    # FakeCaptioner caption appended to custom_metadata
    assert "power drill" in md["custom_metadata"]
    assert md["url"] == f"/static/processed/{md['id']}.png"

    r2 = upload(client, description="again")
    assert r2.status_code == 409
    b2 = r2.json()
    assert b2["success"] is False
    assert b2["error"] == "Duplicate image"
    assert b2["metadata"]["id"] == md["id"]


def test_static_serving_after_upload(client):
    md = upload(client).json()["metadata"]
    r = client.get(md["url"])
    assert r.status_code == 200
    assert r.headers["content-type"] == "image/png"
    assert client.get("/static/processed/nope.png").status_code == 404


def test_upload_folder_counts(client):
    names = ["red drill.jpg", "red drill match.jpg"]
    files = [
        ("files", (n, jpg_bytes(n), "image/jpeg")) for n in names + [names[0]]
    ]
    r = client.post("/api/upload-folder", files=files)
    assert r.status_code == 200
    body = r.json()
    assert body["total"] == 3
    assert body["successful"] == 2
    assert body["skipped"] == 1
    assert body["failed"] == 0
    skipped = [x for x in body["results"] if x["status"] == "skipped"]
    assert skipped[0]["reason"] == "Duplicate image detected" or "Duplicate" in skipped[0]["reason"]


def test_search_text_and_limits(client):
    for n in os.listdir(CORPUS):
        upload(client, n)
    r = client.post("/api/search/text", data={"query": "red drill", "limit": 3})
    assert r.status_code == 200
    results = r.json()["results"]
    assert len(results) == 3
    scores = [x["similarity_score"] for x in results]
    assert scores == sorted(scores, reverse=True)
    # limit 0 -> all
    r = client.post("/api/search/text", data={"query": "red drill", "limit": 0})
    assert len(r.json()["results"]) == 6


def test_search_image_self_match(client):
    upload(client, "red drill.jpg")
    upload(client, "orange drill.avif")
    r = client.post(
        "/api/search/image",
        files={"file": ("q.jpg", jpg_bytes("red drill.jpg"), "image/jpeg")},
        data={"limit": 1},
    )
    assert r.json()["results"][0]["filename"] == "red drill.jpg"
    assert r.json()["results"][0]["similarity_score"] > 0.999


def test_search_multimodal_route(client):
    upload(client, "red drill.jpg")
    r = client.post(
        "/api/search/multimodal",
        files={"file": ("q.jpg", jpg_bytes("red drill.jpg"), "image/jpeg")},
        data={"query": "red drill", "weight_image": 1.0, "limit": 1},
    )
    assert r.status_code == 200
    assert r.json()["results"][0]["filename"] == "red drill.jpg"


def test_images_listing_and_get_by_id(client):
    md = upload(client).json()["metadata"]
    r = client.get("/api/images")
    assert len(r.json()["images"]) == 1
    r = client.get(f"/api/image/{md['id']}")
    assert r.json()["image"]["id"] == md["id"]
    assert client.get("/api/image/img_nope").status_code == 404


def test_metadata_update(client):
    md = upload(client).json()["metadata"]
    r = client.put(
        f"/api/metadata/{md['id']}",
        data={"description": "new desc", "custom_metadata": "cm"},
    )
    assert r.status_code == 200
    assert r.json()["metadata"]["description"] == "new desc"
    r = client.get(f"/api/image/{md['id']}")
    assert r.json()["image"]["description"] == "new desc"
    assert (
        client.put("/api/metadata/img_nope", data={"description": "x"}).status_code
        == 404
    )


def test_metadata_update_requires_description(client):
    """description is Form(...) in the reference (main.py:479): a PUT
    without it must 422, not silently null the stored description."""
    md = upload(client, description="keep me").json()["metadata"]
    r = client.put(
        f"/api/metadata/{md['id']}", data={"custom_metadata": "cm only"}
    )
    assert r.status_code == 422
    r = client.get(f"/api/image/{md['id']}")
    assert r.json()["image"]["description"] == "keep me"
    # validation precedes the existence check, like FastAPI's Form(...)
    assert client.put("/api/metadata/img_nope", data={}).status_code == 422


def test_filter_lifecycle_and_backfill(client):
    upload(client, "red drill.jpg")
    upload(client, "orange drill.avif")
    # add filter -> background back-fill with FakeCaptioner (answers Yes
    # to questions containing 'drill')
    r = client.post("/api/filters", data={"filter_query": "is there a drill?"})
    assert r.json()["filters"] == ["is there a drill?"]
    # duplicate add
    r = client.post("/api/filters", data={"filter_query": "is there a drill?"})
    assert r.json()["message"] == "Filter already exists"

    # wait for backfill thread
    for _ in range(100):
        p = client.get(
            "/api/filter-progress", params={"filter_query": "is there a drill?"}
        ).json()
        if p.get("status") == "completed":
            break
        time.sleep(0.05)
    assert p["status"] == "completed"
    assert p["progress"] == 100

    # filter results stored per image
    imgs = client.get("/api/images").json()["images"]
    fr = json.loads(imgs[0]["filter_results_json"])
    assert fr["is there a drill?"].lower() == "yes"

    # search with the filter applied keeps both
    r = client.post(
        "/api/search/text",
        data={"query": "drill", "limit": 10, "filters": "is there a drill?"},
    )
    assert len(r.json()["results"]) == 2

    # unknown progress
    assert (
        client.get(
            "/api/filter-progress", params={"filter_query": "nope"}
        ).json()["status"]
        == "not_found"
    )

    # delete (path segment URL-encoded, as the frontend client does)
    from urllib.parse import quote

    enc = quote("is there a drill?", safe="")
    assert client.delete(f"/api/filters/{enc}").status_code == 200
    assert client.delete(f"/api/filters/{enc}").status_code == 404


def test_empty_query_with_filters_lists_all(client):
    upload(client, "red drill.jpg")
    upload(client, "red drill match.jpg")
    client.state.save_filters(["f1"])
    # one image answers yes
    imgs = client.get("/api/images").json()["images"]
    target = imgs[0]["id"]
    with client.state.lock:
        md = dict(client.state.image_metadata[target])
        md["filter_results_json"] = json.dumps({"f1": "yes"})
        client.state.image_metadata[target] = md
        client.state.store.update(ids=[target], metadatas=[md])
    r = client.post(
        "/api/search/text", data={"query": "  ", "limit": 10, "filters": "f1"}
    )
    results = r.json()["results"]
    assert [x["id"] for x in results] == [target]
    # no similarity_score on the listing path (reference main.py:245-249)
    assert "similarity_score" not in results[0]


def test_new_upload_gets_existing_filters_applied(client):
    client.state.save_filters(["is there a drill?", "is it blue?"])
    md = upload(client, "red drill.jpg").json()["metadata"]
    fr = json.loads(md["filter_results_json"])
    assert fr["is there a drill?"] == "Yes"
    assert fr["is it blue?"] == "No"


def test_reset(client):
    upload(client)
    client.state.save_filters(["x"])
    r = client.post("/api/reset")
    assert r.json()["success"] is True
    assert client.get("/api/images").json()["images"] == []
    assert client.get("/api/filters").json()["filters"] == []


def test_unified_search_dispatch(client):
    upload(client, "red drill.jpg")
    r = client.post("/search", data={"query": "drill"})
    assert r.json()["mode"] == "text"
    r = client.post(
        "/search",
        files={"file": ("q.jpg", jpg_bytes(), "image/jpeg")},
    )
    assert r.json()["mode"] == "image"
    r = client.post(
        "/search",
        files={"file": ("q.jpg", jpg_bytes(), "image/jpeg")},
        data={"query": "drill", "enhance_with_caption": "true"},
    )
    assert r.json()["mode"] == "multimodal"
    assert client.post("/search", data={}).status_code == 422


def test_upload_samples(client, monkeypatch):
    monkeypatch.setenv("IMATCH_SAMPLES_DIR", CORPUS)
    r = client.post("/upload-samples")
    body = r.json()
    assert body["successful"] == 6
    r2 = client.post("/upload-samples")
    assert r2.json()["skipped"] == 6


def test_batch_filter_add(client):
    r = client.post(
        "/api/filters/batch",
        data={"filter_queries": "has a drill?, is outdoors? , has a drill?"},
    )
    body = r.json()
    assert body["added"] == ["has a drill?", "is outdoors?"]
    assert client.get("/api/filters").json()["filters"] == [
        "has a drill?",
        "is outdoors?",
    ]


def test_health(client):
    r = client.get("/api/health")
    assert r.json()["status"] == "ok"
    assert r.json()["captioner"] is True


def test_cors_preflight(client):
    # a GENUINE preflight carries Origin + Access-Control-Request-Method
    # (what Starlette's CORSMiddleware keys on too); bare OPTIONS falls
    # through to normal routing
    r = client.request(
        "OPTIONS",
        "/api/images",
        headers={
            "origin": "http://localhost:3000",
            "access-control-request-method": "GET",
            "access-control-request-headers": "content-type",
        },
    )
    assert r.status_code == 204
    assert "access-control-allow-origin" in r.headers
    # credentialed responses must echo requested headers, not "*"
    assert r.headers["access-control-allow-headers"] == "content-type"
    # bare OPTIONS without preflight headers is ordinary routing: no
    # OPTIONS route exists -> 404, never a phantom 204 for any path
    r = client.request("OPTIONS", "/api/nonexistent")
    assert r.status_code == 404


# ---------------------------------------------------------------------------
# Web UI pages (serving/ui.py)
# ---------------------------------------------------------------------------


def test_ui_pages_serve_and_are_consistent(client):
    import re

    for path in ("/", "/manage"):
        r = client.get(path)
        assert r.status_code == 200
        assert r.headers["content-type"].startswith("text/html")
        html = r.text
        # every element id the inline JS references must exist in the DOM
        js_ids = set(re.findall(r"\$\('#([\w]+)'\)", html)) | set(
            re.findall(r"getElementById\('([\w]+)'\)", html)
        )
        dom_ids = set(re.findall(r'id="([\w]+)"', html))
        assert js_ids <= dom_ids, (path, js_ids - dom_ids)


def test_ui_manage_dropzone_capabilities(client):
    """Pins the FileDropzone-equivalent capability set (reference
    frontend/src/components/FileDropzone.tsx:17-24, lib/api.ts:125-238):
    drag-drop zone, 10 MB client cap, sequential per-file progress with
    409-as-skipped classification."""
    html = client.get("/manage").text
    assert 'id="dropzone"' in html
    assert "MAX_FILE_MB=10" in html
    assert "uploadSequential" in html
    assert "Uploading file ${i+1} of ${total}" in html
    assert "r.status===409" in html  # duplicate classified as skipped
    assert "dataTransfer" in html  # drop handler wires into the input


def test_metrics_and_profiler_endpoints(client):
    # generate some activity
    r = client.post(
        "/api/search/text", data={"query": "anything", "limit": "3"}
    )
    assert r.status_code == 200
    m = client.get("/api/metrics").json()
    assert "timings" in m and "embed.text" in m["timings"]
    assert m["timings"]["embed.text"]["count"] >= 1
    assert "index_count" in m
    # operational index snapshot (store.stats)
    assert m["index"]["engine"] in (
        "tilemax", "sharded", "pallas", "ivf", "ivf-sharded", "tilemax-host"
    )
    assert m["index"]["live"] == m["index_count"]
    assert "score_dtype" in m["index"]

    # profiler start/stop lifecycle (CPU backend traces fine)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        r = client.post("/api/profile/start", data={"log_dir": d})
        assert r.status_code == 200, r.text
        r2 = client.post("/api/profile/start", data={"log_dir": d})
        assert r2.status_code == 409  # already active
        r3 = client.post("/api/profile/stop")
        assert r3.status_code == 200
        r4 = client.post("/api/profile/stop")
        assert r4.status_code == 409  # none active


def test_search_text_get_variant(client):
    """README-documented GET form of text search works alongside POST."""
    up = client.post(
        "/api/upload",
        files={"file": ("d.png", _png_bytes(_rand_img(0)), "image/png")},
        data={"description": "a drill"},
    )
    assert up.status_code == 200
    r = client.get("/api/search/text?query=drill&limit=5")
    assert r.status_code == 200
    assert len(r.json()["results"]) >= 1


def test_search_batch_matches_single(client):
    """POST /api/search/batch: one dispatch for Q queries, each row
    identical to the equivalent /api/search/text call."""
    for n in os.listdir(CORPUS):
        upload(client, n)
    queries = ["red drill", "a yellow banana", "power tool on a table"]
    r = client.post("/api/search/batch", json={"queries": queries, "limit": 4})
    assert r.status_code == 200
    rows = r.json()["results"]
    assert len(rows) == len(queries)
    for q, row in zip(queries, rows):
        single = client.post(
            "/api/search/text", data={"query": q, "limit": 4}
        ).json()["results"]
        assert [x["id"] for x in row] == [x["id"] for x in single]
        assert [x["similarity_score"] for x in row] == pytest.approx(
            [x["similarity_score"] for x in single], rel=1e-5
        )


def test_search_batch_filters_and_limits(client):
    upload(client, "red drill.jpg")
    upload(client, "orange drill.avif")
    client.post("/api/filters", data={"filter_query": "is it a drill"})
    for _ in range(100):
        p = client.get(
            "/api/filter-progress", params={"filter_query": "is it a drill"}
        ).json()
        if p.get("status") == "completed":
            break
        time.sleep(0.05)
    # filters apply per row, same as the single route
    r = client.post(
        "/api/search/batch",
        json={"queries": ["drill"], "limit": 0, "filters": ["is it a drill"]},
    )
    assert r.status_code == 200
    (row,) = r.json()["results"]
    assert len(row) == 2  # limit 0 -> all (FakeCaptioner answers Yes)
    # empty queries list -> empty results, not an error
    r = client.post("/api/search/batch", json={"queries": []})
    assert r.status_code == 200 and r.json()["results"] == []
    # empty query string + filters -> the newest-first listing, exactly
    # like POST /api/search/text's documented idiom (main.py:245) — and
    # it must coexist with embedded queries in the same batch
    single = client.post(
        "/api/search/text", data={"query": "", "limit": 0, "filters": "is it a drill"}
    ).json()["results"]
    r = client.post(
        "/api/search/batch",
        json={"queries": ["", "drill"], "limit": 0, "filters": ["is it a drill"]},
    )
    assert r.status_code == 200
    listing_row, embedded_row = r.json()["results"]
    assert [x["id"] for x in listing_row] == [x["id"] for x in single]
    assert len(embedded_row) == 2 and "similarity_score" in embedded_row[0]


def test_search_batch_validation(client):
    assert client.post("/api/search/batch", json={}).status_code == 422
    assert (
        client.post(
            "/api/search/batch", json={"queries": "not a list"}
        ).status_code
        == 422
    )
    assert (
        client.post(
            "/api/search/batch", json={"queries": ["ok", 3]}
        ).status_code
        == 422
    )
    r = client.post(
        "/api/search/batch", json={"queries": ["q"] * 257}
    )
    assert r.status_code == 422
    # filters must be a list of strings, not a bare string / number
    for bad in ("is it red", 5, [3]):
        r = client.post(
            "/api/search/batch", json={"queries": ["q"], "filters": bad}
        )
        assert r.status_code == 422, bad


def test_search_image_batch_matches_single(client):
    """POST /api/search/image-batch: one batched tower+index pass, each
    row identical to the equivalent /api/search/image call."""
    for n in os.listdir(CORPUS):
        upload(client, n)
    names = ["red drill.jpg", "orange drill.avif", "red drill not match.jpg"]
    files = [("files", (n, jpg_bytes(n), "image/jpeg")) for n in names]
    r = client.post("/api/search/image-batch", files=files, data={"limit": 4})
    assert r.status_code == 200
    rows = r.json()["results"]
    assert len(rows) == len(names)
    for n, row in zip(names, rows):
        single = client.post(
            "/api/search/image",
            files={"file": (n, jpg_bytes(n), "image/jpeg")},
            data={"limit": 4},
        ).json()["results"]
        assert [x["id"] for x in row] == [x["id"] for x in single]
        assert [x["similarity_score"] for x in row] == pytest.approx(
            [x["similarity_score"] for x in single], rel=1e-5
        )
    # self-match ranks first with similarity 1.0 in every row
    assert rows[0][0]["filename"] == "red drill.jpg"
    assert rows[0][0]["similarity_score"] > 0.999


def test_search_image_batch_validation(client):
    assert client.post("/api/search/image-batch").status_code == 422
    r = client.post(
        "/api/search/image-batch",
        files=[("files", ("bad.jpg", b"not an image", "image/jpeg"))],
    )
    assert r.status_code == 422
    assert "bad.jpg" in r.json()["error"]
    many = [
        ("files", (f"f{i}.jpg", jpg_bytes(), "image/jpeg")) for i in range(257)
    ]
    assert client.post("/api/search/image-batch", files=many).status_code == 422


def test_backfill_error_isolation(client):
    """A captioner that blows up on one image must not kill the job."""
    state = client.state

    class Flaky:
        available = True
        calls = 0

        def encode_image(self, arr):
            return {"feat": np.asarray(arr, np.float32).mean(axis=(0, 1))}

        def caption(self, encoded):
            return {"caption": "x"}

        def query(self, encoded, q):
            Flaky.calls += 1
            if Flaky.calls == 1:
                raise RuntimeError("boom")
            return {"answer": "Yes"}

    state.captioner = Flaky()
    for i in range(3):
        client.post(
            "/api/upload",
            files={"file": (f"f{i}.png", _png_bytes(_rand_img(10 + i)), "image/png")},
        )
    client.post("/api/filters", data={"filter_query": "is broken"})
    import time as _t

    for _ in range(200):
        p = client.get("/api/filter-progress?filter_query=is%20broken").json()
        if p.get("status") in ("completed", "error"):
            break
        _t.sleep(0.05)
    assert p["status"] == "completed"  # survived the mid-job exception


def test_static_path_traversal_blocked(client):
    up = upload(client)
    assert up.status_code == 200
    # normal static fetch works
    url = up.json()["metadata"]["url"]
    assert client.get(url).status_code == 200
    # absolute-path and dot-dot escapes must not serve host files
    for evil in (
        "/static//etc/passwd",
        "/static/../../../../etc/passwd",
        "/static/%2e%2e/%2e%2e/etc/passwd",
    ):
        r = client.get(evil)
        assert r.status_code in (403, 404), evil
        assert b"root:" not in r.content, evil


def test_multipart_preserves_trailing_newlines(client):
    """Part content ending in CR/LF must arrive byte-exact (a stripped
    trailing newline changes the stored bytes and the phash id)."""
    payload = b"hello world\n"
    r = client.post(
        "/api/upload",
        files={"file": ("x.bin", payload, "application/octet-stream")},
        data={"description": "line1\n"},
    )
    # decode fails (not an image) -> 500, but the handler received the
    # exact bytes; verify at the parser level instead:
    from imatch_tpu.serving.asgi import _parse_multipart

    boundary = "testbound123"
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="file"; filename="x.bin"\r\n'
        "Content-Type: application/octet-stream\r\n\r\n"
    ).encode() + payload + (
        f"\r\n--{boundary}\r\n"
        'Content-Disposition: form-data; name="description"\r\n\r\n'
        "line1\n"
        f"\r\n--{boundary}--\r\n"
    ).encode()
    form = _parse_multipart(body, f'multipart/form-data; boundary="{boundary}"')
    assert form.get("file").content == payload
    assert form.get("description") == "line1\n"


def test_options_has_single_cors_origin(client):
    r = client.request(
        "OPTIONS",
        "/api/upload",
        headers={
            "origin": "http://localhost:3000",
            "access-control-request-method": "POST",
        },
    )
    assert r.status_code == 204
    vals = [
        v for k, v in r.headers.multi_items()
        if k.lower() == "access-control-allow-origin"
    ]
    assert len(vals) == 1, vals


def test_filter_with_slash_deletable(client):
    r = client.post("/api/filters", data={"filter_query": "indoor/outdoor"})
    assert r.status_code == 200
    assert "indoor/outdoor" in client.get("/api/filters").json()["filters"]
    r = client.delete("/api/filters/indoor%2Foutdoor")
    assert r.status_code == 200
    assert "indoor/outdoor" not in client.get("/api/filters").json()["filters"]


def test_ui_escapes_user_content(client):
    """Stored XSS probe: HTML in a description must come back escaped by
    the UI's esc() helper (present in both pages' inline JS)."""
    for page in ("/", "/manage"):
        html = client.get(page).text
        assert "const esc=" in html
        # every ${...} interpolation of API data goes through esc( or is
        # numeric/static; spot-check the known user-content sites
        assert "${esc(" in html


def test_no_raw_path_params_not_double_decoded(client):
    """When an ASGI server omits scope['raw_path'], captured path params
    must not be percent-decoded a second time (a filter literally named
    "50%2Foff" would otherwise become "50/off" and 404)."""
    state = client.state
    r = client.post("/api/filters", data={"filter_query": "50%2Foff"})
    assert r.status_code == 200
    assert "50%2Foff" in state.load_filters()

    async def call_without_raw_path():
        scope = {
            "type": "http",
            "method": "DELETE",
            "path": "/api/filters/50%2Foff",  # already-decoded per spec
            "query_string": b"",
            "headers": [],
        }
        received = {"status": None}

        async def receive():
            return {"type": "http.request", "body": b"", "more_body": False}

        async def send(msg):
            if msg["type"] == "http.response.start":
                received["status"] = msg["status"]

        await client.app(scope, receive, send)
        return received["status"]

    status = asyncio.run(call_without_raw_path())
    assert status == 200
    assert "50%2Foff" not in state.load_filters()


def test_ui_scripts_have_no_invalid_unicode_escapes(client):
    """A bare \\u not followed by 4 hex digits inside a JS string is an
    unconditional ECMAScript parse error that kills the page's entire
    inline script (every handler dead). No JS engine ships in this
    image, so pin the byte pattern plus delimiter balance."""
    import re

    for page in ("/", "/manage"):
        r = client.get(page)
        assert r.status_code == 200
        text = r.text
        for m in re.finditer(r"\\u(?![0-9a-fA-F]{4})", text):
            ctx = text[max(0, m.start() - 60) : m.start() + 20]
            raise AssertionError(f"invalid \\u escape in {page}: ...{ctx!r}")
        for script in re.findall(r"<script>(.*?)</script>", text, re.S):
            assert script.count("`") % 2 == 0, f"unbalanced backticks in {page}"
            assert script.count("{") == script.count("}"), (
                f"unbalanced braces in {page}"
            )


def test_upload_folder_stores_original_bytes_verbatim(client, monkeypatch):
    """Bulk ingest without background removal stores the uploaded file's
    exact bytes under its own extension (no lossless-but-slow PNG
    re-encode of identical pixels); IMATCH_SAVE_ORIGINAL=0 restores the
    reference's always-PNG behavior."""
    import io as _io

    from PIL import Image as _Image

    rng = np.random.default_rng(77)
    im = _Image.fromarray(rng.integers(0, 256, (40, 40, 3), np.uint8))
    buf = _io.BytesIO()
    im.save(buf, "JPEG", quality=90)
    jpeg = buf.getvalue()

    r = client.post(
        "/api/upload-folder",
        files=[("files", ("photo.jpg", jpeg, "image/jpeg"))],
    )
    assert r.status_code == 200
    res = r.json()["results"][0]
    assert res["status"] == "success"
    md = client.state.image_metadata[res["id"]]
    assert md["url"].endswith(".jpg")
    with open(md["processed_url"], "rb") as f:
        assert f.read() == jpeg  # byte-for-byte the original
    assert client.get(md["url"]).status_code == 200

    # reference-parity mode: always re-encode PNG
    monkeypatch.setenv("IMATCH_SAVE_ORIGINAL", "0")
    buf2 = _io.BytesIO()
    _Image.fromarray(rng.integers(0, 256, (40, 40, 3), np.uint8)).save(
        buf2, "JPEG", quality=90
    )
    r = client.post(
        "/api/upload-folder",
        files=[("files", ("photo2.jpg", buf2.getvalue(), "image/jpeg"))],
    )
    res = r.json()["results"][0]
    assert res["status"] == "success"
    md = client.state.image_metadata[res["id"]]
    assert md["url"].endswith(".png")


def test_unserializable_handler_result_is_500(client):
    """A handler returning non-JSON-serializable data must surface as a
    logged 500, not an unhandled exception killing the connection."""
    import numpy as np

    @client.app.get("/api/_test_bad")
    def bad(req):
        return {"x": np.float32(1.5), "arr": np.arange(3)}

    r = client.get("/api/_test_bad")
    assert r.status_code == 500
    assert "unserializable" in r.json()["error"]


def test_unlisted_origin_never_gets_credentialed_cors(client):
    """'*' in the origin list must NOT reflect arbitrary Origins with
    allow-credentials — only explicitly-listed origins get the
    credentialed response; others get the wildcard WITHOUT credentials."""
    r = client.get("/api/images", headers={"origin": "https://evil.example"})
    acao = r.headers.get("access-control-allow-origin")
    cred = r.headers.get("access-control-allow-credentials")
    assert acao in (None, "*")
    assert cred is None
    # explicitly-listed dev origin still gets the credentialed reflect
    r = client.get(
        "/api/images", headers={"origin": "http://localhost:3000"}
    )
    assert r.headers["access-control-allow-origin"] == "http://localhost:3000"
    assert r.headers["access-control-allow-credentials"] == "true"


def test_string_field_sent_as_file_is_422(client):
    """A multipart client sending 'query' as a FILE part must get a 422
    validation error, not an AttributeError 500."""
    r = client.post(
        "/api/search/text",
        files={"query": ("q.txt", b"drill", "text/plain")},
        data={"limit": "3", "filters": "x"},
    )
    assert r.status_code == 422
    assert "string" in r.json()["error"]


def test_metadata_update_races_reset_404_not_500(client):
    md = upload(client).json()["metadata"]
    client.post("/api/reset")
    r = client.put(
        f"/api/metadata/{md['id']}",
        data={"description": "after reset"},
    )
    assert r.status_code == 404
    assert client.get("/api/images").json()["images"] == []


def test_file_part_string_fields_are_422(client):
    """Multipart clients can send ANY field as a FILE part. String
    fields that reached handlers as UploadFile objects used to either
    500 (.strip()/.split() AttributeError) or poison persistent state
    (an UploadFile inside store metadata or filters.json makes every
    later json.dumps — journal, snapshot, SIGTERM save — raise)."""
    r = client.post(
        "/api/upload",
        files={
            "file": ("a.jpg", jpg_bytes(), "image/jpeg"),
            "description": ("d.txt", b"sneaky", "text/plain"),
        },
    )
    assert r.status_code == 422
    assert client.get("/api/images").json()["images"] == []
    r = client.post(
        "/api/filters",
        files={"filter_query": ("f.txt", b"x", "text/plain")},
    )
    assert r.status_code == 422
    assert client.get("/api/filters").json()["filters"] == []
    r = client.post(
        "/api/filters/batch",
        files={"filter_queries": ("f.txt", b"a,b", "text/plain")},
    )
    assert r.status_code == 422
    assert client.get("/api/filters").json()["filters"] == []
    r = client.post(
        "/search", files={"query": ("q.txt", b"drill", "text/plain")}
    )
    assert r.status_code == 422

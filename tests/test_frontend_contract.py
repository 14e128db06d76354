"""Replays the EXACT request set the reference Next.js client makes
(/root/reference/frontend/src/lib/api.ts:47-380) against this server:
same methods, same multipart field names (axios FormData sends multipart
even for text-only forms), same URL encodings, and asserts the response
fields the client and its Zustand stores read. Passing this file means
the reference frontend can point NEXT_PUBLIC_API_URL here unchanged.
"""

import asyncio
import io

import httpx
import numpy as np
import pytest
from PIL import Image

from imatch_tpu.models.clip.configs import TINY
from imatch_tpu.pipeline.captioner import NullCaptioner
from imatch_tpu.pipeline.embedder import ClipEmbedder
from imatch_tpu.pipeline.state import AppState
from imatch_tpu.serving.app import create_app


@pytest.fixture(scope="module")
def embedder():
    return ClipEmbedder(config=TINY)


@pytest.fixture()
def client(tmp_path, embedder):
    state = AppState(
        root=str(tmp_path), embedder=embedder, captioner=NullCaptioner()
    )
    app = create_app(state)
    transport = httpx.ASGITransport(app=app)
    c = httpx.AsyncClient(transport=transport, base_url="http://localhost:8000")

    class Sync:
        state_ = state

        def request(self, method, url, **kw):
            return asyncio.run(c.request(method, url, **kw))

    return Sync()


def _png_bytes(seed, size=(48, 40)):
    rng = np.random.default_rng(seed)
    buf = io.BytesIO()
    Image.fromarray(
        rng.integers(0, 256, size + (3,), np.uint8)
    ).save(buf, "PNG")
    return buf.getvalue()


def _mp(fields, files=()):
    """Multipart body exactly as axios FormData: every text field is a
    part (api.ts posts multipart even for query-only forms)."""
    out = [(k, (None, v)) for k, v in fields]
    out += [(k, (name, data, "image/png")) for k, name, data in files]
    return {"files": out}


def test_api_ts_full_call_set(client):
    # uploadImage (api.ts:48-69): file + description + custom_metadata +
    # remove_bg=String(false) -> data.metadata.id (uploadStore.ts reads it)
    r = client.request(
        "POST",
        "/api/upload",
        **_mp(
            [
                ("description", "a red drill"),
                ("custom_metadata", "tool"),
                ("remove_bg", "false"),
            ],
            [("file", "drill.png", _png_bytes(0))],
        ),
    )
    assert r.status_code == 200
    dup_id = r.json()["metadata"]["id"]
    assert r.json()["metadata"]["url"].startswith("/static/")

    # uploadFolderWithProgress (api.ts:72-238): sequential /api/upload
    # posts; a 409 must carry data.message and data.metadata.id (the
    # client classifies it as skipped and extracts the duplicate id)
    r = client.request(
        "POST",
        "/api/upload",
        **_mp([("remove_bg", "false")], [("file", "dup.png", _png_bytes(0))]),
    )
    assert r.status_code == 409
    body = r.json()
    assert "Duplicate" in body["error"]
    assert body["message"]
    assert body["metadata"]["id"] == dup_id

    # uploadFolder (api.ts:241-255): repeated 'files' parts + remove_bg
    r = client.request(
        "POST",
        "/api/upload-folder",
        **_mp(
            [("remove_bg", "false")],
            [
                ("files", "a.png", _png_bytes(1)),
                ("files", "b.png", _png_bytes(2)),
                ("files", "dup.png", _png_bytes(0)),
            ],
        ),
    )
    assert r.status_code == 200
    body = r.json()
    assert body["success"] is True and body["total"] == 3
    assert body["successful"] == 2 and body["skipped"] == 1
    statuses = {x["filename"]: x["status"] for x in body["results"]}
    assert statuses == {"a.png": "success", "b.png": "success", "dup.png": "skipped"}

    # searchByImage (api.ts:258-276): file + repeated filters + limit
    r = client.request(
        "POST",
        "/api/search/image",
        **_mp(
            [("limit", "10")],
            [("file", "q.png", _png_bytes(1))],
        ),
    )
    assert r.status_code == 200
    results = r.json()["results"]
    assert results and {"id", "similarity_score", "url"} <= set(results[0])

    # searchByText (api.ts:279-296): multipart text form; limit=0 is All
    r = client.request(
        "POST",
        "/api/search/text",
        **_mp([("query", "drill"), ("limit", "0")]),
    )
    assert r.status_code == 200
    assert len(r.json()["results"]) == 3

    # searchMultimodal (api.ts:299-319): file+query+weight_image+limit
    r = client.request(
        "POST",
        "/api/search/multimodal",
        **_mp(
            [("query", "red tool"), ("weight_image", "0.7"), ("limit", "10")],
            [("file", "q.png", _png_bytes(2))],
        ),
    )
    assert r.status_code == 200
    assert r.json()["results"]

    # getAllImages (api.ts:322) -> data.images (imageStore.ts)
    r = client.request("GET", "/api/images")
    assert len(r.json()["images"]) == 3

    # getImageById (api.ts:327) -> data.image
    r = client.request("GET", f"/api/image/{dup_id}")
    assert r.json()["image"]["id"] == dup_id

    # addFilter (api.ts:337-346): multipart filter_query -> data.filters
    r = client.request(
        "POST", "/api/filters", **_mp([("filter_query", "is it a tool?")])
    )
    assert r.status_code == 200
    assert "is it a tool?" in r.json()["filters"]

    # getFilters (api.ts:332) -> data.filters (filterStore.ts)
    r = client.request("GET", "/api/filters")
    assert r.json()["filters"] == ["is it a tool?"]

    # getFilterProgress (api.ts:349-351): encodeURIComponent query param
    r = client.request(
        "GET", "/api/filter-progress?filter_query=is%20it%20a%20tool%3F"
    )
    assert r.status_code == 200
    assert "status" in r.json()

    # filtered text search: repeated 'filters' parts AND empty query ->
    # list-all semantics (search/page.tsx uses this for browse-by-filter)
    r = client.request(
        "POST",
        "/api/search/text",
        **_mp(
            [("query", ""), ("filters", "is it a tool?"), ("limit", "10")]
        ),
    )
    assert r.status_code == 200  # NullCaptioner: no yes-answers, empty ok
    assert r.json()["results"] == []

    # updateMetadata (api.ts:364-379): description required, optional
    # custom_metadata -> data.metadata
    r = client.request(
        "PUT",
        f"/api/metadata/{dup_id}",
        **_mp([("description", "edited"), ("custom_metadata", "x")]),
    )
    assert r.status_code == 200
    assert r.json()["metadata"]["description"] == "edited"

    # deleteFilter (api.ts:354-356): encodeURIComponent in the path
    r = client.request("DELETE", "/api/filters/is%20it%20a%20tool%3F")
    assert r.status_code == 200
    assert r.json()["filters"] == []

    # resetSystem (api.ts:359-361)
    r = client.request("POST", "/api/reset")
    assert r.status_code == 200 and r.json()["success"] is True
    r = client.request("GET", "/api/images")
    assert r.json()["images"] == []

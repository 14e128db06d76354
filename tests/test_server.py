"""Socket-level smoke test of the first-party HTTP server."""

import asyncio
import os
import threading

import httpx
import pytest

from imatch_tpu.models.clip.configs import TINY
from imatch_tpu.pipeline.captioner import NullCaptioner
from imatch_tpu.pipeline.embedder import ClipEmbedder
from imatch_tpu.pipeline.state import AppState
from imatch_tpu.serving.app import create_app
from imatch_tpu.serving.server import serve_async

CORPUS = "/root/reference/images"


@pytest.fixture(scope="module")
def server_url(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("srv")
    state = AppState(
        root=str(tmp),
        embedder=ClipEmbedder(config=TINY),
        captioner=NullCaptioner(),
    )
    app = create_app(state)
    port = 8765
    loop = asyncio.new_event_loop()
    ready = None

    def run():
        nonlocal ready
        asyncio.set_event_loop(loop)
        ready_evt = asyncio.Event()
        globals()["_ready_evt"] = ready_evt
        loop.run_until_complete(
            serve_async(app, host="127.0.0.1", port=port, ready=ready_evt)
        )

    t = threading.Thread(target=run, daemon=True)
    t.start()
    # wait for the socket to accept
    import socket
    import time

    for _ in range(100):
        try:
            socket.create_connection(("127.0.0.1", port), timeout=0.2).close()
            break
        except OSError:
            time.sleep(0.05)
    return f"http://127.0.0.1:{port}"


def test_http_roundtrip(server_url):
    with httpx.Client(base_url=server_url) as c:
        r = c.get("/api/health")
        assert r.status_code == 200
        assert r.json()["status"] == "ok"

        # multipart upload over a real socket
        with open(os.path.join(CORPUS, "red drill.jpg"), "rb") as f:
            data = f.read()
        r = c.post(
            "/api/upload",
            files={"file": ("red drill.jpg", data, "image/jpeg")},
            data={"description": "socket upload"},
        )
        assert r.status_code == 200
        md = r.json()["metadata"]

        # keep-alive: second request on the same client
        r = c.get(f"/api/image/{md['id']}")
        assert r.json()["image"]["description"] == "socket upload"

        # static file over the socket
        r = c.get(md["url"])
        assert r.status_code == 200
        assert r.headers["content-type"] == "image/png"

        # search
        r = c.post("/api/search/text", data={"query": "drill", "limit": 5})
        assert r.status_code == 200
        assert len(r.json()["results"]) == 1

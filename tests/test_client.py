"""Python API client against a real socket (serving/server.py in a
thread) — end-to-end through HTTP, not ASGI shortcuts."""

import asyncio
import socket
import threading

import numpy as np
import pytest
from PIL import Image

from imatch_tpu.client import ApiError, ImageMatchClient
from imatch_tpu.models.clip.configs import TINY
from imatch_tpu.pipeline.embedder import ClipEmbedder
from imatch_tpu.pipeline.state import AppState
from imatch_tpu.serving.app import create_app
from imatch_tpu.serving.server import serve_async

CORPUS = "/root/reference/images"


class FakeCaptioner:
    available = True

    def encode_image(self, image_np):
        return {"feat": np.asarray(image_np, np.float32).mean(axis=(0, 1))}

    def caption(self, encoded):
        return {"caption": "a drill"}

    def query(self, encoded, question):
        return {"answer": "Yes"}


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("client_srv")
    state = AppState(
        root=str(root),
        embedder=ClipEmbedder(config=TINY),
        captioner=FakeCaptioner(),
    )
    app = create_app(state)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    loop = asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        task = loop.create_task(serve_async(app, "127.0.0.1", port))
        try:
            loop.run_forever()
        finally:
            task.cancel()
            try:
                loop.run_until_complete(task)
            except (asyncio.CancelledError, Exception):
                pass

    t = threading.Thread(target=run, daemon=True)
    t.start()
    import time

    for _ in range(100):
        try:
            with socket.create_connection(("127.0.0.1", port), 0.2):
                break
        except OSError:
            time.sleep(0.05)
    yield ImageMatchClient(f"http://127.0.0.1:{port}", timeout=120)
    loop.call_soon_threadsafe(loop.stop)


def test_client_full_flow(server, tmp_path):
    c = server
    assert c.health()["status"] == "ok"

    r = c.upload(f"{CORPUS}/red drill.jpg", description="a red drill")
    assert r["success"] and not r.get("duplicate")
    img_id = r["metadata"]["id"]

    # duplicate -> classified, not raised
    r2 = c.upload(f"{CORPUS}/red drill.jpg")
    assert r2.get("duplicate")

    res = c.upload_folder_batched(
        [f"{CORPUS}/red drill match.jpg", f"{CORPUS}/red drill.jpg"]
    )
    assert res["successful"] == 1 and res["skipped"] == 1

    # sequential path with progress callback
    seen = []
    out = c.upload_folder(
        [f"{CORPUS}/red drill not match.jpg"],
        on_progress=lambda i, n, e: seen.append((i, n, e["status"])),
    )
    assert out[0]["status"] == "success" and seen == [(1, 1, "success")]

    hits = c.search_text("red drill", limit=5)
    assert len(hits) >= 1 and "similarity_score" in hits[0]
    rows = c.search_text_batch(["red drill", "banana"], limit=5)
    assert len(rows) == 2
    assert [x["id"] for x in rows[0]] == [x["id"] for x in hits]
    hits = c.search_image(f"{CORPUS}/red drill.jpg", limit=3)
    assert hits[0]["id"] == img_id  # self-match first
    rows = c.search_image_batch(
        [f"{CORPUS}/red drill.jpg", f"{CORPUS}/orange drill.avif"], limit=3
    )
    assert len(rows) == 2
    assert [x["id"] for x in rows[0]] == [x["id"] for x in hits]
    hits = c.search_multimodal(
        f"{CORPUS}/red drill.jpg", "drill", weight_image=0.7, limit=3
    )
    assert hits

    assert any(i["id"] == img_id for i in c.images())
    assert c.image(img_id)["id"] == img_id
    c.update_metadata(img_id, "edited")
    assert c.image(img_id)["description"] == "edited"

    c.add_filter("is it red")
    assert "is it red" in c.filters()
    p = c.wait_for_filter("is it red", poll_s=0.05, timeout_s=30)
    assert p["status"] == "completed"
    hits = c.search_text("red drill", filters=["is it red"], limit=5)
    assert hits  # FakeCaptioner answers Yes for everything

    c.delete_filter("is it red")
    assert "is it red" not in c.filters()

    m = c.metrics()
    assert "timings" in m

    with pytest.raises(ApiError) as ei:
        c.image("img_nope")
    assert ei.value.status == 404

    c.reset()
    assert c.images() == []


def test_init_index_script(tmp_path):
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "scripts/init_index.py", str(tmp_path)],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    assert "initialized empty index" in r.stdout
    r2 = subprocess.run(
        [sys.executable, "scripts/init_index.py", str(tmp_path)],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert "existing index" in r2.stdout  # idempotent


def test_chunked_transfer_rejected(server):
    """Chunked bodies are refused (501) rather than desyncing keep-alive."""
    import socket as _socket
    import urllib.parse

    host = urllib.parse.urlparse(server.base_url).netloc
    h, p = host.split(":")
    with _socket.create_connection((h, int(p)), timeout=10) as s:
        s.sendall(
            b"POST /api/filters HTTP/1.1\r\n"
            b"Host: x\r\nTransfer-Encoding: chunked\r\n\r\n"
            b"5\r\nhello\r\n0\r\n\r\n"
        )
        resp = s.recv(4096)
    assert b"501" in resp.split(b"\r\n")[0]


def test_client_filter_with_slash_roundtrip(server):
    """delete_filter must percent-encode '/' (encodeURIComponent parity) —
    safe='/' would leave it a path separator and 404."""
    c = server
    c.add_filter("indoor/outdoor scene")
    assert "indoor/outdoor scene" in c.filters()
    c.delete_filter("indoor/outdoor scene")
    assert "indoor/outdoor scene" not in c.filters()


def test_client_unicode_and_quote_filenames_roundtrip(server, tmp_path):
    """Multipart filenames with UTF-8 and quotes survive the client ->
    server round-trip: UTF-8 exactly (the server decodes part headers
    as UTF-8 like browsers send them), quotes as %22 (browser-style
    percent-encoding — no truncation, no header injection)."""
    from PIL import Image
    import numpy as np

    c = server  # the fixture yields a ready client
    rng = np.random.default_rng(77)
    p = tmp_path / 'café "q".png'
    Image.fromarray(
        rng.integers(0, 256, (24, 24, 3), np.uint8)
    ).save(p)
    out = c.upload(str(p))
    assert out["success"] is True
    got = out["metadata"]["filename"]
    assert "café" in got  # UTF-8 preserved, not mojibaked
    assert "%22q%22" in got  # quotes percent-encoded, nothing truncated
    assert "\\" not in got

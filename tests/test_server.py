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


def _raw_request(server_url, payload: bytes) -> bytes:
    import socket

    host, port = server_url.rsplit("/", 1)[1].split(":")
    with socket.create_connection((host, int(port)), timeout=5) as s:
        s.sendall(payload)
        s.settimeout(2)
        chunks = []
        try:
            while True:
                b = s.recv(65536)
                if not b:
                    break
                chunks.append(b)
        except socket.timeout:
            pass
    return b"".join(chunks)


def test_head_response_has_no_body(server_url):
    """RFC 9110 §9.3.2: HEAD responses carry headers (incl.
    content-length) but NO body — a body desyncs keep-alive clients."""
    raw = _raw_request(
        server_url,
        b"HEAD /api/health HTTP/1.1\r\nhost: x\r\nconnection: close\r\n\r\n",
    )
    head, _, body = raw.partition(b"\r\n\r\n")
    assert b"200" in head.split(b"\r\n")[0]
    assert b"content-length" in head.lower()
    assert body == b""


def test_malformed_content_length_is_400(server_url):
    raw = _raw_request(
        server_url,
        b"POST /api/filters HTTP/1.1\r\nhost: x\r\n"
        b"content-length: abc\r\nconnection: close\r\n\r\n",
    )
    assert raw.split(b"\r\n")[0].split()[1] == b"400"
    raw = _raw_request(
        server_url,
        b"POST /api/filters HTTP/1.1\r\nhost: x\r\n"
        b"content-length: -5\r\nconnection: close\r\n\r\n",
    )
    assert raw.split(b"\r\n")[0].split()[1] == b"400"


def test_cors_echoes_single_origin_with_credentials(server_url):
    """Fetch spec: allow-origin must be ONE value; credentials require
    echoing the requesting Origin (never '*' or a joined list)."""
    with httpx.Client(base_url=server_url) as c:
        r = c.get("/api/health", headers={"Origin": "http://localhost:3000"})
        assert r.headers["access-control-allow-origin"] == "http://localhost:3000"
        assert r.headers.get("access-control-allow-credentials") == "true"
        # no Origin header: wildcard is fine but credentials must be absent
        r = c.get("/api/health")
        assert r.headers["access-control-allow-origin"] == "*"
        assert "access-control-allow-credentials" not in r.headers


def test_concurrent_filter_adds_lose_nothing(server_url):
    """The load->append->save RMW must be atomic across the handler
    thread pool: N concurrent adds must all land in filters.json."""
    from concurrent.futures import ThreadPoolExecutor

    names = [f"race filter {i}" for i in range(8)]

    def add(n):
        with httpx.Client(base_url=server_url) as c:
            return c.post("/api/filters", data={"filter_query": n}).status_code

    with ThreadPoolExecutor(8) as pool:
        codes = list(pool.map(add, names))
    assert codes == [200] * 8
    with httpx.Client(base_url=server_url) as c:
        filters = c.get("/api/filters").json()["filters"]
    assert set(names) <= set(filters)


def test_idle_connection_closed_by_timeout(server_url, monkeypatch):
    """Slowloris guard: a connection that sends nothing (or half a
    header) must be closed by the idle timeout instead of pinning a
    connection task forever."""
    import socket
    import time

    monkeypatch.setenv("IMATCH_HTTP_IDLE_TIMEOUT", "1")
    host, port = server_url.rsplit("/", 1)[1].split(":")
    t0 = time.time()
    with socket.create_connection((host, int(port)), timeout=10) as s:
        s.sendall(b"GET /api/health HTTP/1.1\r\nhost: x")  # half a header
        s.settimeout(10)
        data = s.recv(65536)  # server closes -> b""
    assert data == b""
    assert time.time() - t0 < 8


def test_stalled_body_closed_by_timeout(server_url, monkeypatch):
    """A request that declares a body and never sends it must be
    dropped by the body timeout."""
    import socket
    import time

    monkeypatch.setenv("IMATCH_HTTP_BODY_TIMEOUT", "1")
    host, port = server_url.rsplit("/", 1)[1].split(":")
    t0 = time.time()
    with socket.create_connection((host, int(port)), timeout=10) as s:
        s.sendall(
            b"POST /api/search/text HTTP/1.1\r\nhost: x\r\n"
            b"content-length: 100000\r\n\r\npartial"
        )
        s.settimeout(10)
        data = s.recv(65536)
    assert data == b""
    assert time.time() - t0 < 8


def test_expect_100_continue_interim_response(server_url):
    """RFC 9110 §10.1.1: a client sending Expect: 100-continue waits for
    the interim response before transmitting the body — without it curl
    stalls ~1 s per upload and stricter clients hit the body timeout."""
    import socket

    host, port = server_url.rsplit("/", 1)[1].split(":")
    body = b"filter_query=via100"
    with socket.create_connection((host, int(port)), timeout=5) as s:
        s.sendall(
            b"POST /api/filters HTTP/1.1\r\nhost: x\r\n"
            b"content-type: application/x-www-form-urlencoded\r\n"
            b"expect: 100-continue\r\n"
            + f"content-length: {len(body)}\r\n".encode()
            + b"connection: close\r\n\r\n"
        )
        s.settimeout(5)
        interim = s.recv(65536)
        assert interim.startswith(b"HTTP/1.1 100 Continue"), interim[:60]
        s.sendall(body)
        chunks = [interim]
        try:
            while True:
                b2 = s.recv(65536)
                if not b2:
                    break
                chunks.append(b2)
        except socket.timeout:
            pass
    raw = b"".join(chunks)
    assert b"HTTP/1.1 200" in raw
    assert b"via100" in raw


def test_static_bad_path_is_400_not_dead_connection(server_url):
    """A percent-encoded NUL in a static path made os.path.realpath
    raise, killing the connection task with no response at all."""
    raw = _raw_request(
        server_url,
        b"GET /static/%00x HTTP/1.1\r\nhost: x\r\nconnection: close\r\n\r\n",
    )
    assert raw.split(b"\r\n")[0].split()[1] == b"400"


def test_non_ascii_header_value_survives_latin1(server_url):
    """Header values are latin-1 on the wire (ASGI spec); a default
    .encode() transcoded raw byte 0xE9 into UTF-8 mojibake."""
    raw = _raw_request(
        server_url,
        b"GET /api/health HTTP/1.1\r\nhost: x\r\n"
        b"x-probe: caf\xe9\r\nconnection: close\r\n\r\n",
    )
    # the request must simply succeed with the raw byte intact in the
    # parsed scope; the access-log/handler path must not crash on it
    assert raw.split(b"\r\n")[0].split()[1] == b"200"


def test_multipart_filename_before_name_field():
    """RFC 6266/7578 mandate no parameter order in Content-Disposition:
    a part with filename before name used to be registered under the
    FILENAME (the bare name=" regex matched inside filename=")."""
    from imatch_tpu.serving.asgi import Request

    body = (
        b"--B\r\n"
        b'Content-Disposition: form-data; filename="a.jpg"; name="files"\r\n'
        b"Content-Type: image/jpeg\r\n\r\n"
        b"JPGDATA\r\n"
        b"--B--\r\n"
    )
    scope = {
        "type": "http",
        "method": "POST",
        "path": "/x",
        "query_string": b"",
        "headers": [(b"content-type", b"multipart/form-data; boundary=B")],
    }
    form = Request(scope, body).form()
    uf = form.get("files")
    assert uf is not None and uf.filename == "a.jpg"
    assert uf.content == b"JPGDATA"
    assert form.get("a.jpg") is None

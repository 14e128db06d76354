"""CloudCaptioner: the reference's MOONDREAM_API_KEY cloud mode
(main.py:94-99) against a local mock of the hosted API."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

from imatch_tpu.pipeline.captioner import CloudCaptioner, get_captioner


@pytest.fixture()
def mock_api():
    seen = {"auth": [], "paths": [], "bodies": []}

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            body = json.loads(
                self.rfile.read(int(self.headers["Content-Length"]))
            )
            seen["auth"].append(self.headers.get("X-Moondream-Auth"))
            seen["paths"].append(self.path)
            seen["bodies"].append(body)
            if self.path.endswith("/caption"):
                out = {"caption": "a red power drill on a white table"}
            else:
                out = {
                    "answer": "Yes"
                    if "drill" in body.get("question", "").lower()
                    else "No"
                }
            data = json.dumps(out).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}/v1", seen
    srv.shutdown()


def test_cloud_caption_and_query(mock_api):
    url, seen = mock_api
    cap = CloudCaptioner("sk-test-123", base_url=url)
    img = np.zeros((32, 32, 3), np.uint8)
    enc = cap.encode_image(img)
    assert CloudCaptioner._url(enc).startswith("data:image/jpeg;base64,")
    assert cap.caption(enc)["caption"].startswith("a red power drill")
    assert cap.query(enc, "Yes or No: is there a drill?")["answer"] == "Yes"
    assert cap.query(enc, "Yes or No: is there a cat?")["answer"] == "No"
    assert set(seen["auth"]) == {"sk-test-123"}
    assert [p.rsplit("/", 1)[1] for p in seen["paths"]] == [
        "caption",
        "query",
        "query",
    ]
    # the question reaches the API verbatim (filter formatting intact)
    assert seen["bodies"][1]["question"] == "Yes or No: is there a drill?"


def test_factory_cloud_first_chain(mock_api, monkeypatch):
    url, _ = mock_api
    # auto + key -> cloud (reference main.py:95-99)
    monkeypatch.setenv("MOONDREAM_API_KEY", "sk-abc")
    monkeypatch.setenv("MOONDREAM_API_URL", url)
    monkeypatch.delenv("IMATCH_CAPTIONER", raising=False)
    cap = get_captioner()
    assert isinstance(cap, CloudCaptioner) and cap.base_url == url
    # explicit cloud without a key -> hard error
    monkeypatch.delenv("MOONDREAM_API_KEY")
    monkeypatch.setenv("IMATCH_CAPTIONER", "cloud")
    with pytest.raises(RuntimeError):
        get_captioner()


def test_cloud_in_ingest_pipeline(mock_api, tmp_path):
    """Full process_image with the cloud captioner: caption lands in
    custom_metadata, existing filters are answered over the API."""
    from imatch_tpu.models.clip.configs import TINY
    from imatch_tpu.pipeline.embedder import ClipEmbedder
    from imatch_tpu.pipeline.ingest import process_image
    from imatch_tpu.pipeline.state import AppState
    from PIL import Image

    url, seen = mock_api
    state = AppState(
        root=str(tmp_path),
        embedder=ClipEmbedder(config=TINY),
        captioner=CloudCaptioner("sk-x", base_url=url),
    )
    state.save_filters(["is there a drill?"])
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 256, (40, 40, 3), np.uint8))
    md, is_new = process_image(state, img, "d.png")
    assert is_new
    assert "a red power drill" in md["custom_metadata"]
    fr = json.loads(md["filter_results_json"])
    assert fr == {"is there a drill?": "Yes"}


def test_cloud_encoded_cache_roundtrip_and_grayscale(mock_api, tmp_path):
    """The npz cache round-trip must keep query() working (the filter
    backfill path loads encodings from disk, backfill.py), and grayscale
    frames must encode as real images, not 3-px-wide column slices."""
    from imatch_tpu.pipeline.captioner import load_encoded, save_encoded

    url, seen = mock_api
    cap = CloudCaptioner("sk-x", base_url=url)
    enc = cap.encode_image(np.full((16, 16), 128, np.uint8))  # 2-D gray
    u = CloudCaptioner._url(enc)
    assert u.startswith("data:image/jpeg;base64,")
    save_encoded(str(tmp_path), "img_x", enc)
    loaded = load_encoded(str(tmp_path), "img_x")
    ans = cap.query(loaded, "Yes or No: is there a drill?")["answer"]
    assert ans == "Yes"
    # the JSON body carried the decoded data-URL string, not an ndarray
    assert seen["bodies"][-1]["image_url"] == u

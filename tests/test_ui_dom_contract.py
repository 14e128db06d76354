"""UI DOM/endpoint cross-contract: the closest-to-a-browser drive this
environment allows.

No JS engine ships in this image (no Chrome/node/embeddable engine, and
installs are forbidden), so the page scripts cannot be *executed*; what
CAN be pinned mechanically is the contract a browser run would exercise:

1. every element id the inline scripts reference
   (getElementById/querySelector('#...')) exists in the served DOM —
   the bug class behind round 2's dead /manage script;
2. every function wired via on*= attributes is defined in the script;
3. every fetch() the scripts can issue is DRIVEN against the live app
   with a representative payload and must answer with its intended
   status — uploads, all three search modes, filters add/list/delete,
   progress polling, metadata edit, reset (the flows of
   /root/reference/templates/main.html:1011 and manage.html:670-948).
"""

import io
import re

import numpy as np
import pytest
from PIL import Image

# reuse the in-process client fixture machinery from the API tests
from tests.test_api import client, embedder  # noqa: F401

PAGES = ("/", "/manage")


def _scripts(html):
    return "\n".join(re.findall(r"<script>(.*?)</script>", html, re.S))


def _png_bytes(seed=0, size=40):
    rng = np.random.default_rng(seed)
    im = Image.fromarray(rng.integers(0, 256, (size, size, 3), dtype=np.uint8))
    buf = io.BytesIO()
    im.save(buf, "PNG")
    return buf.getvalue()


@pytest.mark.parametrize("page", PAGES)
def test_every_dom_reference_resolves(client, page):
    html = client.get(page).text
    js = _scripts(html)
    # the pages define `const $=s=>document.querySelector(s)`
    ids = set(re.findall(r"getElementById\('([^']+)'\)", js))
    ids |= set(re.findall(r"querySelector\('#([A-Za-z0-9_-]+)'", js))
    ids |= set(re.findall(r"\$\('#([A-Za-z0-9_-]+)'\)", js))
    ids |= set(re.findall(r"querySelectorAll\('#([A-Za-z0-9_-]+)[ '\"]", js))
    assert ids, f"no DOM references found in {page} scripts?"
    for el_id in sorted(ids):
        assert f'id="{el_id}"' in html, (
            f"{page} script references #{el_id} but the DOM has no such id"
        )


@pytest.mark.parametrize("page", PAGES)
def test_every_inline_handler_is_defined(client, page):
    html = client.get(page).text
    js = _scripts(html)
    handlers = set(re.findall(r"""on\w+="(\w+)\s*\(""", html))
    for fn in sorted(handlers):
        assert re.search(
            rf"(?:function\s+{fn}\b|(?:const|let|var)\s+{fn}\s*=|async\s+function\s+{fn}\b)",
            js,
        ), f"{page} wires on*={fn}(...) but the script never defines it"


def test_every_script_fetch_target_is_served(client):
    """Collect each fetch() call site across both pages and replay the
    request a browser would send, with real payloads."""
    seen = set()
    for page in PAGES:
        js = _scripts(client.get(page).text)
        # prefix-concatenated targets: fetch('/api/image/'+id)
        for url in re.findall(r"fetch\('([^']+)'\s*\+", js):
            seen.add(url.split("?")[0].rstrip("/") + "/{param}")
        # static targets: fetch('/api/filters')
        for url in re.findall(r"fetch\('([^']+)'[,)]", js):
            seen.add(url.split("?")[0].rstrip("/"))
        # variable targets: const url='/api/...'; url='/api/filters/batch'
        for url in re.findall(r"=\s*'(/api/[a-z/]+)'", js):
            seen.add(url.rstrip("/"))

    png = _png_bytes()
    up = client.post(
        "/api/upload",
        files={"file": ("ui_probe.png", png, "image/png")},
        data={"description": "ui probe"},
    )
    assert up.status_code == 200
    img_id = up.json()["metadata"]["id"]

    drives = {
        "/api/filters": [
            ("GET", {}, 200),
            ("POST", {"data": {"filter_query": "is it a probe"}}, 200),
        ],
        "/api/filters/{param}": [("DELETE", {"param": "is it a probe"}, 200)],
        "/api/filters/batch": [
            (
                "POST",
                {"data": {"filter_queries": "is it red, is it sharp"}},
                200,
            ),
        ],
        "/api/filter-progress": [
            ("GET", {"params": {"filter_query": "missing"}}, 200)
        ],
        # progress polling concatenates the query: same route
        "/api/filter-progress/{param}": [
            ("GET", {"params": {"filter_query": "missing"}}, 200)
        ],
        "/api/images": [("GET", {}, 200)],
        "/api/image/{param}": [("GET", {"param": img_id}, 200)],
        "/api/upload": [
            (
                "POST",
                {"files": {"file": ("p2.png", _png_bytes(seed=2), "image/png")}},
                200,
            ),
            # duplicate -> 409, the status the upload JS classifies
            (
                "POST",
                {"files": {"file": ("p2.png", _png_bytes(seed=2), "image/png")}},
                409,
            ),
        ],
        "/api/upload-folder": [
            (
                "POST",
                {"files": [("files", ("p3.png", _png_bytes(seed=3), "image/png"))]},
                200,
            )
        ],
        "/api/search/text": [
            ("POST", {"data": {"query": "probe", "limit": "5"}}, 200)
        ],
        "/api/search/image": [
            (
                "POST",
                {"files": {"file": ("q.png", png, "image/png")}, "data": {"limit": "5"}},
                200,
            )
        ],
        "/api/search/multimodal": [
            (
                "POST",
                {
                    "files": {"file": ("q.png", png, "image/png")},
                    "data": {"query": "probe", "weight_image": "0.5"},
                },
                200,
            )
        ],
        "/api/metadata/{param}": [
            ("PUT", {"param": img_id, "data": {"description": "edited"}}, 200)
        ],
        "/api/reset": [("POST", {}, 200)],
    }

    # every target the scripts reference must have a drive entry, and
    # every drive must answer with its intended status
    missing = [u for u in sorted(seen) if u not in drives]
    assert not missing, f"fetch targets with no drive coverage: {missing}"
    for url, cases in drives.items():
        for method, kw, want in cases:
            kw = dict(kw)
            param = kw.pop("param", None)
            target = (
                url.replace("/{param}", "").replace("{param}", "")
                if param is None
                else url.replace("{param}", param)
            )
            r = client.request(method, target, **kw)
            assert r.status_code == want, (method, target, r.status_code, r.text[:200])


def test_manage_sections_and_reset_flow(client):
    """The manage page's functional areas + danger-zone reset wiring
    (reference manage.html capabilities: upload, batch upload, filters,
    reset confirm): each area's form/control is present, resetAll() asks
    for confirmation, and the reset endpoint leaves the system empty."""
    html = client.get("/manage").text
    js = _scripts(html)
    for el in ("ufile", "bfiles"):  # single upload + folder upload inputs
        assert f'id="{el}"' in html, f"missing control #{el}"
    assert "resetAll()" in html and "function resetAll" in js.replace(
        "async function resetAll", "function resetAll"
    )
    assert "confirm(" in js, "reset must have a confirm step"
    client.post(
        "/api/upload", files={"file": ("r.png", _png_bytes(seed=9), "image/png")}
    )
    assert client.post("/api/reset").status_code == 200
    assert client.get("/api/images").json()["images"] == []

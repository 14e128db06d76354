"""The sharded index as a *serving* engine (IMATCH_INDEX_ENGINE=sharded).

Round-2 gap (VERDICT.md): parallel/dist_search was a tested library no
request could reach. These tests drive the mesh-sharded engine through
the real VectorStore and the real HTTP route on the virtual 8-device CPU
mesh (conftest.py), pinning bit-identical results vs the single-chip
tilemax engine — the scale-out story for the reference's one-process
hnswlib query (/root/reference/backend/app/main.py:761, SURVEY.md §2.3).
"""

import asyncio

import httpx
import numpy as np
import pytest

from imatch_tpu.index.store import VectorStore


def _mk_corpus(n, d, seed=0):
    rng = np.random.default_rng(seed)
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    return emb


def _pair(n=900, d=64, seed=0):
    emb = _mk_corpus(n, d, seed)
    ids = [f"r{i:05d}" for i in range(n)]
    mds = [{"id": i} for i in ids]
    a = VectorStore(engine="tilemax")
    b = VectorStore(engine="sharded")
    for s in (a, b):
        s.add(ids=ids, embeddings=emb, metadatas=mds)
    return a, b, emb, ids


def test_sharded_engine_matches_tilemax():
    a, b, emb, ids = _pair()
    q = emb[[3, 500, 777]] * 0.9 + _mk_corpus(3, 64, seed=9) * 0.1
    ra = a.query(q, n_results=17)
    rb = b.query(q, n_results=17)
    assert ra["ids"] == rb["ids"]
    for da, db in zip(ra["distances"], rb["distances"]):
        np.testing.assert_allclose(da, db, rtol=0, atol=1e-6)


def test_sharded_engine_self_match_and_duplicate_ties():
    """Tie-to-lower-index must hold ACROSS shards: a duplicate row placed
    in a later shard must lose to its copy in an earlier one."""
    n, d = 640, 32
    emb = _mk_corpus(n, d)
    emb[600] = emb[5]  # cross-shard duplicate (shards of 80 rows)
    ids = [f"x{i:04d}" for i in range(n)]
    s = VectorStore(engine="sharded")
    s.add(ids=ids, embeddings=emb)
    r = s.query(emb[[5]], n_results=2)
    assert r["ids"][0][0] == "x0005"
    assert r["ids"][0][1] == "x0600"
    assert abs(r["distances"][0][0] - r["distances"][0][1]) < 1e-6


def test_sharded_engine_tracks_mutations():
    a, b, emb, ids = _pair(n=300, d=32)
    q = emb[[7]]
    # delete the top hit: both engines must agree on the new ordering
    top = a.query(q, n_results=1)["ids"][0][0]
    for s in (a, b):
        s.delete([top])
    ra, rb = a.query(q, n_results=5), b.query(q, n_results=5)
    assert top not in rb["ids"][0]
    assert ra["ids"] == rb["ids"]
    # add a new exact-match row: it must become the top hit
    for s in (a, b):
        s.add(ids=["new"], embeddings=q)
    ra, rb = a.query(q, n_results=3), b.query(q, n_results=3)
    assert rb["ids"][0][0] == "new"
    assert ra["ids"] == rb["ids"]


def test_sharded_engine_k_exceeds_corpus():
    emb = _mk_corpus(5, 16)
    s = VectorStore(engine="sharded")
    s.add(ids=[f"t{i}" for i in range(5)], embeddings=emb)
    r = s.query(emb[[0]], n_results=50)
    assert r["ids"][0][0] == "t0"
    assert len(r["ids"][0]) == 5  # -1 slots dropped, no phantom rows


def test_auto_engine_resolves_to_sharded_on_mesh():
    import jax

    s = VectorStore(engine="auto")
    expected = "sharded" if len(jax.devices()) > 1 else "tilemax"
    assert s.engine == expected


def test_http_text_search_through_sharded_engine(tmp_path, monkeypatch):
    """GET /api/search/text end-to-end through the sharded engine on the
    virtual 8-device mesh, results identical to a tilemax-backed server."""
    from imatch_tpu.models.clip.configs import TINY
    from imatch_tpu.pipeline.captioner import NullCaptioner
    from imatch_tpu.pipeline.embedder import ClipEmbedder
    from imatch_tpu.pipeline.state import AppState
    from imatch_tpu.serving.app import create_app

    embedder = ClipEmbedder(config=TINY)

    def build(engine, root):
        monkeypatch.setenv("IMATCH_INDEX_ENGINE", engine)
        state = AppState(
            root=str(root), embedder=embedder, captioner=NullCaptioner()
        )
        assert state.store.engine == engine
        return state, create_app(state)

    async def drive(app, uploads):
        transport = httpx.ASGITransport(app=app)
        async with httpx.AsyncClient(
            transport=transport, base_url="http://t"
        ) as c:
            for name, blob in uploads:
                r = await c.post(
                    "/api/upload", files={"file": (name, blob, "image/jpeg")}
                )
                assert r.status_code == 200, r.text
            r = await c.get("/api/search/text?query=red%20drill&limit=5")
            assert r.status_code == 200
            return r.json()["results"]

    import io

    from PIL import Image

    rng = np.random.default_rng(1)
    uploads = []
    for i in range(6):
        im = Image.fromarray(
            rng.integers(0, 256, (48, 48, 3), dtype=np.uint8), "RGB"
        )
        buf = io.BytesIO()
        im.save(buf, "PNG")
        uploads.append((f"img{i}.png", buf.getvalue()))

    _, app_s = build("sharded", tmp_path / "s")
    _, app_t = build("tilemax", tmp_path / "t")
    res_s = asyncio.run(drive(app_s, uploads))
    res_t = asyncio.run(drive(app_t, uploads))
    assert [r["id"] for r in res_s] == [r["id"] for r in res_t]
    assert len(res_s) == 5
    for a, b in zip(res_s, res_t):
        assert a["similarity_score"] == pytest.approx(
            b["similarity_score"], abs=1e-6
        )


def test_ivf_sharded_full_probe_equals_exact():
    """The mesh ANN tier (IMATCH_INDEX_ENGINE=ivf-sharded,
    parallel/dist_ivf.py): with n_probe >= clusters-per-shard every
    shard scans all of its rows, so results must equal the exact
    engines bit-for-bit — ids AND distances."""
    import os

    n, d = 960, 48
    emb = _mk_corpus(n, d, seed=3)
    ids = [f"v{i:05d}" for i in range(n)]
    exact = VectorStore(engine="tilemax")
    ann = VectorStore(engine="ivf-sharded")
    for s in (exact, ann):
        s.add(ids=ids, embeddings=emb)
    q = emb[[7, 430, 901]] * 0.95 + _mk_corpus(3, d, seed=11) * 0.05
    os.environ["IMATCH_IVF_NPROBE"] = "4096"  # >= any shard's clusters
    try:
        ra = ann.query(q, n_results=12)
    finally:
        del os.environ["IMATCH_IVF_NPROBE"]
    re = exact.query(q, n_results=12)
    assert ra["ids"] == re["ids"]
    for da, de in zip(ra["distances"], re["distances"]):
        np.testing.assert_allclose(da, de, rtol=0, atol=1e-6)


def test_ivf_sharded_default_probe_recall_and_mutations():
    """Default n_probe on clustered data: high recall vs exact, global
    ids survive shard offsets, and mutations (delete + re-add) are
    visible after the device cache invalidates."""
    rng = np.random.default_rng(21)
    centers = _mk_corpus(24, 32, seed=5)
    rows = centers[rng.integers(0, 24, 1200)] + 0.05 * rng.standard_normal(
        (1200, 32)
    ).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    ids = [f"c{i:05d}" for i in range(1200)]
    exact = VectorStore(engine="tilemax")
    ann = VectorStore(engine="ivf-sharded")
    for s in (exact, ann):
        s.add(ids=ids, embeddings=rows)
    q = rows[[10, 600, 1100]]
    re = exact.query(q, n_results=10)
    ra = ann.query(q, n_results=10)
    # self-match must always survive (its own cluster is the top probe)
    for row, qi in zip(ra["ids"], (10, 600, 1100)):
        assert row[0] == ids[qi]
    recall = np.mean(
        [
            len(set(a) & set(e)) / len(e)
            for a, e in zip(ra["ids"], re["ids"])
        ]
    )
    assert recall >= 0.9, recall

    ann.delete(ids=[ids[10]])
    r2 = ann.query(q[:1], n_results=3)
    assert ids[10] not in r2["ids"][0]
    ann.add(ids=["fresh"], embeddings=rows[[10]])
    r3 = ann.query(q[:1], n_results=3)
    assert r3["ids"][0][0] == "fresh"

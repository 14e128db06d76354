"""scripts/migrate_from_reference.py against a synthetic Chroma layout.

chromadb itself is not installed here, so the fixture builds the sqlite
schema Chroma 0.4-0.6 writes (collections / segments / embeddings /
embedding_metadata / embeddings_queue — the WAL that holds full fp32
vectors). The migrator must reconstruct ids, metadata (including
filter_results_json), documents, and vectors, honoring WAL
update/delete replay, and fall back to re-embedding processed PNGs for
WAL-pruned rows.
"""

from __future__ import annotations

import os
import sqlite3
import sys

import numpy as np
import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
)

from migrate_from_reference import migrate  # noqa: E402

from imatch_tpu.index.store import VectorStore  # noqa: E402

DIM = 48  # matches the "tiny" CLIP config so --reembed rows agree


def _vec(seed: int) -> np.ndarray:
    return np.random.default_rng(seed).normal(size=(DIM,)).astype("<f4")


def _create_schema(con, topic_column=True):
    """The sqlite DDL Chroma 0.4-0.6 writes — ONE definition shared by
    every fixture variant, so schema drift is fixed in one place."""
    con.executescript(
        """
        CREATE TABLE collections (
            id TEXT PRIMARY KEY, name TEXT, dimension INTEGER);
        CREATE TABLE segments (
            id TEXT PRIMARY KEY, type TEXT, scope TEXT, collection TEXT);
        CREATE TABLE embeddings (
            id INTEGER PRIMARY KEY AUTOINCREMENT, segment_id TEXT,
            embedding_id TEXT, seq_id BLOB, created_at TEXT);
        CREATE TABLE embedding_metadata (
            id INTEGER, key TEXT, string_value TEXT, int_value INTEGER,
            float_value REAL, bool_value INTEGER);
        """
    )
    if topic_column:
        con.execute(
            "CREATE TABLE embeddings_queue (seq_id INTEGER PRIMARY KEY,"
            " created_at TEXT, operation INTEGER, topic TEXT, id TEXT,"
            " vector BLOB, encoding TEXT, metadata TEXT)"
        )
    else:
        con.execute(
            "CREATE TABLE embeddings_queue (seq_id INTEGER PRIMARY KEY,"
            " created_at TEXT, operation INTEGER, id TEXT,"
            " vector BLOB, encoding TEXT, metadata TEXT)"
        )


def make_chroma_db(dirpath, *, prune_wal_for=(), topic_column=True, ids=None):
    """Synthetic reference deployment. Default: the 3-live-row scenario
    with WAL add/update/delete replay and typed metadata. With ``ids``:
    a simple N-row corpus (one filename metadata + one WAL add per id)
    for scale-shaped tests."""
    os.makedirs(dirpath, exist_ok=True)
    con = sqlite3.connect(os.path.join(dirpath, "chroma.sqlite3"))
    _create_schema(con, topic_column=topic_column)
    con.execute(
        "INSERT INTO collections VALUES ('col-1', 'image-match', ?)", (DIM,)
    )
    con.executemany(
        "INSERT INTO segments VALUES (?, ?, ?, 'col-1')",
        [
            ("seg-md", "urn:chroma:segment/metadata/sqlite", "METADATA"),
            ("seg-vec", "urn:chroma:segment/vector/hnsw-local", "VECTOR"),
        ],
    )
    if ids is not None:
        con.executemany(
            "INSERT INTO embeddings (id, segment_id, embedding_id)"
            " VALUES (?, 'seg-md', ?)",
            list(enumerate(ids, start=1)),
        )
        con.executemany(
            "INSERT INTO embedding_metadata VALUES (?, 'filename', ?,"
            " NULL, NULL, NULL)",
            [(pk, f"{i}.jpg") for pk, i in enumerate(ids, start=1)],
        )
        con.executemany(
            "INSERT INTO embeddings_queue VALUES (?, '', 0, 'col-1', ?, ?,"
            " 'FLOAT32', '{}')"
            if topic_column
            else "INSERT INTO embeddings_queue VALUES (?, '', 0, ?, ?,"
            " 'FLOAT32', '{}')",
            [
                (pk, i, _vec(pk).tobytes())
                for pk, i in enumerate(ids, start=1)
            ],
        )
        con.commit()
        con.close()
        return
    # Live set: img_a, img_b, img_c (img_d was added then deleted — it
    # appears only in the WAL, not in embeddings).
    for pk, emb_id in ((1, "img_a"), (2, "img_b"), (3, "img_c")):
        con.execute(
            "INSERT INTO embeddings (id, segment_id, embedding_id)"
            " VALUES (?, 'seg-md', ?)",
            (pk, emb_id),
        )
    meta_rows = []
    for pk, emb_id in ((1, "img_a"), (2, "img_b"), (3, "img_c")):
        meta_rows += [
            (pk, "id", emb_id, None, None, None),
            (pk, "filename", f"{emb_id}.jpg", None, None, None),
            (pk, "description", f"desc {emb_id}", None, None, None),
            (pk, "url", f"/static/processed/{emb_id}.png", None, None, None),
            (pk, "created_at", "2025-03-28T12:00:00", None, None, None),
            (pk, "chroma:document", f"desc {emb_id}", None, None, None),
        ]
    # type coverage: int, float, bool values
    meta_rows += [
        (1, "filter_results_json", '{"is it red": "yes"}', None, None, None),
        (1, "views", None, 7, None, None),
        (2, "score", None, None, 0.5, None),
        (3, "flagged", None, None, None, 1),
    ]
    con.executemany(
        "INSERT INTO embedding_metadata VALUES (?, ?, ?, ?, ?, ?)", meta_rows
    )
    # WAL replay: add a(v1) -> add b -> add d -> delete d -> update a(v2)
    wal = [
        (1, _OPS["add"], "img_a", _vec(1).tobytes()),
        (2, _OPS["add"], "img_b", _vec(2).tobytes()),
        (3, _OPS["add"], "img_d", _vec(4).tobytes()),
        (4, _OPS["delete"], "img_d", None),
        (5, _OPS["update"], "img_a", _vec(11).tobytes()),
        (6, _OPS["add"], "img_c", _vec(3).tobytes()),
    ]
    wal = [r for r in wal if r[2] not in prune_wal_for]
    for seq, op, emb_id, blob in wal:
        if topic_column:
            con.execute(
                "INSERT INTO embeddings_queue VALUES (?, '', ?, "
                "'persistent://default/default/col-1', ?, ?, 'FLOAT32', '{}')",
                (seq, op, emb_id, blob),
            )
        else:
            con.execute(
                "INSERT INTO embeddings_queue VALUES (?, '', ?, ?, ?, "
                "'FLOAT32', '{}')",
                (seq, op, emb_id, blob),
            )
    con.commit()
    con.close()


_OPS = {"add": 0, "update": 1, "upsert": 2, "delete": 3}


def test_migrate_full_wal(tmp_path):
    chroma = tmp_path / "chroma_data"
    make_chroma_db(str(chroma))
    summary = migrate(
        chroma_dir=str(chroma), root=str(tmp_path), collection="image-match"
    )
    assert summary["rows_migrated"] == 3
    assert summary["vectors_from_wal"] == 3
    assert summary["rows_dropped"] == 0
    store = VectorStore.load(str(tmp_path / "index_data"), persist=False)
    got = store.get(include=["metadatas", "documents", "embeddings"])
    by_id = dict(zip(got["ids"], got["embeddings"]))
    assert set(by_id) == {"img_a", "img_b", "img_c"}
    # update replay: img_a carries v2, not v1
    np.testing.assert_allclose(by_id["img_a"], _vec(11), rtol=1e-6)
    np.testing.assert_allclose(by_id["img_b"], _vec(2), rtol=1e-6)
    md = dict(zip(got["ids"], got["metadatas"]))
    assert md["img_a"]["filter_results_json"] == '{"is it red": "yes"}'
    assert md["img_a"]["views"] == 7
    assert md["img_b"]["score"] == 0.5
    assert md["img_c"]["flagged"] is True
    assert "chroma:document" not in md["img_a"]
    docs = dict(zip(got["ids"], got["documents"]))
    assert docs["img_b"] == "desc img_b"


def test_migrate_wal_without_topic_column(tmp_path):
    chroma = tmp_path / "chroma_data"
    make_chroma_db(str(chroma), topic_column=False)
    summary = migrate(
        chroma_dir=str(chroma), root=str(tmp_path), collection="image-match"
    )
    assert summary["rows_migrated"] == 3


def test_migrate_pruned_wal_requires_choice(tmp_path):
    chroma = tmp_path / "chroma_data"
    make_chroma_db(str(chroma), prune_wal_for=("img_c",))
    with pytest.raises(SystemExit, match="no vector in"):
        migrate(
            chroma_dir=str(chroma),
            root=str(tmp_path),
            collection="image-match",
        )
    summary = migrate(
        chroma_dir=str(chroma),
        root=str(tmp_path),
        collection="image-match",
        skip_missing=True,
    )
    assert summary["rows_migrated"] == 2
    assert summary["rows_dropped"] == 1
    store = VectorStore.load(str(tmp_path / "index_data"), persist=False)
    assert set(store.get()["ids"]) == {"img_a", "img_b"}


def test_migrate_reembed_fallback(tmp_path, monkeypatch):
    from PIL import Image

    monkeypatch.setenv("IMATCH_CLIP_CONFIG", "tiny")
    chroma = tmp_path / "chroma_data"
    make_chroma_db(str(chroma), prune_wal_for=("img_c",))
    processed = tmp_path / "static" / "processed"
    processed.mkdir(parents=True)
    Image.new("RGB", (40, 40), (200, 30, 30)).save(processed / "img_c.png")
    summary = migrate(
        chroma_dir=str(chroma),
        root=str(tmp_path),
        collection="image-match",
        reembed=True,
    )
    assert summary["rows_migrated"] == 3
    assert summary["vectors_reembedded"] == 1
    store = VectorStore.load(str(tmp_path / "index_data"), persist=False)
    got = store.get(include=["embeddings"])
    by_id = dict(zip(got["ids"], got["embeddings"]))
    # the re-embedded row is a real unit embedding of the right dim
    v = np.asarray(by_id["img_c"], np.float32)
    assert v.shape == (DIM,)
    assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-3


def test_migrate_dry_run_writes_nothing(tmp_path):
    chroma = tmp_path / "chroma_data"
    make_chroma_db(str(chroma))
    summary = migrate(
        chroma_dir=str(chroma),
        root=str(tmp_path),
        collection="image-match",
        dry_run=True,
    )
    assert summary["rows_live"] == 3
    assert not (tmp_path / "index_data").exists()


def test_migrate_many_rows_crosses_bind_chunks(tmp_path):
    """1,203 rows: the embedding_metadata IN() query must be chunked —
    one bind per row breaks past SQLite's variable cap (999 on older
    builds). Verifies metadata survives intact across chunk edges."""
    n = 1203
    chroma = tmp_path / "chroma_data"
    ids = [f"img_{i:05d}" for i in range(n)]
    make_chroma_db(str(chroma), ids=ids)
    summary = migrate(
        chroma_dir=str(chroma), root=str(tmp_path), collection="image-match"
    )
    assert summary["rows_migrated"] == n
    store = VectorStore.load(str(tmp_path / "index_data"), persist=False)
    got = store.get(include=["metadatas"])
    md = dict(zip(got["ids"], got["metadatas"]))
    assert len(md) == n
    # spot rows on both sides of the 500-bind chunk edges
    for probe in (0, 499, 500, 999, 1000, n - 1):
        assert md[ids[probe]]["filename"] == f"{ids[probe]}.jpg"


def test_migrate_unknown_collection(tmp_path):
    chroma = tmp_path / "chroma_data"
    make_chroma_db(str(chroma))
    with pytest.raises(SystemExit, match="not found"):
        migrate(
            chroma_dir=str(chroma), root=str(tmp_path), collection="nope"
        )

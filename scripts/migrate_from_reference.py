"""Migrate a reference ("ImageMatch") deployment into imatch_tpu.

The reference persists its index in ChromaDB's on-disk layout
(chroma_data/chroma.sqlite3, /root/reference/utils.py:104-138): ids,
metadata and documents live in sqlite tables (``embeddings`` +
``embedding_metadata``), and — because Chroma's write-ahead log is kept
in the same sqlite file — the full fp32 vectors are normally
recoverable from the ``embeddings_queue`` table without importing
chromadb at all. This script reads that layout with stdlib sqlite3 and
writes an imatch_tpu ``VectorStore`` snapshot, preserving:

- every image id (the phash-derived ``img_<hex>`` — imatch_tpu's phash
  is bit-identical to imagehash.phash, so future dedup checks keep
  working against migrated ids);
- every metadata record verbatim, including captions appended to
  ``custom_metadata`` and the ``filter_results_json`` produced by the
  reference's filter backfill (so AND-filtered search works on day one
  without re-running any VLM);
- documents (the description, stored under Chroma's
  ``chroma:document`` metadata key);
- the embeddings themselves when the WAL still has them (the common
  case; Chroma <=0.5.5 never pruned it).

For rows whose vectors were pruned from the WAL, ``--reembed`` decodes
``static/processed/<id>.png`` and re-embeds with the configured CLIP
checkpoint (IMATCH_CLIP_CONFIG/IMATCH_CLIP_CHECKPOINT — use the same
LongCLIP weights as the reference for drop-in score parity).

Static assets need no migration: serve imatch_tpu from the reference's
backend root and ``static/{uploads,processed,encoded}`` and
``filters.json`` are picked up in place (encoded/*.pt Moondream tensors
are the one artifact that does NOT transfer — they are torch tensors of
a different model; imatch_tpu re-encodes lazily when a filter backfill
needs them).

Usage:
  python scripts/migrate_from_reference.py \
      --chroma-dir chroma_data --root . [--collection image-match] \
      [--reembed] [--skip-missing] [--dry-run]

Schema notes: written against Chroma 0.4.x-0.6.x (the reference pins
chromadb>=0.4.13, requirements.txt:10). Column sets are introspected
per table so minor schema drift across those versions is tolerated.
"""

from __future__ import annotations

import argparse
import json
import os
import sqlite3
import sys
from typing import Dict, List, Optional, Tuple

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# Chroma Operation enum wire values (chromadb/types.py): the WAL stores
# these ints in embeddings_queue.operation.
_OP_ADD, _OP_UPDATE, _OP_UPSERT, _OP_DELETE = 0, 1, 2, 3

# Chroma stores the document text as a reserved metadata key.
_DOC_KEY = "chroma:document"


def _columns(con: sqlite3.Connection, table: str) -> List[str]:
    return [r[1] for r in con.execute(f"PRAGMA table_info({table})")]


def _has_table(con: sqlite3.Connection, table: str) -> bool:
    return (
        con.execute(
            "SELECT 1 FROM sqlite_master WHERE type='table' AND name=?",
            (table,),
        ).fetchone()
        is not None
    )


def _find_collection(
    con: sqlite3.Connection, name: str
) -> Tuple[str, Optional[int]]:
    """Return (collection_id, dimension)."""
    cols = _columns(con, "collections")
    sel = ["id"]
    sel.append("dimension" if "dimension" in cols else "NULL")
    row = con.execute(
        f"SELECT {', '.join(sel)} FROM collections WHERE name = ?", (name,)
    ).fetchone()
    if row is None:
        names = [
            r[0] for r in con.execute("SELECT name FROM collections")
        ]
        raise SystemExit(
            f"collection {name!r} not found in chroma db "
            f"(collections present: {names})"
        )
    return str(row[0]), (int(row[1]) if row[1] is not None else None)


def _metadata_segment(con: sqlite3.Connection, collection_id: str) -> str:
    cols = _columns(con, "segments")
    if "collection" in cols:
        rows = con.execute(
            "SELECT id, scope FROM segments WHERE collection = ?",
            (collection_id,),
        ).fetchall()
    else:
        # chroma 0.4.x: segments carry a pulsar-style topic string that
        # embeds the collection uuid
        rows = con.execute(
            "SELECT id, scope FROM segments WHERE topic LIKE ?",
            (f"%{collection_id}%",),
        ).fetchall()
    for seg_id, scope in rows:
        if str(scope).upper() == "METADATA":
            return str(seg_id)
    raise SystemExit(
        f"no METADATA segment for collection {collection_id} "
        f"(segments: {rows})"
    )


def read_records(
    con: sqlite3.Connection, metadata_segment: str
) -> List[Tuple[str, dict, Optional[str]]]:
    """Live rows from the metadata segment: (embedding_id, metadata,
    document), in insertion order. This table is authoritative — Chroma
    applies deletes to it synchronously."""
    rows = con.execute(
        "SELECT id, embedding_id FROM embeddings WHERE segment_id = ? "
        "ORDER BY id",
        (metadata_segment,),
    ).fetchall()
    metas: Dict[int, dict] = {int(pk): {} for pk, _ in rows}
    # Chunk the IN() binds: SQLite caps bound variables (999 on older
    # builds), and real deployments have far more rows than that.
    _CHUNK = 500
    pks = [int(pk) for pk, _ in rows]
    for lo in range(0, len(pks), _CHUNK):
        chunk = pks[lo : lo + _CHUNK]
        q = (
            "SELECT id, key, string_value, int_value, float_value, "
            "bool_value FROM embedding_metadata WHERE id IN "
            f"({','.join('?' * len(chunk))})"
        )
        for pk, key, s, i, f, b in con.execute(q, chunk):
            if s is not None:
                val = s
            elif b is not None and i is None and f is None:
                val = bool(b)
            elif i is not None:
                val = int(i)
            elif f is not None:
                val = float(f)
            else:
                val = None
            metas[int(pk)][key] = val
    out = []
    for pk, emb_id in rows:
        md = metas[int(pk)]
        doc = md.pop(_DOC_KEY, None)
        out.append((str(emb_id), md, doc))
    return out


def read_wal_vectors(
    con: sqlite3.Connection, collection_id: str
) -> Dict[str, np.ndarray]:
    """Replay embeddings_queue (Chroma's sqlite WAL) into {id: vector}.

    Vectors are raw little-endian fp32 blobs (encoding 'FLOAT32').
    Rows whose WAL entries were pruned (chroma>=0.5.6 maintenance) just
    won't appear — callers fall back to --reembed for those."""
    if not _has_table(con, "embeddings_queue"):
        return {}
    cols = _columns(con, "embeddings_queue")
    has_topic = "topic" in cols
    sel = "seq_id, operation, id, vector" + (
        ", encoding" if "encoding" in cols else ", NULL"
    )
    if has_topic:
        rows = con.execute(
            f"SELECT {sel} FROM embeddings_queue WHERE topic LIKE ? "
            "ORDER BY seq_id",
            (f"%{collection_id}%",),
        ).fetchall()
    else:
        rows = con.execute(
            f"SELECT {sel} FROM embeddings_queue ORDER BY seq_id"
        ).fetchall()
    vecs: Dict[str, np.ndarray] = {}
    for _seq, op, emb_id, blob, enc in rows:
        if op == _OP_DELETE:
            vecs.pop(str(emb_id), None)
            continue
        if blob is None:
            continue
        if enc is not None and str(enc).upper() not in (
            "FLOAT32",
            "SCALARENCODING.FLOAT32",
        ):
            raise SystemExit(
                f"unsupported WAL vector encoding {enc!r} for {emb_id}"
            )
        vecs[str(emb_id)] = np.frombuffer(blob, dtype="<f4").copy()
    return vecs


def _reembed(ids: List[str], processed_dir: str, skip_missing: bool):
    """Decode static/processed/<id>.png and embed with the configured
    CLIP tower. Returns ({id: vector}, [ids still missing])."""
    from imatch_tpu.pipeline.embedder import ClipEmbedder
    from imatch_tpu.runtime.loader import default_loader

    loader = default_loader()
    images, have = [], []
    missing: List[str] = []
    for id_ in ids:
        path = os.path.join(processed_dir, f"{id_}.png")
        if not os.path.exists(path):
            missing.append(id_)
            continue
        with open(path, "rb") as f:
            images.append(loader.wait(loader.submit_bytes(f.read())))
        have.append(id_)
    if missing and not skip_missing:
        raise SystemExit(
            f"{len(missing)} ids have neither a WAL vector nor a "
            f"processed image (first: {missing[:5]}); rerun with "
            "--skip-missing to migrate without them"
        )
    if not have:
        return {}, missing
    # resolve the config env HERE, not via the embedder module's
    # import-time default — in long-lived processes (the test suite)
    # the module may have been imported before IMATCH_CLIP_CONFIG was set
    emb = ClipEmbedder(
        config=os.environ.get("IMATCH_CLIP_CONFIG", "vit-b32")
    ).embed_images(images)
    return dict(zip(have, np.asarray(emb, np.float32))), missing


def migrate(
    chroma_dir: str,
    root: str,
    collection: str,
    data_dir: Optional[str] = None,
    reembed: bool = False,
    skip_missing: bool = False,
    dry_run: bool = False,
) -> dict:
    db_path = os.path.join(chroma_dir, "chroma.sqlite3")
    if not os.path.exists(db_path):
        raise SystemExit(f"no chroma.sqlite3 under {chroma_dir!r}")
    con = sqlite3.connect(f"file:{db_path}?mode=ro", uri=True)
    try:
        coll_id, dim = _find_collection(con, collection)
        seg = _metadata_segment(con, coll_id)
        records = read_records(con, seg)
        wal = read_wal_vectors(con, coll_id)
    finally:
        con.close()

    live_ids = [r[0] for r in records]
    vecs = {i: wal[i] for i in live_ids if i in wal}
    need = [i for i in live_ids if i not in vecs]
    missing: List[str] = []
    if need:
        if reembed:
            re_vecs, missing = _reembed(
                need, os.path.join(root, "static", "processed"), skip_missing
            )
            vecs.update(re_vecs)
        elif skip_missing:
            missing = need
        else:
            raise SystemExit(
                f"{len(need)} of {len(live_ids)} rows have no vector in "
                "the Chroma WAL (pruned?). Rerun with --reembed to "
                "re-encode them from static/processed, or --skip-missing "
                "to drop them."
            )

    keep = [r for r in records if r[0] in vecs]
    if keep:
        dims = {vecs[r[0]].shape[0] for r in keep}
        if len(dims) > 1:
            raise SystemExit(f"inconsistent vector dims in WAL: {dims}")
        dim = dims.pop()
        if dim is None or dim <= 0:
            raise SystemExit("could not determine embedding dimension")

    summary = {
        "collection": collection,
        "rows_live": len(live_ids),
        "rows_migrated": len(keep),
        "vectors_from_wal": sum(1 for r in keep if r[0] in wal),
        "vectors_reembedded": sum(1 for r in keep if r[0] not in wal),
        "rows_dropped": len(missing),
        "dim": dim,
    }
    if dry_run:
        return summary

    if data_dir is None:
        data_dir = os.path.join(
            root, os.environ.get("IMATCH_DATA_DIR", "index_data")
        )
    from imatch_tpu.index.store import VectorStore

    if keep:
        store = VectorStore(dim=dim)
        store.add(
            ids=[r[0] for r in keep],
            embeddings=np.stack([vecs[r[0]] for r in keep]),
            metadatas=[r[1] for r in keep],
            documents=[r[2] for r in keep],
        )
    else:
        store = VectorStore(dim=dim or 768)
    store.save(data_dir)
    summary["data_dir"] = os.path.abspath(data_dir)
    return summary


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument(
        "--chroma-dir",
        default="chroma_data",
        help="reference CHROMA_PERSIST_DIR (utils.py:21)",
    )
    ap.add_argument(
        "--root",
        default=".",
        help="deployment root (holds static/ and receives index_data/)",
    )
    ap.add_argument(
        "--collection",
        default=os.environ.get("COLLECTION_NAME", "image-match"),
        help="reference COLLECTION_NAME (utils.py:20)",
    )
    ap.add_argument("--data-dir", default=None, help="snapshot output dir")
    ap.add_argument(
        "--reembed",
        action="store_true",
        help="re-embed rows whose vectors were pruned from the WAL",
    )
    ap.add_argument(
        "--skip-missing",
        action="store_true",
        help="drop rows that have neither a WAL vector nor a processed "
        "image instead of failing",
    )
    ap.add_argument(
        "--dry-run", action="store_true", help="report counts, write nothing"
    )
    ap.add_argument(
        "--platform",
        default="cpu",
        choices=("cpu", "default"),
        help="jax platform; cpu (default) keeps this host-side tool off "
        "the accelerator — use 'default' to re-embed on TPU",
    )
    args = ap.parse_args(argv)

    # Host-side tool: pin to CPU unconditionally unless asked otherwise
    # (the config knob, not the env var — this jax build's TPU plugin
    # self-registers and ignores JAX_PLATFORMS; docs/DESIGN.md).
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    summary = migrate(
        chroma_dir=args.chroma_dir,
        root=args.root,
        collection=args.collection,
        data_dir=args.data_dir,
        reembed=args.reembed,
        skip_missing=args.skip_missing,
        dry_run=args.dry_run,
    )
    print(json.dumps(summary, indent=2))
    if not args.dry_run:
        print(
            "\nDone. Serve with:  cd %s && python run.py\n"
            "static/ and filters.json are used in place; encoded/*.pt "
            "(torch Moondream tensors) do not transfer — imatch_tpu "
            "re-encodes lazily when a filter backfill needs them."
            % args.root
        )


if __name__ == "__main__":
    main()

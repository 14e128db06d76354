"""Property-based store semantics: random interleavings of
add/update/delete/query must match a brute-force numpy oracle on ids,
ordering, and distances — across engines. Complements the example-based
suites in tests/test_index.py with machine-generated mutation orders
(tombstones, compaction, capacity growth, duplicate-id rejection).
Reference semantics: chroma cosine collection,
/root/reference/backend/app/main.py:630-782."""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from imatch_tpu.index.store import VectorStore

D = 8


def _vec(rng_int):
    r = np.random.default_rng(rng_int)
    v = r.standard_normal(D).astype(np.float32)
    return v / np.linalg.norm(v)


class Oracle:
    def __init__(self):
        self.rows = {}  # id -> vector

    def query(self, q, k):
        if not self.rows:
            return [], []
        ids = list(self.rows)
        mat = np.stack([self.rows[i] for i in ids]).astype(np.float64)
        sims = mat @ q.astype(np.float64)
        # stable sort: ties break to earlier insertion (the store breaks
        # to lower slot index, which equals insertion order without
        # compaction; with compaction relative order is preserved)
        order = np.argsort(-sims, kind="stable")[:k]
        return [ids[i] for i in order], [1.0 - sims[i] for i in order]


ops_strategy = st.lists(
    st.one_of(
        st.tuples(st.just("add"), st.integers(0, 39), st.integers(0, 10_000)),
        st.tuples(st.just("update"), st.integers(0, 39), st.integers(0, 10_000)),
        st.tuples(st.just("delete"), st.integers(0, 39), st.just(0)),
        st.tuples(st.just("query"), st.integers(0, 10_000), st.integers(1, 12)),
    ),
    min_size=5,
    max_size=40,
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(ops=ops_strategy)
def test_store_matches_oracle(ops):
    _with_small_cap(ops, "tilemax")


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(ops=ops_strategy)
def test_sharded_store_matches_oracle(ops):
    # the multi-chip exact engine must satisfy the same oracle under
    # arbitrary mutation interleavings (virtual 8-device mesh)
    _with_small_cap(ops, "sharded")


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(ops=ops_strategy)
def test_host_rescore_store_matches_oracle(ops):
    # the int8-phase1 capacity tier is exact too (fp32 host rescore)
    _with_small_cap(ops, "tilemax-host")


def _with_small_cap(ops, engine):
    import imatch_tpu.index.store as store_mod

    # shrink the capacity floor so compaction and capacity doubling are
    # reachable inside 40-id interleavings (default floor is 1024)
    orig_cap = store_mod._MIN_CAP
    store_mod._MIN_CAP = 8
    try:
        _run_ops(ops, engine)
    finally:
        store_mod._MIN_CAP = orig_cap


def _run_ops(ops, engine="tilemax"):
    store = VectorStore(dim=D, engine=engine)
    oracle = Oracle()
    for op in ops:
        if op[0] == "add":
            _, slot, seed = op
            vid = f"id{slot}"
            v = _vec(seed)
            if vid in oracle.rows:
                try:
                    store.add(ids=[vid], embeddings=[v])
                    raise AssertionError("duplicate add must raise")
                except ValueError:
                    pass
            else:
                store.add(ids=[vid], embeddings=[v])
                oracle.rows[vid] = v
        elif op[0] == "update":
            _, slot, seed = op
            vid = f"id{slot}"
            v = _vec(seed + 50_000)
            if vid in oracle.rows:
                store.update(ids=[vid], embeddings=[v])
                oracle.rows[vid] = v
            else:
                try:
                    store.update(ids=[vid], embeddings=[v])
                    raise AssertionError("update of missing id must raise")
                except KeyError:
                    pass
        elif op[0] == "delete":
            _, slot, _ = op
            vid = f"id{slot}"
            store.delete([vid])  # idempotent either way
            oracle.rows.pop(vid, None)
        else:
            _, seed, k = op
            q = _vec(seed + 100_000)
            want_ids, want_d = oracle.query(q, k)
            res = store.query([q], n_results=k)
            assert res["ids"][0] == want_ids, (res["ids"][0], want_ids)
            np.testing.assert_allclose(
                res["distances"][0], want_d, atol=2e-4
            )
    assert store.count() == len(oracle.rows)

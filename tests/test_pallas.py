"""Pallas kernels vs XLA references (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imatch_tpu.index.search import cosine_topk
from imatch_tpu.ops.attention import _mha_xla
from imatch_tpu.ops.pallas import flash_mha, pallas_cosine_topk


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("s", [50, 257])
def test_flash_mha_matches_xla(causal, s):
    rng = np.random.default_rng(0)
    b, h, d = 2, 3, 64
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    ref = _mha_xla(q, k, v, causal=causal, precision=jax.lax.Precision.HIGHEST)
    out = flash_mha(q, k, v, causal=causal, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_flash_mha_uneven_blocks():
    rng = np.random.default_rng(1)
    b, h, s, d = 1, 2, 130, 32
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
        for _ in range(3)
    )
    ref = _mha_xla(q, k, v, causal=True, precision=jax.lax.Precision.HIGHEST)
    out = flash_mha(q, k, v, causal=True, block_q=64, block_k=64,
                    interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("n,k", [(100, 10), (5000, 25), (130, 200)])
def test_pallas_topk_matches_reference(n, k):
    rng = np.random.default_rng(2)
    d, q = 64, 5
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    valid = np.ones((n,), bool)
    valid[rng.integers(0, n, 7)] = False
    queries = jnp.asarray(corpus[:q])
    ref_s, ref_i = cosine_topk(
        queries,
        jnp.asarray(corpus),
        jnp.asarray(valid),
        k=k,
        score_dtype=jnp.float32,
    )
    s, i = pallas_cosine_topk(
        queries,
        jnp.asarray(corpus),
        jnp.asarray(valid),
        k=k,
        tile_n=128,
        score_dtype=jnp.float32,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))
    np.testing.assert_allclose(
        np.asarray(s), np.asarray(ref_s), rtol=1e-5, atol=1e-6
    )


def test_pallas_topk_duplicate_rows_tie_break():
    """Duplicate corpus rows: ties must resolve to the lower index."""
    rng = np.random.default_rng(3)
    d = 32
    base = rng.standard_normal((40, d)).astype(np.float32)
    corpus = np.concatenate([base, base[:10]])  # rows 40..49 dup 0..9
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    valid = np.ones((len(corpus),), bool)
    queries = jnp.asarray(corpus[:3])
    s, i = pallas_cosine_topk(
        queries,
        jnp.asarray(corpus),
        jnp.asarray(valid),
        k=4,
        tile_n=16,
        score_dtype=jnp.float32,
        interpret=True,
    )
    i = np.asarray(i)
    # Self-match must hit the ORIGINAL (lower) index.
    np.testing.assert_array_equal(i[:, 0], np.arange(3))


def test_flash_mismatched_blocks_cover_tail():
    """block_q != block_k: the sequence must pad to a multiple of BOTH
    (lcm), or trailing q-blocks are never written and the tail rows
    return uninitialized memory."""
    import numpy as np

    from imatch_tpu.ops.attention import _mha_xla
    from imatch_tpu.ops.pallas.flash_attention import flash_mha

    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((1, 2, 600, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 600, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 600, 16)), jnp.float32)
    out = flash_mha(q, k, v, block_q=48, block_k=128)
    ref = _mha_xla(q, k, v, causal=False)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5
    )

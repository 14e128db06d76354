"""Fused Pallas dynamic-quantize kernels vs the XLA compositions.

The W8A8 tiers quantize activations per token before every int8
contraction (models/clip/quant.py, models/moondream/model.py prefill).
ops/pallas/quantize.py folds that into a single HBM pass; these tests
pin the kernels (interpreter mode on CPU) to the XLA reference in
ops/quant.py bit-for-bit — same amax, same scale, same rounding — and
the env dispatch in quant_rows_int8 / ln_quant_rows_int8.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imatch_tpu.ops.pallas import ln_quant_rows_pallas, quant_rows_pallas
from imatch_tpu.ops.quant import (
    ln_quant_rows_int8,
    quant_rows_int8,
    quant_rows_int8_xla,
)


def _assert_quant_equal(got, ref):
    qg, sg = got
    qr, sr = ref
    # interpret-mode reduce ordering differs from XLA's tree reduce by
    # <= 1 ulp on the fp32 amax; codes may flip by one LSB on rounding
    # boundaries. Everything else must be identical.
    np.testing.assert_allclose(
        np.asarray(sg), np.asarray(sr), rtol=2e-7, atol=0
    )
    diff = np.abs(
        np.asarray(qg, dtype=np.int32) - np.asarray(qr, dtype=np.int32)
    )
    assert diff.max() <= 1
    assert (diff != 0).mean() < 1e-3


@pytest.mark.parametrize("shape", [(64, 512), (37, 768), (2, 5, 256)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_quant_rows_pallas_matches_xla(shape, dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape) * 3.0, dtype)
    got = quant_rows_pallas(x, interpret=True)
    ref = quant_rows_int8_xla(x)
    assert got[0].shape == x.shape and got[0].dtype == jnp.int8
    assert got[1].shape == x.shape[:-1] + (1,)
    assert got[1].dtype == jnp.float32
    _assert_quant_equal(got, ref)


def test_quant_rows_pallas_zero_row():
    """An all-zero token must produce scale 1.0 and zeros, not NaN."""
    x = jnp.zeros((4, 128), jnp.float32)
    q, s = quant_rows_pallas(x, interpret=True)
    np.testing.assert_array_equal(np.asarray(s), 1.0)
    np.testing.assert_array_equal(np.asarray(q), 0)


@pytest.mark.parametrize("rows", [1, 50, 300])
def test_ln_quant_pallas_matches_composition(rows):
    """Fused LN+quant == fp32 LayerNorm -> quant_rows_int8_xla."""
    rng = np.random.default_rng(1)
    d, eps = 384, 1e-5
    x = jnp.asarray(rng.standard_normal((rows, d)) * 2.0, jnp.float32)
    g = jnp.asarray(rng.standard_normal((d,)) * 0.5 + 1.0, jnp.float32)
    b = jnp.asarray(rng.standard_normal((d,)) * 0.1, jnp.float32)
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps) * g + b
    ref = quant_rows_int8_xla(y)
    got = ln_quant_rows_pallas(x, g, b, eps=eps, interpret=True)
    qg, sg = got
    qr, sr = ref
    # LN math order differs microscopically (var vs mean-of-squares);
    # scales agree to fp32 roundoff, codes to 1 LSB.
    np.testing.assert_allclose(
        np.asarray(sg), np.asarray(sr), rtol=1e-6, atol=0
    )
    diff = np.abs(
        np.asarray(qg, dtype=np.int32) - np.asarray(qr, dtype=np.int32)
    )
    assert diff.max() <= 1
    assert (diff != 0).mean() < 2e-3


def test_ln_quant_bf16_input():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((16, 256)), jnp.bfloat16)
    g = jnp.ones((256,), jnp.float32)
    b = jnp.zeros((256,), jnp.float32)
    q, s = ln_quant_rows_pallas(x, g, b, interpret=True)
    assert q.dtype == jnp.int8 and s.dtype == jnp.float32
    # every row hits +-127 somewhere (LN output has unit variance)
    assert int(jnp.max(jnp.abs(q.astype(jnp.int32)))) == 127


def test_dispatch_env(monkeypatch):
    """IMATCH_QUANT_KERNEL routes between kernels; default is XLA."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((8, 128)), jnp.float32)

    monkeypatch.setenv("IMATCH_QUANT_KERNEL", "xla")
    q_x, s_x = quant_rows_int8(x)
    monkeypatch.setenv("IMATCH_QUANT_KERNEL", "pallas")
    q_p, s_p = quant_rows_int8(x)  # interpret-mode Pallas on CPU
    _assert_quant_equal((q_p, s_p), (q_x, s_x))

    monkeypatch.delenv("IMATCH_QUANT_KERNEL", raising=False)
    q_a, s_a = quant_rows_int8(x)  # default == xla
    np.testing.assert_array_equal(np.asarray(q_a), np.asarray(q_x))
    np.testing.assert_array_equal(np.asarray(s_a), np.asarray(s_x))


def test_ln_quant_dispatch_fallback(monkeypatch):
    """ln_quant_rows_int8's XLA fallback == the Pallas kernel."""
    rng = np.random.default_rng(4)
    d = 192
    x = jnp.asarray(rng.standard_normal((12, d)), jnp.float32)
    p = {
        "scale": jnp.asarray(rng.standard_normal((d,)) + 1.0, jnp.float32),
        "bias": jnp.asarray(rng.standard_normal((d,)) * 0.2, jnp.float32),
    }
    monkeypatch.setenv("IMATCH_QUANT_KERNEL", "xla")
    ref = ln_quant_rows_int8(x, p, 1e-5)
    monkeypatch.setenv("IMATCH_QUANT_KERNEL", "pallas")
    got = ln_quant_rows_int8(x, p, 1e-5)
    np.testing.assert_allclose(
        np.asarray(got[1]), np.asarray(ref[1]), rtol=1e-6, atol=0
    )
    diff = np.abs(
        np.asarray(got[0], np.int32) - np.asarray(ref[0], np.int32)
    )
    assert diff.max() <= 1

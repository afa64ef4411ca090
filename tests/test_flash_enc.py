"""Head-minor encoder attention kernel: interpret-mode parity vs the exact
jnp attention (whisper.attention on split heads)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sar_tpu.models import whisper
from sar_tpu.ops.flash_enc import encoder_attention_hm

B, H, hd, T_VALID, T_PAD = 2, 4, 16, 50, 64
D = H * hd


@pytest.fixture(scope="module")
def qkv(rng=np.random.default_rng(5)):
    def mk():
        x = rng.standard_normal((B, T_PAD, D)).astype(np.float32)
        x[:, T_VALID:] = 0.0
        return jnp.asarray(x)
    return mk(), mk(), mk()


def test_kernel_matches_exact_attention(qkv):
    q, k, v = qkv
    got = encoder_attention_hm(q, k, v, n_heads=H, t_valid=T_VALID,
                               interpret=True)
    mask = (jnp.arange(T_PAD) < T_VALID)[None, None, None]
    want = whisper.attention(whisper.split_heads(q, H),
                             whisper.split_heads(k, H),
                             whisper.split_heads(v, H), mask)
    want = whisper.merge_heads(want)
    np.testing.assert_allclose(np.asarray(got[:, :T_VALID]),
                               np.asarray(want[:, :T_VALID]),
                               rtol=2e-5, atol=2e-5)


def test_padded_rows_do_not_contaminate(qkv):
    """Garbage in padded QUERY rows must not change valid rows' outputs."""
    q, k, v = qkv
    q2 = q.at[:, T_VALID:].set(1e3)
    a = encoder_attention_hm(q, k, v, n_heads=H, t_valid=T_VALID,
                             interpret=True)
    b = encoder_attention_hm(q2, k, v, n_heads=H, t_valid=T_VALID,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(a[:, :T_VALID]),
                                  np.asarray(b[:, :T_VALID]))


# ---------------------------------------------------------------------------
# Fused LN + QKV + attention kernel
# ---------------------------------------------------------------------------

T_PAD_F = 128      # the fused kernel's chunked LayerNorm walks 128-row tiles


@pytest.fixture(scope="module")
def fused_world(rng=np.random.default_rng(7)):
    x = rng.standard_normal((B, T_PAD_F, D)).astype(np.float32)
    x[:, T_VALID:] = 0.0
    p = {
        "ln_scale": rng.standard_normal(D).astype(np.float32) * 0.1 + 1.0,
        "ln_bias": rng.standard_normal(D).astype(np.float32) * 0.1,
        "wq": rng.standard_normal((D, D)).astype(np.float32) * 0.1,
        "bq": rng.standard_normal(D).astype(np.float32) * 0.1,
        "wk": rng.standard_normal((D, D)).astype(np.float32) * 0.1,
        "wv": rng.standard_normal((D, D)).astype(np.float32) * 0.1,
        "bv": rng.standard_normal(D).astype(np.float32) * 0.1,
    }
    return jnp.asarray(x), {k: jnp.asarray(v) for k, v in p.items()}


def _unfused(x, p):
    """The exact math the fused kernel replaces (whisper._enc_layer_apply's
    LN + projections + attention, pre-out-projection)."""
    h = whisper.layer_norm(x, p["ln_scale"], p["ln_bias"])
    scaling = (D // H) ** -0.5
    q = (h @ p["wq"] + p["bq"]) * scaling
    k = h @ p["wk"]
    v = h @ p["wv"] + p["bv"]
    mask = (jnp.arange(T_PAD_F) < T_VALID)[None, None, None]
    a = whisper.attention(whisper.split_heads(q, H),
                          whisper.split_heads(k, H),
                          whisper.split_heads(v, H), mask)
    return whisper.merge_heads(a)


def test_fused_kernel_matches_unfused_layer_math(fused_world):
    from sar_tpu.ops.flash_enc import encoder_attention_fused
    x, p = fused_world
    got = encoder_attention_fused(
        x, p["ln_scale"], p["ln_bias"], p["wq"], p["bq"], p["wk"], p["wv"],
        p["bv"], n_heads=H, t_valid=T_VALID, interpret=True)
    want = _unfused(x, p)
    np.testing.assert_allclose(np.asarray(got[:, :T_VALID]),
                               np.asarray(want[:, :T_VALID]),
                               rtol=2e-4, atol=2e-5)


def test_fused_kernel_bf16_matches_bf16_unfused(fused_world):
    """Production dtype: bf16 params/activations, fp32 LN params (the
    cast_params convention)."""
    from sar_tpu.ops.flash_enc import encoder_attention_fused
    x, p = fused_world
    xb = x.astype(jnp.bfloat16)
    pb = {k: (v if k.startswith("ln") else v.astype(jnp.bfloat16))
          for k, v in p.items()}
    got = encoder_attention_fused(
        xb, pb["ln_scale"], pb["ln_bias"], pb["wq"], pb["bq"], pb["wk"],
        pb["wv"], pb["bv"], n_heads=H, t_valid=T_VALID, interpret=True)
    want = _unfused(xb, pb)
    np.testing.assert_allclose(
        np.asarray(got[:, :T_VALID]).astype(np.float32),
        np.asarray(want[:, :T_VALID]).astype(np.float32),
        rtol=0.05, atol=0.05)


def test_fused_padded_rows_do_not_contaminate(fused_world):
    from sar_tpu.ops.flash_enc import encoder_attention_fused
    x, p = fused_world
    x2 = x.at[:, T_VALID:].set(37.0)
    args = (p["ln_scale"], p["ln_bias"], p["wq"], p["bq"], p["wk"], p["wv"],
            p["bv"])
    a = encoder_attention_fused(x, *args, n_heads=H, t_valid=T_VALID,
                                interpret=True)
    b = encoder_attention_fused(x2, *args, n_heads=H, t_valid=T_VALID,
                                interpret=True)
    np.testing.assert_array_equal(np.asarray(a[:, :T_VALID]),
                                  np.asarray(b[:, :T_VALID]))


def test_fused_support_gate():
    from sar_tpu.ops.flash_enc import fused_qkv_supported
    assert fused_qkv_supported(1536, 768, 12)        # whisper-small
    assert fused_qkv_supported(1536, 1024, 16)       # whisper-medium (bq=128)
    assert not fused_qkv_supported(1536, 1280, 20)   # whisper-large: VMEM
    assert not fused_qkv_supported(1000, 768, 12)    # unaligned T

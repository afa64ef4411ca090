"""Fused s8-MXU cross-attention decode kernel: interpret-mode parity.

The kernel (ops/decode_cross.py) must match its jnp reference exactly (same
quantization points), and the reference must match the model-side jnp twin
whisper._cross_attention_int8_mxu — the path `scores_int8` uses off-TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sar_tpu.models import whisper
from sar_tpu.ops.decode_cross import (cross_decode_attention,
                                      cross_decode_reference)

L, B, H, hd, S, S_pad = 2, 3, 4, 64, 100, 128
D = H * hd


@pytest.fixture(scope="module")
def data(rng=np.random.default_rng(7)):
    k = rng.standard_normal((L, B, S_pad, H, hd)).astype(np.float32)
    v = rng.standard_normal((L, B, S_pad, H, hd)).astype(np.float32)
    k[:, :, S:] = 0.0
    v[:, :, S:] = 0.0
    kq, ks = whisper.quantize_kv(jnp.asarray(k))
    vq, vs = whisper.quantize_kv(jnp.asarray(v))
    ks = ks.transpose(0, 1, 3, 2).at[..., S:].set(0.0)   # [L, B, H, S_pad]
    vs = vs.transpose(0, 1, 3, 2).at[..., S:].set(0.0)
    qh = jnp.asarray(rng.standard_normal((B, H, 1, hd)), jnp.float32)
    qq, qs = whisper.quantize_kv(qh)
    return (qq[:, :, 0].reshape(B, D), qs,
            kq.reshape(L, B, S_pad, D), ks,
            vq.reshape(L, B, S_pad, D), vs, qh)


@pytest.mark.parametrize("layer", [0, 1])
def test_kernel_matches_reference(data, layer):
    qq, qs, kq, ks, vq, vs, _ = data
    got = cross_decode_attention(qq, qs, kq, ks, vq, vs, layer=layer,
                                 n_heads=H, out_dtype=jnp.float32,
                                 interpret=True)
    want = cross_decode_reference(qq, qs, kq, ks, vq, vs, layer=layer,
                                  n_heads=H, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_reference_matches_model_twin(data):
    """Same math as the jnp path decode_step uses when scores_int8=True."""
    qq, qs, kq, ks, vq, vs, qh = data
    ref = cross_decode_reference(qq, qs, kq, ks, vq, vs, layer=0,
                                 n_heads=H, out_dtype=jnp.float32)
    # The model twin quantizes q itself from the float query.
    twin = whisper._cross_attention_int8_mxu(qh, kq[0], ks[0], vq[0], vs[0])
    twin = whisper.merge_heads(twin)[:, 0]               # [B, D]
    np.testing.assert_allclose(np.asarray(ref), np.asarray(twin),
                               rtol=2e-5, atol=2e-5)


def test_short_encoder_matches_classic_layout(data,
                                              rng=np.random.default_rng(9)):
    """A cache built from a SHORTER-than-max encoder output must attend
    identically in both layouts (the padding mask keys on zero scales, not
    on a static model length — regression for the cfg.max_source_positions
    masking bug)."""
    S_short = 40                                        # << S_pad
    k = rng.standard_normal((B, S_pad, H, hd)).astype(np.float32)
    v = rng.standard_normal((B, S_pad, H, hd)).astype(np.float32)
    k[:, S_short:] = 0.0
    v[:, S_short:] = 0.0
    kq, ks = whisper.quantize_kv(jnp.asarray(k))
    vq, vs = whisper.quantize_kv(jnp.asarray(v))
    ks = ks.transpose(0, 2, 1).at[:, :, S_short:].set(0.0)  # [B, H, S_pad]
    vs = vs.transpose(0, 2, 1).at[:, :, S_short:].set(0.0)
    qh = jnp.asarray(rng.standard_normal((B, H, 1, hd)), jnp.float32)
    hm = whisper._cross_attention_int8(
        qh, kq.reshape(B, S_pad, D), ks, vq.reshape(B, S_pad, D), vs)
    # Classic layout over only the REAL S_short positions.
    kq5 = kq[:, :S_short].transpose(0, 2, 1, 3)
    vq5 = vq[:, :S_short].transpose(0, 2, 1, 3)
    classic = whisper._attention_int8(qh, kq5, ks[..., :S_short],
                                      vq5, vs[..., :S_short])
    np.testing.assert_allclose(np.asarray(hm), np.asarray(classic),
                               rtol=2e-5, atol=2e-5)


def test_kernel_close_to_exact_attention(data):
    """Quantized-probs output stays within the documented few-% envelope of
    the exact int8-KV attention."""
    qq, qs, kq, ks, vq, vs, qh = data
    got = cross_decode_attention(qq, qs, kq, ks, vq, vs, layer=0,
                                 n_heads=H, out_dtype=jnp.float32,
                                 interpret=True)
    exact = whisper._cross_attention_int8(qh, kq[0], ks[0], vq[0], vs[0])
    exact = whisper.merge_heads(exact)[:, 0]
    err = (np.abs(np.asarray(got) - np.asarray(exact)).max()
           / max(np.abs(np.asarray(exact)).max(), 1e-6))
    assert err < 0.05, f"relative error {err}"


@pytest.mark.parametrize("K", [2, 4])
def test_beamfolded_kernel_matches_reference(data, K,
                                             rng=np.random.default_rng(13)):
    """Beam-folded queries (K per sample) over the shared per-sample slab:
    the kernel's [K*H, S] row expansion must match the per-beam jnp
    reference, and K=1 must embed as the greedy case."""
    _, _, kq, ks, vq, vs, _ = data
    qh = jnp.asarray(rng.standard_normal((B, H, K, hd)), jnp.float32)
    qq4, qs4 = whisper.quantize_kv(qh)                 # [B,H,K,hd], [B,H,K]
    qq = qq4.transpose(0, 2, 1, 3).reshape(B, K, D)    # [B, K, D]
    qs = qs4.transpose(0, 2, 1).reshape(B, K * H, 1)   # row k*H+h order
    got = cross_decode_attention(qq, qs, kq, ks, vq, vs, layer=1,
                                 n_heads=H, out_dtype=jnp.float32,
                                 interpret=True, beam_width=K)
    want = cross_decode_reference(qq, qs, kq, ks, vq, vs, layer=1,
                                  n_heads=H, out_dtype=jnp.float32)
    assert got.shape == (B, K, D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_beamfolded_reference_matches_model_twin(data,
                                                 rng=np.random.default_rng(3)):
    """The beam-folded reference must equal the model-side jnp twin on the
    same folded query block (what decode_step(beam_width=K) computes)."""
    _, _, kq, ks, vq, vs, _ = data
    K = 3
    qh = jnp.asarray(rng.standard_normal((B, H, K, hd)), jnp.float32)
    qq4, qs4 = whisper.quantize_kv(qh)
    qq = qq4.transpose(0, 2, 1, 3).reshape(B, K, D)
    qs = qs4.transpose(0, 2, 1).reshape(B, K * H, 1)
    ref = cross_decode_reference(qq, qs, kq, ks, vq, vs, layer=0,
                                 n_heads=H, out_dtype=jnp.float32)
    twin = whisper._cross_attention_int8_mxu(qh, kq[0], ks[0], vq[0], vs[0])
    twin = whisper.merge_heads(twin)                   # [B, K, D]
    np.testing.assert_allclose(np.asarray(ref), np.asarray(twin),
                               rtol=2e-5, atol=2e-5)

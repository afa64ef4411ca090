"""Fused s8-MXU self-attention decode kernel: interpret-mode parity.

Mirrors tests/test_decode_cross.py for the dynamic-valid-length self kernel
(ops/attic/decode_self.py) and its jnp twins in whisper.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sar_tpu.models import whisper
from sar_tpu.ops.attic.decode_self import (self_decode_attention,
                                     self_decode_reference)

L, B, H, hd, MAX = 2, 6, 4, 64, 40   # B=6 -> nb=2 blocks exercise the loop
D = H * hd


@pytest.fixture(scope="module")
def data(rng=np.random.default_rng(11)):
    k = rng.standard_normal((L, B, MAX, H, hd)).astype(np.float32)
    v = rng.standard_normal((L, B, MAX, H, hd)).astype(np.float32)
    kq, ks = whisper.quantize_kv(jnp.asarray(k))
    vq, vs = whisper.quantize_kv(jnp.asarray(v))
    ks = ks.transpose(0, 1, 3, 2)                       # [L, B, H, MAX]
    vs = vs.transpose(0, 1, 3, 2)
    qh = jnp.asarray(rng.standard_normal((B, H, 1, hd)), jnp.float32)
    qq, qs = whisper.quantize_kv(qh)
    return (qq[:, :, 0].reshape(B, D), qs,
            kq.reshape(L, B, MAX, D), ks,
            vq.reshape(L, B, MAX, D), vs, qh)


@pytest.mark.parametrize("layer,valid", [(0, 7), (1, MAX)])
def test_kernel_matches_reference(data, layer, valid):
    qq, qs, kq, ks, vq, vs, _ = data
    got = self_decode_attention(qq, qs, kq, ks, vq, vs, jnp.int32(valid),
                                layer=layer, n_heads=H,
                                out_dtype=jnp.float32, interpret=True)
    want = self_decode_reference(qq, qs, kq, ks, vq, vs, valid, layer=layer,
                                 n_heads=H, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_reference_matches_model_twin(data):
    """Same math as decode_step's head-minor jnp path (scores_int8)."""
    qq, qs, kq, ks, vq, vs, qh = data
    ref = self_decode_reference(qq, qs, kq, ks, vq, vs, 9, layer=0,
                                n_heads=H, out_dtype=jnp.float32)
    twin = whisper._self_attention_int8_mxu_hm(
        qh, kq[0], ks[0], vq[0], vs[0], jnp.int32(9))
    twin = whisper.merge_heads(twin)[:, 0]
    np.testing.assert_allclose(np.asarray(ref), np.asarray(twin),
                               rtol=2e-5, atol=2e-5)


def test_exact_hm_twin_matches_classic(data, rng=np.random.default_rng(3)):
    """The exact head-minor twin must equal the classic-layout int8 path on
    the same quantized values."""
    qq, qs, kq, ks, vq, vs, qh = data
    valid = 12
    exact_hm = whisper._self_attention_int8_hm(
        qh, kq[0], ks[0], vq[0], vs[0], jnp.int32(valid))
    # Classic layout [B, H, S, hd] of the same values.
    kq5 = kq[0].reshape(B, MAX, H, hd).transpose(0, 2, 1, 3)
    vq5 = vq[0].reshape(B, MAX, H, hd).transpose(0, 2, 1, 3)
    mask = (jnp.arange(MAX) < valid)[None, None, None]
    classic = whisper._attention_int8(qh, kq5, ks[0], vq5, vs[0], mask=mask)
    np.testing.assert_allclose(np.asarray(exact_hm), np.asarray(classic),
                               rtol=2e-5, atol=2e-5)

"""Exact-compute fused cross-decode kernel: interpret-mode parity.

The exact kernel (ops/decode_cross.py::cross_decode_attention_exact) is the
DEFAULT TPU decode path (whisper.decode_step picks it for head-minor caches
when scores_int8 is off). It must match its jnp reference exactly, the
reference must match the model-side default `whisper._cross_attention_int8`
twin, and greedy decode over a head-minor cache must produce the same
tokens as the classic int8 layout (the CPU e2e check below; on TPU the
benchmark agreement harness covers the compiled kernel).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sar_tpu.models import whisper
from sar_tpu.ops.decode_cross import (cross_decode_attention_exact,
                                      cross_decode_reference_exact)

L, B, H, hd, S, S_pad = 2, 3, 4, 64, 100, 128
D = H * hd


@pytest.fixture(scope="module")
def data(rng=np.random.default_rng(11)):
    k = rng.standard_normal((L, B, S_pad, H, hd)).astype(np.float32)
    v = rng.standard_normal((L, B, S_pad, H, hd)).astype(np.float32)
    k[:, :, S:] = 0.0
    v[:, :, S:] = 0.0
    kq, ks = whisper.quantize_kv(jnp.asarray(k))
    vq, vs = whisper.quantize_kv(jnp.asarray(v))
    ks = ks.transpose(0, 1, 3, 2).at[..., S:].set(0.0)   # [L, B, H, S_pad]
    vs = vs.transpose(0, 1, 3, 2).at[..., S:].set(0.0)
    qh = jnp.asarray(rng.standard_normal((B, H, 1, hd)), jnp.float32)
    return (qh[:, :, 0].reshape(B, D),                   # head-minor q rows
            kq.reshape(L, B, S_pad, D), ks,
            vq.reshape(L, B, S_pad, D), vs, qh)


@pytest.mark.parametrize("layer", [0, 1])
def test_exact_kernel_matches_reference(data, layer):
    q, kq, ks, vq, vs, _ = data
    got = cross_decode_attention_exact(q, kq, ks, vq, vs, layer=layer,
                                       n_heads=H, out_dtype=jnp.float32,
                                       interpret=True)
    want = cross_decode_reference_exact(q, kq, ks, vq, vs, layer=layer,
                                        n_heads=H, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_exact_reference_matches_model_twin(data):
    """Same math as the default head-minor jnp path decode_step uses
    (whisper._cross_attention_int8) — the DEFAULT decode quantization
    points, no q/probs quantization anywhere."""
    q, kq, ks, vq, vs, qh = data
    ref = cross_decode_reference_exact(q, kq, ks, vq, vs, layer=0,
                                       n_heads=H, out_dtype=jnp.float32)
    twin = whisper._cross_attention_int8(qh, kq[0], ks[0], vq[0], vs[0])
    twin = whisper.merge_heads(twin)[:, 0]               # [B, D]
    np.testing.assert_allclose(np.asarray(ref), np.asarray(twin),
                               rtol=2e-5, atol=2e-5)


def test_exact_reference_matches_classic_path(data):
    """The exact head-minor math must equal the CLASSIC-layout exact path
    (whisper._attention_int8) over the real (unpadded) positions — the
    guarantee that flipping the default cache layout never changes
    decode numerics beyond reduction order."""
    q, kq, ks, vq, vs, qh = data
    ref = cross_decode_reference_exact(q, kq, ks, vq, vs, layer=1,
                                       n_heads=H, out_dtype=jnp.float32)
    kq5 = kq[1].reshape(B, S_pad, H, hd)[:, :S].transpose(0, 2, 1, 3)
    vq5 = vq[1].reshape(B, S_pad, H, hd)[:, :S].transpose(0, 2, 1, 3)
    classic = whisper._attention_int8(qh, kq5, ks[1][..., :S],
                                      vq5, vs[1][..., :S])
    classic = whisper.merge_heads(classic)[:, 0]
    np.testing.assert_allclose(np.asarray(ref), np.asarray(classic),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("K", [2, 4])
def test_exact_beamfolded_matches_reference(data, K,
                                            rng=np.random.default_rng(17)):
    """Beam-folded exact queries (K per sample) over the shared slab."""
    _, kq, ks, vq, vs, _ = data
    qh = jnp.asarray(rng.standard_normal((B, H, K, hd)), jnp.float32)
    q = qh.transpose(0, 2, 1, 3).reshape(B, K, D)        # [B, K, D]
    got = cross_decode_attention_exact(q, kq, ks, vq, vs, layer=1,
                                       n_heads=H, out_dtype=jnp.float32,
                                       interpret=True, beam_width=K)
    want = cross_decode_reference_exact(q, kq, ks, vq, vs, layer=1,
                                        n_heads=H, out_dtype=jnp.float32)
    assert got.shape == (B, K, D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_exact_beamfolded_reference_matches_model_twin(
        data, rng=np.random.default_rng(5)):
    _, kq, ks, vq, vs, _ = data
    K = 3
    qh = jnp.asarray(rng.standard_normal((B, H, K, hd)), jnp.float32)
    q = qh.transpose(0, 2, 1, 3).reshape(B, K, D)
    ref = cross_decode_reference_exact(q, kq, ks, vq, vs, layer=0,
                                       n_heads=H, out_dtype=jnp.float32)
    twin = whisper._cross_attention_int8(qh, kq[0], ks[0], vq[0], vs[0])
    twin = whisper.merge_heads(twin)                     # [B, K, D]
    np.testing.assert_allclose(np.asarray(ref), np.asarray(twin),
                               rtol=2e-5, atol=2e-5)


def test_use_head_minor_gating():
    """Layout auto-selection: int8-only, no int4, no mesh; scores_int8
    forces it (the s8 opt-in's layout) on any backend; plain int8 picks it
    only on TPU (False here on CPU)."""
    hm = whisper.use_head_minor
    on_tpu = jax.default_backend() == "tpu"
    assert hm(cross_kv_int8=True, self_kv_int8=True,
              scores_int8=True) is True
    assert hm(cross_kv_int8=True, self_kv_int8=True) is on_tpu
    assert hm(cross_kv_int8=False, self_kv_int8=False) is False
    assert hm(cross_kv_int8=True, self_kv_int8=False) is False
    assert hm(cross_kv_int8=True, self_kv_int8=True,
              cross_kv_int4=True, self_kv_int4=True) is False

    class FakeMesh:
        pass

    assert hm(cross_kv_int8=True, self_kv_int8=True, scores_int8=True,
              mesh=FakeMesh()) is False


def test_greedy_head_minor_tokens_match_classic():
    """End-to-end: greedy decode over a head-minor int8 cache (the TPU
    default layout; jnp twin path on CPU) must emit the same tokens as the
    classic int8 layout."""
    from sar_tpu.models.config import get_config
    from sar_tpu.decode.greedy import greedy_decode

    cfg = get_config("whisper-test")
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    mel = jax.random.normal(
        jax.random.PRNGKey(1),
        (2, cfg.num_mel_bins, cfg.max_source_positions * 2))
    enc = whisper.encode(params, mel, cfg)
    prompt = jnp.asarray(cfg.prompt_ids("hindi"), jnp.int32)

    classic = greedy_decode(params, enc, cfg, prompt, max_new_tokens=8,
                            cross_kv_int8=True, self_kv_int8=True,
                            head_minor=False)
    hm = greedy_decode(params, enc, cfg, prompt, max_new_tokens=8,
                       cross_kv_int8=True, self_kv_int8=True,
                       head_minor=True)
    np.testing.assert_array_equal(np.asarray(classic), np.asarray(hm))

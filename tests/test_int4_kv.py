"""int4 nibble-packed KV cache: pack/unpack exactness, attention math vs an
explicit-dequant reference, decode-loop integration (greedy + beam +
segmented), and the compose-guards. int4 is an opt-in approximation (15
levels/row) gated like scores_int8 — these tests pin the mechanics, not WER."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sar_tpu.decode import greedy_decode
from sar_tpu.decode.beam import beam_decode
from sar_tpu.models import whisper
from sar_tpu.models.config import get_config


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("whisper-test")
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _dequant4(packed, scale):
    """[.., S, hd//2] packed + [.., S] scale -> float [.., S, hd]
    (contiguous-halves layout: low nibbles first half, high nibbles second)."""
    lo, hi = whisper.unpack_kv4(packed)
    q = np.concatenate([np.asarray(lo), np.asarray(hi)], axis=-1)
    return q.astype(np.float32) * np.asarray(scale)[..., None]


def test_quantize_kv4_roundtrip_exact(rng):
    """Rows whose values are integer multiples of amax/7 survive exactly."""
    q = rng.integers(-7, 8, size=(3, 5, 8)).astype(np.float32)
    q[..., 0] = 7.0                       # pin amax so scale == 1 per row
    packed, scale = whisper.quantize_kv4(jnp.asarray(q))
    assert packed.shape == (3, 5, 4) and packed.dtype == jnp.int8
    np.testing.assert_allclose(np.asarray(scale), 1.0, rtol=1e-6)
    np.testing.assert_array_equal(_dequant4(packed, scale), q)


def test_quantize_kv4_error_bound(rng):
    """Arbitrary rows: |x - dq(x)| <= scale/2 elementwise, values in [-7,7]."""
    x = rng.standard_normal((2, 4, 7, 16)).astype(np.float32) * 3.0
    packed, scale = whisper.quantize_kv4(jnp.asarray(x))
    lo, hi = whisper.unpack_kv4(packed)
    vals = np.concatenate([np.asarray(lo), np.asarray(hi)], -1)
    assert vals.min() >= -7 and vals.max() <= 7
    err = np.abs(x - _dequant4(packed, scale))
    assert (err <= np.asarray(scale)[..., None] / 2 + 1e-6).all()


def test_quantize_kv4_odd_head_dim():
    with pytest.raises(ValueError, match="even head_dim"):
        whisper.quantize_kv4(jnp.zeros((2, 3, 5)))


def test_attention_int4_matches_explicit_dequant(rng):
    """_attention_int4's two half-width dots == one full dot over the
    explicitly dequantized K/V (same scale-factored math)."""
    B, H, Q, S, hd = 2, 3, 1, 11, 8
    q = jnp.asarray(rng.standard_normal((B, H, Q, hd)), jnp.float32)
    k = rng.standard_normal((B, H, S, hd)).astype(np.float32)
    v = rng.standard_normal((B, H, S, hd)).astype(np.float32)
    kp, ks = whisper.quantize_kv4(jnp.asarray(k))
    vp, vs = whisper.quantize_kv4(jnp.asarray(v))
    out = np.asarray(whisper._attention_int4(q, kp, ks, vp, vs))

    kd, vd = _dequant4(kp, ks), _dequant4(vp, vs)
    scores = np.einsum("bhqd,bhsd->bhqs", np.asarray(q), kd)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(scores), -1))
    ref = np.einsum("bhqs,bhsd->bhqd", probs, vd)
    np.testing.assert_allclose(out, ref, atol=2e-5)

    # Mask path (self-attention valid prefix).
    mask = (jnp.arange(S) < 6)[None, None, None, :]
    out_m = np.asarray(whisper._attention_int4(q, kp, ks, vp, vs, mask=mask))
    scores_m = np.where(np.asarray(mask), scores, np.finfo(np.float32).min)
    probs_m = np.asarray(jax.nn.softmax(jnp.asarray(scores_m), -1))
    ref_m = np.einsum("bhqs,bhsd->bhqd", probs_m, vd)
    np.testing.assert_allclose(out_m, ref_m, atol=2e-5)


def test_int4_cross_kv_close_to_bf16(setup, rng):
    """int4 cross-KV decode: first-step logits within a loose tolerance
    (≈2x the int8 band), decent token agreement on random weights."""
    cfg, params = setup
    mel = jnp.asarray(rng.standard_normal((4, cfg.num_mel_bins,
                                           cfg.max_source_positions * 2)),
                      jnp.float32)
    enc = whisper.encode(params, mel, cfg)
    prompt = jnp.asarray(cfg.prompt_ids("hindi"), jnp.int32)

    cache_bf = whisper.init_cache(params, enc, cfg, max_len=16)
    cache_q = whisper.init_cache(params, enc, cfg, max_len=16,
                                 cross_kv_int4=True)
    assert cache_q.cross_k.shape[-1] == cache_bf.cross_k.shape[-1] // 2
    tok = jnp.full((4,), cfg.sot_token_id, jnp.int32)
    logits_bf, _ = whisper.decode_step(params, tok, jnp.int32(0), cache_bf, cfg)
    logits_q, _ = whisper.decode_step(params, tok, jnp.int32(0), cache_q, cfg)
    err = np.abs(np.asarray(logits_bf) - np.asarray(logits_q)).max()
    assert err < 0.5, err

    a = greedy_decode(params, enc, cfg, prompt, max_new_tokens=10)
    b = greedy_decode(params, enc, cfg, prompt, max_new_tokens=10,
                      cross_kv_int4=True, self_kv_int4=True)
    agreement = (np.asarray(a) == np.asarray(b)).mean()
    assert agreement > 0.6, agreement


def test_int4_segmented_matches_unsegmented(setup, rng):
    """Segment slicing moves the packed hd//2 value axis and the scale rows
    consistently: tokens are bit-identical to the unsegmented loop."""
    cfg, params = setup
    mel = jnp.asarray(rng.standard_normal((2, cfg.num_mel_bins, 64)),
                      jnp.float32)
    enc = whisper.encode(params, mel, cfg)
    prompt = jnp.asarray(cfg.prompt_ids("telugu"), jnp.int32)
    a = greedy_decode(params, enc, cfg, prompt, max_new_tokens=12,
                      cross_kv_int4=True, self_kv_int4=True, segment=0)
    b = greedy_decode(params, enc, cfg, prompt, max_new_tokens=12,
                      cross_kv_int4=True, self_kv_int4=True, segment=4)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_int4_beam_runs(setup, rng):
    """Beam search over an int4 cache: shared per-sample cross slabs, beam
    reorder over the packed self cache."""
    cfg, params = setup
    mel = jnp.asarray(rng.standard_normal((2, cfg.num_mel_bins, 64)),
                      jnp.float32)
    enc = whisper.encode(params, mel, cfg)
    prompt = jnp.asarray(cfg.prompt_ids("hindi"), jnp.int32)
    out = beam_decode(params, enc, cfg, prompt, num_beams=2,
                      max_new_tokens=8, cross_kv_int4=True,
                      self_kv_int4=True)
    assert out.shape == (2, prompt.shape[0] + 8)
    bf = beam_decode(params, enc, cfg, prompt, num_beams=2, max_new_tokens=8)
    assert (np.asarray(out) == np.asarray(bf)).mean() > 0.5


def test_int4_mixed_cross4_self8(setup, rng):
    """Cross int4 + self int8 compose (the flags are independent)."""
    cfg, params = setup
    mel = jnp.asarray(rng.standard_normal((2, cfg.num_mel_bins, 64)),
                      jnp.float32)
    enc = whisper.encode(params, mel, cfg)
    prompt = jnp.asarray(cfg.prompt_ids("hindi"), jnp.int32)
    out = greedy_decode(params, enc, cfg, prompt, max_new_tokens=8,
                        cross_kv_int4=True, self_kv_int8=True)
    assert out.shape == (2, prompt.shape[0] + 8)


def test_int4_evaluator(setup, rng):
    """ASREvaluator(kv_int4=True) — the evaluate_model.py --kv_cache int4
    path: transcribes, and refuses to compose with scores_int8."""
    from sar_tpu.data.tokenizer import CharTokenizer
    from sar_tpu.evaluation.evaluator import ASREvaluator
    cfg, params = setup
    tok = CharTokenizer(cfg)
    mel = jnp.asarray(rng.standard_normal((2, cfg.num_mel_bins,
                                           cfg.max_source_positions * 2)),
                      jnp.float32)
    ev = ASREvaluator(cfg, params, tok, language="english", max_new_tokens=8,
                      kv_int4=True)
    assert ev.kv_int4 and not ev.kv_int8
    texts = ev._transcribe_batch(mel)
    assert len(texts) == 2
    with pytest.raises(ValueError, match="int4"):
        ASREvaluator(cfg, params, tok, language="english", kv_int4=True,
                     scores_int8=True)


def test_int4_guards(setup, rng):
    """scores_int8 (s8-MXU) and head_minor refuse int4-packed caches."""
    cfg, params = setup
    mel = jnp.asarray(rng.standard_normal((1, cfg.num_mel_bins, 64)),
                      jnp.float32)
    enc = whisper.encode(params, mel, cfg)
    prompt = jnp.asarray(cfg.prompt_ids("hindi"), jnp.int32)
    cache = whisper.init_cache(params, enc, cfg, max_len=8,
                               cross_kv_int4=True, self_kv_int4=True)
    tok = jnp.full((1,), cfg.sot_token_id, jnp.int32)
    with pytest.raises(ValueError, match="int4"):
        whisper.decode_step(params, tok, jnp.int32(0), cache, cfg,
                            scores_int8=True)
    with pytest.raises(ValueError, match="int4"):
        whisper.init_cache(params, enc, cfg, max_len=8, cross_kv_int8=True,
                           self_kv_int8=True, cross_kv_int4=True,
                           head_minor=True)

"""Numerical parity of the JAX Whisper vs the substrate the reference uses
(HF WhisperForConditionalGeneration), on a tiny random-init config — offline,
CPU-only. Covers encoder, teacher-forced decoder, and the KV-cached step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sar_tpu.models import convert, whisper
from sar_tpu.models.config import MODEL_CONFIGS

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def tiny():
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    hf_cfg = HFConfig(
        vocab_size=256, num_mel_bins=80, d_model=64,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
        max_source_positions=32, max_target_positions=32,
        pad_token_id=3, bos_token_id=4, eos_token_id=3,
        decoder_start_token_id=4, attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf_model = WhisperForConditionalGeneration(hf_cfg).eval()
    cfg = convert.config_from_hf(hf_cfg)
    params = jax.tree.map(jnp.asarray, convert.from_hf_model(hf_model, cfg))
    return hf_model, cfg, params


def _mel(rng, B, cfg):
    return rng.standard_normal((B, cfg.num_mel_bins, cfg.max_source_positions * 2)).astype(np.float32)


def test_encoder_parity(tiny, rng):
    hf_model, cfg, params = tiny
    mel = _mel(rng, 2, cfg)
    with torch.no_grad():
        theirs = hf_model.model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    ours = np.asarray(whisper.encode(params, jnp.asarray(mel), cfg))
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_forward_parity(tiny, rng):
    hf_model, cfg, params = tiny
    mel = _mel(rng, 2, cfg)
    tokens = rng.integers(0, cfg.vocab_size, size=(2, 10)).astype(np.int32)
    with torch.no_grad():
        theirs = hf_model(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(tokens.astype(np.int64)),
        ).logits.numpy()
    ours = np.asarray(whisper.forward(params, jnp.asarray(mel), jnp.asarray(tokens), cfg))
    np.testing.assert_allclose(ours, theirs, atol=5e-4)


def test_decode_step_matches_teacher_forced(tiny, rng):
    """The KV-cached incremental path must reproduce full-sequence logits."""
    _, cfg, params = tiny
    mel = _mel(rng, 2, cfg)
    T = 8
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, T)), jnp.int32)

    enc_out = whisper.encode(params, jnp.asarray(mel), cfg)
    full = whisper.decode_train(params, enc_out, tokens, cfg)

    cache = whisper.init_cache(params, enc_out, cfg, max_len=T)
    step_logits = []
    for t in range(T):
        logits, cache = whisper.decode_step(params, tokens[:, t], jnp.int32(t), cache, cfg)
        step_logits.append(logits)
    incremental = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(np.asarray(incremental), np.asarray(full), atol=2e-4)


def test_remat_matches(tiny, rng):
    _, cfg, params = tiny
    mel = jnp.asarray(_mel(rng, 1, cfg))
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 5)), jnp.int32)
    a = whisper.forward(params, mel, tokens, cfg)
    b = whisper.forward(params, mel, tokens, cfg, remat=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_shift_tokens_right():
    labels = jnp.asarray([[7, 8, 9, -100], [5, -100, -100, -100]])
    out = whisper.shift_tokens_right(labels, start_token_id=4, pad_token_id=0)
    np.testing.assert_array_equal(np.asarray(out), [[4, 7, 8, 9], [4, 5, 0, 0]])


def test_cross_entropy_masking():
    logits = jnp.zeros((1, 3, 10))
    labels = jnp.asarray([[1, 2, -100]])
    loss = whisper.cross_entropy_loss(logits, labels)
    np.testing.assert_allclose(float(loss), np.log(10.0), rtol=1e-5)


def test_registry_configs():
    assert MODEL_CONFIGS["whisper-small"].d_model == 768
    assert MODEL_CONFIGS["whisper-large"].num_mel_bins == 128
    small = MODEL_CONFIGS["whisper-small"]
    # <|sot|><|hi|><|transcribe|><|notimestamps|>
    assert small.prompt_ids("hindi") == [50258, 50259 + 17, 50359, 50363]
    assert small.prompt_ids("italian")[1] == 50259 + 15


def test_param_count_small_matches_reference_scale():
    """whisper-small should be ~244M params (/root/reference/README.md:109-113)."""
    cfg = MODEL_CONFIGS["whisper-small"]
    params = whisper.init_params(jax.random.PRNGKey(0), MODEL_CONFIGS["whisper-test"])
    assert whisper.param_count(params) > 0  # smoke: init works
    # Analytic count for small (no init at that size in tests).
    d, L, f, V = cfg.d_model, cfg.encoder_layers, cfg.ffn_dim, cfg.vocab_size
    approx = V * d + (cfg.max_source_positions + cfg.max_target_positions) * d \
        + L * (4 * d * d + 2 * d * f) + L * (8 * d * d + 2 * d * f)
    assert 200e6 < approx < 300e6

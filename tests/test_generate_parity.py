"""Token-level parity of the compiled decode loops vs the substrate's
generate() — the strongest offline WER-parity proxy in a zero-egress world.

The reference relies entirely on HF generate semantics
(/root/reference/src/models/whisper_lora.py:145-186 greedy defaults;
/root/reference/scripts/evaluate_model.py:71-72 exposes num_beams). These
tests drive the SAME tiny random-init HF model through GenerationMixin
(greedy and beam, with suppress/begin-suppress enabled) and assert our
lax.while_loop decoders produce the same tokens.

GenerationMixin.generate is called directly (not Whisper's override) so the
prompt is an explicit decoder_input_ids — matching how our decode loops are
driven, and how the reference uses the model after clearing
forced_decoder_ids (/root/reference/src/models/base.py:129-131).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sar_tpu.decode.beam import beam_decode
from sar_tpu.decode.greedy import greedy_decode
from sar_tpu.models import convert, whisper

EOS = 3


@pytest.fixture(scope="module")
def tiny():
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    hf_cfg = HFConfig(
        vocab_size=256, num_mel_bins=80, d_model=64,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
        max_source_positions=32, max_target_positions=48,
        pad_token_id=EOS, bos_token_id=4, eos_token_id=EOS,
        decoder_start_token_id=4, attn_implementation="eager",
    )
    torch.manual_seed(1)
    hf_model = WhisperForConditionalGeneration(hf_cfg).eval()
    # Bias the (tied) EOS embedding so sequences actually terminate within a
    # few steps — exercising the EOS/finalization paths, not only max-length.
    with torch.no_grad():
        hf_model.model.decoder.embed_tokens.weight[EOS] += 0.4
    # The reference clears suppression lists (base.py:129-131); tests pass
    # them explicitly instead.
    hf_model.generation_config.suppress_tokens = None
    hf_model.generation_config.begin_suppress_tokens = None
    hf_model.generation_config.forced_decoder_ids = None
    cfg = convert.config_from_hf(hf_cfg)
    params = jax.tree.map(jnp.asarray, convert.from_hf_model(hf_model, cfg))
    return hf_model, cfg, params


def _mel(seed, B, cfg):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(
        (B, cfg.num_mel_bins, cfg.max_source_positions * 2)).astype(np.float32)


PROMPT = [4, 11, 7]  # explicit decoder prompt (sot + arbitrary forced tokens)


def _hf_generate(hf_model, mel, max_new_tokens, **kw):
    """Run the substrate's generic generate (greedy or beam) with an explicit
    decoder prompt; returns sequences as np.ndarray [B, <=P+max_new]."""
    from transformers.generation import GenerationMixin
    B = mel.shape[0]
    dec = torch.tensor([PROMPT] * B, dtype=torch.long)
    with torch.no_grad():
        out = GenerationMixin.generate(
            hf_model, input_features=torch.from_numpy(mel),
            decoder_input_ids=dec, max_new_tokens=max_new_tokens,
            do_sample=False, **kw)
    return np.asarray(out)


def _gen_tokens(row, prompt_len):
    """Generated ids after the prompt, cut at (excluding) the first EOS."""
    body = list(row[prompt_len:])
    return body[:body.index(EOS)] if EOS in body else body


def _assert_rows_match(theirs, ours, prompt_len):
    for i in range(ours.shape[0]):
        t = _gen_tokens(theirs[i], prompt_len)
        o = _gen_tokens(np.asarray(ours)[i], prompt_len)
        assert t == o, f"row {i}: HF {t} != ours {o}"


@pytest.mark.parametrize("suppress,begin", [((), ()), ((9, 17, 30), (5, 8))])
def test_greedy_token_parity(tiny, suppress, begin):
    hf_model, cfg, params = tiny
    mel = _mel(7, 3, cfg)
    kw = {}
    if suppress:
        kw["suppress_tokens"] = list(suppress)
    if begin:
        kw["begin_suppress_tokens"] = list(begin)
    theirs = _hf_generate(hf_model, mel, max_new_tokens=16, num_beams=1, **kw)

    enc = whisper.encode(params, jnp.asarray(mel), cfg)
    ours = greedy_decode(params, enc, cfg, jnp.asarray(PROMPT, jnp.int32),
                         max_new_tokens=16, suppress_ids=suppress,
                         begin_suppress_ids=begin)
    _assert_rows_match(theirs, ours, len(PROMPT))


@pytest.mark.parametrize("num_beams,length_penalty", [
    (2, 1.0), (3, 1.0), (4, 0.0), (4, 2.0), (3, -0.5)])
def test_beam_token_parity(tiny, num_beams, length_penalty):
    hf_model, cfg, params = tiny
    mel = _mel(11, 3, cfg)
    theirs = _hf_generate(hf_model, mel, max_new_tokens=12,
                          num_beams=num_beams, length_penalty=length_penalty,
                          early_stopping=False)

    enc = whisper.encode(params, jnp.asarray(mel), cfg)
    ours = beam_decode(params, enc, cfg, jnp.asarray(PROMPT, jnp.int32),
                       num_beams=num_beams, max_new_tokens=12,
                       length_penalty=length_penalty)
    _assert_rows_match(theirs, ours, len(PROMPT))


def test_beam_token_parity_with_suppress(tiny):
    hf_model, cfg, params = tiny
    mel = _mel(13, 2, cfg)
    suppress, begin = (9, 17, 30, 44), (5, 8)
    theirs = _hf_generate(hf_model, mel, max_new_tokens=12, num_beams=3,
                          suppress_tokens=list(suppress),
                          begin_suppress_tokens=list(begin))
    enc = whisper.encode(params, jnp.asarray(mel), cfg)
    ours = beam_decode(params, enc, cfg, jnp.asarray(PROMPT, jnp.int32),
                       num_beams=3, max_new_tokens=12, suppress_ids=suppress,
                       begin_suppress_ids=begin)
    _assert_rows_match(theirs, ours, len(PROMPT))


def test_beam_maxlen_no_eos_parity(tiny):
    """Max-length finalization path: EOS suppressed so nothing terminates."""
    hf_model, cfg, params = tiny
    mel = _mel(17, 2, cfg)
    theirs = _hf_generate(hf_model, mel, max_new_tokens=8, num_beams=3,
                          suppress_tokens=[EOS])
    enc = whisper.encode(params, jnp.asarray(mel), cfg)
    ours = beam_decode(params, enc, cfg, jnp.asarray(PROMPT, jnp.int32),
                       num_beams=3, max_new_tokens=8, suppress_ids=(EOS,))
    # No EOS anywhere: compare the full generated window.
    P = len(PROMPT)
    np.testing.assert_array_equal(theirs[:, P:P + 8],
                                  np.asarray(ours)[:, P:P + 8])

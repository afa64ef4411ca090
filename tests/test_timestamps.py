"""Whisper timestamp decoding: parity vs the installed HF stack.

Three layers of evidence, all hermetic:
  1. `apply_timestamp_rules` reproduces `WhisperTimeStampLogitsProcessor`
     (transformers 4.57) mask-for-mask on random logits walks.
  2. The compiled greedy loop with `timestamps=True` is token-exact vs HF
     `GenerationMixin.generate` with the timestamp processor attached.
  3. Same for beam search (HF applies processors to log-probs in beam
     mode — the loop mirrors that on its timestamps branch).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sar_tpu.decode.beam import beam_decode
from sar_tpu.decode.greedy import greedy_decode
from sar_tpu.decode.timestamps import (apply_timestamp_rules, format_segments,
                                       split_segments)
from sar_tpu.models import convert, whisper

EOS = 3
NO_TS = 200          # timestamps occupy ids 201..255 of the 256-wide vocab
PROMPT = [4, 11, 7]  # sot + forced tokens; no <|notimestamps|>


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
    torch.manual_seed(7)
    hf_model = WhisperForConditionalGeneration(hf_cfg).eval()
    with torch.no_grad():
        # Nudge EOS and a few timestamp embeddings so walks terminate and
        # actually emit timestamps under random weights.
        hf_model.model.decoder.embed_tokens.weight[EOS] += 0.3
        hf_model.model.decoder.embed_tokens.weight[NO_TS + 1:] += 0.2
    hf_model.generation_config.suppress_tokens = None
    hf_model.generation_config.begin_suppress_tokens = None
    hf_model.generation_config.forced_decoder_ids = None
    cfg = dataclasses.replace(convert.config_from_hf(hf_cfg),
                              no_timestamps_token_id=NO_TS)
    params = jax.tree.map(jnp.asarray, convert.from_hf_model(hf_model, cfg))
    return hf_model, cfg, params


def _hf_processor(cfg, begin_index, max_initial=1):
    from transformers import GenerationConfig
    from transformers.generation.logits_process import \
        WhisperTimeStampLogitsProcessor
    gen_cfg = GenerationConfig(eos_token_id=cfg.eos_token_id)
    gen_cfg.no_timestamps_token_id = cfg.no_timestamps_token_id
    gen_cfg.max_initial_timestamp_index = max_initial
    return WhisperTimeStampLogitsProcessor(gen_cfg, begin_index=begin_index)


def _mel(seed, B, cfg):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(
        (B, cfg.num_mel_bins, cfg.max_source_positions * 2)).astype(np.float32)


def test_rules_match_hf_processor(tiny):
    """Walk 10 argmax steps from the prompt; at each step the jax mask must
    equal the torch processor's output (same -infs, same finite values)."""
    _, cfg, _ = tiny
    V, total, P = 256, 16, len(PROMPT)
    rng = np.random.default_rng(0)
    B = 3
    proc = _hf_processor(cfg, begin_index=P)

    seqs = [list(PROMPT) for _ in range(B)]
    for step in range(10):
        pos = P - 1 + step          # index of the token just consumed
        scores = rng.standard_normal((B, V)).astype(np.float32) * 3
        theirs = proc(torch.tensor([s for s in seqs], dtype=torch.long),
                      torch.from_numpy(scores.copy())).numpy()

        buf = np.full((B, total), cfg.eos_token_id, np.int32)
        for b, s in enumerate(seqs):
            buf[b, :len(s)] = s
        ours = np.asarray(apply_timestamp_rules(
            jnp.asarray(scores), jnp.asarray(buf), jnp.int32(pos),
            jnp.int32(P), cfg, max_initial_timestamp_index=1))

        np.testing.assert_array_equal(np.isneginf(theirs), np.isneginf(ours),
                                      err_msg=f"step {step}")
        finite = ~np.isneginf(theirs)
        np.testing.assert_allclose(theirs[finite], ours[finite], rtol=1e-6,
                                   err_msg=f"step {step}")
        nxt = theirs.argmax(-1)
        for b in range(B):
            seqs[b].append(int(nxt[b]))


def test_rules_crafted_prefixes(tiny):
    """Exercise each grammar branch explicitly: lone timestamp, completed
    pair, monotonicity threshold, initial-position cap."""
    _, cfg, _ = tiny
    V, total, P = 256, 12, 2
    ts = cfg.no_timestamps_token_id + 1
    proc = _hf_processor(cfg, begin_index=P)
    rng = np.random.default_rng(1)
    prefixes = [
        [4, 9],                       # initial position (len == begin_index)
        [4, 9, ts + 1],               # lone timestamp -> ts-or-EOS only
        [4, 9, ts + 1, 17],           # text after opening ts
        [4, 9, ts + 1, ts + 1],       # completed pair -> text only
        [4, 9, ts + 2, 17, ts + 4, ts + 6],   # rising stamps
    ]
    for seq in prefixes:
        scores = rng.standard_normal((1, V)).astype(np.float32) * 3
        theirs = proc(torch.tensor([seq], dtype=torch.long),
                      torch.from_numpy(scores.copy())).numpy()
        buf = np.full((1, total), cfg.eos_token_id, np.int32)
        buf[0, :len(seq)] = seq
        ours = np.asarray(apply_timestamp_rules(
            jnp.asarray(scores), jnp.asarray(buf), jnp.int32(len(seq) - 1),
            jnp.int32(P), cfg, max_initial_timestamp_index=1))
        np.testing.assert_array_equal(np.isneginf(theirs), np.isneginf(ours),
                                      err_msg=f"prefix {seq}")
        finite = ~np.isneginf(theirs)
        np.testing.assert_allclose(theirs[finite], ours[finite], rtol=1e-6,
                                   err_msg=f"prefix {seq}")


def _hf_generate_ts(hf_model, cfg, mel, max_new_tokens, **kw):
    from transformers.generation import GenerationMixin
    B = mel.shape[0]
    dec = torch.tensor([PROMPT] * B, dtype=torch.long)
    proc = _hf_processor(cfg, begin_index=len(PROMPT))
    with torch.no_grad():
        out = GenerationMixin.generate(
            hf_model, input_features=torch.from_numpy(mel),
            decoder_input_ids=dec, max_new_tokens=max_new_tokens,
            do_sample=False, logits_processor=[proc], **kw)
    return np.asarray(out)


def _gen_tokens(row, prompt_len):
    body = list(row[prompt_len:])
    return body[:body.index(EOS)] if EOS in body else body


def test_greedy_timestamps_match_hf(tiny):
    hf_model, cfg, params = tiny
    mel = _mel(5, 4, cfg)
    theirs = _hf_generate_ts(hf_model, cfg, mel, max_new_tokens=12)
    enc = whisper.encode(params, jnp.asarray(mel), cfg)
    ours = np.asarray(greedy_decode(
        params, enc, cfg, jnp.asarray(PROMPT, jnp.int32),
        max_new_tokens=12, timestamps=True))
    emitted_ts = 0
    for i in range(4):
        a = _gen_tokens(theirs[i], len(PROMPT))
        b = _gen_tokens(ours[i], len(PROMPT))
        assert a == b, (i, a, b)
        emitted_ts += sum(t > NO_TS for t in a)
    assert emitted_ts > 0, "walk never produced a timestamp token"


def test_beam_timestamps_match_hf(tiny):
    hf_model, cfg, params = tiny
    mel = _mel(9, 3, cfg)
    theirs = _hf_generate_ts(hf_model, cfg, mel, max_new_tokens=10,
                             num_beams=2, length_penalty=1.0,
                             early_stopping=False)
    enc = whisper.encode(params, jnp.asarray(mel), cfg)
    ours = np.asarray(beam_decode(
        params, enc, cfg, jnp.asarray(PROMPT, jnp.int32), num_beams=2,
        max_new_tokens=10, timestamps=True))
    for i in range(3):
        a = _gen_tokens(theirs[i], len(PROMPT))
        b = _gen_tokens(ours[i], len(PROMPT))
        assert a == b, (i, a, b)


def test_split_and_format_segments(tiny):
    _, cfg, _ = tiny

    class Tok:
        def decode(self, ids):
            return " ".join(f"w{i}" for i in ids)

    ts = cfg.no_timestamps_token_id + 1
    ids = [ts + 0, 10, 11, ts + 25, ts + 25, 12, ts + 40]
    segs = split_segments(ids, cfg)
    assert segs[0] == (0.0, 0.5, [10, 11])
    assert segs[1] == (0.5, 0.8, [12])
    out = format_segments(segs, Tok())
    assert "[0.00 -> 0.50] w10 w11" in out
    assert "[0.50 -> 0.80] w12" in out

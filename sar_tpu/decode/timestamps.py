"""Whisper timestamp decoding rules, vectorized for the compiled loops.

Implements HF's `WhisperTimeStampLogitsProcessor` semantics (transformers
4.57, generation/logits_process.py — itself a port of openai/whisper's
ApplyTimestampRules) as a pure function over the step logits, so the rules
run INSIDE `lax.while_loop` decode bodies on [B, V] blocks instead of a
per-sample host loop:

  1. `<|notimestamps|>` is always suppressed.
  2. Timestamps come in pairs (begin/end), except directly before EOS:
     after a single timestamp only timestamps-or-EOS may follow; after a
     completed pair the next token must be text.
  3. Timestamps never decrease; a repeated timestamp is only allowed as
     the closing half of a pair.
  4. At the first generated position only timestamps are allowed, capped
     at `max_initial_timestamp_index` above `<|0.00|>`.
  5. If the total timestamp probability mass exceeds the most likely text
     token, text is masked (the model "wants" a timestamp).

The reference never exposes timestamps (it decodes with
`<|notimestamps|>`, /root/reference/src/models/base.py:129-131); this is a
new capability. Parity is tested token-exactly against HF
`generate(return_timestamps=True)` and against the HF processor itself on
random logits (tests/test_timestamps.py).

Timestamp token values: id `timestamp_begin + i` means `i * 0.02` seconds
(Whisper's 20 ms grid).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def apply_timestamp_rules(logits: jnp.ndarray, tokens: jnp.ndarray,
                          pos, plen, cfg, *,
                          max_initial_timestamp_index: int | None = 1,
                          detect_from_logprob: bool = True) -> jnp.ndarray:
    """Mask step logits per the Whisper timestamp grammar.

    logits: [R, V] fp32 — the step's logits (suppress lists already
        applied, matching HF's processor order).
    tokens: [R, total] int32 — the sequence buffer; positions <= pos are
        valid (prompt + generated so far).
    pos: scalar — index of the token just consumed; the token being
        chosen now lands at pos + 1.
    plen: scalar — prompt length (HF's begin_index); generated tokens
        occupy [plen, pos].
    """
    R, V = logits.shape
    total = tokens.shape[1]
    ts_begin = cfg.no_timestamps_token_id + 1
    eos = cfg.eos_token_id
    cols = jnp.arange(V)
    is_ts_col = cols >= ts_begin

    # 1. <|notimestamps|> is never sampled on the timestamp path.
    logits = logits.at[:, cfg.no_timestamps_token_id].set(NEG_INF)

    n_gen = pos + 1 - plen                       # len of generated prefix
    last_tok = jax.lax.dynamic_slice_in_dim(tokens, pos, 1, axis=1)[:, 0]
    prev_tok = jax.lax.dynamic_slice_in_dim(
        tokens, jnp.maximum(pos - 1, 0), 1, axis=1)[:, 0]
    last_was = (n_gen >= 1) & (last_tok >= ts_begin)
    penult_was = (n_gen < 2) | (prev_tok >= ts_begin)

    # 2. Pair rule: after a completed pair -> text only; after a lone
    #    timestamp -> no plain text below EOS (timestamps or EOS).
    logits = jnp.where((last_was & penult_was)[:, None] & is_ts_col[None],
                       NEG_INF, logits)
    logits = jnp.where((last_was & ~penult_was)[:, None] & (cols < eos)[None],
                       NEG_INF, logits)

    # 3. Monotonic rule: threshold = value AT the latest generated
    #    timestamp (+1 unless it is the lone opening half of a pair, so a
    #    closing timestamp may repeat it).
    idxs = jnp.arange(total)
    in_gen = (idxs[None] >= plen) & (idxs[None] <= pos)      # [1/R, total]
    is_ts = (tokens >= ts_begin) & in_gen
    any_ts = is_ts.any(axis=1)
    last_ts_idx = jnp.max(jnp.where(is_ts, idxs[None], -1), axis=1)
    ts_last_val = jnp.take_along_axis(
        tokens, jnp.maximum(last_ts_idx, 0)[:, None], axis=1)[:, 0]
    thr = jnp.where(last_was & ~penult_was, ts_last_val, ts_last_val + 1)
    mono = (any_ts[:, None] & is_ts_col[None]
            & (cols[None] < thr[:, None]))
    logits = jnp.where(mono, NEG_INF, logits)

    # 4. First generated position: timestamps only, capped near <|0.00|>.
    initial = pos == plen - 1
    init_mask = ~is_ts_col
    if max_initial_timestamp_index is not None:
        init_mask = init_mask | (cols > ts_begin + max_initial_timestamp_index)
    logits = jnp.where(initial & init_mask[None], NEG_INF, logits)

    # 5. Probability rule, on the masked logits (HF computes log_softmax of
    #    the processed scores).
    if detect_from_logprob:
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        ts_lp = jax.scipy.special.logsumexp(
            jnp.where(is_ts_col[None], logprobs, NEG_INF), axis=-1)
        max_text = jnp.max(jnp.where(is_ts_col[None], NEG_INF, logprobs),
                           axis=-1)
        logits = jnp.where((ts_lp > max_text)[:, None] & ~is_ts_col[None],
                           NEG_INF, logits)
    return logits


def split_segments(ids, cfg, prompt_len: int = 0):
    """Host-side: split a decoded row into (start_s, end_s, token_list)
    segments on its timestamp tokens. Tokens before the first timestamp
    (or all of them, if none) come back as one (None, None, tokens)
    segment. `ids` is a 1-D python/numpy sequence already stripped of the
    prompt/EOS (e.g. `transcribe_tokens` output)."""
    ts_begin = cfg.no_timestamps_token_id + 1
    segments = []
    cur_start = None
    cur: list[int] = []
    for t in list(ids)[prompt_len:]:
        t = int(t)
        if t >= ts_begin:
            stamp = (t - ts_begin) * 0.02
            if cur_start is None:
                if cur:
                    segments.append((None, None, cur))
                    cur = []
                cur_start = stamp
            else:
                segments.append((cur_start, stamp, cur))
                cur, cur_start = [], None
        else:
            cur.append(t)
    if cur or cur_start is not None:
        segments.append((cur_start, None, cur))
    return segments


def format_segments(segments, tokenizer) -> str:
    """Render split_segments output as '[0.00 -> 1.24] text' lines."""
    lines = []
    for start, end, toks in segments:
        text = tokenizer.decode(toks).strip()
        if not text:
            continue
        if start is None:
            lines.append(text)
        else:
            end_s = f"{end:.2f}" if end is not None else "?"
            lines.append(f"[{start:.2f} -> {end_s}] {text}")
    return "\n".join(lines)

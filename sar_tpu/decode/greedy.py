"""KV-cached greedy decoding, compiled end-to-end.

Replaces the substrate generate() the reference calls
(/root/reference/src/models/whisper_lora.py:145-186, max_new_tokens=256
greedy default; evaluator at src/evaluation/__init__.py:64-95) with a single
`lax.while_loop` under jit: static shapes, no per-token host round-trip, and
early exit once every sequence has emitted EOS. The decoder prompt
`<|sot|><|lang|><|task|><|notimestamps|>` is fed through the same loop
(prompt positions force the next token instead of taking the argmax), which
doubles as forced-token handling. Suppress-token masking is available but off
by default — the reference explicitly clears suppress lists
(/root/reference/src/models/base.py:129-131).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sar_tpu.models import whisper
from sar_tpu.models.config import WhisperConfig


def greedy_decode(params: dict, enc_out: jnp.ndarray, cfg: WhisperConfig,
                  prompt_ids: jnp.ndarray, *, max_new_tokens: int = 256,
                  lora: dict | None = None,
                  adapter_idx: jnp.ndarray | None = None,
                  lora_scale: float = 1.0,
                  cross_kv_int8: bool = False,
                  self_kv_int8: bool = False,
                  cross_kv_int4: bool = False,
                  self_kv_int4: bool = False,
                  scores_int8: bool = False,
                  suppress_ids: tuple[int, ...] = (),
                  begin_suppress_ids: tuple[int, ...] = (),
                  prompt_len: jnp.ndarray | None = None,
                  segment: int = 32,
                  timestamps: bool = False,
                  max_initial_timestamp_index: int | None = 1,
                  temperature: float = 0.0,
                  rng: jnp.ndarray | None = None,
                  with_logprobs: bool = False,
                  with_no_speech: bool = False,
                  head_minor: bool | None = None):
    """Greedy decode. prompt_ids: [P] or [B, P] int32 (e.g. cfg.prompt_ids(lang)).

    Returns [B, P + max_new_tokens] int32; positions after EOS are EOS/pad.
    Shapes are static — safe under jit/pjit with no retracing across batches.

    NOTE for peak throughput: jit encode+init_cache and this loop as TWO
    separate programs (as sar_tpu.evaluation and bench.py do) — fusing the
    encoder into the same XLA program as the decode loop measurably slows the
    loop (~1.5x at whisper-small B=64 on v5e; live encoder intermediates
    degrade the loop's memory behavior).
    """
    B = enc_out.shape[0]
    if prompt_ids.ndim == 1:
        prompt_ids = jnp.broadcast_to(prompt_ids[None], (B, prompt_ids.shape[0]))
    P = prompt_ids.shape[1]
    total = min(P + max_new_tokens, cfg.max_target_positions)

    if head_minor is None:
        # Head-minor slabs feed the fused streaming kernels: the exact
        # default on TPU and the s8-MXU opt-in (whisper.use_head_minor).
        # Mesh callers must pass head_minor=False (no SPMD rule).
        head_minor = whisper.use_head_minor(
            cross_kv_int8=cross_kv_int8, self_kv_int8=self_kv_int8,
            cross_kv_int4=cross_kv_int4, self_kv_int4=self_kv_int4,
            scores_int8=scores_int8)
    cache = whisper.init_cache(params, enc_out, cfg, max_len=total, lora=lora,
                               adapter_idx=adapter_idx, lora_scale=lora_scale,
                               cross_kv_int8=cross_kv_int8,
                               self_kv_int8=self_kv_int8,
                               cross_kv_int4=cross_kv_int4,
                               self_kv_int4=self_kv_int4,
                               head_minor=head_minor)
    return greedy_decode_from_cache(
        params, cache, cfg, prompt_ids, lora=lora, adapter_idx=adapter_idx,
        lora_scale=lora_scale, scores_int8=scores_int8,
        suppress_ids=suppress_ids, begin_suppress_ids=begin_suppress_ids,
        prompt_len=prompt_len, segment=segment, timestamps=timestamps,
        max_initial_timestamp_index=max_initial_timestamp_index,
        temperature=temperature, rng=rng, with_logprobs=with_logprobs,
        with_no_speech=with_no_speech)


def greedy_decode_from_cache(params: dict, cache, cfg: WhisperConfig,
                             prompt_ids: jnp.ndarray, *,
                             lora: dict | None = None,
                             adapter_idx: jnp.ndarray | None = None,
                             lora_scale: float = 1.0,
                             scores_int8: bool = False,
                             suppress_ids: tuple[int, ...] = (),
                             begin_suppress_ids: tuple[int, ...] = (),
                             prompt_len: jnp.ndarray | None = None,
                             return_cache: bool = False,
                             segment: int = 32,
                             timestamps: bool = False,
                             max_initial_timestamp_index: int | None = 1,
                             temperature: float = 0.0,
                             rng: jnp.ndarray | None = None,
                             with_logprobs: bool = False,
                             with_no_speech: bool = False,
                             no_speech_pos=0,
                             max_gen_tokens=None):
    """The decode loop alone, from a prepared DecodeCache (see note above).
    Total length = cache.self_k.shape[3]. `begin_suppress_ids` are masked
    only at the first generated position (HF begin_suppress_tokens
    semantics; the reference clears these, so both default empty).

    `prompt_len` (traced int32 scalar, <= prompt_ids width) makes the forced
    prefix length DYNAMIC: positions < prompt_len force the buffer's token,
    the rest are generated. One compiled program then serves every prefix
    length — this is what incremental/streaming decoding rides (the
    committed transcript grows every update without retracing).

    `return_cache=True` additionally returns the final DecodeCache (cross
    fields passed through unchanged, self fields = the loop's final carry).
    Callers that jit this with `donate_argnums` on the cache MUST use it:
    XLA donation is input-output aliasing, so without a cache-shaped output
    the donated prep cache cannot alias the loop carry and both copies
    coexist in HBM ("Some donated buffers were not usable"). Drop the
    returned cache on the host to free the buffers.

    `segment` > 0 splits the loop into static-length segments: segment s
    carries self-KV buffers sized to its static high-water mark
    min((s+1)*segment, total) (zero-padded up between segments), so each
    step's self-attention streams only ~the valid prefix instead of all
    `total` rows — the buffers ARE the prefix; no per-step slicing, so the
    while carry still updates in place. Tokens are identical to segment=0;
    compile time grows with total/segment.

    Passing `rng` enables sampling: each step draws from
    softmax(logits/temperature) (after all masks) via the Gumbel-max
    identity argmax(logits + T*gumbel), with per-step keys folded from
    `rng`. `temperature` is a TRACED scalar, so one compiled program
    serves every temperature — and T=0.0 reproduces greedy argmax exactly
    (the openai temperature-fallback driver rides this). `with_logprobs`
    additionally returns (sum_logprobs [B] fp32, n_scored [B] int32): the
    accumulated log_softmax of each CHOSEN generated token, including the
    first EOS (openai's sum_logprobs convention; avg = sum / n_scored).
    `with_no_speech` returns p(<|nospeech|>) [B] fp32 from the RAW logits
    of the SOT step — openai's probs_at_sot silence signal, captured
    before any suppress/grammar masking. `no_speech_pos` (traced scalar)
    is the buffer position of `<|sot|>`: 0 for the standard prompt, >0
    when a `<|startofprev|>` context precedes it (conditioned long-form).
    `max_gen_tokens` (traced scalar or None) caps the GENERATED tokens per
    row at plen + max_gen_tokens: rows that hit the cap emit EOS padding
    and count as finished (needed when the prompt buffer is wider than
    the live prompt — without it the loop would run to the buffer end and
    the logprob stats would cover tokens the caller never keeps).
    Returns tokens, then (sum_logprobs, n_scored) if requested, then
    no_speech_prob if requested, then the cache if `return_cache` — flat
    tuple in that order."""
    B = cache.cross_k.shape[1]
    if prompt_ids.ndim == 1:
        prompt_ids = jnp.broadcast_to(prompt_ids[None], (B, prompt_ids.shape[0]))
    P = prompt_ids.shape[1]
    plen = P if prompt_len is None else prompt_len
    total = cache.self_k.shape[3]
    eos = cfg.eos_token_id

    tokens = jnp.full((B, total), eos, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt_ids.astype(jnp.int32), (0, 0))

    suppress = jnp.asarray(suppress_ids, jnp.int32) if suppress_ids else None
    begin_suppress = (jnp.asarray(begin_suppress_ids, jnp.int32)
                      if begin_suppress_ids else None)

    # Only the mutable self-attention cache (+ its int8 scales) is
    # loop-carried; the (large, loop-invariant) cross K/V are closed over so
    # the while body never copies them.
    cross = cache._replace(self_k=None, self_v=None,
                           self_k_scale=None, self_v_scale=None)
    mutable0 = (cache.self_k, cache.self_v,
                cache.self_k_scale, cache.self_v_scale)

    # Sampling is enabled by PASSING `rng` (a static program property);
    # `temperature` itself rides as a traced scalar, so one compiled
    # program serves every temperature — including exact greedy at 0.0 via
    # the Gumbel-max identity argmax(logits + T*gumbel) ~ softmax(l/T).
    if rng is None and not (isinstance(temperature, (int, float))
                            and temperature == 0.0):
        raise ValueError("temperature > 0 requires an rng key")

    def make_cond(pos_hi):
        def cond(state):
            pos, _, _, finished, *_ = state
            return (pos < pos_hi) & ~jnp.all(finished)
        return cond

    def body(state):
        pos, tokens, mutable, finished, sum_lp, n_sc, ns_prob = state
        sk, sv, sks, svs = mutable
        step_cache = cross._replace(self_k=sk, self_v=sv,
                                    self_k_scale=sks, self_v_scale=svs)
        logits, step_cache = whisper.decode_step(
            params, tokens[:, pos], pos, step_cache, cfg,
            lora=lora, adapter_idx=adapter_idx, lora_scale=lora_scale,
            scores_int8=scores_int8)
        if with_no_speech:
            # openai's probs_at_sot: softmax of the RAW logits at the
            # <|sot|> position (0 unless a <|startofprev|> context
            # precedes the standard prompt).
            p0 = jax.nn.softmax(logits.astype(jnp.float32), -1)
            ns_prob = jnp.where(pos == no_speech_pos,
                                p0[:, cfg.no_speech_token_id], ns_prob)
        if suppress is not None:
            logits = logits.at[:, suppress].set(jnp.finfo(jnp.float32).min)
        if begin_suppress is not None:
            first_gen = pos == plen - 1
            masked = logits.at[:, begin_suppress].set(
                jnp.finfo(jnp.float32).min)
            logits = jnp.where(first_gen, masked, logits)
        if timestamps:
            from sar_tpu.decode.timestamps import apply_timestamp_rules
            logits = apply_timestamp_rules(
                logits.astype(jnp.float32), tokens, pos, plen, cfg,
                max_initial_timestamp_index=max_initial_timestamp_index)
        if rng is not None:
            step_key = jax.random.fold_in(rng, pos)
            u = jax.random.uniform(step_key, logits.shape, jnp.float32,
                                   minval=jnp.finfo(jnp.float32).tiny)
            gumbel = -jnp.log(-jnp.log(u))
            t = jnp.asarray(temperature, jnp.float32)
            sampled = jnp.argmax(
                logits.astype(jnp.float32) + t * gumbel, -1).astype(jnp.int32)
        else:
            sampled = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        # Prompt positions force the provided token; finished rows emit EOS.
        in_prompt = pos + 1 < plen
        if max_gen_tokens is not None:
            # Position pos+1 would be generated token index pos+1-plen.
            past_cap = (pos + 1 - plen) >= max_gen_tokens
            finished = finished | (~in_prompt & past_cap)
        forced = jax.lax.dynamic_slice_in_dim(
            tokens, jnp.minimum(pos + 1, total - 1), 1, axis=1)[:, 0]
        nxt = jnp.where(in_prompt, forced, jnp.where(finished, eos, sampled))
        if with_logprobs:
            # log-prob of the CHOSEN token at untempered softmax (openai
            # scores at temperature 1 regardless of the sampling T).
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            step_lp = jnp.take_along_axis(logp, nxt[:, None], axis=1)[:, 0]
            score = ~in_prompt & ~finished
            sum_lp = sum_lp + jnp.where(score, step_lp, 0.0)
            n_sc = n_sc + score.astype(jnp.int32)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, pos + 1))
        finished = finished | (~in_prompt & (nxt == eos))
        mutable = (step_cache.self_k, step_cache.self_v,
                   step_cache.self_k_scale, step_cache.self_v_scale)
        return pos + 1, tokens, mutable, finished, sum_lp, n_sc, ns_prob

    def tslice(x, hi):
        """Prefix of the time axis (axis 3 for both [L,B,H,T,hd] K/V and
        [L,B,H,T] scales)."""
        return None if x is None else jax.lax.slice_in_dim(x, 0, hi, axis=3)

    def tpad(x, delta):
        return None if x is None else jnp.pad(
            x, [(0, 0)] * 3 + [(0, delta)] + [(0, 0)] * (x.ndim - 4))

    if segment and segment < total - 1:
        # Python-unrolled segments: segment s runs pos in
        # [s*segment, min((s+1)*segment, total-1)) carrying self buffers
        # sized hi_s = min((s+1)*segment, total) — the step at pos writes
        # row pos and reads rows <= pos < hi_s. Between segments the carry
        # is zero-padded up; the final segment's buffers are full-size, so
        # return_cache sees the standard shape.
        n_seg = (total - 2) // segment + 1
        hi = min(segment, total)
        state = (jnp.int32(0), tokens,
                 tuple(tslice(x, hi) for x in mutable0),
                 jnp.zeros((B,), bool),
                 jnp.zeros((B,), jnp.float32), jnp.zeros((B,), jnp.int32),
                 jnp.zeros((B,), jnp.float32))
        for s in range(n_seg):
            pos_hi = min((s + 1) * segment, total - 1)
            state = jax.lax.while_loop(make_cond(pos_hi), body, state)
            if s + 1 < n_seg:
                next_hi = min((s + 2) * segment, total)
                pos, tokens, mutable, fin, sum_lp, n_sc, ns = state
                state = (pos, tokens,
                         tuple(tpad(x, next_hi - hi) for x in mutable), fin,
                         sum_lp, n_sc, ns)
                hi = next_hi
    else:
        state = (jnp.int32(0), tokens, mutable0, jnp.zeros((B,), bool),
                 jnp.zeros((B,), jnp.float32), jnp.zeros((B,), jnp.int32),
                 jnp.zeros((B,), jnp.float32))
        state = jax.lax.while_loop(make_cond(total - 1), body, state)
    _, tokens, mutable, _, sum_lp, n_sc, ns_prob = state
    out = (tokens,)
    if with_logprobs:
        out += (sum_lp, n_sc)
    if with_no_speech:
        out += (ns_prob,)
    if return_cache:
        sk, sv, sks, svs = mutable
        if sk is not None and sk.shape[3] < total:
            # Segment grid may stop at total-1 rows (the last writable row
            # is total-2); pad to the standard cache shape so the donated
            # input can alias the output.
            delta = total - sk.shape[3]
            sk, sv, sks, svs = (tpad(x, delta) for x in (sk, sv, sks, svs))
        out += (cross._replace(self_k=sk, self_v=sv,
                               self_k_scale=sks, self_v_scale=svs),)
    return out if len(out) > 1 else tokens


@functools.partial(jax.jit, static_argnames=(
    "cfg", "max_new_tokens", "lora_scale", "cross_kv_int8", "self_kv_int8",
    "scores_int8", "suppress_ids", "begin_suppress_ids"))
def greedy_decode_jit(params, enc_out, cfg, prompt_ids, max_new_tokens=256,
                      lora=None, adapter_idx=None, lora_scale=1.0,
                      cross_kv_int8=False, self_kv_int8=False,
                      scores_int8=False, suppress_ids=(),
                      begin_suppress_ids=()):
    return greedy_decode(params, enc_out, cfg, prompt_ids,
                         max_new_tokens=max_new_tokens, lora=lora,
                         adapter_idx=adapter_idx, lora_scale=lora_scale,
                         cross_kv_int8=cross_kv_int8, self_kv_int8=self_kv_int8,
                         scores_int8=scores_int8, suppress_ids=suppress_ids,
                         begin_suppress_ids=begin_suppress_ids)


def transcribe_tokens(tokens, cfg: WhisperConfig, prompt_len: int) -> list[list[int]]:
    """Strip prompt and everything from the first EOS; returns per-row id lists
    (host-side; feed to a tokenizer's decode)."""
    import numpy as np
    out = []
    arr = np.asarray(tokens)
    for row in arr:
        body = row[prompt_len:]
        eos_pos = np.nonzero(body == cfg.eos_token_id)[0]
        if eos_pos.size:
            body = body[:eos_pos[0]]
        out.append(body.tolist())
    return out

"""Batched beam-search decoding, compiled end-to-end.

The reference exposes `num_beams` through its evaluator and CLI
(/root/reference/scripts/evaluate_model.py:71-72 -> HF generate's beam
search). This is a TPU-native re-design: fixed beam width K and fixed max
length (no dynamic hypothesis sets), one `lax.while_loop`, the KV cache kept
at [L, B*K, ...] and gathered along the beam axis on every reorder — so the
whole search stays on device with static shapes.

Scoring: sum of token log-probs; finished beams absorb further steps with
log-prob 0 (EOS-locked). Final selection divides by generated length**
length_penalty (HF convention, default 1.0).

Performance note: like every cache-reordering beam search (HF
reorder_cache, t5x), each step gathers the whole self cache along the beam
axis — ~2-3x the per-token cost of greedy. Cross K/V are NOT reordered
(identical across a sample's beams). Use int8 KV flags to halve the gather
traffic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sar_tpu.models import whisper
from sar_tpu.models.config import WhisperConfig

NEG_INF = jnp.float32(-1e9)


def beam_decode(params: dict, enc_out: jnp.ndarray, cfg: WhisperConfig,
                prompt_ids: jnp.ndarray, *, num_beams: int = 4,
                max_new_tokens: int = 256, length_penalty: float = 1.0,
                lora: dict | None = None,
                adapter_idx: jnp.ndarray | None = None,
                lora_scale: float = 1.0,
                cross_kv_int8: bool = False,
                self_kv_int8: bool = False) -> jnp.ndarray:
    """Beam search. prompt_ids: [P] or [B, P]. Returns best beam [B, total]."""
    B, S, D = enc_out.shape
    K = num_beams
    if prompt_ids.ndim == 1:
        prompt_ids = jnp.broadcast_to(prompt_ids[None], (B, prompt_ids.shape[0]))
    P = prompt_ids.shape[1]
    total = min(P + max_new_tokens, cfg.max_target_positions)
    eos = cfg.eos_token_id
    V = cfg.vocab_size

    # Expand encoder states and adapter indices beam-wise: [B*K, ...].
    enc_k = jnp.repeat(enc_out, K, axis=0)
    idx_k = None if adapter_idx is None else jnp.repeat(adapter_idx, K, axis=0)
    cache = whisper.init_cache(params, enc_k, cfg, max_len=total, lora=lora,
                               adapter_idx=idx_k, lora_scale=lora_scale,
                               cross_kv_int8=cross_kv_int8,
                               self_kv_int8=self_kv_int8)

    tokens = jnp.full((B, K, total), eos, jnp.int32)
    tokens = tokens.at[:, :, :P].set(prompt_ids[:, None, :])
    # Only beam 0 is live initially (all beams identical -> dedupe by score).
    scores = jnp.tile(jnp.where(jnp.arange(K) == 0, 0.0, NEG_INF)[None], (B, 1))
    finished = jnp.zeros((B, K), bool)

    def cond(state):
        pos, _, _, _, finished = state
        return (pos < total - 1) & ~jnp.all(finished)

    def body(state):
        pos, tokens, scores, cache, finished = state
        flat_tok = tokens.reshape(B * K, total)[:, pos]
        logits, cache = whisper.decode_step(
            params, flat_tok, pos, cache, cfg, lora=lora,
            adapter_idx=idx_k, lora_scale=lora_scale)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1).reshape(B, K, V)

        in_prompt = pos + 1 < P

        # Finished beams: only EOS continuation, at zero cost.
        eos_only = jnp.full((V,), NEG_INF).at[eos].set(0.0)
        logp = jnp.where(finished[..., None], eos_only[None, None], logp)

        cand = scores[..., None] + logp                        # [B, K, V]
        flat = cand.reshape(B, K * V)
        top_scores, top_idx = jax.lax.top_k(flat, K)           # [B, K]
        beam_src = top_idx // V
        new_tok = (top_idx % V).astype(jnp.int32)

        # During the prompt: keep beams in place and force the prompt token.
        keep = jnp.broadcast_to(jnp.arange(K)[None], (B, K))
        beam_src = jnp.where(in_prompt, keep, beam_src)
        forced = jax.lax.dynamic_slice_in_dim(
            prompt_ids, jnp.minimum(pos + 1, P - 1), 1, axis=1)
        new_tok = jnp.where(in_prompt, forced, new_tok)
        new_scores = jnp.where(in_prompt, scores, top_scores)

        # Reorder beam state.
        gather = (jnp.arange(B)[:, None] * K + beam_src).reshape(-1)  # [B*K]
        tokens = tokens.reshape(B * K, total)[gather].reshape(B, K, total)
        tokens = jax.lax.dynamic_update_slice(
            tokens, new_tok[..., None], (0, 0, pos + 1))
        finished = finished.reshape(B * K)[gather].reshape(B, K)
        # Reorder ONLY the self cache (+ its scales): beam_src stays within a
        # sample, and cross K/V are identical across a sample's beams — their
        # reorder would be a multi-GB no-op.
        cache = cache._replace(
            self_k=cache.self_k[:, gather],
            self_v=cache.self_v[:, gather],
            self_k_scale=(None if cache.self_k_scale is None
                          else cache.self_k_scale[:, gather]),
            self_v_scale=(None if cache.self_v_scale is None
                          else cache.self_v_scale[:, gather]))
        finished = finished | (~in_prompt & (new_tok == eos))
        return pos + 1, tokens, new_scores, cache, finished

    state = (jnp.int32(0), tokens, scores, cache, finished)
    _, tokens, scores, _, finished = jax.lax.while_loop(cond, body, state)

    # Length-normalized selection (length = generated tokens up to + incl EOS).
    gen = tokens[:, :, P:]
    has_eos = jnp.any(gen == eos, axis=-1)
    first_eos = jnp.argmax(gen == eos, axis=-1)
    lengths = jnp.where(has_eos, first_eos + 1, gen.shape[-1]).astype(jnp.float32)
    norm = scores / jnp.power(jnp.maximum(lengths, 1.0), length_penalty)
    best = jnp.argmax(norm, axis=-1)                            # [B]
    return jnp.take_along_axis(tokens, best[:, None, None], axis=1)[:, 0]

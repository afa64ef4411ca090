"""Batched beam-search decoding, compiled end-to-end.

The reference exposes `num_beams` through its evaluator and CLI
(/root/reference/scripts/evaluate_model.py:71-72 -> HF generate's beam
search). This is a TPU-native implementation of the same algorithm the
substrate runs (transformers GenerationMixin._beam_search): fixed beam width
K, a 2K candidate expansion per step, separate running/finished beam sets
merged by top-k, and the early-stopping heuristic of early_stopping=False —
all inside one `lax.while_loop` with static shapes, the self-KV cache kept at
[L, B*K, ...] and gathered along the beam axis on every reorder, so the whole
search stays on device. Cross K/V live at [L, B, ...] — one copy per sample,
shared by its beams (see the performance note).

Semantics mirrored from the substrate (for token-level parity, verified in
tests/test_generate_parity.py):
- running scores init: beam 0 = 0, others = -1e9 (dedupes identical beams).
- per step: top-2K candidates by accumulated log-prob; candidates that hit a
  stopping criterion (EOS, or max length reached) are excluded from the next
  running set; only candidates ranked < K may finalize.
- finalized score = sum of token log-probs (incl. EOS) divided by
  (generated_len ** length_penalty), generated length counting the EOS.
- early_stopping=False heuristic: a batch stops improving once
  best_running / (cur_generated_len ** length_penalty) can no longer beat its
  worst finished slot (only meaningful once all K slots hold finished
  hypotheses); finalization is then frozen for that batch.
- suppress masks are applied to the *log-probs* (no renormalization), exactly
  like the substrate's logits processors in beam mode.

Performance note: cross K/V — the dominant decode traffic (S=1500) — are
stored ONCE per sample and shared across its beams: `decode_step(beam_width=K)`
folds the K beam queries into the attention's query dimension, so each step
streams the cross slab once instead of K times (HF/t5x repeat it per beam).
The classic per-step reorder_cache gather (a full self-cache read+write per
step — measured as the dominant residual beam cost through round 4) is gone
on the default path: the self cache is slot-major and never moves; a
[B, K, total] int32 ancestry matrix is permuted instead, and the attention
selects each beam's history rows in-register (whisper._self_attention_beam).
int4 self-KV and the s8-MXU opt-in keep the physical reorder. Use int8 KV
flags to halve the slab traffic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sar_tpu.models import whisper
from sar_tpu.models.config import WhisperConfig

# A plain Python float, NOT jnp.float32(...): a module-level device scalar
# is hoisted as a shared constant buffer into every beam trace, and jax
# 0.9's cross-trace const bookkeeping then fails repeat executions with
# "Execution supplied 30 buffers but compiled program expected 31" (jit
# fast path) / "compiled for 53 inputs but called with 52" (AOT) once
# another program has traced with the same shared const. A literal embeds
# into the HLO instead.
NEG_INF = -1e9


def beam_decode(params: dict, enc_out: jnp.ndarray, cfg: WhisperConfig,
                prompt_ids: jnp.ndarray, *, num_beams: int = 4,
                max_new_tokens: int = 256, length_penalty: float = 1.0,
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
                segment: int = 32,
                timestamps: bool = False,
                max_initial_timestamp_index: int | None = 1,
                head_minor: bool | None = None) -> jnp.ndarray:
    """Beam search. prompt_ids: [P] or [B, P]. Returns best beam [B, total];
    positions after the first EOS are EOS-filled.

    `segment` > 0 splits the decode into static-length segments: segment s
    carries self-KV buffers sized to its static high-water mark
    min((s+1)*segment, total) (zero-padded up between segments), so both
    the per-step beam-reorder gather and the self-attention read touch only
    ~the valid prefix instead of all `total` rows — the reorder was the
    dominant residual beam cost (a full self-cache read+write per step).
    The buffers ARE the prefix (no per-step slicing), so the while carry
    still updates in place. Token output is bit-identical to segment=0;
    compile time grows with the segment count (total/segment loop bodies)."""
    B, S, D = enc_out.shape
    K = num_beams
    K2 = 2 * K
    if prompt_ids.ndim == 1:
        prompt_ids = jnp.broadcast_to(prompt_ids[None], (B, prompt_ids.shape[0]))
    P = prompt_ids.shape[1]
    total = min(P + max_new_tokens, cfg.max_target_positions)
    eos = cfg.eos_token_id
    V = cfg.vocab_size

    # Cross K/V are computed and stored ONCE per sample and shared across its
    # K beams (decode_step folds beam queries into the attention's query dim)
    # — cross-KV is the dominant decode traffic, so beam costs ~greedy+reorder
    # per row instead of K x the cross reads. Only the self cache and the
    # adapter indices are beam-expanded to [B*K, ...].
    idx_k = None if adapter_idx is None else jnp.repeat(adapter_idx, K, axis=0)
    # Head-minor cross slabs on TPU when scores_int8: the fused s8-MXU
    # kernel folds the K beam queries into extra block-diagonal rows and
    # streams each sample's slab once (ops/decode_cross.py). Off-TPU the
    # head-minor jnp twin pays a per-step slab transpose, so the classic
    # layout (s8 einsum) stays the CPU/test path.
    if head_minor is None:
        # Auto: the fused streaming kernels (exact default / s8 opt-in)
        # consume head-minor slabs on TPU; mesh callers pass False. On CPU
        # the classic layout stays (both with and without scores_int8 —
        # beam's CPU paths keep the s8/exact einsums on classic slabs).
        if scores_int8:
            head_minor = jax.default_backend() == "tpu"
        else:
            head_minor = whisper.use_head_minor(
                cross_kv_int8=cross_kv_int8, self_kv_int8=self_kv_int8,
                cross_kv_int4=cross_kv_int4, self_kv_int4=self_kv_int4)
    cache = whisper.init_cache(params, enc_out, cfg, max_len=total, lora=lora,
                               adapter_idx=adapter_idx, lora_scale=lora_scale,
                               cross_kv_int8=cross_kv_int8,
                               self_kv_int8=self_kv_int8,
                               cross_kv_int4=cross_kv_int4,
                               self_kv_int4=self_kv_int4,
                               self_batch=B * K, head_minor=head_minor)
    # The (large, loop-invariant) cross K/V are closed over; only the
    # mutable self buffers ride the while carry (segment-sized when
    # `segment` > 0).
    cross = cache._replace(self_k=None, self_v=None,
                           self_k_scale=None, self_v_scale=None)
    mutable0 = (cache.self_k, cache.self_v,
                cache.self_k_scale, cache.self_v_scale)

    suppress = jnp.asarray(suppress_ids, jnp.int32) if suppress_ids else None
    begin_suppress = (jnp.asarray(begin_suppress_ids, jnp.int32)
                      if begin_suppress_ids else None)

    # Reorder-free self cache (the default): slots are never physically
    # gathered; an ancestry matrix anc[b, k, t] — the slot that wrote row t
    # of logical beam k's history — is composed per step instead (int32,
    # ~B*K*total bytes vs a full self-cache read+write per step; see
    # whisper._self_attention_beam). int4 self-KV and the s8-MXU kernel
    # keep the physical-reorder path.
    use_anc = K > 1 and not (self_kv_int4 or scores_int8)
    anc0 = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :, None],
                            (B, K, total))
    ident_col = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :, None],
                                 (B, K, 1))

    run_seqs = jnp.full((B, K, total), eos, jnp.int32)
    run_seqs = run_seqs.at[:, :, :P].set(prompt_ids[:, None, :])
    run_scores = jnp.tile(
        jnp.where(jnp.arange(K) == 0, 0.0, NEG_INF)[None], (B, 1))
    fin_seqs = run_seqs
    fin_scores = jnp.full((B, K), NEG_INF)
    fin_flags = jnp.zeros((B, K), bool)
    # Per-batch: can the running beams still improve the finished set?
    unsatisfied = jnp.ones((B,), bool)

    rank2k = jnp.arange(K2)
    # Only candidates ranked within the top K may finalize (the extra K exist
    # so the running set never starves when the top K all pick EOS).
    top_k_mask = rank2k < K

    def make_cond(pos_hi):
        def cond(state):
            pos, *_, unsat, _, _ = state
            return (pos < pos_hi) & jnp.any(unsat)
        return cond

    def body(state):
        (pos, run_seqs, run_scores, fin_seqs, fin_scores, fin_flags,
         unsat, anc, mutable) = state
        sk, sv, sks, svs = mutable
        step_cache = cross._replace(self_k=sk, self_v=sv,
                                    self_k_scale=sks, self_v_scale=svs)
        flat_tok = run_seqs.reshape(B * K, total)[:, pos]
        anc_step = None
        if use_anc:
            # This step writes each logical beam's row into its own slot:
            # column `pos` is the identity by construction.
            anc = jax.lax.dynamic_update_slice(anc, ident_col, (0, 0, pos))
            anc_step = jax.lax.slice_in_dim(anc, 0, sk.shape[3], axis=2)
        logits, step_cache = whisper.decode_step(
            params, flat_tok, pos, step_cache, cfg, lora=lora,
            adapter_idx=idx_k, lora_scale=lora_scale,
            scores_int8=scores_int8, beam_width=K, ancestry=anc_step)
        # Two-stage exact top-2K (HF semantics: suppression masks log-probs
        # WITHOUT renormalizing, so suppressed tokens still contribute
        # softmax mass). Selection runs on raw logits — log_softmax is
        # monotonic per row — and only the 2K survivors per beam are
        # converted to log-probs via the row logsumexp. This avoids
        # materializing the [B*K, V] log-prob matrix and shrinks the
        # cross-beam sort from K*V to K*2K columns. Tie-breaking matches
        # the single-stage top_k over [B, K*V]: candidates are beam-major,
        # and within a beam stage-1 orders equal values by token index.
        logits32 = logits.astype(jnp.float32)                  # [B*K, V]
        in_prompt = pos + 1 < P
        if timestamps:
            # HF beam mode runs every logits processor on the LOG-PROBS
            # (generation/utils.py computes log_softmax first), so the
            # timestamp grammar — including its internal re-softmax for
            # the probability rule — must see logp, and the full [B*K, V]
            # matrix is materialized on this path.
            from sar_tpu.decode.timestamps import apply_timestamp_rules
            logp = jax.nn.log_softmax(logits32, -1)
            if suppress is not None:
                logp = logp.at[:, suppress].set(NEG_INF)
            if begin_suppress is not None:
                masked = logp.at[:, begin_suppress].set(NEG_INF)
                logp = jnp.where(pos == P - 1, masked, logp)
            logp = apply_timestamp_rules(
                logp, run_seqs.reshape(B * K, total), pos, P, cfg,
                max_initial_timestamp_index=max_initial_timestamp_index)
            acc = (run_scores[..., None]
                   + logp.reshape(B, K, V)).reshape(B, K * V)
            scores2k, idx2k = jax.lax.top_k(acc, K2)           # [B, 2K]
            beam_src = idx2k // V
            tok2k = (idx2k % V).astype(jnp.int32)
        else:
            # Two-stage exact top-2K (see block below): selection on raw
            # logits, conversion via the row logsumexp on survivors only.
            lse = jax.scipy.special.logsumexp(logits32, axis=-1)   # [B*K]
            sel = logits32
            if suppress is not None:
                sel = sel.at[:, suppress].set(NEG_INF)
            if begin_suppress is not None:
                masked = sel.at[:, begin_suppress].set(NEG_INF)
                sel = jnp.where(pos == P - 1, masked, sel)
            vals, toks = jax.lax.top_k(sel, K2)                # [B*K, 2K]
            logp2k = vals - lse[:, None]

            # Top-2K continuations by accumulated log-prob, over the K*2K
            # surviving (beam, token) candidates per sample.
            acc = (run_scores.reshape(B * K)[:, None]
                   + logp2k).reshape(B, K * K2)
            scores2k, col2k = jax.lax.top_k(acc, K2)           # [B, 2K]
            beam_src = col2k // K2
            tok2k = jnp.take_along_axis(
                toks.reshape(B, K * K2), col2k, axis=1).astype(jnp.int32)

        gather = (jnp.arange(B)[:, None] * K + beam_src).reshape(-1)
        cand_seqs = run_seqs.reshape(B * K, total)[gather].reshape(B, K2, total)
        cand_seqs = jax.lax.dynamic_update_slice(
            cand_seqs, tok2k[..., None], (0, 0, pos + 1))

        # Stopping criteria per candidate: EOS, or the buffer is now full.
        hits = (tok2k == eos) | (pos + 2 >= total)

        # Next running set: best K candidates that did NOT stop.
        run_cand = scores2k + hits * NEG_INF
        new_run_scores, sel = jax.lax.top_k(run_cand, K)       # sel in [0,2K)
        new_run_seqs = jnp.take_along_axis(cand_seqs, sel[..., None], axis=1)
        alive_src = jnp.take_along_axis(beam_src, sel, axis=1)  # cache reorder

        # Finished set: merge candidates that stopped (rank < K only), scored
        # with the length penalty over generated tokens including this one.
        gen_len = (pos + 2 - P).astype(jnp.float32)
        norm = scores2k / jnp.power(jnp.maximum(gen_len, 1.0), length_penalty)
        can_finalize = (hits & top_k_mask[None] & ~in_prompt
                        & unsat[:, None])
        fin_cand = jnp.where(can_finalize, norm, NEG_INF)
        merged_scores = jnp.concatenate([fin_scores, fin_cand], axis=1)
        merged_seqs = jnp.concatenate([fin_seqs, cand_seqs], axis=1)
        merged_flags = jnp.concatenate([fin_flags, can_finalize], axis=1)
        new_fin_scores, fsel = jax.lax.top_k(merged_scores, K)
        new_fin_seqs = jnp.take_along_axis(merged_seqs, fsel[..., None], axis=1)
        new_fin_flags = jnp.take_along_axis(merged_flags, fsel, axis=1)

        # Prompt phase: force the next prompt token, keep beams in place.
        forced = jax.lax.dynamic_slice_in_dim(
            prompt_ids, jnp.minimum(pos + 1, P - 1), 1, axis=1)   # [B, 1]
        prompt_seqs = jax.lax.dynamic_update_slice(
            run_seqs, jnp.broadcast_to(forced[:, :, None], (B, K, 1)),
            (0, 0, pos + 1))
        keep = jnp.broadcast_to(jnp.arange(K)[None], (B, K))
        new_run_seqs = jnp.where(in_prompt, prompt_seqs, new_run_seqs)
        new_run_scores = jnp.where(in_prompt, run_scores, new_run_scores)
        alive_src = jnp.where(in_prompt, keep, alive_src)
        new_fin_seqs = jnp.where(in_prompt, fin_seqs, new_fin_seqs)
        new_fin_scores = jnp.where(in_prompt, fin_scores, new_fin_scores)
        new_fin_flags = jnp.where(in_prompt, fin_flags, new_fin_flags)

        if use_anc:
            # Compose the ancestry permutation instead of moving cache rows:
            # new beam k's history is old beam alive_src[k]'s history (the
            # row just written at `pos` included — its slot is alive_src[k]
            # because column pos was the identity before this gather).
            anc = jnp.take_along_axis(anc, alive_src[:, :, None], axis=1)
            mutable = (step_cache.self_k, step_cache.self_v,
                       step_cache.self_k_scale, step_cache.self_v_scale)
        else:
            # Physical reorder (int4 / s8-MXU paths): gather ONLY the self
            # cache (+ its scales) — alive_src stays within a sample, and
            # cross K/V are identical across a sample's beams. The carried
            # buffers hold only the current segment's prefix, so the gather
            # moves ~the valid rows, not all `total`.
            cgather = (jnp.arange(B)[:, None] * K + alive_src).reshape(-1)
            mutable = tuple(None if x is None else x[:, cgather]
                            for x in (step_cache.self_k, step_cache.self_v,
                                      step_cache.self_k_scale,
                                      step_cache.self_v_scale))

        # early_stopping=False heuristic: improvement still possible while the
        # best running beam, if it ended at the current generated length,
        # could beat some finished slot (-1e9 for unfinished slots, so any
        # open slot keeps the batch unsatisfied).
        cur_gen = (pos + 2 - P).astype(jnp.float32)
        best_possible = (jnp.max(new_run_scores, axis=1)
                         / jnp.power(jnp.maximum(cur_gen, 1.0), length_penalty))
        worst = jnp.where(new_fin_flags,
                          jnp.min(new_fin_scores, axis=1, keepdims=True),
                          NEG_INF)                              # [B, K]
        still = jnp.any(best_possible[:, None] > worst, axis=1)
        new_unsat = jnp.where(in_prompt, unsat, unsat & still)

        return (pos + 1, new_run_seqs, new_run_scores, new_fin_seqs,
                new_fin_scores, new_fin_flags, new_unsat, anc, mutable)

    def tslice(x, hi):
        return None if x is None else jax.lax.slice_in_dim(x, 0, hi, axis=3)

    def tpad(x, delta):
        return None if x is None else jnp.pad(
            x, [(0, 0)] * 3 + [(0, delta)] + [(0, 0)] * (x.ndim - 4))

    if segment and segment < total - 1:
        # Python-unrolled segments: segment s runs pos in
        # [s*segment, min((s+1)*segment, total-1)) carrying self buffers
        # sized min((s+1)*segment, total), zero-padded up between segments.
        # Finished batches fall through remaining loops via the shared cond.
        n_seg = (total - 2) // segment + 1
        hi = min(segment, total)
        state = (jnp.int32(0), run_seqs, run_scores, fin_seqs, fin_scores,
                 fin_flags, unsatisfied, anc0,
                 tuple(tslice(x, hi) for x in mutable0))
        for s in range(n_seg):
            pos_hi = min((s + 1) * segment, total - 1)
            state = jax.lax.while_loop(make_cond(pos_hi), body, state)
            if s + 1 < n_seg:
                next_hi = min((s + 2) * segment, total)
                state = state[:-1] + (
                    tuple(tpad(x, next_hi - hi) for x in state[-1]),)
                hi = next_hi
    else:
        state = (jnp.int32(0), run_seqs, run_scores, fin_seqs, fin_scores,
                 fin_flags, unsatisfied, anc0, mutable0)
        state = jax.lax.while_loop(make_cond(total - 1), body, state)
    (_, run_seqs, run_scores, fin_seqs, fin_scores, fin_flags, _, _, _) = state

    # Finished slots are kept sorted descending by the top_k merge; slot 0 is
    # the best hypothesis (max-length finalization guarantees it exists).
    return fin_seqs[:, 0]

"""Temperature-fallback transcription (openai-whisper's robust decode).

openai/whisper's `transcribe` decodes each window greedily first, then
retries at increasing sampling temperatures when the result looks
degenerate (decoding.py / transcribe.py in openai-whisper):

  - compression_ratio > compression_ratio_threshold (2.4): the text is so
    repetitive that gzip crushes it — the classic repetition loop.
  - avg_logprob < logprob_threshold (-1.0): the model was guessing.

Neither the reference nor plain HF short-form generate has this; HF ports
it only inside its long-form loop. Here it is a standalone batch driver
over the compiled decode programs: one prep per temperature pass (the
decode donates its cache), full-batch redecode per escalation step with
results accepted only for still-failing rows — static shapes, so every
temperature reuses the same two compiled programs.

The no_speech criterion (openai transcribe.py's silence gate) is captured
too: p(<|nospeech|>) from the RAW logits at the SOT step rides out of the
decode loop as `no_speech_prob`, and `should_skip_silence` applies
openai's rule — skip when no_speech_prob > threshold UNLESS the text is
confident (avg_logprob above the logprob threshold). The long-form loop
(evaluation/longform.py fallback=True) drops such windows.
"""

from __future__ import annotations

import zlib

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_TEMPERATURES = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0)


def compression_ratio(text: str) -> float:
    """openai-whisper's definition: utf-8 length / zlib-compressed length."""
    data = text.encode("utf-8")
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


def needs_retry(text: str, avg_logprob: float, *,
                compression_ratio_threshold: float | None = 2.4,
                logprob_threshold: float | None = -1.0,
                no_speech_prob: float | None = None,
                no_speech_threshold: float | None = None) -> bool:
    """openai transcribe.py's needs_fallback logic (thresholds None = off):
    repetitive or unconfident text retries — UNLESS the window is probably
    silence (no_speech_prob above threshold), which never retries (the
    skip rule handles it instead)."""
    retry = False
    if (compression_ratio_threshold is not None
            and compression_ratio(text) > compression_ratio_threshold):
        retry = True
    if (logprob_threshold is not None and avg_logprob < logprob_threshold):
        retry = True
    if (no_speech_threshold is not None and no_speech_prob is not None
            and no_speech_prob > no_speech_threshold):
        retry = False
    return retry


def should_skip_silence(row: dict, *,
                        no_speech_threshold: float | None = 0.6,
                        logprob_threshold: float | None = -1.0) -> bool:
    """openai transcribe.py's segment-skip rule: the window is silence when
    p(<|nospeech|>) exceeds the threshold, unless the decoded text is
    confident enough (avg_logprob > logprob_threshold) to overrule it."""
    if no_speech_threshold is None:
        return False
    skip = row.get("no_speech_prob", 0.0) > no_speech_threshold
    if (logprob_threshold is not None
            and row.get("avg_logprob", 0.0) > logprob_threshold):
        skip = False
    return skip


class FallbackTranscriber:
    """Reusable fallback decoder: builds its two jitted programs ONCE, so
    repeated calls (long-form groups, evaluator batches) hit the jit cache
    instead of retracing (a fresh closure per call would retrace every
    time — jax.jit caches by function identity)."""

    def __init__(self, cfg, params, tokenizer, *, language: str = "hindi",
                 max_new_tokens: int = 256,
                 temperatures=DEFAULT_TEMPERATURES,
                 compression_ratio_threshold: float | None = 2.4,
                 logprob_threshold: float | None = -1.0,
                 no_speech_threshold: float | None = 0.6,
                 lora=None, lora_scale: float = 1.0,
                 kv_int8: bool = True, flash: str | bool = "auto",
                 seed: int = 0, prompt_tokens=None,
                 timestamps: bool = False, prompt_width: int | None = None,
                 task: str = "transcribe", best_of: int = 1):
        from functools import partial

        from sar_tpu.models import whisper

        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.temperatures = tuple(temperatures)
        self.max_new_tokens = max_new_tokens
        # openai's best_of (decoding.py): at T > 0, sample `best_of`
        # candidates per row and keep the one with the highest avg logprob
        # (MaximumLikelihoodRanker, length_penalty=None). Greedy (T=0)
        # passes always decode once. Candidates run as extra passes of the
        # SAME compiled decode program with fresh rng folds — no tiled
        # cache, so HBM stays at the single-batch footprint. openai
        # defaults best_of=5; here 1 (each candidate costs a full decode
        # pass — opt in where the escalation rate warrants it).
        self.best_of = max(1, int(best_of))
        self.compression_ratio_threshold = compression_ratio_threshold
        self.logprob_threshold = logprob_threshold
        self.no_speech_threshold = no_speech_threshold
        self._base_key = jax.random.PRNGKey(seed)
        self._calls = 0
        use_flash = (("hm" if jax.default_backend() == "tpu" else False)
                     if flash == "auto" else flash)
        # timestamps=True decodes with the Whisper timestamp grammar:
        # <|notimestamps|> leaves the prompt and timestamp tokens appear in
        # the output ids; quality thresholds are computed on the
        # timestamp-stripped text.
        self.timestamps = timestamps
        self._prompt = jnp.asarray(
            list(prompt_tokens) if prompt_tokens is not None
            else cfg.prompt_ids(language, task, no_timestamps=not timestamps),
            jnp.int32)
        # prompt_width reserves buffer room for WIDER per-call prompts
        # (conditioned long-form prepends <|startofprev|> + context; the
        # actual forced length rides as a traced prompt_len).
        width = max(int(self._prompt.shape[0]), prompt_width or 0)
        total = min(width + max_new_tokens, cfg.max_target_positions)

        # Encode ONCE per batch; only the (donated, consumed) cache is
        # rebuilt per escalation pass — the encoder never re-runs.
        def enc(params, mel):
            return whisper.encode(params, mel, cfg, lora=lora,
                                  lora_scale=lora_scale, flash=use_flash)

        def mkcache(params, enc_out):
            return whisper.init_cache(params, enc_out, cfg, max_len=total,
                                      lora=lora, lora_scale=lora_scale,
                                      cross_kv_int8=kv_int8,
                                      self_kv_int8=kv_int8,
                                      head_minor=whisper.use_head_minor(
                                          cross_kv_int8=kv_int8,
                                          self_kv_int8=kv_int8))

        # temperature is a TRACED scalar (Gumbel-max in the loop): one
        # compiled decode program serves every escalation step, T=0.0
        # included.
        P_std = int(self._prompt.shape[0])

        def dec(params, cache, prompt, plen, rng, temperature):
            from sar_tpu.decode.greedy import greedy_decode_from_cache
            # Per-call prompts are [<|startofprev|> ctx... | std]: <|sot|>
            # sits at plen - P_std (0 for the plain prompt), and generation
            # is capped at max_new_tokens past the live prompt so the
            # logprob stats cover exactly the tokens the caller keeps.
            return greedy_decode_from_cache(
                params, cache, cfg, prompt, prompt_len=plen,
                lora=lora, lora_scale=lora_scale,
                temperature=temperature, rng=rng, with_logprobs=True,
                with_no_speech=True, return_cache=True,
                timestamps=timestamps, no_speech_pos=plen - P_std,
                max_gen_tokens=max_new_tokens)

        self._enc = jax.jit(enc)
        self._mkcache = jax.jit(mkcache)
        self._dec = partial(jax.jit, donate_argnums=(1,))(dec)

    def __call__(self, mel, n_valid: int | None = None, prompt=None,
                 prompt_len: int | None = None):
        """`prompt`/`prompt_len` override the constructor prompt per call
        (conditioned decoding): `prompt` is an id buffer (width <= the
        constructor's prompt_width budget; one compiled program per
        distinct width) and `prompt_len` the forced-prefix length — a
        TRACED scalar, so varying context lengths reuse the program."""
        from sar_tpu.decode.greedy import transcribe_tokens
        cfg = self.cfg
        mel = jnp.asarray(mel)
        B = mel.shape[0]
        texts: list[str | None] = [None] * B
        info: list[dict | None] = [None] * B
        pending = list(range(B if n_valid is None else min(n_valid, B)))
        prompt = self._prompt if prompt is None else jnp.asarray(
            prompt, jnp.int32)
        P = int(prompt.shape[-1]) if prompt_len is None else int(prompt_len)
        # Fold a per-call counter into the key so windows/batches resample
        # independently (openai advances its RNG per decode; identical
        # noise across windows would correlate their retry failures).
        self._calls += 1
        call_key = jax.random.fold_in(self._base_key, self._calls)

        enc_out = self._enc(self.params, mel)
        for t_idx, temperature in enumerate(self.temperatures):
            # best_of candidates per sampled pass (T=0 is deterministic —
            # always one), each a fresh pass of the same compiled program;
            # per-row winner by avg logprob (openai MaximumLikelihoodRanker
            # with length_penalty=None).
            n_cand = 1 if temperature == 0.0 else self.best_of
            base_rng = jax.random.fold_in(call_key, t_idx)
            ids = sum_lp = n_sc = ns_prob = None
            for c in range(n_cand):
                cache = self._mkcache(self.params, enc_out)
                rng = base_rng if c == 0 else jax.random.fold_in(base_rng, c)
                tokens, c_slp, c_nsc, c_nsp, spent = self._dec(
                    self.params, cache, prompt, jnp.int32(P), rng,
                    jnp.float32(temperature))
                del spent
                c_ids = transcribe_tokens(tokens, cfg, prompt_len=P)
                c_slp = np.asarray(c_slp)
                c_nsc = np.asarray(c_nsc)
                c_nsp = np.asarray(c_nsp)
                if ids is None:
                    ids = list(c_ids)
                    sum_lp, n_sc, ns_prob = (c_slp.copy(), c_nsc.copy(),
                                             c_nsp.copy())
                else:
                    better = (c_slp / np.maximum(c_nsc, 1)
                              > sum_lp / np.maximum(n_sc, 1))
                    for b in np.flatnonzero(better):
                        ids[b] = c_ids[b]
                        sum_lp[b], n_sc[b] = c_slp[b], c_nsc[b]
                        ns_prob[b] = c_nsp[b]
            still = []
            for b in pending:
                # The loop decodes to the buffer end; when the actual
                # prompt is narrower than the prompt_width budget that is
                # MORE than max_new_tokens new ids — enforce the contract
                # here (also keeps the word-aligner's buffer inside
                # max_target_positions).
                row_ids = ids[b][:self.max_new_tokens]
                if self.timestamps:
                    # thresholds judge the TEXT; timestamp tokens would
                    # poison the compression ratio.
                    text_ids = [i for i in row_ids
                                if i < cfg.no_timestamps_token_id]
                else:
                    text_ids = row_ids
                text = self.tokenizer.decode(text_ids)
                avg_lp = float(sum_lp[b] / max(int(n_sc[b]), 1))
                row = {"temperature": float(temperature),
                       "avg_logprob": avg_lp,
                       "no_speech_prob": float(ns_prob[b]),
                       "compression_ratio": compression_ratio(text),
                       # accepted token ids (stripped of prompt/EOS, incl.
                       # timestamp tokens when the grammar is on) — the
                       # word-timestamp aligner and the segment splitter
                       # consume these
                       "ids": list(row_ids)}
                texts[b], info[b] = text, row
                last = t_idx == len(self.temperatures) - 1
                if not last and needs_retry(
                        text, avg_lp,
                        compression_ratio_threshold=(
                            self.compression_ratio_threshold),
                        logprob_threshold=self.logprob_threshold,
                        no_speech_prob=row["no_speech_prob"],
                        no_speech_threshold=self.no_speech_threshold):
                    still.append(b)
            pending = still
            if not pending:
                break
        return texts, info


def transcribe_batch_with_fallback(
        cfg, params, mel, tokenizer, *, n_valid: int | None = None, **kw):
    """One-shot form of FallbackTranscriber (builds the programs fresh —
    for repeated batches, construct a FallbackTranscriber once).

    Transcribes a mel batch [B, n_mels, frames] with temperature fallback.
    Returns (texts, info) where info is a list of per-sample dicts:
    {"temperature", "avg_logprob", "no_speech_prob", "compression_ratio"}
    for the ACCEPTED result. Rows that fail every temperature keep the
    last (highest-T) result, like openai's transcribe. Rows >= `n_valid`
    are batch padding: they decode (static shapes) but never trigger an
    escalation pass."""
    return FallbackTranscriber(cfg, params, tokenizer, **kw)(mel, n_valid)

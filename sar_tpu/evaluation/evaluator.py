"""ASR evaluation: batched transcription + corpus WER/CER.

Capability parity with /root/reference/src/evaluation/__init__.py:
ASREvaluator (batch generate -> decode preds/refs -> corpus WER/CER + sample
count, optional prediction/reference return, :44-114), evaluate_per_sample
(:116-140), analyze (:142-169), transcribe_audio (:172-220) and
batch_transcribe (:223-292).

TPU-first: generation is the compiled greedy/beam loop over a whole batch
(the reference loops HF generate per batch with per-token host syncs); mel
features are computed on device from raw audio when items carry "audio".
"""

from __future__ import annotations

import functools
import logging
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from sar_tpu.decode import greedy_decode, transcribe_tokens
from sar_tpu.models import whisper
from sar_tpu.models.config import WhisperConfig
from sar_tpu.ops import mel as mel_ops
from sar_tpu.training.metrics import (analyze_errors, compute_metrics,
                                      compute_metrics_per_sample)

logger = logging.getLogger(__name__)


class ASREvaluator:
    """Evaluates a (possibly LoRA-adapted) model on a dataloader."""

    def __init__(self, cfg: WhisperConfig, params: dict, tokenizer,
                 language: str = "hindi", max_new_tokens: int = 256,
                 num_beams: int = 1, lora: dict | None = None,
                 lora_scale: float = 1.0, kv_int8: bool = True, mesh=None,
                 flash: str | bool = "auto", scores_int8: bool = False,
                 prompt_tokens=None, fallback: bool = False,
                 task: str = "transcribe", best_of: int = 1,
                 kv_int4: bool = False):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.language = language
        self.max_new_tokens = max_new_tokens
        self.num_beams = num_beams
        self.lora = lora
        self.lora_scale = lora_scale
        # kv_int4 (nibble-packed, quantize_kv4) supersedes kv_int8 when set:
        # it is the --kv_cache int4 opt-in — halves the dominant decode
        # traffic again at coarser (15-level) quantization.
        self.kv_int4 = kv_int4
        self.kv_int8 = kv_int8 and not kv_int4
        if scores_int8 and kv_int4:
            raise ValueError("scores_int8 (the s8-MXU path) does not compose "
                             "with an int4-packed KV cache")
        if scores_int8 and not self.kv_int8:
            raise ValueError("scores_int8 requires kv_int8=True")
        # Beams + scores_int8 ride the beam-folded fused kernel on TPU
        # (ops/decode_cross.py beam_width=K: the K beam queries become
        # extra block-diagonal MXU rows; hardware-validated by
        # jobs/tpu_validation.sh step 4 — token agreement 1.0 vs the
        # classic layout on v5e). Off-TPU beam_decode uses the jnp twin.
        if scores_int8 and num_beams > 1:
            # Honor the explicit opt-in, but surface the measured cost:
            # at whisper-small B=16 beam-4 the fused path ran 5.45 ms/token
            # vs 4.44 with bf16 scores (PARITY.md round-3 validation).
            logger.info("beams + scores_int8 uses the beam-folded fused "
                        "kernel (exact-agreement-validated); note it "
                        "measured SLOWER than bf16 scores at small batch "
                        "on v5e — benchmark both for your shape")
        if scores_int8 and mesh is not None:
            # The fused pallas kernel has no SPMD partitioning rule; under a
            # mesh it would error or all-gather the sharded cross cache.
            logger.warning("scores_int8 is unsupported under a device mesh; "
                           "falling back to bf16 attention scores")
            scores_int8 = False
        # s8-MXU attention (fused kernel on TPU; approximate — see
        # PARITY.md known-deviations). The WER gate for making it default.
        self.scores_int8 = scores_int8
        # openai-style temperature fallback (evaluation/fallback.py):
        # greedy-only and meshless — the escalation re-decode has no
        # beam-folded or SPMD path.
        if fallback and (num_beams > 1 or mesh is not None):
            logger.warning("fallback applies to greedy single-chip "
                           "evaluation; disabled here")
            fallback = False
        self.fallback = fallback
        self.best_of = best_of
        # Blockwise (flash) encoder attention: avoids the [1500, 1500] fp32
        # score materialization that OOMed whisper-large at batch 32.
        # "auto" = on for TPU backends (the Pallas kernel has no CPU build).
        # "auto" -> the head-minor fwd kernel on TPU (fastest; encode
        # docstring covers the variants), exact jnp attention on CPU.
        self.flash = (("hm" if jax.default_backend() == "tpu" else False)
                      if flash == "auto" else flash)
        # Optional DPxTP mesh: weights tensor-parallel over "model", batches
        # over "data" — the ICI-sharded whisper-large batch-inference path
        # (BASELINE config #5). Partial batches are padded to the data axis.
        self.mesh = mesh
        if mesh is not None:
            from sar_tpu.parallel.sharding import shard_lora, shard_params
            self.params = shard_params(self.params, mesh)
            if self.lora is not None:
                self.lora = shard_lora(self.lora, mesh)
        # `prompt_tokens` overrides the standard Whisper decoder prompt —
        # e.g. [sot] alone for English-only / custom-vocab models.
        # `task="translate"` swaps the task token: X -> English speech
        # translation (Whisper's second task; the reference never exposes
        # it — HF generate takes task= through get_decoder_prompt_ids).
        self._prompt = jnp.asarray(
            list(prompt_tokens) if prompt_tokens is not None
            else cfg.prompt_ids(language, task), jnp.int32)
        self._build_steps()

    def _build_steps(self):
        """Two-phase inference: encode+cross-KV prep and the decode loop are
        SEPARATE jitted programs — fusing them slows the loop ~1.5x (see
        sar_tpu.decode.greedy docstring)."""
        cfg, mnt = self.cfg, self.max_new_tokens
        lora, scale, beams = self.lora, self.lora_scale, self.num_beams
        total = min(int(self._prompt.shape[0]) + mnt, cfg.max_target_positions)

        kv_int8 = self.kv_int8
        kv_int4 = self.kv_int4
        flash = self.flash
        scores_int8 = self.scores_int8

        # Head-minor slabs feed the fused streaming decode kernels (exact
        # default on TPU, s8-MXU under scores_int8); mesh decodes keep the
        # classic layout (the kernels have no SPMD rule).
        head_minor = whisper.use_head_minor(
            cross_kv_int8=kv_int8, self_kv_int8=kv_int8,
            cross_kv_int4=kv_int4, self_kv_int4=kv_int4,
            scores_int8=scores_int8, mesh=self.mesh)

        def prep(params, mel):
            enc = whisper.encode(params, mel, cfg, lora=lora, lora_scale=scale,
                                 flash=flash)
            return whisper.init_cache(params, enc, cfg, max_len=total,
                                      lora=lora, lora_scale=scale,
                                      cross_kv_int8=kv_int8,
                                      self_kv_int8=kv_int8,
                                      cross_kv_int4=kv_int4,
                                      self_kv_int4=kv_int4,
                                      head_minor=head_minor)

        def prep_enc_only(params, mel):
            return whisper.encode(params, mel, cfg, lora=lora, lora_scale=scale,
                                  flash=flash)

        def dec(params, cache, prompt):
            from sar_tpu.decode.greedy import greedy_decode_from_cache
            # return_cache makes the donated input aliasable (see the
            # greedy_decode_from_cache docstring); the caller drops it.
            return greedy_decode_from_cache(params, cache, cfg, prompt,
                                            lora=lora, lora_scale=scale,
                                            scores_int8=scores_int8,
                                            return_cache=True)

        # Mesh beam decodes force the classic layout; meshless defers to
        # beam_decode's own auto (None).
        beam_hm = False if self.mesh is not None else None

        def beam(params, enc, prompt):
            from sar_tpu.decode.beam import beam_decode
            return beam_decode(params, enc, cfg, prompt, num_beams=beams,
                               max_new_tokens=mnt, lora=lora, lora_scale=scale,
                               cross_kv_int8=kv_int8, self_kv_int8=kv_int8,
                               cross_kv_int4=kv_int4, self_kv_int4=kv_int4,
                               scores_int8=scores_int8, head_minor=beam_hm)

        if self.fallback:
            from sar_tpu.evaluation.fallback import FallbackTranscriber
            self._fallback = FallbackTranscriber(
                cfg, self.params, self.tokenizer, language=self.language,
                max_new_tokens=mnt, lora=lora, lora_scale=scale,
                kv_int8=kv_int8, flash=flash, best_of=self.best_of,
                prompt_tokens=np.asarray(self._prompt).tolist())
        self._prep = jax.jit(prep)
        self._prep_enc = jax.jit(prep_enc_only)
        # The cache is donated into the decode loop so the prep output and
        # the loop's working cache never coexist in HBM (whisper-large B=32
        # OOMed on exactly that double allocation).
        self._decode = jax.jit(dec, donate_argnums=(1,))
        self._beam = jax.jit(beam)

    def _transcribe_batch(self, mel: jnp.ndarray) -> list[str]:
        B = mel.shape[0]
        if self.fallback:
            texts, _ = self._fallback(mel)
            return texts
        if self.mesh is not None:
            from sar_tpu.parallel.distributed import (n_batch_shards,
                                                      put_global_batch)
            pad = (-B) % n_batch_shards(self.mesh)
            if pad:
                mel = jnp.pad(mel, [(0, pad), (0, 0), (0, 0)])
            mel = put_global_batch(np.asarray(mel), self.mesh)
        if self.num_beams > 1:
            # Beam builds its own beam-expanded cache; skip the greedy cache.
            enc = self._prep_enc(self.params, mel)
            tokens = self._beam(self.params, enc, self._prompt)
        else:
            cache = self._prep(self.params, mel)
            tokens, spent_cache = self._decode(self.params, cache, self._prompt)
            del spent_cache  # aliases the donated prep cache; free it now
        ids = transcribe_tokens(tokens[:B], self.cfg,
                                prompt_len=int(self._prompt.shape[0]))
        return [self.tokenizer.decode(row) for row in ids]

    def evaluate(self, dataloader, return_predictions: bool = False) -> dict:
        """Corpus metrics over a dataloader (parity with :44-114)."""
        preds, refs = [], []
        for batch in dataloader.one_epoch():
            preds.extend(self._transcribe_batch(
                jnp.asarray(batch["input_features"])))
            refs.extend(batch["texts"])
        results = compute_metrics(preds, refs)
        results["num_samples"] = len(refs)
        logger.info("eval: WER=%.4f CER=%.4f n=%d", results["wer"],
                    results["cer"], results["num_samples"])
        if return_predictions:
            results["predictions"] = preds
            results["references"] = refs
        return results

    def evaluate_per_sample(self, dataloader) -> list[dict]:
        """Per-sample WER/CER rows (parity with :116-140)."""
        out = self.evaluate(dataloader, return_predictions=True)
        per = compute_metrics_per_sample(out["predictions"], out["references"])
        for row, p, r in zip(per, out["predictions"], out["references"]):
            row["prediction"], row["reference"] = p, r
        return per

    def analyze(self, dataloader, top_k: int = 10) -> dict:
        """Metrics + insertion/deletion analysis (parity with :142-169)."""
        out = self.evaluate(dataloader, return_predictions=True)
        out["error_analysis"] = analyze_errors(out["predictions"],
                                               out["references"], top_k)
        return out

    def save_results(self, results: dict, output_dir: str | Path) -> None:
        """metrics.json + predictions.txt/references.txt (parity with
        /root/reference/scripts/evaluate_model.py:154-188)."""
        import json
        out = Path(output_dir)
        out.mkdir(parents=True, exist_ok=True)
        metrics = {k: v for k, v in results.items()
                   if k not in ("predictions", "references")}
        (out / "metrics.json").write_text(json.dumps(metrics, indent=2))
        if "predictions" in results:
            (out / "predictions.txt").write_text(
                "\n".join(results["predictions"]) + "\n")
            (out / "references.txt").write_text(
                "\n".join(results["references"]) + "\n")


def transcribe_audio(audio: np.ndarray, cfg: WhisperConfig, params: dict,
                     tokenizer, language: str = "hindi",
                     max_new_tokens: int = 256, lora: dict | None = None,
                     lora_scale: float = 1.0,
                     task: str = "transcribe") -> str:
    """Single-utterance helper (parity with :172-220). `audio` is a float32
    waveform at 16 kHz."""
    return batch_transcribe([audio], cfg, params, tokenizer, language,
                            max_new_tokens=max_new_tokens, lora=lora,
                            lora_scale=lora_scale, task=task)[0]


@functools.partial(jax.jit, static_argnames=("cfg", "max_new_tokens",
                                             "lora_scale"))
def _transcribe_step(params, audio, prompt, lora, *, cfg, max_new_tokens,
                     lora_scale):
    """Mel + encode + greedy decode as ONE persistent jitted program.

    Module-level so jit's cache (keyed on function identity + arg
    shapes/treedefs + the static args) survives across `batch_transcribe`
    calls: transcribing N long files from the CLI compiles once, not N
    times. `lora` rides as a pytree ARGUMENT — adapters of identical
    shape swap without retracing."""
    feats = mel_ops.log_mel_spectrogram(
        audio, cfg.num_mel_bins, dtype=jax.tree.leaves(params)[0].dtype)
    feats = feats[:, :, :cfg.num_audio_frames]
    enc = whisper.encode(params, feats, cfg, lora=lora, lora_scale=lora_scale)
    return greedy_decode(params, enc, cfg, prompt,
                         max_new_tokens=max_new_tokens, lora=lora,
                         lora_scale=lora_scale)


def batch_transcribe(audios: list[np.ndarray], cfg: WhisperConfig,
                     params: dict, tokenizer, language: str = "hindi",
                     batch_size: int = 8, max_new_tokens: int = 256,
                     lora: dict | None = None,
                     lora_scale: float = 1.0,
                     task: str = "transcribe",
                     return_ids: bool = False
                     ) -> list[str] | list[list[int]]:
    """Batched raw-audio transcription (parity with :223-292): pad/trim to the
    30 s window, mel on device, compiled greedy decode. `task="translate"`
    emits English for any source language. `return_ids=True` returns the
    per-clip token id lists instead of decoded strings (the overlapped
    long-form path merges ids across windows before decoding)."""
    prompt = jnp.asarray(cfg.prompt_ids(language, task), jnp.int32)

    out: list = []
    for s in range(0, len(audios), batch_size):
        chunk = audios[s:s + batch_size]
        n = len(chunk)
        padded = mel_ops.stack_pad_audio(
            chunk + [np.zeros(1, np.float32)] * (batch_size - n))
        tokens = _transcribe_step(params, jnp.asarray(padded), prompt, lora,
                                  cfg=cfg, max_new_tokens=max_new_tokens,
                                  lora_scale=float(lora_scale))
        ids = transcribe_tokens(tokens[:n], cfg, prompt_len=int(prompt.shape[0]))
        out.extend(ids if return_ids
                   else (tokenizer.decode(row) for row in ids))
    return out

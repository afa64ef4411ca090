"""Streaming (incremental) transcription over a growing audio stream.

New capability beyond the reference — it has no streaming path at all
(clips longer than the window are simply dropped by the duration filter,
/root/reference/src/data/dataset.py:59-77) and its generate() is offline
batch-only (/root/reference/src/models/whisper_lora.py:145-186).

Whisper's encoder is bidirectional over a fixed window, so true
frame-incremental encoding is impossible; the standard streaming recipe
(LocalAgreement, as in whisper_streaming / SimulWhisper) re-runs the window
on every audio update and COMMITS the longest common prefix of consecutive
hypotheses — committed text is stable, the tail may still be revised.

TPU-first: every update executes the SAME two pre-compiled XLA programs —
(mel -> encode -> cache init) and the greedy while-loop with a *traced*
committed-prefix length (``greedy_decode_from_cache``'s ``prompt_len``).
The committed transcript is forced teacher-style through the loop (which
also rebuilds the self-KV cache for the new encoder output), and generation
continues from there. Growing audio and growing transcript therefore never
retrace or recompile: the audio is zero-padded to the fixed window and the
token buffer has static width, only ``prompt_len`` changes.

Streams longer than one window roll over: when the buffer fills, the
window's final hypothesis is committed wholesale (as in
:mod:`sar_tpu.evaluation.longform` chunking) and a fresh window begins.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sar_tpu.models import whisper
from sar_tpu.models.config import WhisperConfig
from sar_tpu.ops import mel as mel_ops


def common_prefix_len(a: list[int], b: list[int]) -> int:
    n = 0
    for x, y in zip(a, b):
        if x != y:
            break
        n += 1
    return n


class StreamingTranscriber:
    """Incremental transcriber for one audio stream.

    ``feed(chunk)`` appends 16 kHz float32 samples and returns the text
    committed so far; ``finalize()`` flushes the tail and returns the full
    transcript. ``hypothesis`` exposes the unstable tail for display.
    """

    def __init__(self, cfg: WhisperConfig, params: dict, tokenizer,
                 language: str = "hindi", max_new_tokens: int = 224,
                 lora: dict | None = None, lora_scale: float = 1.0,
                 kv_int8: bool = False, flash: str | bool = "auto",
                 task: str = "transcribe"):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.window_samples = cfg.num_audio_frames * mel_ops.HOP_LENGTH
        prompt = cfg.prompt_ids(language, task)
        self._p0 = len(prompt)
        self._total = min(self._p0 + max_new_tokens, cfg.max_target_positions)
        self._prompt = np.asarray(prompt, np.int32)
        use_flash = (("hm" if jax.default_backend() == "tpu" else False)
                     if flash == "auto" else flash)

        def prep(params, audio):
            dtype = jax.tree.leaves(params)[0].dtype
            feats = mel_ops.log_mel_spectrogram(audio, cfg.num_mel_bins,
                                                dtype=dtype)
            feats = feats[:, :, :cfg.num_audio_frames]
            enc = whisper.encode(params, feats, cfg, lora=lora,
                                 lora_scale=lora_scale, flash=use_flash)
            return whisper.init_cache(params, enc, cfg, max_len=self._total,
                                      lora=lora, lora_scale=lora_scale,
                                      cross_kv_int8=kv_int8,
                                      self_kv_int8=kv_int8,
                                      head_minor=whisper.use_head_minor(
                                          cross_kv_int8=kv_int8,
                                          self_kv_int8=kv_int8))

        def dec(params, cache, buf, plen):
            from sar_tpu.decode.greedy import greedy_decode_from_cache
            # return_cache lets the donated cache alias the loop carry
            # (see greedy_decode_from_cache); _decode_window drops it.
            return greedy_decode_from_cache(params, cache, cfg, buf,
                                            lora=lora, lora_scale=lora_scale,
                                            prompt_len=plen,
                                            return_cache=True)

        self._prep = jax.jit(prep)
        self._dec = jax.jit(dec, donate_argnums=(1,))
        self.reset()

    def reset(self) -> None:
        self._audio = np.zeros(0, np.float32)
        self._committed: list[int] = []     # generated ids, current window
        self._last_hyp: list[int] | None = None
        self._segments: list[str] = []      # rolled-over windows' text

    @property
    def _commit_cap(self) -> int:
        """Committed ids never exceed capacity-1, so the forced prefix always
        covers the WHOLE committed transcript (a truncated forced prefix
        could be re-generated differently and retract committed text)."""
        return self._total - self._p0 - 1

    # -- internals -----------------------------------------------------
    def _decode_window(self, audio: np.ndarray) -> list[int]:
        """One compiled update: returns the window's generated ids (the
        forced committed prefix followed by fresh greedy continuation)."""
        from sar_tpu.decode import transcribe_tokens
        window = mel_ops.stack_pad_audio([audio], self.window_samples)
        # feed() keeps _committed <= cap; the slice only guards the
        # feed-after-finalize() edge (finalize commits the full hypothesis).
        committed = self._committed[:self._commit_cap]
        buf = np.full((1, self._total), self.cfg.eos_token_id, np.int32)
        buf[0, :self._p0] = self._prompt
        buf[0, self._p0:self._p0 + len(committed)] = committed
        plen = jnp.int32(self._p0 + len(committed))
        cache = self._prep(self.params, jnp.asarray(window))
        tokens, spent_cache = self._dec(self.params, cache,
                                        jnp.asarray(buf), plen)
        del spent_cache  # aliases the donated prep cache
        return transcribe_tokens(tokens, self.cfg, prompt_len=self._p0)[0]

    def _rollover(self) -> None:
        """Window full: commit its final hypothesis and start a new one."""
        hyp = self._decode_window(self._audio[:self.window_samples])
        text = self.tokenizer.decode(hyp).strip()
        if text:
            self._segments.append(text)
        self._audio = self._audio[self.window_samples:]
        self._committed, self._last_hyp = [], None

    # -- public --------------------------------------------------------
    def feed(self, chunk: np.ndarray) -> str:
        """Append audio, run one update, return the committed text."""
        self._audio = np.concatenate(
            [self._audio, np.asarray(chunk, np.float32).reshape(-1)])
        while len(self._audio) > self.window_samples:
            self._rollover()
        hyp = self._decode_window(self._audio)
        if self._last_hyp is not None:
            # LocalAgreement-2: commit what two consecutive hypotheses
            # agree on. Both start with the (fully) forced committed
            # prefix, so the committed text never shrinks; the cap keeps
            # the NEXT forced prefix full-coverage too.
            agree = common_prefix_len(self._last_hyp, hyp)
            self._committed = hyp[:min(agree, self._commit_cap)]
        self._last_hyp = hyp
        return self.text

    def finalize(self) -> str:
        """Flush: the current window's final hypothesis is committed."""
        if self._last_hyp is None:
            if len(self._audio) == 0:
                return self.text      # nothing fed: don't decode silence
            self._last_hyp = self._decode_window(self._audio)
        self._committed = self._last_hyp
        return self.text

    @property
    def text(self) -> str:
        """Committed (stable) transcript."""
        parts = self._segments + [self.tokenizer.decode(self._committed)]
        return " ".join(p.strip() for p in parts if p.strip())

    @property
    def hypothesis(self) -> str:
        """Committed transcript + the unstable tail of the last update."""
        if self._last_hyp is None:
            return self.text
        parts = self._segments + [self.tokenizer.decode(self._last_hyp)]
        return " ".join(p.strip() for p in parts if p.strip())

#!/usr/bin/env python
"""Transcribe audio files from the command line.

The reference has no single-file transcription surface at all — its only
inference entry points are the batch evaluator and the router script
(/root/reference/scripts/evaluate_model.py, inference.py); transcribing one
file meant writing Python against transcribe_audio
(/root/reference/src/evaluation/__init__.py:172-220). This CLI covers that
plus the capabilities the reference lacks entirely:

- default: 30 s window, compiled KV-cached greedy decode
- --num_beams N: compiled beam search
- --timestamps: segment-level timestamps (HF return_timestamps parity)
- --word_timestamps: per-word times via cross-attention DTW alignment
- --fallback: openai-style temperature fallback on degenerate output,
  plus the no-speech silence gate in long-form mode
- --longform: arbitrary-length audio via chunked transcription
  (sar_tpu.evaluation.longform; auto-selected for clips > 30 s)
- --streaming: simulate a live stream from the file, printing the committed
  transcript as it grows (sar_tpu.evaluation.streaming)
- --checkpoint: apply a trained LoRA adapter
"""

import argparse
import json
import logging
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("transcribe")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Transcribe audio files")
    p.add_argument("audio", nargs="+", help="Audio files (wav; other "
                   "formats need soundfile)")
    p.add_argument("--model", type=str, default="whisper-small")
    p.add_argument("--language", type=str, default="hindi",
                   help='Language name/code, or "auto" for zero-shot '
                        "detection from the model's <|lang|> distribution "
                        "(needs real multilingual weights)")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="LoRA adapter dir (train_lora.py output)")
    p.add_argument("--max_new_tokens", type=int, default=256)
    p.add_argument("--task", type=str, default="transcribe",
                   choices=["transcribe", "translate"],
                   help="translate = X -> English speech translation "
                        "(Whisper's second task token)")
    p.add_argument("--num_beams", type=int, default=1)
    p.add_argument("--length_penalty", type=float, default=1.0,
                   help="Beam-search length penalty (HF/openai semantics)")
    p.add_argument("--temperature", type=float, default=0.0,
                   help="Sampling temperature. With --fallback it is the "
                        "START of the escalation ladder (T, T+0.2, ... 1.0 "
                        "— openai's tuple); alone, a single sampled pass "
                        "at this temperature")
    p.add_argument("--compression_ratio_threshold", type=float, default=2.4,
                   help="--fallback retry threshold (gzip ratio)")
    p.add_argument("--logprob_threshold", type=float, default=-1.0,
                   help="--fallback retry + silence-overrule threshold")
    p.add_argument("--no_speech_threshold", type=float, default=0.6,
                   help="Silence-gate threshold in long-form --fallback")
    p.add_argument("--timestamps", action="store_true",
                   help="Decode with Whisper's timestamp grammar (HF "
                        "return_timestamps parity) and print "
                        "'[start -> end] text' segments")
    p.add_argument("--word_timestamps", action="store_true",
                   help="Per-word start/end times via cross-attention DTW "
                        "alignment (openai add_word_timestamps parity); "
                        "prints '[start -> end] word' lines. Combined with "
                        "--timestamps (long-form only): segments AND words "
                        "(openai's output shape)")
    p.add_argument("--hallucination_silence_threshold", type=float,
                   default=None,
                   help="Seconds of silence to skip around a suspected "
                        "hallucinated segment (openai's heuristic; implies "
                        "--timestamps --word_timestamps and the sequential "
                        "long-form loop)")
    p.add_argument("--fallback", action="store_true",
                   help="openai-style temperature fallback: greedy first, "
                        "resample at rising temperatures while the result "
                        "is degenerate (compression ratio > 2.4 or avg "
                        "logprob < -1.0)")
    p.add_argument("--best_of", type=int, default=1,
                   help="Sampled candidates per fallback pass at T > 0; "
                        "the best avg-logprob candidate wins per row "
                        "(openai's best_of; its default is 5 — each "
                        "candidate costs one full decode pass)")
    p.add_argument("--longform", action="store_true",
                   help="Chunked transcription (auto for clips > 30 s)")
    p.add_argument("--chunk_seconds", type=float, default=30.0)
    p.add_argument("--clip_timestamps", type=str, default=None,
                   help='"start,end,start,end,..." seconds: transcribe only '
                        "these ranges (openai clip_timestamps); output "
                        "times stay on the ORIGINAL clock. Last end "
                        "defaults to the file end")
    p.add_argument("--overlap_seconds", type=float, default=0.0)
    p.add_argument("--condition_on_previous_text", action="store_true",
                   help="Sequential long-form with <|startofprev|> context "
                        "from previous windows (openai transcribe default "
                        "behavior; slower than the batched windows)")
    p.add_argument("--initial_prompt", type=str, default=None,
                   help="Free text fed as decoder context for the first "
                        "window (names, vocabulary, style)")
    p.add_argument("--carry_initial_prompt", action="store_true",
                   help="Pin --initial_prompt at the front of EVERY "
                        "window's context (openai's carry_initial_prompt; "
                        "works with or without "
                        "--condition_on_previous_text)")
    p.add_argument("--streaming", action="store_true",
                   help="Feed the file as a live stream; print committed "
                        "text incrementally")
    p.add_argument("--stream_chunk_seconds", type=float, default=1.0)
    p.add_argument("--output", type=str, default=None,
                   help="Write {file: transcript} JSON here")
    p.add_argument("--output_format", type=str, default=None,
                   choices=["txt", "json", "srt", "vtt", "tsv"],
                   help="Write <audio stem>.<fmt> per input (openai CLI "
                        "writer parity); srt/vtt/tsv imply --timestamps")
    p.add_argument("--output_dir", type=str, default=".",
                   help="Directory for --output_format files")
    p.add_argument("--platform", type=str, default=None,
                   choices=["cpu", "tpu", "axon"],
                   help="Force a JAX backend (default: environment's)")
    return p.parse_args(argv)


def _run_long(audio, transcribe_long, cfg, params, tokenizer, language,
              lora, lora_scale, args, temps):
    """One long-form engine call with every CLI knob applied (factored out
    so --clip_timestamps can run it per clip range)."""
    return transcribe_long(audio, cfg, params, tokenizer,
                           language=language,
                           max_new_tokens=args.max_new_tokens,
                           chunk_seconds=args.chunk_seconds,
                           overlap_seconds=args.overlap_seconds,
                           lora=lora, lora_scale=lora_scale,
                           fallback=args.fallback,
                           word_timestamps=args.word_timestamps,
                           timestamps=args.timestamps,
                           hallucination_silence_threshold=(
                               args.hallucination_silence_threshold),
                           condition_on_previous_text=(
                               args.condition_on_previous_text),
                           initial_prompt=args.initial_prompt,
                           task=args.task, best_of=args.best_of,
                           carry_initial_prompt=args.carry_initial_prompt,
                           temperatures=temps,
                           no_speech_threshold=args.no_speech_threshold,
                           logprob_threshold=args.logprob_threshold,
                           compression_ratio_threshold=(
                               args.compression_ratio_threshold))


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from sar_tpu.data.preprocessing import load_audio
    from sar_tpu.data.tokenizer import get_tokenizer
    from sar_tpu.models import lora as lora_lib
    from sar_tpu.models.base import load_base_model
    from sar_tpu.ops import mel as mel_ops

    cfg, params = load_base_model(args.model, dtype=jnp.bfloat16)
    tokenizer = get_tokenizer(
        args.model,
        language="english" if args.language == "auto" else args.language)
    lora = None
    lora_scale = 1.0
    if args.checkpoint:
        ckpt = Path(args.checkpoint)
        adapter = ckpt / "adapter" if (ckpt / "adapter").exists() else ckpt
        lora, lcfg, _ = lora_lib.load_any_adapter(adapter, cfg)
        lora_scale = lcfg.scale
        logger.info("adapter %s (r=%d alpha=%d)", adapter, lcfg.r, lcfg.alpha)

    results = {}
    for path in args.audio:
        audio = load_audio(path)
        seconds = len(audio) / mel_ops.SAMPLE_RATE
        language = args.language
        if language == "auto":
            from sar_tpu.models import whisper
            from sar_tpu.models.config import WHISPER_LANGUAGES
            padded = mel_ops.stack_pad_audio([audio])
            feats0 = mel_ops.log_mel_spectrogram(
                jnp.asarray(padded), cfg.num_mel_bins, dtype=jnp.bfloat16)
            feats0 = feats0[:, :, :cfg.num_audio_frames]
            # Detection runs on the BASE model: detect_language's decoder
            # pass has no adapter, so feeding it adapter-modified encoder
            # activations would score an untrained weight combination.
            enc0 = whisper.encode(params, feats0, cfg)
            idx, probs = whisper.detect_language(params, enc0, cfg)
            language = WHISPER_LANGUAGES[int(idx[0])]
            logger.info("detected language: %s (p=%.2f)", language,
                        float(probs[0, int(idx[0])]))
        conditioned = (args.condition_on_previous_text
                       or args.initial_prompt is not None
                       or args.hallucination_silence_threshold is not None)
        if args.hallucination_silence_threshold is not None:
            # openai's heuristics run on per-segment words inside the seek
            # loop — they imply both timestamp modes.
            if not (args.timestamps and args.word_timestamps):
                logger.info("--hallucination_silence_threshold implies "
                            "--timestamps and --word_timestamps; enabling")
            args.timestamps = args.word_timestamps = True
        clips = None
        if args.clip_timestamps:
            vals = [float(v) for v in args.clip_timestamps.split(",") if v]
            if len(vals) % 2:
                vals.append(seconds)
            clips = list(zip(vals[::2], vals[1::2]))
            if any(e <= s0 for s0, e in clips):
                raise SystemExit("--clip_timestamps ranges must be "
                                 "start < end")
        from sar_tpu.evaluation import writers
        if (args.output_format in writers.SEGMENT_FORMATS
                and not args.timestamps and not args.streaming):
            logger.info("--output_format %s needs segments; enabling "
                        "--timestamps", args.output_format)
            args.timestamps = True
        if args.carry_initial_prompt and args.initial_prompt is None:
            logger.warning("--carry_initial_prompt needs --initial_prompt; "
                           "ignored")
        if args.best_of > 1 and not args.fallback and args.temperature == 0:
            logger.warning("--best_of applies to sampled passes; ignored "
                           "without --fallback or --temperature > 0")
        # Conditioning rides the long-form engine (a short clip is just a
        # single window there).
        # Clip ranges ride the long-form engine (any range length works
        # there; a short range is a single window).
        long = (args.longform or seconds > mel_ops.CHUNK_SECONDS
                or ((conditioned or clips is not None)
                    and not args.streaming))
        if clips is not None and args.streaming:
            logger.warning("--clip_timestamps does not apply to streaming; "
                           "ignored")
        if conditioned and args.streaming:
            logger.warning("--condition_on_previous_text/--initial_prompt "
                           "do not apply to streaming; ignored")
        # Conflict warnings mirror the dispatch below exactly: each names
        # the flag that actually gets dropped on this path.
        if args.streaming:
            for flag, on in [("--num_beams", args.num_beams > 1),
                             ("--timestamps", args.timestamps),
                             ("--word_timestamps", args.word_timestamps),
                             ("--fallback", args.fallback),
                             ("--temperature", args.temperature > 0)]:
                if on:
                    logger.warning("%s does not apply to streaming; "
                                   "ignored", flag)
        elif long:
            if args.num_beams > 1:
                logger.warning("--num_beams only applies to single-window "
                               "decoding; long-form uses greedy")
        else:
            if (args.fallback or args.temperature > 0) and (
                    args.num_beams > 1 or args.timestamps
                    or args.word_timestamps):
                logger.warning("--fallback/--temperature are greedy "
                               "plain-text only in single-window mode; "
                               "ignored here")
            if args.timestamps and args.word_timestamps:
                logger.warning("--timestamps and --word_timestamps are "
                               "exclusive; emitting segments "
                               "(--word_timestamps ignored)")
        # openai's temperature ladder: with --fallback, (T, T+0.2, ..,
        # 1.0); --temperature alone is one sampled pass at T.
        if args.fallback:
            temps, t = [], args.temperature
            while t < 1.0 + 1e-6:
                temps.append(round(t, 2))
                t += 0.2
            temps = tuple(temps) or (args.temperature,)
        elif args.temperature > 0:
            temps = (args.temperature,)
        else:
            temps = None
        file_segments = None
        file_words = None
        t0 = time.perf_counter()
        if args.streaming:
            from sar_tpu.evaluation.streaming import StreamingTranscriber
            st = StreamingTranscriber(cfg, params, tokenizer,
                                      language=language,
                                      max_new_tokens=args.max_new_tokens,
                                      lora=lora, lora_scale=lora_scale,
                                      task=args.task)
            step = int(args.stream_chunk_seconds * mel_ops.SAMPLE_RATE)
            shown = ""

            def show(text):
                # Committed IDS never retract, but their DECODED string can
                # be revised at a boundary (e.g. a partial UTF-8 sequence
                # completing) — reprint the line when it isn't an append.
                nonlocal shown
                if text == shown:
                    return
                if text.startswith(shown):
                    print(text[len(shown):], end="", flush=True)
                else:
                    print("\r" + text, end="", flush=True)
                shown = text

            for s in range(0, len(audio), step):
                show(st.feed(audio[s:s + step]))
            text = st.finalize()
            show(text)
            print()
        elif long:
            from sar_tpu.evaluation.longform import transcribe_long
            texts_acc, segs_acc, words_acc = [], [], []
            for c0, c1 in (clips or [(0.0, seconds)]):
                piece = audio[int(c0 * mel_ops.SAMPLE_RATE):
                              int(c1 * mel_ops.SAMPLE_RATE)]
                out = _run_long(piece, transcribe_long, cfg, params,
                                tokenizer, language, lora, lora_scale,
                                args, temps)
                if args.word_timestamps and args.timestamps:
                    t, segs, ws = out
                elif args.word_timestamps:
                    t, ws = out
                    segs = None
                elif args.timestamps:
                    t, segs = out
                    ws = None
                else:
                    t, segs, ws = out, None, None
                if ws is not None:
                    words_acc.extend({**w, "start": round(w["start"] + c0, 3),
                                      "end": round(w["end"] + c0, 3)}
                                     for w in ws)
                if segs is not None:
                    segs_acc.extend((None if a is None else round(a + c0, 2),
                                     None if z is None else round(z + c0, 2),
                                     txt) for a, z, txt in segs)
                texts_acc.append(t)
            text = " ".join(t.strip() for t in texts_acc if t.strip())
            if args.timestamps:
                file_segments = segs_acc
                for s0, s1, seg_text in segs_acc:
                    a = "?" if s0 is None else f"{s0:7.2f}"
                    z = "?" if s1 is None else f"{s1:7.2f}"
                    print(f"[{a} -> {z}] {seg_text}")
            if args.word_timestamps:
                file_words = words_acc
                if not args.timestamps:
                    print(text)
                for w in words_acc:
                    print(f"[{w['start']:7.2f} -> {w['end']:7.2f}] "
                          f"{w['word']}")
            if not args.timestamps and not args.word_timestamps:
                print(text)
        elif args.num_beams > 1 or args.timestamps or args.word_timestamps:
            from sar_tpu.decode import transcribe_tokens
            from sar_tpu.decode.beam import beam_decode
            from sar_tpu.decode.greedy import greedy_decode
            from sar_tpu.models import whisper
            padded = mel_ops.stack_pad_audio([audio])
            feats = mel_ops.log_mel_spectrogram(
                jnp.asarray(padded), cfg.num_mel_bins, dtype=jnp.bfloat16)
            feats = feats[:, :, :cfg.num_audio_frames]
            enc = whisper.encode(params, feats, cfg, lora=lora,
                                 lora_scale=lora_scale)
            # --timestamps drops <|notimestamps|> from the prompt and turns
            # on the timestamp grammar inside the compiled loop.
            prompt = jnp.asarray(
                cfg.prompt_ids(language, args.task,
                               no_timestamps=not args.timestamps), jnp.int32)
            if args.num_beams > 1:
                tokens = beam_decode(params, enc, cfg, prompt,
                                     num_beams=args.num_beams,
                                     max_new_tokens=args.max_new_tokens,
                                     length_penalty=args.length_penalty,
                                     lora=lora, lora_scale=lora_scale,
                                     timestamps=args.timestamps)
            else:
                tokens = greedy_decode(params, enc, cfg, prompt,
                                       max_new_tokens=args.max_new_tokens,
                                       lora=lora, lora_scale=lora_scale,
                                       timestamps=args.timestamps)
            ids = transcribe_tokens(tokens, cfg, prompt_len=int(prompt.shape[0]))
            if args.timestamps:
                from sar_tpu.decode.timestamps import (format_segments,
                                                       split_segments)
                raw = split_segments(ids[0], cfg)
                text = format_segments(raw, tokenizer)
                decoded = ((a, z, tokenizer.decode(toks).strip())
                           for a, z, toks in raw)
                file_segments = [seg for seg in decoded if seg[2]]
            else:
                text = tokenizer.decode(ids[0])
            print(text)
            if args.word_timestamps and not args.timestamps:
                from sar_tpu.decode.align import align_words
                n_frames = min(-(-len(audio) // (2 * mel_ops.HOP_LENGTH)),
                               cfg.max_source_positions)
                words = align_words(
                    params, feats, tokens, cfg, tokenizer,
                    prompt_len=int(prompt.shape[0]), lora=lora,
                    lora_scale=lora_scale, enc_out=enc,
                    num_frames=[n_frames])[0]
                file_words = words
                for w in words:
                    print(f"[{w['start']:6.2f} -> {w['end']:6.2f}] {w['word']}")
        elif args.fallback or args.temperature > 0:
            from sar_tpu.evaluation.fallback import \
                transcribe_batch_with_fallback
            padded = mel_ops.stack_pad_audio([audio])
            feats = mel_ops.log_mel_spectrogram(
                jnp.asarray(padded), cfg.num_mel_bins, dtype=jnp.bfloat16)
            feats = feats[:, :, :cfg.num_audio_frames]
            # --temperature alone = pure sampling (no quality gates).
            (text,), (row,) = transcribe_batch_with_fallback(
                cfg, params, feats, tokenizer, language=language,
                max_new_tokens=args.max_new_tokens,
                lora=lora, lora_scale=lora_scale, task=args.task,
                best_of=args.best_of, temperatures=temps,
                compression_ratio_threshold=(
                    args.compression_ratio_threshold if args.fallback
                    else None),
                logprob_threshold=(args.logprob_threshold if args.fallback
                                   else None),
                no_speech_threshold=(args.no_speech_threshold
                                     if args.fallback else None))
            logger.info("accepted at T=%.1f (avg_logprob %.3f, "
                        "compression %.2f)", row["temperature"],
                        row["avg_logprob"], row["compression_ratio"])
            print(text)
        else:
            from sar_tpu.evaluation.evaluator import transcribe_audio
            text = transcribe_audio(audio, cfg, params, tokenizer,
                                    language=language,
                                    max_new_tokens=args.max_new_tokens,
                                    lora=lora, lora_scale=lora_scale,
                                    task=args.task)
            print(text)
        dt = time.perf_counter() - t0
        logger.info("%s: %.1f s audio in %.2f s (%.1fx real-time)",
                    path, seconds, dt, seconds / max(dt, 1e-9))
        results[path] = text
        if args.output_format:
            if (args.output_format in writers.SEGMENT_FORMATS
                    and file_segments is None):
                logger.warning("%s: no segments on this path; %s output "
                               "will be empty of cues", path,
                               args.output_format)
            out_dir = Path(args.output_dir)
            out_dir.mkdir(parents=True, exist_ok=True)
            dst = out_dir / (Path(path).stem + "." + args.output_format)
            dst.write_text(writers.render(args.output_format, text,
                                          segments=file_segments,
                                          words=file_words))
            logger.info("wrote %s", dst)
    if args.output:
        Path(args.output).write_text(json.dumps(results, indent=2,
                                                ensure_ascii=False))
        logger.info("wrote %s", args.output)
    return results


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Routed inference: LID-gated multi-adapter transcription over a test split.

The reference's AdapterRouter is library-only — no script instantiates it
(SURVEY.md §2.3 gap; /root/reference/src/models/adapter_router.py:488 has no
driver). This CLI closes that gap: it assembles a router from per-language
adapter checkpoints + a trained LID classifier, runs BATCHED routed
transcription over a mixed-language test set, and reports per-language WER,
routed (LID) accuracy, and routed-vs-oracle WER — the Phase-2 success
metrics of /root/reference/PROJECT_REQUIREMENTS.md:999-1004.
"""

import argparse
import json
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(name)s %(levelname)s %(message)s")
logger = logging.getLogger("route_infer")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Routed multi-adapter inference (TPU)")
    p.add_argument("--model", type=str, default="whisper-small",
                   choices=["whisper-tiny", "whisper-base", "whisper-small",
                            "whisper-medium", "whisper-large", "whisper-test"])
    p.add_argument("--classifier", type=str, required=True,
                   help="Trained LID classifier dir (train_router.py output)")
    p.add_argument("--adapters", type=str, nargs="+", required=True,
                   help="language=path pairs, e.g. hindi=out/hi/final")
    p.add_argument("--router_dir", type=str, default=None,
                   help="Save the assembled router here for reuse")
    p.add_argument("--strategy", type=str, default="hard",
                   choices=["hard", "soft", "threshold"])
    p.add_argument("--threshold", type=float, default=0.7)
    p.add_argument("--data_sources", type=str, nargs="+",
                   default=["common_voice"])
    p.add_argument("--split", type=str, default="test")
    p.add_argument("--max_samples", type=int, default=None,
                   help="Per-language sample cap")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_new_tokens", type=int, default=256)
    p.add_argument("--mixed_precision", type=str, default="bf16",
                   choices=["no", "fp16", "bf16"])
    p.add_argument("--oracle", action="store_true",
                   help="Also decode with oracle (true-language) routing")
    p.add_argument("--output_dir", type=str, default=None)
    p.add_argument("--cache_dir", type=str, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--platform", type=str, default=None,
                   choices=["cpu", "tpu", "axon"],
                   help="Force a JAX backend (default: environment's)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from sar_tpu.data.collate import create_collator
    from sar_tpu.data.datasets import create_dataset
    from sar_tpu.data.loader import DataLoader
    from sar_tpu.data.tokenizer import get_tokenizer
    from sar_tpu.decode import transcribe_tokens
    from sar_tpu.models import classifier as clf
    from sar_tpu.models.base import load_base_model
    from sar_tpu.models.router import build_router_from_checkpoints
    from sar_tpu.training.metrics import compute_metrics

    dtype = {"no": jnp.float32, "fp16": jnp.bfloat16,
             "bf16": jnp.bfloat16}[args.mixed_precision]
    cfg, params = load_base_model(args.model, dtype=dtype,
                                  cache_dir=args.cache_dir)
    clf_dir = Path(args.classifier)
    if (clf_dir / "classifier").exists():
        clf_dir = clf_dir / "classifier"
    clf_params, clf_cfg, _ = clf.load_classifier(clf_dir)

    adapter_dirs = dict(pair.split("=", 1) for pair in args.adapters)
    missing = set(clf_cfg.languages) - set(adapter_dirs)
    if missing:
        raise SystemExit(f"missing adapters for languages: {sorted(missing)}")

    router = build_router_from_checkpoints(
        cfg, params, adapter_dirs, clf_params, clf_cfg,
        strategy=args.strategy, threshold=args.threshold)
    if args.router_dir:
        router.save(args.router_dir)
        logger.info("router saved to %s", args.router_dir)

    tokenizer = get_tokenizer(args.model)
    coll = create_collator(cfg.sot_token_id, with_language=True,
                           num_mels=cfg.num_mel_bins,
                                        num_frames=cfg.num_audio_frames)
    langs = list(clf_cfg.languages)

    # Round-robin-interleave the per-language test sets so every BATCH mixes
    # languages — the Phase-2 scenario is a mixed stream, and a mixed batch
    # is what exercises the per-utterance BGMV adapter dispatch end-to-end
    # (the reference dispatches per sample in a Python loop,
    # adapter_router.py:744-750; one-language-at-a-time evaluation could
    # never show cross-batch routing errors either).
    class _Interleaved:
        def __init__(self, datasets):
            order = []
            for j in range(max(len(d) for d in datasets)):
                for d in datasets:
                    if j < len(d):
                        order.append((d, j))
            self._order = order

        def __len__(self):
            return len(self._order)

        def __getitem__(self, i):
            d, j = self._order[i]
            return d[j]

    per_lang = [create_dataset(language=lang, sources=args.data_sources,
                               split=args.split, tokenizer=tokenizer,
                               language_id=li, max_samples=args.max_samples,
                               seed=args.seed, model_config=cfg)
                for li, lang in enumerate(langs)]
    loader = DataLoader(_Interleaved(per_lang), args.batch_size, coll,
                        shuffle=False, drop_last=False)

    per_lang_preds = {l: ([], []) for l in langs}      # predictions, refs
    oracle_preds = {l: ([], []) for l in langs}
    detect_hits, detect_total = 0, 0
    last_mel = None

    for batch in loader.one_epoch():
        mel = jnp.asarray(batch["input_features"])
        true_ids = [int(i) for i in batch["language_ids"]]
        feats = router.extract_encoder_features(mel)
        detected, probs = router.detect_language(feats)
        detect_hits += sum(router.lang_to_idx[d] == t
                           for d, t in zip(detected, true_ids))
        detect_total += len(detected)
        last_mel = mel

        # Reuse the detection (one LID pass per batch, not two); the decode
        # runs the MIXED-adapter batch in one compiled pass.
        idx = jnp.asarray([router.lang_to_idx[d] for d in detected])
        tokens = router.generate(mel, adapter_idx=idx,
                                 max_new_tokens=args.max_new_tokens)
        ids = transcribe_tokens(tokens, cfg, prompt_len=router.prompt_len)
        for t, row, ref in zip(true_ids, ids, batch["texts"]):
            per_lang_preds[langs[t]][0].append(tokenizer.decode(row))
            per_lang_preds[langs[t]][1].append(ref)

        if args.oracle:
            toks = router.generate(mel, adapter_idx=jnp.asarray(true_ids),
                                   max_new_tokens=args.max_new_tokens)
            ids = transcribe_tokens(toks, cfg, prompt_len=router.prompt_len)
            for t, row, ref in zip(true_ids, ids, batch["texts"]):
                oracle_preds[langs[t]][0].append(tokenizer.decode(row))
                oracle_preds[langs[t]][1].append(ref)

    # Routing overhead per utterance (Phase-2 target: < 10 ms,
    # /root/reference/PROJECT_REQUIREMENTS.md:999-1004), measured on the
    # already-compiled LID path.
    routing_overhead_ms = None
    if last_mel is not None:
        import time
        import numpy as np
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            f = router.extract_encoder_features(last_mel)
            d, _ = router.detect_language(f)
        np.asarray(f[0, 0, 0])   # transfer fence
        routing_overhead_ms = ((time.perf_counter() - t0) / reps
                               / last_mel.shape[0] * 1000)

    results = {"strategy": args.strategy,
               "lid_accuracy": detect_hits / max(detect_total, 1),
               "routing_overhead_ms": routing_overhead_ms,
               "per_language": {}}
    all_p, all_r = [], []
    for lang in langs:
        p, r = per_lang_preds[lang]
        m = compute_metrics(p, r)
        entry = {"routed_wer": m["wer"], "routed_cer": m["cer"],
                 "num_samples": len(r)}
        if args.oracle:
            om = compute_metrics(*oracle_preds[lang])
            entry["oracle_wer"] = om["wer"]
            entry["routing_gap"] = m["wer"] - om["wer"]
        results["per_language"][lang] = entry
        all_p.extend(p)
        all_r.extend(r)
    results["overall"] = compute_metrics(all_p, all_r)

    print(json.dumps(results, indent=2))
    if args.output_dir:
        out = Path(args.output_dir)
        out.mkdir(parents=True, exist_ok=True)
        (out / "routing_results.json").write_text(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Phase-3: adapter analysis CLI.

The reference plans an analyze_adapters.py
(/root/reference/PROJECT_REQUIREMENTS.md:53, Phase 3 at :370-546) but never
ships one. This delivers it: per-layer delta magnitudes, effective ranks,
and cross-language adapter similarity from trained checkpoints.
"""

import argparse
import json
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(name)s %(levelname)s %(message)s")
logger = logging.getLogger("analyze_adapters")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Analyze trained LoRA adapters")
    p.add_argument("--adapters", type=str, nargs="+", required=True,
                   help="language=path pairs")
    p.add_argument("--output", type=str, default=None,
                   help="Write the full JSON report here")
    p.add_argument("--top_k", type=int, default=5,
                   help="Show the k layers with the largest deltas")
    p.add_argument("--model", type=str, default=None,
                   help="Base model registry name for PEFT checkpoint dirs "
                        "whose base_model_name_or_path is not a known hub "
                        "id")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from sar_tpu.analysis import compare_adapters

    adapter_dirs = dict(pair.split("=", 1) for pair in args.adapters)
    report = compare_adapters(adapter_dirs, model=args.model)

    for lang, analysis in report["adapters"].items():
        print(f"\n=== {lang} (r={analysis['rank']}, alpha={analysis['alpha']}) ===")
        print("delta norm by target:")
        for target, norm in sorted(analysis["total_norm_by_target"].items(),
                                   key=lambda kv: -kv[1]):
            print(f"  {target:24s} {norm:10.4f}")
        rows = [(f"{t} L{r['layer']}", r["frobenius_norm"], r["effective_rank"])
                for t, layer_rows in analysis["layers"].items()
                for r in layer_rows]
        rows.sort(key=lambda x: -x[1])
        print(f"top-{args.top_k} layers by delta norm:")
        for name, norm, erank in rows[:args.top_k]:
            print(f"  {name:32s} ||d||={norm:8.4f}  eff.rank={erank:5.2f}")

    if report["pairwise_similarity"]:
        print("\n=== cross-language adapter similarity (mean cosine) ===")
        for pair, sim in sorted(report["pairwise_similarity"].items()):
            print(f"  {pair:24s} {sim:+.4f}")

    if args.output:
        Path(args.output).parent.mkdir(parents=True, exist_ok=True)
        Path(args.output).write_text(json.dumps(report, indent=2))
        logger.info("report written to %s", args.output)
    return report


if __name__ == "__main__":
    main()

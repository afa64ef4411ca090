"""Diff measured zero-shot WER against the reference's published baselines.

The baseline table is BASELINE.md's zero-shot WER% (source:
/root/reference/PROJECT_REQUIREMENTS.md:26-28, produced with
test_inference_run.py on FLEURS test). jobs/real_weight_parity.sh runs the
grid and calls this to produce a machine-readable parity verdict.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

# WER %, zero-shot on FLEURS test (PROJECT_REQUIREMENTS.md:26-28).
BASELINE_WER = {
    "whisper-small": {"hindi": 84.16, "italian": 27.62,
                      "punjabi": 143.40, "telugu": 150.75},
    "whisper-medium": {"hindi": 45.47, "italian": 20.75,
                       "punjabi": 114.41, "telugu": 122.42},
    "whisper-large": {"hindi": 32.31, "italian": 20.38,
                      "punjabi": 91.80, "telugu": 121.57},
}

# BASELINE.json's parity criterion is "±0.1 abs" WER. Read in the table's
# own units (percent), that is 0.1 percentage points — the TIGHTER of the
# two possible readings; a run that passes this trivially passes the looser
# fraction reading too.
TOLERANCE_PP = 0.1


def compare(results_dir: str | Path) -> dict:
    results_dir = Path(results_dir)
    cells = []
    for model, langs in BASELINE_WER.items():
        for lang, ref_wer in langs.items():
            metrics_file = results_dir / f"{model}_{lang}" / "metrics.json"
            if not metrics_file.exists():
                cells.append({"model": model, "language": lang,
                              "reference_wer": ref_wer, "status": "missing"})
                continue
            ours = json.loads(metrics_file.read_text())
            our_wer = 100.0 * float(ours["wer"])
            delta = our_wer - ref_wer
            cells.append({
                "model": model, "language": lang,
                "reference_wer": ref_wer, "our_wer": round(our_wer, 2),
                "delta_pp": round(delta, 2),
                "status": ("parity" if abs(delta) <= TOLERANCE_PP
                           else "better" if delta < 0 else "worse"),
            })
    measured = [c for c in cells if c["status"] != "missing"]
    return {
        "tolerance_pp": TOLERANCE_PP,
        "num_measured": len(measured),
        "num_missing": len(cells) - len(measured),
        "num_parity_or_better": sum(
            1 for c in measured if c["status"] in ("parity", "better")),
        "cells": cells,
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--results", required=True,
                   help="Directory of <model>_<language>/metrics.json cells")
    p.add_argument("--output", default=None, help="Where to write the diff")
    args = p.parse_args(argv)

    report = compare(args.results)
    text = json.dumps(report, indent=2)
    if args.output:
        Path(args.output).write_text(text)
    print(text)
    if report["num_measured"] == 0:
        print("no cells measured yet — run jobs/real_weight_parity.sh "
              "with network access", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

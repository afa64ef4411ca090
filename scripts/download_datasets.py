#!/usr/bin/env python
"""Pre-download datasets to the HF cache to avoid array-job download races.

CLI parity with /root/reference/scripts/download_datasets.py:29-99: Common
Voice for all four languages, AI4Bharat for the three Indic languages, MLS
for Italian. Run this once before launching the training grid.
"""

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(name)s %(levelname)s %(message)s")
logger = logging.getLogger("download_datasets")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Pre-cache HF datasets")
    p.add_argument("--datasets", type=str, nargs="+",
                   default=["common_voice", "ai4bharat", "mls"],
                   choices=["common_voice", "ai4bharat", "mls", "fleurs"])
    p.add_argument("--languages", type=str, nargs="+",
                   default=["hindi", "italian", "punjabi", "telugu"])
    p.add_argument("--splits", type=str, nargs="+",
                   default=["train", "validation", "test"])
    p.add_argument("--cache_dir", type=str, default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from sar_tpu.data.datasets import (LANGUAGE_SOURCES, load_ai4bharat,
                                       load_common_voice, load_fleurs,
                                       load_mls)
    loaders = {"common_voice": load_common_voice, "ai4bharat": load_ai4bharat,
               "mls": load_mls, "fleurs": load_fleurs}
    ok, failed = [], []
    for source in args.datasets:
        for lang in args.languages:
            table = LANGUAGE_SOURCES.get(lang, {})
            if source not in table:
                continue
            for split in args.splits:
                tag = f"{source}/{lang}/{split}"
                try:
                    ds = loaders[source](table[source], split)
                    logger.info("cached %s: %d rows", tag, len(ds))
                    ok.append(tag)
                except Exception as e:
                    logger.warning("FAILED %s: %s", tag, e)
                    failed.append(tag)
    logger.info("done: %d cached, %d failed", len(ok), len(failed))
    if failed:
        logger.warning("failed: %s", failed)
    return ok, failed


if __name__ == "__main__":
    main()

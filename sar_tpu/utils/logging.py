"""Logging setup shared by the CLI scripts (the reference calls
logging.basicConfig per script, e.g. train_lora.py:25-28)."""

from __future__ import annotations

import logging
import sys


def setup_logging(level: int = logging.INFO, name: str | None = None
                  ) -> logging.Logger:
    logging.basicConfig(
        level=level,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
        stream=sys.stderr,
    )
    # JAX/orbax chatter down to warnings.
    for noisy in ("jax._src", "orbax", "absl"):
        logging.getLogger(noisy).setLevel(logging.WARNING)
    return logging.getLogger(name) if name else logging.getLogger()

"""Production serving: dynamic micro-batching over the compiled pipeline.

The reference stops at batch evaluation scripts; it has no serving story.
This package adds one, TPU-first: requests from many clients coalesce into
fixed-size batches (static shapes — ONE compiled program ever), ride the
two-phase prep/decode pipeline with cache donation, and fan back out.
`TranscriptionService` is the embeddable core; `scripts/serve.py` fronts
it with a stdlib HTTP API.
"""

from sar_tpu.serving.service import TranscriptionService  # noqa: F401

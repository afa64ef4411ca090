from sar_tpu.utils.logging import setup_logging  # noqa: F401
from sar_tpu.utils.profiling import Timer, benchmark_fn, force, rtfx, trace  # noqa: F401

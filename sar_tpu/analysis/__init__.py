from sar_tpu.analysis.adapters import (  # noqa: F401
    adapter_similarity,
    analyze_adapter,
    compare_adapters,
)

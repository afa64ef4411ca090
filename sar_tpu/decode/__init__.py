from sar_tpu.decode.greedy import greedy_decode, transcribe_tokens  # noqa: F401

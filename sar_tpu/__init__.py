"""sar_tpu — a TPU-native multilingual ASR framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
dhruv0811/speech-adapter-routing (reference at /root/reference):
per-language LoRA adapters on Whisper, a language-identification router,
and batched multi-adapter routed inference — built TPU-first:

- fused log-mel frontend (matmul STFT on the MXU; Pallas kernel in ops/)
- Whisper encoder/decoder as pure-JAX scanned layer stacks (bf16, pytrees)
- stacked LoRA adapter bank with batched per-utterance gather (BGMV) so one
  batch mixes languages without host round-trips
- KV-cached greedy/beam decode compiled end-to-end (lax.while_loop)
- optax/orbax training stack with the reference's trainer semantics
- jax.sharding.Mesh data/tensor parallelism over ICI
"""

__version__ = "0.1.0"

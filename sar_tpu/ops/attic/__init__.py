"""Measured-and-parked kernel experiments — NOT wired into any production
path. Each module records the measurement that parked it and the concrete
condition that would revive it (see also PARITY.md "parked kernels"):

- attention.py (flash-decode attention): dispatch-bound at decode shapes;
  production decode reaches the HBM roofline via int8 KV
  (whisper._attention_int8) instead. Revive if a fused
  int8-dequant+score+softmax+PV decode kernel is attempted.
- decode_self.py (s8-MXU self-attention decode): per-grid-cell overhead
  dominates on the small (<=448-row) self slabs — 1.54 ms/call vs the jnp
  int8 path's ~0.17 ms/layer at whisper-small B=128. Revive if
  max_target_positions grows past ~1k rows (the cross kernel's regime) or
  whisper-large beam-8 makes the folded self slab comparably tall.

Interpret-mode parity tests keep both honest (tests/test_pallas_attention.py,
tests/test_decode_self.py).
"""

"""Pallas decode-attention kernel (flash-decode style).

The autoregressive decode step is bandwidth-bound on streaming the KV cache:
for whisper-small at batch 64 the cross-attention K/V alone is ~2.9 GB per
decoded token. XLA's GEMV-shaped attention (q has one row) streams at ~350
GB/s on v5e; this kernel reads each K/V slab exactly once into VMEM per
(batch, head) grid cell — scores, softmax, and the value reduction fused —
to push toward the HBM roofline.

Shapes: q [B, H, hd], k/v [B, H, S, hd] -> out [B, H, hd].
`valid_len` (optional, [1] int32 in SMEM) masks positions >= valid_len for
the self-attention cache case; cross-attention passes None (full S).

Status: an EXPERIMENT, not wired into decode_step — measured standalone it
is dispatch-bound at these shapes, and the production decode path instead
reaches the bandwidth roofline via int8 KV (whisper._attention_int8). Kept
with interpret-mode parity tests as the starting point for a fused
(int8-dequant + score + softmax + PV) decode kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attend(q, k, v, s_extra_mask=None):
    """q [1, hd]; k/v [S, hd] -> [1, hd]. All ops 2-D (Mosaic-friendly):
    scores via dot_general (no transposes), value reduction on the VPU."""
    # Explicit f32 converts (arith.extf) — letting the dot upcast internally
    # trips a Mosaic vector.broadcast verifier bug on bf16 GEMV shapes.
    kf = k.astype(jnp.float32)
    qf = q.astype(jnp.float32)
    s = jax.lax.dot_general(kf, qf, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)   # [S, 1]
    if s_extra_mask is not None:
        s = jnp.where(s_extra_mask, s, jnp.float32(-1e30))
    m = jnp.max(s)
    p = jnp.exp(s - m)                                            # [S, 1]
    denom = jnp.sum(p)
    w = (p / denom).astype(v.dtype)                               # [S, 1]
    # Value reduction on the MXU: contract S, fp32 accumulation.
    return jax.lax.dot_general(w, v, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)  # [1, hd]


def _kernel_full(q_ref, k_ref, v_ref, o_ref):
    # q [1, 1, hd]; k/v [1, S, hd]; o [1, 1, hd].
    o_ref[0] = _attend(q_ref[0], k_ref[0], v_ref[0]).astype(o_ref.dtype)


def _kernel_masked(n_ref, q_ref, k_ref, v_ref, o_ref):
    S = k_ref.shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    mask = idx < n_ref[0]
    o_ref[0] = _attend(q_ref[0], k_ref[0], v_ref[0], mask).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     valid_len: jnp.ndarray | None = None,
                     interpret: bool = False) -> jnp.ndarray:
    """Single-token attention: q [B, H, hd] x k/v [B, H, S, hd] -> [B, H, hd].

    q must already carry the 1/sqrt(hd) scaling. valid_len: scalar int32 —
    number of valid cache positions (self-attention); None = attend to all.
    """
    B, H, S, hd = k.shape
    qf = q.reshape(B * H, 1, hd)
    kf = k.reshape(B * H, S, hd)
    vf = v.reshape(B * H, S, hd)

    grid = (B * H,)
    q_spec = pl.BlockSpec((1, 1, hd), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, S, hd), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, 1, hd), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)

    if valid_len is None:
        out = pl.pallas_call(
            _kernel_full,
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=o_spec,
            out_shape=jax.ShapeDtypeStruct((B * H, 1, hd), q.dtype),
            interpret=interpret,
        )(qf, kf, vf)
    else:
        # Scalar-prefetch index maps receive (grid_idx, scalar_ref).
        q_spec_m = pl.BlockSpec((1, 1, hd), lambda i, n: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        kv_spec_m = pl.BlockSpec((1, S, hd), lambda i, n: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        o_spec_m = pl.BlockSpec((1, 1, hd), lambda i, n: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            _kernel_masked,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[q_spec_m, kv_spec_m, kv_spec_m],
                out_specs=o_spec_m,
            ),
            out_shape=jax.ShapeDtypeStruct((B * H, 1, hd), q.dtype),
            interpret=interpret,
        )(jnp.asarray(valid_len, jnp.int32).reshape(1), qf, kf, vf)
    return out.reshape(B, H, hd)


def decode_attention_reference(q, k, v, valid_len=None):
    """jnp reference (used on CPU and in parity tests)."""
    scores = jnp.einsum("bhd,bhsd->bhs", q, k,
                        preferred_element_type=jnp.float32)
    if valid_len is not None:
        S = k.shape[2]
        scores = jnp.where(jnp.arange(S)[None, None, :] < valid_len,
                           scores, jnp.float32(-1e30))
    probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(v.dtype)
    return jnp.einsum("bhs,bhsd->bhd", probs, v)

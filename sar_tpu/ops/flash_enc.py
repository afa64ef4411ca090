"""Head-minor encoder attention kernel (Pallas, TPU, inference forward).

Why: the bundled flash kernel (ops/flash.py) wants [B, H, T, hd] operands,
so every encoder layer pays split_heads/merge_heads transposes PLUS the
relayout copies XLA inserts between a transpose and a pallas_call — measured
~230 ms of the ~415 ms attention-in-context cost per 12-layer whisper-small
encode at B=128 (vs ~182 ms for the kernel alone). This kernel consumes the
residual-stream layout [B, T_pad, H*hd] DIRECTLY: no transposes exist in
the XLA graph at all.

How (grid (B, T_pad/bq); everything 2-D, lane slices 128-aligned):
- heads are processed in 128-lane GROUPS (two hd=64 heads per group). A
  group's scores need per-head contractions, so the group query is masked
  per head (q_h = q with the other head's lanes zeroed) and each head gets
  its own lane-contracted dot: 128-wide MXU contractions at 2x the
  minimal FLOPs — on the MXU that is the same wall time as hd=64-wide
  contractions at 1x, with full lane utilization and zero layout traffic.
- K/V stay whole-slab in VMEM per (batch) cell and are re-used across the
  q-block grid dimension (same BlockSpec index -> no re-fetch).
- softmax is exact per q-block row (the whole padded T fits in VMEM);
  padded key columns (>= t_valid) are masked to -inf. Padded QUERY rows
  compute garbage that the caller slices off; they never contaminate real
  rows (row-wise ops only + masked keys).
- each head-pair's PV dot produces [bq, 128] where only its own head's
  half is valid; the two results are lane-selected and written to the
  128-aligned output slice.

Scope: inference forward only (no custom VJP) — training keeps ops/flash.py
whose backward is fused. Parity: tests/test_flash_enc.py (interpret mode)
vs whisper.attention.

The reference has no custom kernels (SURVEY.md §2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
BLOCK_Q = 256


def _kernel(q_ref, k_ref, v_ref, o_ref, *, heads_per_group: int,
            t_valid: int):
    qg = q_ref[0]                                    # [bq, group] bf16
    kg = k_ref[0]                                    # [T, group]
    vg = v_ref[0]
    bq, group = qg.shape
    T = kg.shape[0]
    hd = group // heads_per_group

    colmask = jax.lax.broadcasted_iota(jnp.int32, (bq, T), 1) < t_valid
    lane_head = jax.lax.broadcasted_iota(jnp.int32, (bq, group), 1) // hd

    og = None
    inv = None
    for j in range(heads_per_group):
        qj = jnp.where(lane_head == j, qg, jnp.bfloat16(0))
        s = jax.lax.dot_general(qj, kg, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = jnp.where(colmask, s, NEG)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        # Softmax normalization is DEFERRED past the PV dot: dividing the
        # [bq, T] probability matrix costs bq*T VPU divides per head, while
        # scaling the [bq, group] output costs bq*group multiplies — ~T/hd x
        # fewer element ops for mathematically identical results (the dot
        # distributes over the scalar row factor).
        invj = 1.0 / jnp.sum(p, axis=1, keepdims=True)     # [bq, 1]
        oj = jax.lax.dot_general(p.astype(qg.dtype), vg,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        og = oj if og is None else jnp.where(lane_head == j, oj, og)
        inv = invj if inv is None else jnp.where(lane_head == j, invj, inv)
    o_ref[0] = (og * inv).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_heads", "t_valid",
                                             "interpret"))
def encoder_attention_hm(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         *, n_heads: int, t_valid: int,
                         interpret: bool = False) -> jnp.ndarray:
    """q/k/v [B, T_pad, H*hd] head-minor (q pre-scaled) -> [B, T_pad, H*hd].
    Key columns >= t_valid are masked; query rows >= t_valid are garbage
    (slice them off)."""
    B, T, D = q.shape
    # Largest divisor of T up to BLOCK_Q — falling back to the whole padded T
    # would put a full [T, group] q-block plus the K/V slab in one grid cell
    # and could blow VMEM for long non-256-multiple windows.
    bq = next(b for b in range(min(BLOCK_Q, T), 0, -1) if T % b == 0)
    group = min(128, D)                              # lanes per grid cell
    hd = D // n_heads
    if D % group or group % hd:
        # Heads straddling a group boundary would silently mix lanes and
        # ungridded lanes would stay unwritten — refuse instead.
        raise ValueError(
            f"flash='hm' needs head_dim ({hd}) to divide the {group}-lane "
            f"group and the group to divide d_model ({D}); use flash=True "
            f"for this configuration")
    per = group // hd                                # heads per group
    kernel = functools.partial(_kernel, heads_per_group=per, t_valid=t_valid)
    # Grid order (B, group, q-block): the K/V block index is constant
    # across the fastest (q-block) dimension, so each [T, group] K/V slice
    # is fetched once per sample — and VMEM holds only a 128-lane slice of
    # K/V regardless of D (whisper-large's [T, 1280] slabs blew the 16 MB
    # budget when a cell held whole rows).
    return pl.pallas_call(
        kernel,
        grid=(B, D // group, T // bq),
        in_specs=[
            pl.BlockSpec((1, bq, group), lambda b, g, i: (b, i, g)),
            pl.BlockSpec((1, T, group), lambda b, g, i: (b, 0, g)),
            pl.BlockSpec((1, T, group), lambda b, g, i: (b, 0, g)),
        ],
        out_specs=pl.BlockSpec((1, bq, group), lambda b, g, i: (b, i, g)),
        out_shape=jax.ShapeDtypeStruct((B, T, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(q, k, v)

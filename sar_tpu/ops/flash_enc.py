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
LN_EPS = 1e-5
# VMEM budget gate for the fused-QKV kernel (whole-sample x + LN scratch +
# K/V slabs must fit; see _fused_vmem_bytes). 16 MB/core minus headroom for
# Mosaic's own temporaries.
FUSED_VMEM_BUDGET = 14 * 1024 * 1024


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


# ---------------------------------------------------------------------------
# Fused LN + QKV-projection + attention (inference encoder, round-4 build)
#
# MEASURED NEGATIVE RESULT (v5e, whisper-small B=128, full 12-layer encode,
# device-fenced medians over 7 iters): flash="fq" 508.8 ms vs "hm" 493.2 at
# bq=256, and 508.0 vs 486.0 at bq=384 — the fused kernel LOSES ~4% despite
# eliminating four [B, T, D] HBM round-trips per layer. The encoder is
# FLOP-bound, not bandwidth-bound, at these shapes (~46% MFU, PARITY.md):
# the ~3 ms/layer of saved HBM traffic cannot repay fragmenting the QKV
# projections into per-cell [T, D] x [D, 128] GEMMs (128-lane N) that the
# XLA batched [B*T, D] x [D, D] GEMMs beat. Kept importable behind
# encode(flash="fq") with its parity suite; "hm" stays the default
# inference encoder path.
# ---------------------------------------------------------------------------

def _fused_kernel(x_ref, lns_ref, lnb_ref, wq_ref, bq_ref, wk_ref, wv_ref,
                  bv_ref, o_ref, h_s, k_s, v_s, *, heads_per_group: int,
                  t_valid: int, bq: int, scaling: float):
    """One grid cell (b, g, i): q-block i of head-group g for sample b.

    Per-sample work is staged through persistent VMEM scratch exploiting the
    TPU grid's sequential row-major execution:
      - at (g==0, i==0): LayerNorm the whole [T, D] residual into h_s —
        once per SAMPLE (the pre-LN x never materializes an h in HBM);
      - at (i==0): project this group's K/V slabs [T, group] into k_s/v_s —
        once per (sample, group), reused across all q-blocks;
      - every cell: project the q-block [bq, group] and run the head-pair
        masked-lane attention of `_kernel` against the resident slabs.
    """
    g = pl.program_id(1)
    i = pl.program_id(2)
    T, D = h_s.shape

    @pl.when(jnp.logical_and(g == 0, i == 0))
    def _layernorm():
        scale = lns_ref[0].astype(jnp.float32)
        bias = lnb_ref[0].astype(jnp.float32)

        def chunk(c, _):
            xb = x_ref[0, pl.ds(c * 128, 128), :].astype(jnp.float32)
            mu = jnp.mean(xb, axis=1, keepdims=True)
            var = jnp.mean(xb * xb, axis=1, keepdims=True) - mu * mu
            y = (xb - mu) * jax.lax.rsqrt(var + LN_EPS)
            h_s[pl.ds(c * 128, 128), :] = (y * scale + bias).astype(h_s.dtype)
            return _

        jax.lax.fori_loop(0, T // 128, chunk, None, unroll=False)

    @pl.when(i == 0)
    def _project_kv():
        h = h_s[:]
        k_s[:] = jax.lax.dot_general(
            h, wk_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(k_s.dtype)
        v_s[:] = (jax.lax.dot_general(
            h, wv_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            + bv_ref[0].astype(jnp.float32)).astype(v_s.dtype)

    hq = h_s[pl.ds(i * bq, bq), :]
    qg = ((jax.lax.dot_general(hq, wq_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
           + bq_ref[0].astype(jnp.float32)) * scaling).astype(h_s.dtype)
    kg = k_s[:]
    vg = v_s[:]
    group = qg.shape[1]
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
        invj = 1.0 / jnp.sum(p, axis=1, keepdims=True)
        oj = jax.lax.dot_general(p.astype(qg.dtype), vg,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        og = oj if og is None else jnp.where(lane_head == j, oj, og)
        inv = invj if inv is None else jnp.where(lane_head == j, invj, inv)
    o_ref[0] = (og * inv).astype(o_ref.dtype)


def _fused_vmem_bytes(T: int, D: int, bq: int) -> int:
    """Rough per-core VMEM footprint of the fused kernel's resident set:
    double-buffered x block, LN scratch, K/V slabs, weight slices, and the
    per-head fp32 score block."""
    bf2, f4 = 2, 4
    return (2 * T * D * bf2            # x block (double-buffered)
            + T * D * bf2              # h_s
            + 2 * T * 128 * bf2        # k_s + v_s
            + 2 * 3 * D * 128 * bf2    # wq/wk/wv slices (double-buffered)
            + 2 * bq * T * f4          # score/prob temporaries
            + 2 * bq * 128 * bf2)      # out block


def _pick_bq(T: int, D: int) -> int | None:
    """Largest q-block (divisor of T, <= BLOCK_Q) whose resident set fits
    the VMEM budget — whisper-medium fits at bq=128 where 256 would not.
    Blocks under 128 rows (whisper-large would need bq=8) starve the MXU;
    those shapes keep the unfused hm path instead."""
    floor = min(128, T)
    for b in range(min(BLOCK_Q, T), floor - 1, -1):
        if T % b == 0 and _fused_vmem_bytes(T, D, b) <= FUSED_VMEM_BUDGET:
            return b
    return None


def fused_qkv_supported(T_padded: int, D: int, n_heads: int) -> bool:
    """Whether the fused LN+QKV+attention kernel fits this shape (VMEM
    budget + the head-group lane constraints shared with flash='hm')."""
    group = min(128, D)
    hd = D // n_heads
    if D % group or group % hd:
        return False
    if T_padded % 128:
        return False                    # chunked LN walks 128-row tiles
    return _pick_bq(T_padded, D) is not None


@functools.partial(jax.jit, static_argnames=("n_heads", "t_valid",
                                             "interpret"))
def encoder_attention_fused(x: jnp.ndarray, ln_scale: jnp.ndarray,
                            ln_bias: jnp.ndarray, wq: jnp.ndarray,
                            bq_: jnp.ndarray, wk: jnp.ndarray,
                            wv: jnp.ndarray, bv: jnp.ndarray,
                            *, n_heads: int, t_valid: int,
                            interpret: bool = False) -> jnp.ndarray:
    """Fused pre-LN + q/k/v projection + head-minor attention.

    x [B, T_pad, D] is the PRE-LN residual stream; returns the attention
    output [B, T_pad, D] (head-minor, pre-out-projection). Compared to the
    flash='hm' path this removes four [B, T, D] HBM round-trips per layer
    (h, q, k, v never exist in HBM) at identical MXU FLOPs: K/V slabs are
    projected once per (sample, head-group) into VMEM scratch and reused
    across q-blocks.

    Inference-only (no VJP), exact (fp32 LN and projection accumulation,
    fp32 softmax — parity-tested against the layer's unfused math in
    tests/test_flash_enc.py). Query rows >= t_valid are garbage the caller
    slices off; key columns >= t_valid are masked in-kernel. Gate shapes
    with fused_qkv_supported()."""
    B, T, D = x.shape
    bq = _pick_bq(T, D)
    group = min(128, D)
    hd = D // n_heads
    if D % group or group % hd:
        raise ValueError(
            f"fused-QKV needs head_dim ({hd}) to divide the {group}-lane "
            f"group and the group to divide d_model ({D})")
    if T % 128:
        raise ValueError(f"fused-QKV needs a 128-aligned padded T, got {T}")
    if bq is None:
        raise ValueError(
            f"fused-QKV resident set exceeds the VMEM budget at T={T}, "
            f"D={D}; gate with fused_qkv_supported()")
    per = group // hd
    scaling = float(hd) ** -0.5
    kernel = functools.partial(_fused_kernel, heads_per_group=per,
                               t_valid=t_valid, bq=bq, scaling=scaling)
    ln_scale2 = ln_scale.reshape(1, D)
    ln_bias2 = ln_bias.reshape(1, D)
    bq2 = bq_.reshape(1, D)
    bv2 = bv.reshape(1, D)
    return pl.pallas_call(
        kernel,
        grid=(B, D // group, T // bq),
        in_specs=[
            # x: whole sample, constant across (g, i) -> fetched once per b.
            pl.BlockSpec((1, T, D), lambda b, g, i: (b, 0, 0)),
            pl.BlockSpec((1, D), lambda b, g, i: (0, 0)),
            pl.BlockSpec((1, D), lambda b, g, i: (0, 0)),
            # Weight slices follow the head-group: [D, group] lanes.
            pl.BlockSpec((D, group), lambda b, g, i: (0, g)),
            pl.BlockSpec((1, group), lambda b, g, i: (0, g)),
            pl.BlockSpec((D, group), lambda b, g, i: (0, g)),
            pl.BlockSpec((D, group), lambda b, g, i: (0, g)),
            pl.BlockSpec((1, group), lambda b, g, i: (0, g)),
        ],
        out_specs=pl.BlockSpec((1, bq, group), lambda b, g, i: (b, i, g)),
        out_shape=jax.ShapeDtypeStruct((B, T, D), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((T, D), x.dtype),          # h_s: LN'd residual
            pltpu.VMEM((T, group), x.dtype),      # k_s
            pltpu.VMEM((T, group), x.dtype),      # v_s
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(x, ln_scale2, ln_bias2, wq, bq2, wk, wv, bv2)

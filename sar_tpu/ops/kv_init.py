"""Fused cross-KV projection + int8 quantization kernel (Pallas, TPU).

Why: building the decode cache (whisper.init_cache) is the third leg of
prep time (122.6 ms of the 578.6 ms whisper-small B=128 prep, PARITY.md
r03 profile). The XLA scan body runs per layer: GEMM -> bf16 K/V
materialized in HBM -> separate quantize pass (abs/max/div/round over
~3.5e9 elements) -> int8 store; the bf16 intermediates round-trip HBM
(~0.9 GB/layer of avoidable traffic) and the quantize pass is a separate
fusion. Head-minor slabs additionally paid a pad + scales transpose
(+70 ms measured, PARITY.md) — which is what kept the fused decode kernels
off the default path in round 3.

How: one kernel projects AND quantizes straight into the padded head-minor
layout the fused decode kernels (ops/decode_cross.py) consume:
- grid (L, G, B, S_pad/CS): per cell, the [CS, D] residual chunk is
  projected against this layer's [D, D/G] K and V weight column blocks
  (fp32 MXU accumulation, rounded to the compute dtype exactly like
  whisper.linear), quantized per (row, head) in VMEM, and stored int8 —
  the bf16 K/V never exist in HBM. G > 1 splits the OUTPUT columns into
  head-aligned groups so whisper-large's [1280, 1280] weight pair fits the
  double-buffered VMEM budget (G=1 for small/medium keeps one-shot rows);
  the residual chunk is re-streamed G times, the weight traffic is
  unchanged (L*G fetches of D*D/G).
- weight blocks are indexed by (l, g) alone, so Pallas re-fetches them only
  when those advance; the residual chunk streams once per (layer, group,
  chunk).
- per-head amax/scale runs on 64-lane head slices; the quantized head
  slices are reassembled by lane concatenation, one [CS, D/G] store per
  tensor per cell.
- rows >= t_valid (the 128-aligned layout padding) are zeroed with scale 0
  — the decode kernels key their padding mask on scale > 0 (strictly
  positive for real rows), same convention as whisper.init_cache's jnp
  body.

LoRA (routed/adapted decode): the cross_v projection may carry a
per-sample LoRA delta (the reference's Phase-2 banks adapt q_proj/v_proj
of ALL attentions — cross_v included — so round 4's kernel excluded
adapted banks entirely and routed decode paid the slow jnp cache build).
Pass `va` [L, B|1, D, r] / `vb` [L, B|1, r, D] (the bank slices gathered
ONCE per decode — the adapter index is frozen for the whole decode) and
`lora_scale`; the kernel computes delta = scale * (x @ va_lb) @ vb_lb in
VMEM ([D, r] + [r, D/G] blocks, ~50 KB at r=16) and adds it to the fp32 V
rows before the quantize — numerics match whisper.lora_delta's
bf16-intermediate einsums (u rounded to the compute dtype between the two
dots). cross_k is never adapted by the reference's target set; banks that
do adapt it keep the jnp body (see init_cache).

Numerics: identical quantization points to whisper.quantize_kv over the
jnp body's bf16 projections (fp32 accum -> bf16 round -> fp32 quantize
math) — parity-tested in tests/test_kv_init.py.

The reference has no custom kernels (SURVEY.md §2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-core VMEM budget for the resident set (x/w/y/out blocks, double-
# buffered where Pallas pipelines them) — 16 MB minus Mosaic headroom.
VMEM_BUDGET = 14 * 1024 * 1024


def _vmem_bytes(cs: int, d: int, dg: int, r: int) -> int:
    bf2, f4 = 2, 4
    v = (2 * cs * d * bf2          # x chunk (double-buffered)
         + 2 * 2 * d * dg * bf2    # wk + wv column blocks (double-buffered)
         + 2 * cs * dg * f4        # k/v fp32 GEMM results
         + 2 * 2 * cs * dg         # int8 outs (double-buffered)
         + 4 * cs * f4 * 32)       # scale columns / temporaries slack
    if r:
        v += 2 * 2 * (d * r + r * dg) * bf2 + cs * r * f4   # va/vb blocks + u
    return v


def _pick_plan(s_pad: int, d: int, n_heads: int,
               r: int = 0) -> tuple[int, int] | None:
    """Smallest head-aligned column-group count G (1 = whole rows) and the
    largest 128-multiple chunk CS of S_pad whose resident set fits VMEM."""
    hd = d // n_heads
    for g in (1, 2, 4, 8):
        if n_heads % g or (d // g) % 128:
            continue
        dg = d // g
        if dg % hd:
            continue
        for cs in range(min(512, s_pad), 127, -128):
            if s_pad % cs == 0 and _vmem_bytes(cs, d, dg, r) <= VMEM_BUDGET:
                return cs, g
    return None


def fused_kv_init_supported(s_pad: int, d: int, n_heads: int,
                            lora_rank: int = 0) -> bool:
    """Shape gate: 128-aligned S_pad, 64-lane-divisible heads, VMEM fit.
    whisper-small/medium fit at G=1; whisper-large fits at G=2 (the
    [1280, 640] column blocks halve the double-buffered weight residency)."""
    if s_pad % 128 or d % n_heads:
        return False
    hd = d // n_heads
    if hd % 8 or d % 128:
        return False
    return _pick_plan(s_pad, d, n_heads, lora_rank) is not None


def _quantize_rows(y32: jnp.ndarray, n_heads: int, rowmask: jnp.ndarray,
                   cdt) -> tuple[jnp.ndarray, jnp.ndarray]:
    """y32 [CS, DG] fp32 GEMM result -> (int8 values [CS, DG], scales
    [CS, HG] fp32), per-(row, head) symmetric int8 exactly like
    whisper.quantize_kv over the bf16-rounded projection. `rowmask` is a
    [CS, 1] valid-row column, `n_heads` the heads within THIS column group."""
    cs, dg = y32.shape
    hd = dg // n_heads
    # Round through the compute dtype first: the jnp body quantizes the
    # BF16 projection (linear() emits x.dtype), so the kernel must too.
    yf = y32.astype(cdt).astype(jnp.float32)
    ay = jnp.abs(yf)
    scales = []
    qs = []
    for h in range(n_heads):
        sl = slice(h * hd, (h + 1) * hd)
        amax = jnp.max(ay[:, sl], axis=1, keepdims=True)       # [CS, 1]
        scale = jnp.maximum(amax, 1e-8) / 127.0
        qh = jnp.clip(jnp.round(yf[:, sl] / scale), -127, 127)
        qs.append(qh)
        scales.append(scale)
    q = jnp.concatenate(qs, axis=1)                            # [CS, DG] f32
    q = jnp.where(rowmask, q, 0.0).astype(jnp.int8)
    scale_mat = jnp.concatenate(scales, axis=1)                # [CS, HG]
    scale_mat = jnp.where(rowmask, scale_mat, 0.0)
    return q, scale_mat


def _cell_body(x, wk, wv, bv, kq_ref, ks_ref, vq_ref, vs_ref, v_extra32,
               *, nh_blk: int, t_valid: int, cs: int):
    """Shared per-grid-cell math: project the [CS, D] chunk against the
    [D, DG] weight blocks, add `v_extra32` (fp32 LoRA delta or 0) to V,
    quantize, store."""
    c = pl.program_id(3)
    cdt = x.dtype
    row = c * cs + jax.lax.broadcasted_iota(jnp.int32, (cs, 1), 0)
    rowmask = row < t_valid

    k32 = jax.lax.dot_general(x, wk, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    kq, ksc = _quantize_rows(k32, nh_blk, rowmask, cdt)
    kq_ref[0, 0] = kq
    ks_ref[0, 0, 0] = ksc.T                                    # [HG, CS]

    v32 = (jax.lax.dot_general(x, wv, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
           + bv.astype(jnp.float32))
    if v_extra32 is not None:
        v32 = v32 + v_extra32
    vq, vsc = _quantize_rows(v32, nh_blk, rowmask, cdt)
    vq_ref[0, 0] = vq
    vs_ref[0, 0, 0] = vsc.T


def _kernel(x_ref, wk_ref, wv_ref, bv_ref, kq_ref, ks_ref, vq_ref, vs_ref,
            *, nh_blk: int, t_valid: int, cs: int):
    _cell_body(x_ref[0], wk_ref[0], wv_ref[0], bv_ref[0, 0],
               kq_ref, ks_ref, vq_ref, vs_ref, None,
               nh_blk=nh_blk, t_valid=t_valid, cs=cs)


def _kernel_lora(x_ref, wk_ref, wv_ref, bv_ref, va_ref, vb_ref,
                 kq_ref, ks_ref, vq_ref, vs_ref,
                 *, nh_blk: int, t_valid: int, cs: int, lora_scale: float):
    x = x_ref[0]
    cdt = x.dtype
    # whisper.lora_delta numerics: both dots accumulate fp32 on the MXU but
    # the rank-space intermediate is rounded to the compute dtype between
    # them (einsum emits x.dtype), and the scale multiplies in fp32.
    u = jax.lax.dot_general(x, va_ref[0, 0], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32).astype(cdt)
    d32 = jax.lax.dot_general(u, vb_ref[0, 0], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    _cell_body(x, wk_ref[0], wv_ref[0], bv_ref[0, 0],
               kq_ref, ks_ref, vq_ref, vs_ref, lora_scale * d32,
               nh_blk=nh_blk, t_valid=t_valid, cs=cs)


@functools.partial(jax.jit, static_argnames=("n_heads", "t_valid",
                                             "lora_scale", "interpret"))
def fused_kv_init(enc_pad: jnp.ndarray, wk: jnp.ndarray, wv: jnp.ndarray,
                  bv: jnp.ndarray, *, n_heads: int, t_valid: int,
                  va: jnp.ndarray | None = None,
                  vb: jnp.ndarray | None = None,
                  lora_scale: float = 1.0,
                  interpret: bool = False):
    """enc_pad [B, S_pad, D] (rows >= t_valid zero), wk/wv [L, D, D],
    bv [L, D] -> (kq [L, B, S_pad, D] s8, ks [L, B, H, S_pad] f32,
    vq, vs) — the head-minor DecodeCache cross fields.

    `va` [L, B|1, D, r] / `vb` [L, B|1, r, D]: optional per-sample cross_v
    LoRA slices (adapter bank gathered by the decode's frozen adapter
    index; a singleton batch dim broadcasts one adapter over the batch).

    Gate shapes with fused_kv_init_supported()."""
    B, S_pad, D = enc_pad.shape
    L = wk.shape[0]
    H = n_heads
    hd = D // H
    r = va.shape[-1] if va is not None else 0
    plan = _pick_plan(S_pad, D, H, r)
    if plan is None or S_pad % 128 or D % 128:
        raise ValueError(
            f"fused_kv_init unsupported at S_pad={S_pad}, D={D}, r={r}; "
            "gate with fused_kv_init_supported()")
    cs, G = plan
    DG = D // G
    nh_blk = DG // hd
    # [L, 1, D] so the bias block's trailing two dims satisfy the TPU
    # block-shape rule (a [L, D] block (1, D) has an illegal 1-row tile).
    bv3 = bv.reshape(L, 1, D)
    grid = (L, G, B, S_pad // cs)
    in_specs = [
        pl.BlockSpec((1, cs, D), lambda l, g, b, c: (b, c, 0)),
        pl.BlockSpec((1, D, DG), lambda l, g, b, c: (l, 0, g)),
        pl.BlockSpec((1, D, DG), lambda l, g, b, c: (l, 0, g)),
        pl.BlockSpec((1, 1, DG), lambda l, g, b, c: (l, 0, g)),
    ]
    operands = [enc_pad, wk, wv, bv3]
    if va is not None:
        Bv = va.shape[1]
        bmap = (lambda b: b) if Bv > 1 else (lambda b: 0)
        in_specs += [
            pl.BlockSpec((1, 1, D, r), lambda l, g, b, c: (l, bmap(b), 0, 0)),
            pl.BlockSpec((1, 1, r, DG), lambda l, g, b, c: (l, bmap(b), 0, g)),
        ]
        operands += [va, vb]
        kernel = functools.partial(_kernel_lora, nh_blk=nh_blk,
                                   t_valid=t_valid, cs=cs,
                                   lora_scale=lora_scale)
    else:
        kernel = functools.partial(_kernel, nh_blk=nh_blk, t_valid=t_valid,
                                   cs=cs)
    # Scales carry an explicit G axis so the block's second-minor dim equals
    # the full array dim (nh_blk) — a (1, 1, nh_blk, cs) block over
    # [L, B, H, S_pad] is an ILLEGAL TPU tiling when G > 1 (nh_blk is then
    # neither 8-divisible nor the whole H, e.g. 10 of 20 at whisper-large).
    # G * nh_blk = H on adjacent axes, so the reshape back is free.
    kq, ks, vq, vs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, cs, DG), lambda l, g, b, c: (l, b, c, g)),
            pl.BlockSpec((1, 1, 1, nh_blk, cs),
                         lambda l, g, b, c: (l, b, g, 0, c)),
            pl.BlockSpec((1, 1, cs, DG), lambda l, g, b, c: (l, b, c, g)),
            pl.BlockSpec((1, 1, 1, nh_blk, cs),
                         lambda l, g, b, c: (l, b, g, 0, c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, B, S_pad, D), jnp.int8),
            jax.ShapeDtypeStruct((L, B, G, nh_blk, S_pad), jnp.float32),
            jax.ShapeDtypeStruct((L, B, S_pad, D), jnp.int8),
            jax.ShapeDtypeStruct((L, B, G, nh_blk, S_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 4),
        interpret=interpret,
    )(*operands)
    return (kq, ks.reshape(L, B, H, S_pad), vq, vs.reshape(L, B, H, S_pad))

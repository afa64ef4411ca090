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
- grid (L, B, S_pad/CS): per cell, the [CS, D] residual chunk is projected
  against this layer's [D, D] K and V weights (fp32 MXU accumulation,
  rounded to the compute dtype exactly like whisper.linear), quantized
  per (row, head) in VMEM, and stored int8 — the bf16 K/V never exist in
  HBM.
- weight blocks are indexed by `l` alone, so Pallas re-fetches them only
  when the layer advances (L fetches total); the residual chunk streams
  once per (layer, chunk) — the same traffic XLA's per-layer GEMMs pay.
- per-head amax/scale runs on 64-lane head slices; the quantized head
  slices are reassembled by lane concatenation, one [CS, D] store per
  tensor per cell.
- rows >= t_valid (the 128-aligned layout padding) are zeroed with scale 0
  — the decode kernels key their padding mask on scale > 0 (strictly
  positive for real rows), same convention as whisper.init_cache's jnp
  body.

Numerics: identical quantization points to whisper.quantize_kv over the
jnp body's bf16 projections (fp32 accum -> bf16 round -> fp32 quantize
math) — parity-tested in tests/test_kv_init.py.

Scope: inference cache build, no LoRA on cross_k/cross_v (adapted banks
keep the jnp body — the reference's Phase-2 banks adapt q/v of ALL
attentions, so routed decode falls back automatically; see init_cache).
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


def _vmem_bytes(cs: int, d: int) -> int:
    bf2, f4 = 2, 4
    return (2 * cs * d * bf2          # x chunk (double-buffered)
            + 2 * 2 * d * d * bf2     # wk + wv (double-buffered)
            + 2 * cs * d * f4         # k/v fp32 GEMM results
            + 2 * 2 * cs * d          # int8 outs (double-buffered)
            + 4 * cs * f4 * 32)       # scale columns / temporaries slack


def _pick_cs(s_pad: int, d: int) -> int | None:
    """Largest 128-multiple chunk of S_pad whose resident set fits."""
    for cs in range(min(512, s_pad), 127, -128):
        if s_pad % cs == 0 and _vmem_bytes(cs, d) <= VMEM_BUDGET:
            return cs
    return None


def fused_kv_init_supported(s_pad: int, d: int, n_heads: int) -> bool:
    """Shape gate: 128-aligned S_pad, 64-lane-divisible heads, VMEM fit
    (whisper-small and -medium fit; whisper-large's double-buffered
    [1280, 1280] weight pair alone exceeds the budget — it keeps the jnp
    body)."""
    if s_pad % 128 or d % n_heads:
        return False
    hd = d // n_heads
    if hd % 8 or d % 128:
        return False
    return _pick_cs(s_pad, d) is not None


def _quantize_rows(y32: jnp.ndarray, n_heads: int, rowmask: jnp.ndarray,
                   cdt) -> tuple[jnp.ndarray, jnp.ndarray]:
    """y32 [CS, D] fp32 GEMM result -> (int8 values [CS, D], scales
    [CS, H] fp32), per-(row, head) symmetric int8 exactly like
    whisper.quantize_kv over the bf16-rounded projection."""
    cs, d = y32.shape
    hd = d // n_heads
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
    q = jnp.concatenate(qs, axis=1)                            # [CS, D] f32
    q = jnp.where(rowmask, q, 0.0).astype(jnp.int8)
    scale_mat = jnp.concatenate(scales, axis=1)                # [CS, H]
    scale_mat = jnp.where(rowmask[:, :n_heads], scale_mat, 0.0)
    return q, scale_mat


def _kernel(x_ref, wk_ref, wv_ref, bv_ref, kq_ref, ks_ref, vq_ref, vs_ref,
            *, n_heads: int, t_valid: int, cs: int):
    c = pl.program_id(2)
    x = x_ref[0]                                               # [CS, D] bf16
    cdt = x.dtype
    row = c * cs + jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    rowmask = row < t_valid

    k32 = jax.lax.dot_general(x, wk_ref[0], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    kq, ksc = _quantize_rows(k32, n_heads, rowmask, cdt)
    kq_ref[0, 0] = kq
    ks_ref[0, 0] = ksc.T                                       # [H, CS]

    v32 = (jax.lax.dot_general(x, wv_ref[0], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
           + bv_ref[0, 0].astype(jnp.float32))
    vq, vsc = _quantize_rows(v32, n_heads, rowmask, cdt)
    vq_ref[0, 0] = vq
    vs_ref[0, 0] = vsc.T


@functools.partial(jax.jit, static_argnames=("n_heads", "t_valid",
                                             "interpret"))
def fused_kv_init(enc_pad: jnp.ndarray, wk: jnp.ndarray, wv: jnp.ndarray,
                  bv: jnp.ndarray, *, n_heads: int, t_valid: int,
                  interpret: bool = False):
    """enc_pad [B, S_pad, D] (rows >= t_valid zero), wk/wv [L, D, D],
    bv [L, D] -> (kq [L, B, S_pad, D] s8, ks [L, B, H, S_pad] f32,
    vq, vs) — the head-minor DecodeCache cross fields.

    Gate shapes with fused_kv_init_supported()."""
    B, S_pad, D = enc_pad.shape
    L = wk.shape[0]
    H = n_heads
    cs = _pick_cs(S_pad, D)
    if cs is None or S_pad % 128 or D % 128:
        raise ValueError(
            f"fused_kv_init unsupported at S_pad={S_pad}, D={D}; gate with "
            "fused_kv_init_supported()")
    kernel = functools.partial(_kernel, n_heads=H, t_valid=t_valid, cs=cs)
    # [L, 1, D] so the bias block's trailing two dims satisfy the TPU
    # block-shape rule (a [L, D] block (1, D) has an illegal 1-row tile).
    bv3 = bv.reshape(L, 1, D)
    grid = (L, B, S_pad // cs)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, cs, D), lambda l, b, c: (b, c, 0)),
            pl.BlockSpec((1, D, D), lambda l, b, c: (l, 0, 0)),
            pl.BlockSpec((1, D, D), lambda l, b, c: (l, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda l, b, c: (l, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, cs, D), lambda l, b, c: (l, b, c, 0)),
            pl.BlockSpec((1, 1, H, cs), lambda l, b, c: (l, b, 0, c)),
            pl.BlockSpec((1, 1, cs, D), lambda l, b, c: (l, b, c, 0)),
            pl.BlockSpec((1, 1, H, cs), lambda l, b, c: (l, b, 0, c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, B, S_pad, D), jnp.int8),
            jax.ShapeDtypeStruct((L, B, H, S_pad), jnp.float32),
            jax.ShapeDtypeStruct((L, B, S_pad, D), jnp.int8),
            jax.ShapeDtypeStruct((L, B, H, S_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(enc_pad, wk, wv, bv3)

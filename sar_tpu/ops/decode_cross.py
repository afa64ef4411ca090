"""Fused int8-MXU cross-attention decode kernel (Pallas, TPU).

Why: the autoregressive decode step is bandwidth-bound on streaming the
cross-attention K/V cache (S=1500 per layer) — at whisper-small batch 128 it
is ~6 of the ~8 ms/token step (component profile, PARITY.md). XLA's int8
path must dequantize the slabs to bf16 on the VPU before the MXU dots, and
that conversion (~3.5e9 elements/step) sits on the critical path; XLA's
s8 einsum (`scores_int8`) is slower still because it won't map an
s8 GEMV onto the MXU. This kernel keeps the s8 tensors s8: both
contractions run native int8 x int8 -> int32 on the MXU, and the only VPU
work is on the tiny [H, S] score plane.

How (one grid cell per batch row; everything stays 2-D for Mosaic):
- the cache layout (whisper.DecodeCache) is head-minor [B, S_pad, H*hd]:
  one contiguous lane-aligned slab per sample, scales head-major [H, S_pad].
- queries (pre-quantized per head, [B, H*hd] s8 + [B, H, 1] f32 scales)
  become a block-diagonal [H, D] matrix via iota masks — no transposes.
- scores^T [H, S_pad] = Qrows @ K^T (s8 MXU, lane-contracted on both sides),
  scaled by q/k scales, padding masked, softmax along lanes.
- probs are folded with the V scales and re-quantized per head ([H,1]
  scale), then P @ V (s8 MXU) -> [H, D]; the per-head diagonal [hd] blocks
  are extracted with an iota mask + sublane reduction -> [1, D] out row.

Numerics match whisper._cross_attention_int8_mxu (the jnp twin used on CPU
and in interpret-mode parity tests): q and probs quantization make this an
approximation of the exact-int8-KV path — it ships behind the same
`scores_int8` opt-in, gated on the benchmark's token-agreement harness
(PARITY.md known-deviations).

This module also holds the EXACT-compute sibling (`_kernel_exact` /
`cross_decode_attention_exact`, round 4): the same per-sample slab
streaming and beam folding, but K/V dequantized in VMEM and q/probs never
quantized — bit-compatible quantization points with the classic
`whisper._attention_int8` einsum path. That one IS the default TPU decode
kernel (whisper.decode_step picks it whenever the cache is head-minor and
scores_int8 is off); it exists because XLA's exact path pays the int8->bf16
slab conversion on the critical path (~3.5e9 elements/step) while the
kernel overlaps it with the next cell's DMA.

The reference has no custom kernels (SURVEY.md §2); its decode is
HF generate on torch/CUDA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30  # python float: jnp scalars would be captured consts in Pallas


def _kernel(qq_ref, qs_ref, kq_ref, ks_ref, vq_ref, vs_ref, o_ref,
            *, n_heads: int, head_dim: int, beam_width: int):
    H, hd, K = n_heads, head_dim, beam_width
    D = H * hd
    S = kq_ref.shape[-2]

    # Block-diagonal query rows: Qrows[k*H + h, 64h:64h+64] = q_{k,h} (s8) —
    # the K beam queries of a sample share its K/V slab, so they ride as
    # extra rows of the SAME two MXU contractions (K=1 is the greedy case).
    # The select runs in f32 (i1 masks carry the (8,128) tile; selecting s8
    # directly would need an unsupported (32,128) mask relayout) and the
    # integer-valued result is then cast to s8.
    col_head = jax.lax.broadcasted_iota(jnp.int32, (K * H, D), 1) // hd
    row_head = jax.lax.broadcasted_iota(jnp.int32, (K * H, D), 0) % H
    q = qq_ref[0].astype(jnp.float32)                   # [K, D]
    q = jnp.broadcast_to(q[:, None, :], (K, H, D)).reshape(K * H, D)
    qrows = jnp.where(col_head == row_head, q, 0.0).astype(jnp.int8)

    # scores^T [K*H, S]: lane-contraction on both operands (A @ B^T), s8 MXU.
    st = jax.lax.dot_general(qrows, kq_ref[0, 0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.int32)
    ks = ks_ref[0, 0]                                   # [H, S]
    ks_t = (jnp.broadcast_to(ks[None], (K, H, S)).reshape(K * H, S)
            if K > 1 else ks)
    st = st.astype(jnp.float32) * qs_ref[0] * ks_t
    # Layout padding carries key scale 0 (real scales are strictly
    # positive) — masking on the scales stays correct for any true S.
    st = jnp.where(ks_t > 0, st, NEG)

    m = jnp.max(st, axis=1, keepdims=True)
    p = jnp.exp(st - m)
    vs = vs_ref[0, 0]
    vs_t = (jnp.broadcast_to(vs[None], (K, H, S)).reshape(K * H, S)
            if K > 1 else vs)
    pw = (p / jnp.sum(p, axis=1, keepdims=True)) * vs_t

    # Re-quantize the weighted probs per row and run P @ V on the s8 MXU.
    ps = jnp.maximum(jnp.max(jnp.abs(pw), axis=1, keepdims=True), 1e-8) / 127.0
    pq = jnp.clip(jnp.round(pw / ps), -127, 127).astype(jnp.int8)
    o = jax.lax.dot_general(pq, vq_ref[0, 0], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    o = o.astype(jnp.float32) * ps                      # [K*H, D]

    # Keep each row's own head block (col_head == row_head), fold the H
    # rows of each beam to one [D] row.
    o = jnp.where(col_head == row_head, o, 0.0)
    o = o.reshape(K, H, D)
    o_ref[0] = jnp.sum(o, axis=1).astype(o_ref.dtype)   # [K, D]


@functools.partial(jax.jit,
                   static_argnames=("layer", "n_heads", "out_dtype",
                                    "interpret", "beam_width"))
def cross_decode_attention(qq: jnp.ndarray, qs: jnp.ndarray,
                           kq: jnp.ndarray, ks: jnp.ndarray,
                           vq: jnp.ndarray, vs: jnp.ndarray,
                           *, layer: int, n_heads: int,
                           out_dtype=jnp.bfloat16,
                           interpret: bool = False,
                           beam_width: int = 1) -> jnp.ndarray:
    """One decode step of cross-attention for a whole batch.

    qq [B, D] s8 (pre-quantized per head, pre-scaled q) + qs [B, H, 1] f32;
    kq/vq [L, B, S_pad, D] s8 and ks/vs [L, B, H, S_pad] f32 are the FULL
    stacked cache — `layer` picks the plane via a static BlockSpec offset,
    so no per-layer slice/reshape buffer is ever materialized (feeding a
    sliced operand to pallas_call would copy the 100s-of-MB slab every
    step). Returns [B, D]. Layout padding (key scale 0) is masked inside
    the kernel — real scales are strictly positive.

    `beam_width` K > 1: qq is [B, K, D] s8 with qs [B, K*H, 1] (the K beam
    queries of each sample, already beam-folded — decode_step's layout),
    the cache stays ONE slab per sample, and the kernel streams it once
    for all K beams; returns [B, K, D].
    """
    folded = qq.ndim == 3
    K = beam_width
    if folded:
        B, _, D = qq.shape
    else:
        B, D = qq.shape
    H = n_heads
    hd = D // H
    S = kq.shape[2]
    l = layer

    kernel = functools.partial(_kernel, n_heads=H, head_dim=hd,
                               beam_width=K)
    # q/out carry a K-row axis (singleton for greedy) so every block's
    # trailing two dims match the array dims (Pallas TPU block-shape rule).
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, K, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, K * H, 1), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, S, D), lambda b: (l, b, 0, 0)),
            pl.BlockSpec((1, 1, H, S), lambda b: (l, b, 0, 0)),
            pl.BlockSpec((1, 1, S, D), lambda b: (l, b, 0, 0)),
            pl.BlockSpec((1, 1, H, S), lambda b: (l, b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, K, D), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, K, D), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(qq if folded else qq[:, None, :], qs, kq, ks, vq, vs)
    return out if folded else out[:, 0]


def _kernel_exact(q_ref, kq_ref, ks_ref, vq_ref, vs_ref, o_ref,
                  *, n_heads: int, head_dim: int, beam_width: int):
    """Exact-compute twin of `_kernel`: K/V arrive int8 (the HBM traffic win
    is identical) but are dequantized IN VMEM to q's dtype (bf16 in
    production, f32 in tests) and both contractions run on the MXU with
    fp32 accumulation; q and the softmax probabilities are never quantized.
    Numerics match the default `whisper._cross_attention_int8` jnp path
    (same quantization points: int8 K/V with per-row scales factored out of
    the dots, fp32 softmax) — this makes the fused streaming kernel usable
    on the DEFAULT decode path, not just behind the scores_int8 opt-in.
    The dequant casts are VMEM-local VPU work overlapped with the next
    cell's slab DMA; the slabs never round-trip HBM dequantized."""
    H, hd, K = n_heads, head_dim, beam_width
    D = H * hd
    S = kq_ref.shape[-2]

    cdt = q_ref.dtype        # compute dtype (bf16 in production, f32 tests)

    col_head = jax.lax.broadcasted_iota(jnp.int32, (K * H, D), 1) // hd
    row_head = jax.lax.broadcasted_iota(jnp.int32, (K * H, D), 0) % H
    q = q_ref[0].astype(jnp.float32)                    # [K, D]
    q = jnp.broadcast_to(q[:, None, :], (K, H, D)).reshape(K * H, D)
    qrows = jnp.where(col_head == row_head, q, 0.0).astype(cdt)

    kbf = kq_ref[0, 0].astype(cdt)                      # [S, D] dequant core
    st = jax.lax.dot_general(qrows, kbf, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ks = ks_ref[0, 0]                                   # [H, S]
    ks_t = (jnp.broadcast_to(ks[None], (K, H, S)).reshape(K * H, S)
            if K > 1 else ks)
    st = st * ks_t
    st = jnp.where(ks_t > 0, st, NEG)

    m = jnp.max(st, axis=1, keepdims=True)
    p = jnp.exp(st - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    vs = vs_ref[0, 0]
    vs_t = (jnp.broadcast_to(vs[None], (K, H, S)).reshape(K * H, S)
            if K > 1 else vs)
    pw = (p * vs_t).astype(cdt)

    vbf = vq_ref[0, 0].astype(cdt)
    o = jax.lax.dot_general(pw, vbf, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)   # [K*H, D]

    o = jnp.where(col_head == row_head, o, 0.0)
    o = o.reshape(K, H, D)
    o_ref[0] = jnp.sum(o, axis=1).astype(o_ref.dtype)   # [K, D]


@functools.partial(jax.jit,
                   static_argnames=("layer", "n_heads", "out_dtype",
                                    "interpret", "beam_width"))
def cross_decode_attention_exact(q: jnp.ndarray,
                                 kq: jnp.ndarray, ks: jnp.ndarray,
                                 vq: jnp.ndarray, vs: jnp.ndarray,
                                 *, layer: int, n_heads: int,
                                 out_dtype=jnp.bfloat16,
                                 interpret: bool = False,
                                 beam_width: int = 1) -> jnp.ndarray:
    """Exact-compute decode step of cross-attention for a whole batch.

    Same operands and layout as `cross_decode_attention` except q arrives
    bf16 UN-quantized: q [B, D] (pre-scaled by head_dim**-0.5), or beam-
    folded [B, K, D]. kq/vq [L, B, S_pad, D] s8 with ks/vs [L, B, H, S_pad]
    f32 per-row scales (head-minor cache built by
    init_cache(head_minor=True)). Returns [B, D] (or [B, K, D]).

    This is the DEFAULT TPU decode kernel (wired in whisper.decode_step
    when the cache is head-minor and scores_int8 is off): it streams each
    sample's int8 slab once per step at the s8 kernel's traffic while
    computing bit-compatible math with the classic exact-int8 path."""
    folded = q.ndim == 3
    K = beam_width
    B = q.shape[0]
    D = q.shape[-1]
    H = n_heads
    hd = D // H
    S = kq.shape[2]
    l = layer

    kernel = functools.partial(_kernel_exact, n_heads=H, head_dim=hd,
                               beam_width=K)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, K, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, S, D), lambda b: (l, b, 0, 0)),
            pl.BlockSpec((1, 1, H, S), lambda b: (l, b, 0, 0)),
            pl.BlockSpec((1, 1, S, D), lambda b: (l, b, 0, 0)),
            pl.BlockSpec((1, 1, H, S), lambda b: (l, b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, K, D), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, K, D), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(q if folded else q[:, None, :], kq, ks, vq, vs)
    return out if folded else out[:, 0]


def cross_decode_reference_exact(q, kq, ks, vq, vs, *, layer, n_heads,
                                 out_dtype=jnp.bfloat16):
    """jnp reference for the exact kernel (parity tests): identical
    quantization points — int8 K/V dequantized via casts to q's dtype with
    scales factored out, fp32 softmax, q/probs never quantized (the same
    math as whisper._cross_attention_int8). Accepts the beam-folded layout
    (q [B, K, D])."""
    kq, ks, vq, vs = kq[layer], ks[layer], vq[layer], vs[layer]
    H = n_heads
    cdt = q.dtype
    if q.ndim == 3:
        B, K, D = q.shape
        hd = D // H
        S = kq.shape[1]
        qf = q.reshape(B, K, H, hd)
        kf = kq.reshape(B, S, H, hd).astype(cdt)
        st = jnp.einsum("bkhd,bshd->bkhs", qf, kf,
                        preferred_element_type=jnp.float32) * ks[:, None]
        st = jnp.where(ks[:, None] > 0, st, NEG)
        p = jax.nn.softmax(st, axis=-1)
        pw = (p * vs[:, None]).astype(cdt)
        vf = vq.reshape(B, S, H, hd).astype(cdt)
        o = jnp.einsum("bkhs,bshd->bkhd", pw, vf,
                       preferred_element_type=jnp.float32)
        return o.reshape(B, K, D).astype(out_dtype)
    B, D = q.shape
    hd = D // H
    S = kq.shape[1]
    qf = q.reshape(B, H, hd)
    kf = kq.reshape(B, S, H, hd).astype(cdt)
    st = jnp.einsum("bhd,bshd->bhs", qf, kf,
                    preferred_element_type=jnp.float32) * ks
    st = jnp.where(ks > 0, st, NEG)
    p = jax.nn.softmax(st, axis=-1)
    pw = (p * vs).astype(cdt)
    vf = vq.reshape(B, S, H, hd).astype(cdt)
    o = jnp.einsum("bhs,bshd->bhd", pw, vf,
                   preferred_element_type=jnp.float32)
    return o.reshape(B, D).astype(out_dtype)


def cross_decode_reference(qq, qs, kq, ks, vq, vs, *, layer, n_heads,
                           out_dtype=jnp.bfloat16):
    """jnp reference with identical quantization points (parity tests).
    Accepts the beam-folded layout too (qq [B, K, D], qs [B, K*H, 1])."""
    kq, ks, vq, vs = kq[layer], ks[layer], vq[layer], vs[layer]
    H = n_heads
    if qq.ndim == 3:                       # beam-folded: per-beam rows
        B, K, D = qq.shape
        hd = D // H
        S = kq.shape[1]
        qf = (qq.reshape(B, K, H, hd).astype(jnp.float32)
              * qs.reshape(B, K, H, 1))                     # [B, K, H, hd]
        kf = kq.reshape(B, S, H, hd).astype(jnp.float32)
        st = jnp.einsum("bkhd,bshd->bkhs", qf, kf) * ks[:, None]
        st = jnp.where(ks[:, None] > 0, st, NEG)
        p = jax.nn.softmax(st, axis=-1)
        pw = p * vs[:, None]
        pscale = jnp.maximum(jnp.max(jnp.abs(pw), -1, keepdims=True),
                             1e-8) / 127.0
        pqq = jnp.clip(jnp.round(pw / pscale), -127, 127)
        vf = vq.reshape(B, S, H, hd).astype(jnp.float32)
        o = jnp.einsum("bkhs,bshd->bkhd", pqq, vf) * pscale
        return o.reshape(B, K, D).astype(out_dtype)
    B, D = qq.shape
    hd = D // H
    S = kq.shape[1]
    qf = qq.reshape(B, H, hd).astype(jnp.float32) * qs      # [B, H, hd]
    kf = kq.reshape(B, S, H, hd).astype(jnp.float32)
    st = jnp.einsum("bhd,bshd->bhs", qf, kf) * ks
    st = jnp.where(ks > 0, st, NEG)
    p = jax.nn.softmax(st, axis=-1)
    pw = p * vs
    pscale = jnp.maximum(jnp.max(jnp.abs(pw), -1, keepdims=True), 1e-8) / 127.0
    pqq = jnp.clip(jnp.round(pw / pscale), -127, 127)
    vf = vq.reshape(B, S, H, hd).astype(jnp.float32)
    o = jnp.einsum("bhs,bshd->bhd", pqq, vf) * pscale
    return o.reshape(B, D).astype(out_dtype)

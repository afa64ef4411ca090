"""Flash (blockwise, never-materialized) multi-head attention for training
and batch inference.

Why: the plain attention path materializes [B, H, Tq, Tk] scores/probs in
fp32 — for the whisper encoder (Tq = Tk = 1500) that is the dominant memory
term on both sides of the graph: the non-remat training backward holds 21 GB
of probs for whisper-small at batch 16 (forcing gradient checkpointing,
whisper.py:_remat), and the whisper-large batch-32 *forward* peaks at
2 x 5.8 GB of transient fp32 scores per layer (the round-1 decode-bench OOM).
Blockwise attention streams K/V tiles through VMEM with a running softmax, so
the [Tq, Tk] plane never exists in HBM, in either direction.

How: jax's bundled Pallas TPU kernel
(jax.experimental.pallas.ops.tpu.flash_attention) — forward AND backward
(custom VJP) — which is the idiomatic TPU building block; this module owns
the whisper-specific part: Whisper's sequence lengths (1500 encoder
positions, label lengths like 224) are not multiples of the 128-lane tile,
so q/k/v are zero-padded to the tile and masked with segment ids (pad
positions get segment 0, real positions 1 — pads only attend to pads, real
rows are exact). The jnp reference path stays in whisper.attention; parity
is tested in interpret mode on CPU (tests/test_flash.py).

The reference has no kernels at all — its attention is whatever HF/torch
dispatches (SURVEY.md §2: "no native code, no custom kernels").
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


_TILE = 128

# Tile sizes for the kernel grid (fwd and bwd). Swept on v5e at whisper-small
# training shapes (B=16, Tq=Tk=1536, hd=64): q=1536/k=768 won (500 ms/step
# vs 532 at 512/512 and 689 at 256/256; 1536/1536 exhausts VMEM). See
# PARITY.md for the full sweep (whisper-medium/large rows under "Round-4
# training-path grid"). Env overrides exist for sweeps on new hardware/
# widths; the committed defaults are the measured optimum across all three
# whisper sizes.
BLOCK_Q = int(os.environ.get("SAR_FLASH_BLOCK_Q", 1536))
BLOCK_K = int(os.environ.get("SAR_FLASH_BLOCK_K", 768))


def _pad_len(t: int) -> int:
    return -(-t // _TILE) * _TILE


def flash_mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
              causal: bool = False) -> jnp.ndarray:
    """Blockwise attention: q [B,H,Tq,hd] x k/v [B,H,Tk,hd] -> [B,H,Tq,hd].

    `q` must already carry the 1/sqrt(hd) scaling (same convention as
    whisper.attention). Handles non-tile-aligned Tq/Tk by zero-padding with
    segment-id masking; `causal` uses absolute positions, so end-padding
    does not disturb the causal pattern of real rows.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)

    B, H, Tq, hd = q.shape
    Tk = k.shape[2]
    Tqp, Tkp = _pad_len(Tq), _pad_len(Tk)
    if Tqp != Tq:
        q = jnp.pad(q, [(0, 0), (0, 0), (0, Tqp - Tq), (0, 0)])
    if Tkp != Tk:
        k = jnp.pad(k, [(0, 0), (0, 0), (0, Tkp - Tk), (0, 0)])
        v = jnp.pad(v, [(0, 0), (0, 0), (0, Tkp - Tk), (0, 0)])

    seg = None
    if Tqp != Tq or Tkp != Tk:
        seg_q = (jnp.arange(Tqp) < Tq).astype(jnp.int32)
        seg_kv = (jnp.arange(Tkp) < Tk).astype(jnp.int32)
        seg = SegmentIds(q=jnp.broadcast_to(seg_q[None], (B, Tqp)),
                         kv=jnp.broadcast_to(seg_kv[None], (B, Tkp)))

    bq, bk = min(BLOCK_Q, Tqp), min(BLOCK_K, Tkp)
    bs = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk,
        block_k_dkv=bk, block_q_dkv=bq,
        block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )
    out = flash_attention(q, k, v, segment_ids=seg, causal=causal,
                          sm_scale=1.0, block_sizes=bs)
    return out[:, :, :Tq] if Tqp != Tq else out

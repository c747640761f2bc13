"""Fused multi-head self-attention for the ViT backbone.

XLA's default attention materializes the (B, H, T, T) score matrix in HBM -
at T=1025 tokens (512px ViT-B/16) that is ~100 MB per layer per direction,
and it dominates the backbone step time. This wraps the Pallas TPU
flash-attention kernel (tiled online-softmax, scores never leave VMEM) with:
  * automatic padding of T to the kernel's block multiple, masked via
    segment ids so padded keys contribute exactly nothing;
  * a jnp fallback on non-TPU backends (tests run it on CPU).

MEASURED VERDICT (v5e, B=4, H=12, T=1025, d=64, bf16; 12-block ViT body):
  * XLA einsum+softmax: 8.8 ms body (attention share ~3.8 ms, ~0.32 ms/layer)
  * stock Pallas flash_attention (best block config): 12.9 ms body
  * custom online-softmax kernel (B*H folded, blk 576/576, this repo's
    experiment): 10.1 ms body
XLA wins at this scale: its fused HLO pipelines the short-T attention better
than either kernel, and d=64 wastes half the lanes in a Pallas tile. The
DEFAULT is therefore the XLA path; pass use_flash=True only for
long-sequence configs (e.g. 8 views x 4k tokens fused in one attention),
where the O(T^2) logits materialization eventually dominates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def int8_prob_attention(
    q: jnp.ndarray,  # (B, T, H, d) - flax layout
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Self-attention with the PROBABILITY matrix stored int8 (serve path).

    At the backbone shape (T~1k) the materialized (B, H, T, T) score tensors
    are the largest remaining activation stream after the int8 backbone
    quantization (runs/int8_bench.json analysis), and the Pallas flash
    kernel measured SLOWER there (module docstring). This keeps XLA's
    winning einsum structure but attacks the bytes:

      * probs are stored int8 with a PER-ROW scale that falls out of the
        softmax for free: row max prob = exp(0)/Z, so
        pq = round(exp(l - rowmax) * 127) needs no division at all - even a
        perfectly uniform row quantizes at full resolution (the r4 fixed
        scale would have rounded 1/1025 to zero);
      * the softmax NORMALIZATION pass disappears: the 1/Z folds into the
        output dequant scale (per query row, constant over the contracted
        key axis, so it commutes with the matmul);
      * V is quantized per (b, h, d) channel - also constant over the
        contraction - and P@V runs on the MXU's native int8 path.

    logits stay bf16 (their scale is unknown before the row max exists).
    Accuracy: probs carry <=0.5/127 relative-to-rowmax rounding and V
    <=0.5/127 per-channel; parity is asserted against the float checkpoint
    by the --int8-backbone eval protocol (runs/int8_bench.json pck_parity).
    """
    B, T, H, d = q.shape
    sm_scale = 1.0 / (d**0.5)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * sm_scale, k)
    if key_mask is not None:
        neg = jnp.asarray(jnp.finfo(logits.dtype).min, logits.dtype)
        logits = jnp.where(key_mask[:, None, None, :], logits, neg)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)  # (B, H, T, T) in compute dtype, in [0, 1]
    z = jnp.sum(e.astype(jnp.float32), axis=-1)  # (B, H, T)
    pq = jnp.round(e.astype(jnp.float32) * 127.0).astype(jnp.int8)

    sv = jnp.maximum(jnp.max(jnp.abs(v.astype(jnp.float32)), axis=1), 1e-6) / 127.0
    vq = jnp.round(v.astype(jnp.float32) / sv[:, None]).astype(jnp.int8)  # (B, T, H, d)

    out = jnp.einsum(
        "bhqk,bkhd->bqhd", pq, vq, preferred_element_type=jnp.int32
    ).astype(jnp.float32)
    # Dequant: (1 / (127 * Z)) per (b, h, q) row x per-channel v scale.
    out = out * jnp.transpose(1.0 / (127.0 * z), (0, 2, 1))[..., None]
    out = out * sv[:, None]
    return out.astype(q.dtype)


def fused_self_attention(
    q: jnp.ndarray,  # (B, T, H, d) - flax layout
    k: jnp.ndarray,
    v: jnp.ndarray,
    use_flash: bool | None = None,
    key_mask: jnp.ndarray | None = None,  # (B, T) bool; False = key unattended
) -> jnp.ndarray:
    """Self-attention returning (B, T, H, d); flash-fused on TPU.

    use_flash=None picks per shape from the MEASURED crossover
    (scripts/bench_attention_fusion.py, v5e): XLA wins at the ViT-body shape
    (T~1k), the Pallas flash kernel wins at the fused multi-view
    self-attention shape - 2.3x at T=4104, B=4 - so flash engages on TPU at
    T >= 2048.
    """
    B, T, H, d = q.shape
    sm_scale = 1.0 / (d**0.5)
    if use_flash is None:
        use_flash = jax.default_backend() == "tpu" and T >= 2048

    if not use_flash:
        # Einsums stay in the native (B, T, H, d) layout - no materialized
        # transposes - and softmax stays in the compute dtype (flax MHA
        # semantics). Upcasting the (B, H, T, T) logits to f32 for softmax
        # costs ~2 extra HBM round-trips of a ~100 MB tensor per layer
        # (measured ~10% of the serve step); jnp.exp is computed with f32
        # internal precision on the VPU regardless.
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * sm_scale, k)
        if key_mask is not None:
            neg = jnp.asarray(jnp.finfo(logits.dtype).min, logits.dtype)
            logits = jnp.where(key_mask[:, None, None, :], logits, neg)
        probs = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v)

    qh = jnp.transpose(q, (0, 2, 1, 3))  # (B, H, T, d)
    kh = jnp.transpose(k, (0, 2, 1, 3))
    vh = jnp.transpose(v, (0, 2, 1, 3))

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    block = 512
    T_pad = ((T + block - 1) // block) * block
    pad = T_pad - T
    if pad:
        qh = jnp.pad(qh, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kh = jnp.pad(kh, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vh = jnp.pad(vh, ((0, 0), (0, 0), (0, pad), (0, 0)))
    if pad or key_mask is not None:
        in_range = (jnp.arange(T_pad) < T).astype(jnp.int32)  # pad tokens: segment 0
        q_seg = jnp.broadcast_to(in_range[None, :], (B, T_pad))
        if key_mask is not None:
            # Masked keys get segment 0 (== pad): no query of segment 1
            # attends them. Masked-view QUERIES keep segment 1 and still
            # attend valid keys - identical to flax MHA key-masking.
            km = jnp.pad(key_mask.astype(jnp.int32), ((0, 0), (0, pad)))
            kv_seg = q_seg * km
        else:
            kv_seg = q_seg
        segment_ids = SegmentIds(q=q_seg, kv=kv_seg)
    else:
        segment_ids = None

    bs = BlockSizes(
        block_q=min(block, T_pad),
        block_k_major=min(block, T_pad),
        block_k=min(block, T_pad),
        block_b=1,
        block_q_major_dkv=min(block, T_pad),
        block_k_major_dkv=min(block, T_pad),
        block_k_dkv=min(block, T_pad),
        block_q_dkv=min(block, T_pad),
        block_k_major_dq=min(block, T_pad),
        block_k_dq=min(block, T_pad),
        block_q_dq=min(block, T_pad),
    )
    out = flash_attention(
        qh, kh, vh, segment_ids=segment_ids, sm_scale=sm_scale, block_sizes=bs
    )
    if pad:
        out = out[:, :, :T, :]
    return jnp.transpose(out, (0, 2, 1, 3))

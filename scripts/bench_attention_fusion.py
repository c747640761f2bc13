"""Measure XLA vs Pallas flash attention at the FUSION workload shape.

ops/attention.py's measured verdict covers the ViT-backbone shape
(T=1025, d=64) where XLA wins. The one shape in this framework where the
O(T^2) logits materialization could flip the verdict is the self-attention
fusion prototype (reference MV-model.ipynb cell 3 / MvRoPose_FR3.py
MultiViewFusion over concatenated view tokens): V views x (S+1) tokens in
ONE self-attention, T = 8 x 513 = 4104 at the max rig size. This script
measures both paths at that shape on the real chip and prints one JSON line
per config - the recorded verdict lives in ops/attention.py's docstring.

Usage: python scripts/bench_attention_fusion.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mvropose_tpu.ops.attention import fused_self_attention


def bench(fn, q, k, v, iters: int = 20) -> float:
    """Chained timing with a final scalar fetch: through the tunneled-TPU
    backend block_until_ready does NOT synchronize, so iterations are
    serialized by feeding a scalar of iteration i into iteration i+1's
    query, and the per-call dispatch round-trip is removed by differencing
    1- vs (iters+1)-length chains (same pattern as bench.py)."""

    def chain(n):
        eps = jnp.zeros((), q.dtype)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(q + eps, k, v)
            eps = jnp.reshape(out, (-1,))[0] * jnp.asarray(1e-12, q.dtype)
        float(jax.device_get(eps).astype(jnp.float32))
        return time.perf_counter() - t0

    chain(2)  # warmup/compile
    t1 = min(chain(1) for _ in range(3))
    tn = min(chain(iters + 1) for _ in range(3))
    return (tn - t1) / iters


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    H, d = 12, 64
    key = jax.random.PRNGKey(0)
    for B in (1, 4):
        for V in (4, 8):
            T = V * 513  # V views x (512 patch tokens + CLS)
            q = jax.random.normal(key, (B, T, H, d), jnp.bfloat16)
            k = jax.random.normal(key, (B, T, H, d), jnp.bfloat16)
            v = jax.random.normal(key, (B, T, H, d), jnp.bfloat16)

            xla = jax.jit(lambda q, k, v: fused_self_attention(q, k, v, use_flash=False))
            flash = jax.jit(lambda q, k, v: fused_self_attention(q, k, v, use_flash=True))

            t_xla = bench(xla, q, k, v)
            t_flash = bench(flash, q, k, v)
            err = float(
                jnp.max(jnp.abs(xla(q, k, v).astype(jnp.float32)
                                - flash(q, k, v).astype(jnp.float32)))
            )
            print(json.dumps({
                "B": B, "views": V, "T": T, "H": H, "d": d,
                "xla_ms": round(t_xla * 1e3, 3),
                "flash_ms": round(t_flash * 1e3, 3),
                "speedup_flash": round(t_xla / t_flash, 3),
                "max_abs_err": err,
                "device": getattr(jax.devices()[0], "device_kind", "cpu"),
            }), flush=True)


if __name__ == "__main__":
    main()

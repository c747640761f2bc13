"""Race the CNN stem formulations on the real chip.

The serve breakdown (runs/serve_breakdown.json) shows the LightCNNStem at
2.0 ms for 2 GFLOP - 0.5% MFU, 30% HBM utilization: latency-bound, because
its convs have C_in = 3/16/32 and the MXU pads the contracting dimension to
128 lanes (97% waste on conv1). The classic TPU fix (used by the MLPerf
ResNet submissions) is space-to-depth: a 3x3 stride-2 SAME conv over
(H, W, C) is EXACTLY a 2x2 stride-1 conv over the space-to-depth(2) input
(H/2, W/2, 4C) with the 3x3 kernel zero-embedded into 4x4 and rearranged -
same math, 4x fewer spatial positions, 4x wider contraction.

This script races, at the serve shape (4 x 512 x 512 x 3, bf16):
  v0: the current stem (three 3x3 s2 convs via flax)
  v1: space-to-depth formulation of all three convs (C_in 12/64/128)
with an on-device fori_loop timer (ONE dispatch for N iterations - at
sub-2ms kernel scale the host-chained method of bench.py is dominated by
its ~1.4 ms/call dispatch floor through the tunnel).

MEASURED VERDICT (v5e, on-device loop, full-sum dependency):
  stem_v0 0.60-0.64 ms   stem_v1 1.77-1.79 ms   (conv1: 0.13 vs 1.03 ms)
v0 WINS by ~3x: XLA:TPU already lowers small-C_in convs efficiently (it
performs its own layout transformations), while the explicit s2d transpose
costs a full HBM pass of sublane shuffles per conv. The stem therefore
stays in its direct form. Second finding: the stem's real cost is ~0.6 ms,
not the 2.0 ms the chained-timing serve breakdown first attributed to it -
that number was the dispatch floor, and bench_serve_breakdown.py now uses
the same on-device loop method.

Exact equivalence of the rearranged conv is asserted in
tests/test_models.py::test_s2d_conv_equivalence (CPU).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def s2d(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel order (di, dj, c)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // 2, W // 2, 4 * C)


def rearrange_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, F) 3x3-stride-2 kernel -> (2, 2, 4C, F) s2d-space kernel.

    A stride-2 SAME conv taps rows {2o-1, 2o, 2o+1}; in s2d(2) space those
    live in blocks {o-1, o}, so the window is 2x2 blocks = a 4x4 original
    window with the 3x3 kernel embedded at offset (1, 1).
    """
    kh, kw, C, F = w.shape
    assert (kh, kw) == (3, 3)
    w4 = jnp.zeros((4, 4, C, F), w.dtype).at[1:4, 1:4].set(w)
    # (2*bi+di, 2*bj+dj, c, f) -> (bi, bj, (di, dj, c), f)
    w4 = w4.reshape(2, 2, 2, 2, C, F)  # (bi, di, bj, dj, c, f)
    w4 = w4.transpose(0, 2, 1, 3, 4, 5)  # (bi, bj, di, dj, c, f)
    return w4.reshape(2, 2, 4 * C, F)


def conv_s2d(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Exact equivalent of lax 3x3 stride-2 padding-1 conv, via s2d."""
    return jax.lax.conv_general_dilated(
        s2d(x),
        rearrange_kernel(w),
        window_strides=(1, 1),
        padding=((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def conv_ref(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(2, 2),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def bn_gelu(x, scale, bias):
    # Inference-mode BN folded to scale+shift (f32), gelu back in bf16 -
    # mirrors ConvBNGelu's eval path.
    y = x.astype(jnp.float32) * scale + bias
    return jax.nn.gelu(y.astype(x.dtype), approximate=False)


def make_params(key, dtype):
    ks = jax.random.split(key, 9)
    shapes = [(3, 3, 3, 16), (3, 3, 16, 32), (3, 3, 32, 64)]
    ws = [jax.random.normal(k, s, dtype) * 0.1 for k, s in zip(ks[:3], shapes)]
    scales = [jnp.ones((s[-1],), jnp.float32) for s in shapes]
    biases = [jnp.zeros((s[-1],), jnp.float32) for s in shapes]
    return ws, scales, biases


def stem_v0(x, ws, scales, biases):
    for w, s, b in zip(ws, scales, biases):
        x = bn_gelu(conv_ref(x, w), s, b)
    return x


def stem_v1(x, ws, scales, biases):
    for w, s, b in zip(ws, scales, biases):
        x = bn_gelu(conv_s2d(x, w), s, b)
    return x


def time_fn(fn, args, iters=100):
    """On-device loop timing: a lax.fori_loop of `iters` applications with a
    data dependency between iterations, ONE dispatch total.

    At ~1 ms kernel scale the host-chained methodology (bench.py) hits its
    floor - per-call dispatch through the tunnel is no longer amortized -
    so the loop must live on device. Differencing a 1-iter against an
    (iters+1)-iter program removes the fixed dispatch + fetch cost.
    """

    def body(x0, rest, n):
        def step(_, eps):
            out = fn(x0 + eps, *rest)
            # Full-output reduction: extracting a single element would let
            # XLA dead-code-eliminate all but that element's receptive field
            # (measured: conv-only "timings" go to ~0 with out[0]).
            return jnp.sum(out) * jnp.asarray(1e-12, out.dtype)

        return jax.lax.fori_loop(0, n, step, jnp.zeros((), x0.dtype))

    def run(n):
        jitted = jax.jit(lambda x0, *rest: body(x0, rest, n))
        float(jax.device_get(jitted(*args)))  # compile + warm
        t0 = time.perf_counter()
        float(jax.device_get(jitted(*args)))
        return time.perf_counter() - t0

    t1 = run(1)
    tn = run(iters + 1)
    return (tn - t1) / iters


def main():
    B, S = 4, 512
    dtype = jnp.bfloat16
    x = jax.random.normal(jax.random.PRNGKey(0), (B, S, S, 3), dtype)
    ws, scales, biases = make_params(jax.random.PRNGKey(1), dtype)

    # Equivalence on-backend before timing (bf16 tolerance).
    a = jax.jit(stem_v0)(x, ws, scales, biases)
    b = jax.jit(stem_v1)(x, ws, scales, biases)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))

    res = {"backend": jax.default_backend(), "max_abs_err": err}
    res["stem_v0_ms"] = round(1e3 * time_fn(stem_v0, (x, ws, scales, biases)), 3)
    res["stem_v1_ms"] = round(1e3 * time_fn(stem_v1, (x, ws, scales, biases)), 3)

    # Per-conv attribution (v0 shapes).
    xs = [x]
    for w, s, b in zip(ws[:2], scales[:2], biases[:2]):
        xs.append(jax.jit(lambda x, w, s, b: bn_gelu(conv_ref(x, w), s, b))(xs[-1], w, s, b))
    for i in range(3):
        res[f"conv{i+1}_v0_ms"] = round(
            1e3 * time_fn(lambda x, w: conv_ref(x, w), (xs[i], ws[i])), 3
        )
        res[f"conv{i+1}_v1_ms"] = round(
            1e3 * time_fn(lambda x, w: conv_s2d(x, w), (xs[i], ws[i])), 3
        )
    print(json.dumps(res))


if __name__ == "__main__":
    main()

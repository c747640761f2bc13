"""Serve-step roofline: where do the ~12.5 ms of a 4-camera frame-set go?

Decomposes the flagship serve forward (ViT-B/16 @512px, 4 views, fusion +
heads + fused decode) into separately-compiled stages and reports, per stage:
wall ms (on-device fori_loop with a full-output data dependency - see
`timed` for why host-chained timing is wrong at sub-2ms stage scale),
XLA cost-analysis FLOPs and HBM bytes, achieved TFLOP/s, MFU, and arithmetic
intensity vs the chip's ridge point - i.e. whether the stage is compute- or
bandwidth-bound. Also sweeps the batch (frame-set) axis to localize the flat
B=1..4 scaling called out in VERDICT r2.

CAVEAT: stages are separate XLA programs, so deltas are indicative (fusion
boundaries differ from the monolithic program); the single-program MFU in
bench.py is the headline number. Writes runs/serve_breakdown.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

HBM_GBPS = {"TPU v5 lite": 819, "TPU v5e": 819, "TPU v4": 1228, "TPU v6 lite": 1640}


def cost_of(jitted, *args):
    c = jitted.lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def timed(fn, args, mk_scalar, iters=100):
    """On-device fori_loop timing: ONE dispatch runs `iters` applications
    with a scalar data dependency between iterations.

    The host-chained method (bench.py) has a ~1.4 ms/call dispatch floor
    through the tunnel, which at sub-2ms stage scale dominates the kernel
    itself (measured: the CNN stem "cost" 2.0 ms chained vs 0.6 ms with the
    loop on device - see scripts/bench_stem.py). mk_scalar must consume the
    FULL output (a sum, not an element): extracting one element lets XLA
    dead-code-eliminate everything outside its receptive field.
    """

    def run(n):
        @jax.jit
        def prog(*a):
            def step(_, eps):
                return mk_scalar(fn(eps, *a))

            return jax.lax.fori_loop(0, n, step, jnp.zeros((), jnp.float32))

        float(jax.device_get(prog(*args)))  # compile + warm
        t0 = time.perf_counter()
        float(jax.device_get(prog(*args)))
        return time.perf_counter() - t0

    t1 = run(1)
    tn = run(iters + 1)
    return (tn - t1) / iters


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from __graft_entry__ import _flagship_cfg
    from bench_train import peak_flops
    from mvropose_tpu.decode import decode_keypoints
    from mvropose_tpu.models import MultiViewPoseEstimator
    from mvropose_tpu.models.vit import ViTBackbone
    from mvropose_tpu.models.stem import LightCNNStem
    from mvropose_tpu.utils.initializers import random_variables

    dev = jax.devices()[0]
    peak = peak_flops(dev) or float("nan")
    kind = getattr(dev, "device_kind", str(dev))
    hbm = next((v for k, v in HBM_GBPS.items() if kind.startswith(k)), None)
    ridge = peak / (hbm * 1e9) if hbm else None  # FLOP/byte at the roofline knee
    use_pallas = jax.default_backend() == "tpu"

    cfg = _flagship_cfg(image_size=512)
    model = MultiViewPoseEstimator(cfg)
    B, V, S = 1, 4, cfg.vit.image_size
    images = jax.random.normal(jax.random.PRNGKey(0), (B, V, S, S, 3), jnp.float32)
    view_ids = jnp.tile(jnp.arange(V, dtype=jnp.int32), (B, 1))
    view_mask = jnp.ones((B, V), dtype=bool)
    shapes = jax.eval_shape(
        lambda k: model.init(k, images, view_ids, view_mask), jax.random.PRNGKey(0)
    )
    variables = random_variables(shapes)

    backbone = ViTBackbone(cfg.vit)
    bb_vars = {"params": variables["params"]["backbone"]}
    stem = LightCNNStem(dtype=cfg.compute_dtype)
    stem_shapes = jax.eval_shape(
        lambda k: stem.init(k, images.reshape(B * V, S, S, 3), False), jax.random.PRNGKey(0)
    )
    stem_vars = random_variables(stem_shapes)

    flat = images.reshape(B * V, S, S, 3)

    # Weights ride as jit ARGUMENTS: closed-over device arrays embed as
    # program constants, and random weights (incompressible, unlike zeros)
    # blow the tunnel's remote-compile request limit (HTTP 413).
    @jax.jit
    def f_backbone(eps, v, x):
        return backbone.apply(v, x + eps)["patch_tokens"]

    @jax.jit
    def f_stem(eps, v, x):
        return stem.apply(v, x + eps, False)

    @jax.jit
    def f_full(eps, v, im, vi, vm):
        return model.apply(v, im + eps, vi, vm)

    @jax.jit
    def f_full_decode(eps, v, im, vi, vm):
        hm, ang = model.apply(v, im + eps, vi, vm)
        xy, conf = decode_keypoints(hm, image_hw=(720, 1280), mode="argmax",
                                    use_pallas=use_pallas)
        return xy, conf, ang

    stages = []

    def stage(name, fn, args, mk_scalar):
        dt = timed(fn, args, mk_scalar)
        flops, nbytes = cost_of(fn, jnp.zeros(()), *args)
        intensity = flops / nbytes if nbytes else None
        stages.append({
            "stage": name,
            "ms": round(dt * 1e3, 3),
            "tflops": round(flops / 1e12, 3),
            "gbytes": round(nbytes / 1e9, 3),
            "achieved_tflops_per_sec": round(flops / dt / 1e12, 2),
            "mfu": round(flops / dt / peak, 4),
            "intensity_flop_per_byte": round(intensity, 1) if intensity else None,
            "bound": (None if not (intensity and ridge)
                      else ("compute" if intensity >= ridge else "hbm")),
            "hbm_util": round(nbytes / dt / (hbm * 1e9), 4) if hbm else None,
        })
        print(json.dumps(stages[-1]), flush=True)

    # Full-output sums (f32): every output tensor must feed the loop-carried
    # scalar or XLA dead-code-eliminates the work that produced it.
    def sum_all(*ts):
        return sum(jnp.sum(t.astype(jnp.float32)) for t in ts) * 1e-12

    stage("backbone_fwd_4x512", f_backbone, (bb_vars, flat), sum_all)
    stage("cnn_stem_4x512", f_stem, (stem_vars, flat), lambda o: sum_all(*o))
    stage("full_fwd", f_full, (variables, images, view_ids, view_mask),
          lambda o: sum_all(*o))
    stage("full_fwd_plus_decode", f_full_decode,
          (variables, images, view_ids, view_mask), lambda o: sum_all(*o))

    # Frame-set (batch) scaling sweep of the full serve program.
    sweep = []
    for b in (1, 2, 4):
        im = jax.random.normal(jax.random.PRNGKey(b), (b, V, S, S, 3), jnp.float32)
        vi = jnp.tile(jnp.arange(V, dtype=jnp.int32), (b, 1))
        vm = jnp.ones((b, V), dtype=bool)
        dt = timed(f_full_decode, (variables, im, vi, vm), lambda o: sum_all(*o))
        flops, nbytes = cost_of(f_full_decode, jnp.zeros(()), variables, im, vi, vm)
        sweep.append({
            "frame_sets": b,
            "ms": round(dt * 1e3, 3),
            "sets_per_sec": round(b / dt, 2),
            "mfu": round(flops / dt / peak, 4),
        })
        print(json.dumps(sweep[-1]), flush=True)

    out = {
        "device": kind,
        "peak_bf16_tflops": round(peak / 1e12, 1),
        "hbm_gbps": hbm,
        "ridge_flop_per_byte": round(ridge, 1) if ridge else None,
        "stages": stages,
        "batch_sweep": sweep,
    }
    Path("runs").mkdir(exist_ok=True)
    Path("runs/serve_breakdown.json").write_text(json.dumps(out, indent=2))
    print("FINAL", json.dumps(out))


if __name__ == "__main__":
    main()

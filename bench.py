"""Flagship benchmark: multi-camera pose inference throughput per TPU chip.

Measures the full jitted serve step on one chip: 4-camera 512x512 batch ->
ViT-B/16 backbone (int8 frozen matmuls + int8-prob attention; bf16 arm also
reported) ->
masked fusion -> heatmaps + angles -> fused Pallas peak decode -> keypoints +
confidences. One "frame" = one synchronized 4-camera frame set (the rig unit
of work).

Baseline: the reference's measured 3-view full-pipeline inference at 5.61
frames/sec on the author's GPU workstation (SURVEY.md section 6,
/root/reference/model/MV-model.ipynb cell 4 outputs). BASELINE.json's target
is >= 30 fps at >= 4 cameras per v5e chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FPS = 5.61


def main() -> None:
    import jax

    # Persistent compilation cache: the first bench run pays the remote TPU
    # compile once; subsequent runs (and the driver's) hit the cache.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from mvropose_tpu.models import MultiViewPoseEstimator
    from mvropose_tpu.decode import decode_keypoints

    cfg = _flagship_cfg(image_size=512)

    B, V = 1, 4
    S = cfg.vit.image_size
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (B, V, S, S, 3), jnp.float32)
    view_ids = jnp.tile(jnp.arange(V, dtype=jnp.int32), (B, 1))
    view_mask = jnp.ones((B, V), dtype=bool)

    # Headline path: int8-quantized frozen backbone + int8-probability
    # attention. The serve program is HBM-bandwidth-bound
    # (runs/serve_breakdown.json: 116 FLOP/byte vs the v5e's 240 ridge), so
    # shrinking the byte streams is the direct roofline attack: r4 halved the
    # matmul operand streams (int8 backbone, 1.13x), r5 stores the
    # materialized (B,H,T,T) attention probs as int8 with free per-row scales
    # and runs P@V on the int8 MXU (ops/attention.int8_prob_attention),
    # measured 1.265x total over bf16 with the per-arm decomposition in
    # runs/attn8_ln_bench.json. Accuracy parity is committed
    # (runs/int8_bench.json pck_parity for the backbone;
    # runs/dream_geo/eval_int8_attn8.txt for backbone+attention on a
    # converged held-out eval); `cli serve --int8-backbone --int8-attention`
    # is the same production path. The bf16 arm is still measured below
    # (fps_bf16) so rounds 1-3 stay comparable.
    import dataclasses

    from mvropose_tpu.models.quantize import quantize_backbone_params

    model_f = MultiViewPoseEstimator(cfg)
    qcfg = dataclasses.replace(
        cfg, vit=dataclasses.replace(cfg.vit, quant="int8", quant_attn="int8")
    )
    model = MultiViewPoseEstimator(qcfg)

    # Build params WITHOUT compiling an init program on the TPU (the remote
    # compile of a full init graph costs minutes and contributes nothing to a
    # throughput benchmark): eval_shape the init, then materialize RANDOM
    # normals (not zeros - zeros would misrepresent any data-dependent hot
    # path) in one device-side program.
    from mvropose_tpu.utils.initializers import random_variables

    shapes = jax.eval_shape(
        lambda k: model_f.init(k, images, view_ids, view_mask), jax.random.PRNGKey(0)
    )
    variables_f = random_variables(shapes)
    params_f = jax.device_get(variables_f["params"])
    params_q = dict(params_f)
    params_q["backbone"] = quantize_backbone_params(params_f["backbone"])
    variables = jax.device_put(
        {**variables_f, "params": jax.tree_util.tree_map(jnp.asarray, params_q)}
    )

    use_pallas = jax.default_backend() == "tpu"

    @jax.jit
    def serve_step(variables, images, view_ids, view_mask, eps):
        # eps (device scalar from the previous iteration's output) serializes
        # chained calls: through the tunneled-TPU (axon) backend
        # jax.block_until_ready does NOT synchronize, so honest timing needs
        # a real data dependency between iterations plus one final host fetch.
        # `variables` is an ARGUMENT, not a closure: closed-over device arrays
        # are embedded as program constants, and ~22M random floats blow the
        # remote-compile request limit (HTTP 413).
        heatmaps, angles = model.apply(variables, images + eps, view_ids, view_mask)
        xy, conf = decode_keypoints(
            heatmaps, image_hw=(720, 1280), mode="argmax", use_pallas=use_pallas
        )
        return xy, conf, angles

    # XLA's own cost analysis of the exact compiled serve program: the FLOP
    # numerator for an honest inference MFU (same method as bench_train.py).
    eps0 = jnp.zeros((), jnp.float32)
    compiled = serve_step.lower(variables, images, view_ids, view_mask, eps0).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    from bench_train import peak_flops

    peak = peak_flops(jax.devices()[0])

    def run_chain(n, call, call_vars):
        """n chained steps ending in a scalar fetch; returns wall seconds.

        `call` is either an AOT compiled executable (default headline; same
        pattern as bench_train.bench_step - re-invoking the jitted serve_step
        would re-trace the identical program the cost-analysis lowering
        already built) or a jitted function (the A/B arm: rounds 1-2 timed
        through the jitted dispatch path, round 3 switched to AOT, so both
        are reported to make round-over-round moves attributable to the
        session, not the call path). NOTE: since r4 the A/B arm runs the
        int8 program (the headline's), no longer comparable to r1-r2's
        bf16-program jitted numbers - fps_jitted_call_program records that."""
        eps = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(n):
            xy, conf, angles = call(call_vars, images, view_ids, view_mask, eps)
            eps = jnp.reshape(conf, (-1,))[0] * 1e-12  # tiny but nonzero: no constant folding
        float(jax.device_get(eps))  # forces the whole chain
        return time.perf_counter() - t0

    iters = 20
    reps = 5

    def chain_protocol(call, call_vars):
        """The variance protocol, shared by the int8 headline and bf16 arms:
        >= 5 independent chains. Per-chain throughput uses a shared 1-chain
        offset (min over reps) to difference out the dispatch round-trip; the
        headline stays best-of (comparable with BENCH_r01-r03), with
        median/min/spread carried so a cross-session move can be told from
        tunnel noise."""
        run_chain(2, call, call_vars)  # warmup / compile
        t1 = min(run_chain(1, call, call_vars) for _ in range(reps))
        dts = sorted(run_chain(iters + 1, call, call_vars) - t1 for _ in range(reps))
        fps_chains = [iters * B / d for d in dts]
        med = fps_chains[len(fps_chains) // 2]
        spread = 100.0 * (fps_chains[0] - fps_chains[-1]) / med
        return fps_chains, dts[0] / iters, med, spread

    fps_chains, step_s, med, spread_pct = chain_protocol(compiled, variables)
    fps = fps_chains[0]  # best chain (min dt), the r01-r03 headline protocol

    # A/B arm: same chain through the jitted call path (r2's protocol shape,
    # but running the int8 program since r4 - see run_chain's docstring).
    run_chain(1, serve_step, variables)  # absorb first-call dispatch setup
    t1_j = min(run_chain(1, serve_step, variables) for _ in range(2))
    dt_j = min(run_chain(iters + 1, serve_step, variables) - t1_j for _ in range(2))
    fps_jitted = iters * B / dt_j

    # bf16 arm (rounds 1-3's headline path): the FULL headline protocol
    # (5 chains, median/min/spread) on the float backbone, so the int8
    # promotion stays attributable round-over-round.
    @jax.jit
    def serve_step_f(variables, images, view_ids, view_mask, eps):
        heatmaps, angles = model_f.apply(variables, images + eps, view_ids, view_mask)
        xy, conf = decode_keypoints(
            heatmaps, image_hw=(720, 1280), mode="argmax", use_pallas=use_pallas
        )
        return xy, conf, angles

    compiled_f = serve_step_f.lower(
        variables_f, images, view_ids, view_mask, eps0
    ).compile()
    cost_f = compiled_f.cost_analysis()
    if isinstance(cost_f, list):
        cost_f = cost_f[0]
    flops_f = float(cost_f.get("flops", 0.0))

    fps_chains_f, step_s_f, med_f, spread_f = chain_protocol(compiled_f, variables_f)
    fps_bf16 = fps_chains_f[0]

    # MFU, each program against ITS OWN peak: the bf16 program vs the chip's
    # bf16 peak (the roofline number, comparable with r1-r3), and the int8
    # program vs the chip's int8 peak (~2x bf16 on v5e) - dividing int8-program
    # FLOPs by the bf16 peak would overstate MXU utilization ~2x (r4's mistake).
    from bench_train import peak_int8_ops

    peak_i8 = peak_int8_ops(jax.devices()[0])

    print(
        json.dumps(
            {
                "metric": "multi_cam_frames_per_sec_per_chip",
                "value": round(fps, 3),
                "unit": "frame-sets/s (4cam@512px ViT-B/16 int8-backbone+attn8 + decode)",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
                "fps_median": round(med, 3),
                "fps_min": round(fps_chains[-1], 3),
                "fps_spread_pct": round(spread_pct, 1),
                "fps_jitted_call": round(fps_jitted, 3),
                "fps_jitted_call_program": "int8_attn8",  # bf16 r1-r2; int8 r4; +attn8 r5
                "fps_bf16": round(fps_bf16, 3),
                "fps_bf16_median": round(med_f, 3),
                "fps_bf16_min": round(fps_chains_f[-1], 3),
                "fps_bf16_spread_pct": round(spread_f, 1),
                "chains": reps,
                "tflops_per_step": round(flops / 1e12, 3),
                "achieved_tflops_per_sec": round(flops / step_s / 1e12, 2),
                "mfu_bf16": round(flops_f / step_s_f / peak, 4) if peak else None,
                "mfu_int8": round(flops / step_s / peak_i8, 4) if peak_i8 else None,
            }
        )
    )


if __name__ == "__main__":
    main()

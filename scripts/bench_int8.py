"""A/B bench: bf16 vs int8-quantized backbone on the flagship serve step.

The committed roofline (runs/serve_breakdown.json) shows the serve program
HBM-bound at 116 FLOP/byte vs the v5e's 240 ridge - the matmul operand
streams (bf16 activations + weights) are the wall. models/quantize.py halves
both through every backbone Dense (int8 weights with per-channel scales,
dynamic per-token int8 activations, MXU int8xint8->int32). This script
measures the exact bench.py serve chain both ways on the real chip and
reports the speedup; PCK parity of the quantization lives in
tests/test_quantize.py (cosine > 0.995) and the committed
`cli eval --int8-backbone` run on a converged checkpoint.

Writes runs/int8_bench.json.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from mvropose_tpu.decode import decode_keypoints
    from mvropose_tpu.models import MultiViewPoseEstimator
    from mvropose_tpu.models.quantize import quantize_backbone_params
    from mvropose_tpu.utils.initializers import random_variables

    cfg = _flagship_cfg(image_size=512)
    B, V, S = 1, 4, cfg.vit.image_size
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (B, V, S, S, 3), jnp.float32)
    view_ids = jnp.tile(jnp.arange(V, dtype=jnp.int32), (B, 1))
    view_mask = jnp.ones((B, V), dtype=bool)
    use_pallas = jax.default_backend() == "tpu"

    model_f = MultiViewPoseEstimator(cfg)
    shapes = jax.eval_shape(
        lambda k: model_f.init(k, images, view_ids, view_mask), jax.random.PRNGKey(0)
    )
    variables_f = random_variables(shapes)

    # int8 arm: same weights, backbone quantized (host round-trip; one-off).
    qcfg = dataclasses.replace(cfg, vit=dataclasses.replace(cfg.vit, quant="int8"))
    model_q = MultiViewPoseEstimator(qcfg)
    params_f = jax.device_get(variables_f["params"])
    params_q = dict(params_f)
    params_q["backbone"] = quantize_backbone_params(params_f["backbone"])
    variables_q = jax.device_put(
        {**variables_f, "params": jax.tree_util.tree_map(jnp.asarray, params_q)}
    )

    def make_step(model):
        @jax.jit
        def step(variables, images, view_ids, view_mask, eps):
            heatmaps, angles = model.apply(variables, images + eps, view_ids, view_mask)
            xy, conf = decode_keypoints(
                heatmaps, image_hw=(720, 1280), mode="argmax", use_pallas=use_pallas
            )
            return xy, conf, angles

        return step

    def measure(step, variables):
        compiled = step.lower(variables, images, view_ids, view_mask,
                              jnp.zeros((), jnp.float32)).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]

        def run_chain(n):
            eps = jnp.zeros((), jnp.float32)
            t0 = time.perf_counter()
            for _ in range(n):
                xy, conf, angles = compiled(variables, images, view_ids, view_mask, eps)
                eps = jnp.reshape(conf, (-1,))[0] * 1e-12
            float(jax.device_get(eps))
            return time.perf_counter() - t0

        run_chain(2)  # warmup
        iters, reps = 20, 5
        t1 = min(run_chain(1) for _ in range(reps))
        dt = min(run_chain(iters + 1) - t1 for _ in range(reps))
        return {
            "fps": iters * B / dt,
            "step_ms": dt / iters * 1e3,
            "flops": float(cost.get("flops", 0.0)),
            "bytes": float(cost.get("bytes accessed", 0.0)),
        }

    res_f = measure(make_step(model_f), variables_f)
    print("bf16:", json.dumps({k: round(v, 3) for k, v in res_f.items()}))
    res_q = measure(make_step(model_q), variables_q)
    print("int8:", json.dumps({k: round(v, 3) for k, v in res_q.items()}))

    report = {
        "config": "4cam@512px ViT-B/16 serve step + decode (bench.py chain protocol)",
        "bf16": {k: round(v, 3) for k, v in res_f.items()},
        "int8": {k: round(v, 3) for k, v in res_q.items()},
        "speedup": round(res_q["fps"] / res_f["fps"], 3),
        "note": "int8 = frozen-backbone matmuls quantized (per-channel weights, "
                "dynamic per-token activations, MXU int8 path); heads stay float. "
                "bytes = XLA cost-analysis 'bytes accessed' of the compiled program.",
    }
    with open("runs/int8_bench.json", "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"speedup": report["speedup"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""A/B/C/D bench: the second roofline attack on the serve step.

runs/int8_bench.json's analysis named the remaining bf16 byte streams after
the int8 backbone quantization: the materialized (B, H, T, T) attention
score/prob tensors and the f32 LayerNorm/residual streams. This script races
the two attacks built against them, each individually attributable:

  arm A  bf16                    (rounds 1-3 headline path)
  arm B  int8 backbone           (round 4 headline path)
  arm C  B + int8-prob attention (ops/attention.int8_prob_attention:
         probs stored int8 with free per-row scales; softmax normalization
         folded into the dequant; P@V on the int8 MXU)
  arm D  C + Pallas fused (residual+)LayerNorm (ops/layernorm.py: one bf16
         pass per LN site, no f32 stream, mid-block residual add fused)

Accuracy parity of C is pinned by tests/test_ops.py (per-row quantization
bounds) and the converged-checkpoint eval (`cli eval --int8-backbone
--int8-attention`); D is numerically the same math as flax LN (parity
tests). Writes runs/attn8_ln_bench.json.
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
    params_f = jax.device_get(variables_f["params"])
    params_q = dict(params_f)
    params_q["backbone"] = quantize_backbone_params(params_f["backbone"])
    variables_q = jax.device_put(
        {**variables_f, "params": jax.tree_util.tree_map(jnp.asarray, params_q)}
    )

    def arm(quant=None, quant_attn=None, fused_ln=False):
        vit = dataclasses.replace(
            cfg.vit, quant=quant, quant_attn=quant_attn, fused_ln=fused_ln
        )
        return MultiViewPoseEstimator(dataclasses.replace(cfg, vit=vit))

    def make_step(model):
        @jax.jit
        def step(variables, images, view_ids, view_mask, eps):
            heatmaps, angles = model.apply(variables, images + eps, view_ids, view_mask)
            xy, conf = decode_keypoints(
                heatmaps, image_hw=(720, 1280), mode="argmax", use_pallas=use_pallas
            )
            return xy, conf, angles

        return step

    def measure(model, variables):
        step = make_step(model)
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
            "fps": round(iters * B / dt, 3),
            "step_ms": round(dt / iters * 1e3, 3),
            "flops": float(cost.get("flops", 0.0)),
            "bytes": float(cost.get("bytes accessed", 0.0)),
        }

    arms = {
        "bf16": (arm(), variables_f),
        "int8": (arm(quant="int8"), variables_q),
        "int8_attn8": (arm(quant="int8", quant_attn="int8"), variables_q),
        "int8_attn8_fusedln": (
            arm(quant="int8", quant_attn="int8", fused_ln=True), variables_q,
        ),
        "int8_fusedln": (arm(quant="int8", fused_ln=True), variables_q),
    }
    report = {"config": "4cam@512px ViT-B/16 serve step + decode (bench.py chain protocol)"}
    for name, (model, variables) in arms.items():
        report[name] = measure(model, variables)
        print(name, json.dumps(report[name]), flush=True)

    base = report["bf16"]["fps"]
    report["speedup_vs_bf16"] = {
        k: round(report[k]["fps"] / base, 3) for k in arms if k != "bf16"
    }
    with open("runs/attn8_ln_bench.json", "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["speedup_vs_bf16"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

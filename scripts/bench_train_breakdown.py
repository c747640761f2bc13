"""Decompose the single-view train step: where do the 133 ms go?

Times four nested programs at the reference DREAM shape (B=240, 224px,
frozen ViT-B/16) with the chained+differenced method (see bench_train.py):

  1. backbone forward only
  2. full model forward (backbone + stem + both heads)
  3. forward + loss + backward (grads)
  4. full train step (+ two-group AdamW update)

The pairwise differences attribute wall time to heads/stem, backward, and
optimizer. Prints one JSON line.

MEASURED (v5e, 2026-08): backbone_fwd 93.2 ms, full_fwd 107.7, fwd+bwd 96.1,
full_step 135.1. CAVEAT on reading differences: each program is compiled and
globally optimized separately, so pairwise deltas are only indicative -
fwd+bwd measuring FASTER than fwd alone shows the cross-program noise floor
(~10 ms at this shape). The robust takeaways: the frozen ViT-B forward is
~69% of the step, and the whole step runs at 41% MFU (bench_train.py's
single-program number, which is the one to trust).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def chain_time(fn, args, n, mk_scalar):
    eps = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(eps, *args)
        eps = mk_scalar(out)
    float(jax.device_get(eps))
    return time.perf_counter() - t0


def timed(fn, args, mk_scalar, iters=10):
    chain_time(fn, args, 2, mk_scalar)  # warmup/compile
    t1 = min(chain_time(fn, args, 1, mk_scalar) for _ in range(3))
    tn = min(chain_time(fn, args, iters + 1, mk_scalar) for _ in range(3))
    return (tn - t1) / iters


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import dataclasses

    from mvropose_tpu.geometry.heatmap import render_heatmaps
    from mvropose_tpu.models import EstimatorConfig, SingleViewPoseEstimator
    from mvropose_tpu.models.vit import VIT_B16, ViTBackbone
    from mvropose_tpu.train import (
        TrainConfig,
        create_train_state,
        make_single_view_train_step,
    )

    B = int(os.environ.get("BENCH_SV_BATCH", "240"))
    vit = dataclasses.replace(VIT_B16, image_size=224)
    cfg = EstimatorConfig(vit=vit, num_joints=7, num_angles=7, heatmap_size=(128, 128))
    model = SingleViewPoseEstimator(cfg)
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (B, 224, 224, 3), jnp.float32)
    kp = jax.random.uniform(rng, (B, 7, 2), minval=8, maxval=120)
    batch = {
        "images": images,
        "heatmaps": render_heatmaps(kp, 128, 128, sigma=5.0),
        "angles": jax.random.normal(rng, (B, 7), jnp.float32),
    }
    variables = model.init(jax.random.PRNGKey(1), images[:1])
    state = create_train_state(model, variables, TrainConfig())

    bb = ViTBackbone(vit)
    bb_vars = {"params": variables["params"]["backbone"]}

    # Params/batch are ARGUMENTS, not closures: closed-over device arrays are
    # embedded as constants in the lowered program and blow the
    # remote-compile request size limit (HTTP 413) on the tunneled TPU.
    @jax.jit
    def f_backbone(eps, bb_vars, images):
        out = bb.apply(bb_vars, images + eps)
        return out["patch_tokens"]

    @jax.jit
    def f_forward(eps, variables, images):
        hm, ang = model.apply(variables, images + eps)
        return hm

    @jax.jit
    def f_grads(eps, variables, batch):
        def loss(p):
            hm, ang = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                batch["images"] + eps,
            )
            return (
                jnp.mean((hm - batch["heatmaps"]) ** 2) * 100.0
                + jnp.mean(jnp.abs(ang - batch["angles"]))
            )

        g = jax.grad(loss)(variables["params"])
        return jax.tree_util.tree_leaves(g)[0]

    step = make_single_view_train_step(TrainConfig())

    sc = lambda out: jnp.reshape(out, (-1,))[0].astype(jnp.float32) * 1e-12

    t_bb = timed(f_backbone, (bb_vars, images), sc)
    t_fw = timed(f_forward, (variables, images), sc)
    t_gr = timed(f_grads, (variables, batch), sc)

    # Full step: thread eps through the images; state is donated so rebuild.
    def f_step(eps, _):
        nonlocal state
        b = dict(batch)
        b["images"] = batch["images"] + eps
        state, m = step(state, b, jax.random.PRNGKey(2))
        return m["loss"]

    t_st = timed(f_step, (None,), lambda out: out * 1e-12)

    print(json.dumps({
        "bench": f"train_sv_breakdown_b{B}_224px",
        "backbone_fwd_ms": round(t_bb * 1e3, 2),
        "full_fwd_ms": round(t_fw * 1e3, 2),
        "fwd_plus_bwd_ms": round(t_gr * 1e3, 2),
        "full_step_ms": round(t_st * 1e3, 2),
        "heads_stem_fwd_ms": round((t_fw - t_bb) * 1e3, 2),
        "backward_ms": round((t_gr - t_fw) * 1e3, 2),
        "optimizer_ms": round((t_st - t_gr) * 1e3, 2),
        "device": getattr(jax.devices()[0], "device_kind", "cpu"),
    }), flush=True)


if __name__ == "__main__":
    main()

"""Benchmark-grade parameter materialization without a full flax init.

The benchmarks and driver entry points must not compile a model.init program
on the TPU (minutes through the remote-compile tunnel), but zero-filled
buffers would make any data-dependent hot path (confidence-gated decode,
masked flash attention) silently unrepresentative. This builds the whole
variables tree as ONE jitted program of per-leaf PRNG normals - no host
transfer, no flax init graph, one cacheable compile.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def random_variables(shapes, seed: int = 0, scale: float = 0.02):
    """Shapes tree (from jax.eval_shape of model.init) -> on-device tree of
    N(0, scale) floats (integer/bool leaves, e.g. batch-stat counters, are
    zeros). BatchNorm running-variance leaves (named 'var') get 1 + noise,
    never a possibly-negative normal: rsqrt(var + eps) of a negative var is
    NaN and would silently poison everything downstream of the stem."""
    leaves_paths, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    names = [
        str(getattr(kp[-1], "key", "")) if kp else "" for kp, _ in leaves_paths
    ]
    leaves = [leaf for _, leaf in leaves_paths]

    @jax.jit
    def build(key):
        keys = jax.random.split(key, len(leaves))
        out = []
        for k, s, name in zip(keys, leaves, names):
            if jnp.issubdtype(s.dtype, jnp.floating):
                noise = scale * jax.random.normal(k, s.shape, s.dtype)
                out.append(1.0 + noise if name == "var" else noise)
            else:
                out.append(jnp.zeros(s.shape, s.dtype))
        return out

    return jax.tree_util.tree_unflatten(treedef, build(jax.random.PRNGKey(seed)))

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
    zeros)."""
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    @jax.jit
    def build(key):
        keys = jax.random.split(key, len(leaves))
        out = []
        for k, s in zip(keys, leaves):
            if jnp.issubdtype(s.dtype, jnp.floating):
                out.append(scale * jax.random.normal(k, s.shape, s.dtype))
            else:
                out.append(jnp.zeros(s.shape, s.dtype))
        return out

    return jax.tree_util.tree_unflatten(treedef, build(jax.random.PRNGKey(seed)))

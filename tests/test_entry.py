"""Driver entry points stay importable and shape-sound (fast CPU checks).

The driver compile-checks entry() on the real chip and runs
dryrun_multichip on a virtual mesh; these tests catch breakage earlier and
cheaply (eval_shape only - no full compile).
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as entrymod


def test_entry_shapes():
    fn, args = entrymod.entry()
    variables, images, view_ids, view_mask = args
    assert isinstance(variables, dict) and "params" in variables
    assert images.shape == (1, 4, 512, 512, 3)
    assert view_ids.shape == (1, 4) and view_mask.shape == (1, 4)
    out = jax.eval_shape(fn, *args)
    heatmaps, angles = out
    assert heatmaps.shape == (1, 4, 8, 128, 128)
    assert angles.shape == (1, 7)
    assert heatmaps.dtype == jnp.float32
    assert angles.dtype == jnp.float32

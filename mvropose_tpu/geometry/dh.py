"""Denavit-Hartenberg transform builders (standard + Craig modified).

The reference robots use two conventions:
  * standard DH  - FR5 / Meca500 (/root/reference/model/Fr5_model_train.ipynb
    cell 2; /root/reference/visualization/Meca500_vis.ipynb cell 0)
  * modified DH (Craig) - Franka Research 3
    (/root/reference/model/MvRoPose_FR3.py:75-88)

Both builders take (a, d, alpha, theta) with alpha/theta already in RADIANS
and return a (4, 4) homogeneous transform. Unit conversion (the reference
feeds degrees into these) is the caller's job via RobotSpec.
"""

from __future__ import annotations

import jax.numpy as jnp


def standard_dh_matrix(a, d, alpha, theta) -> jnp.ndarray:
    """Standard DH transform: Rz(theta) Tz(d) Tx(a) Rx(alpha)."""
    ct, st = jnp.cos(theta), jnp.sin(theta)
    ca, sa = jnp.cos(alpha), jnp.sin(alpha)
    zero = jnp.zeros_like(ct)
    one = jnp.ones_like(ct)
    return jnp.stack(
        [
            jnp.stack([ct, -st * ca, st * sa, a * ct]),
            jnp.stack([st, ct * ca, -ct * sa, a * st]),
            jnp.stack([zero, sa, ca, d * one]),
            jnp.stack([zero, zero, zero, one]),
        ]
    )


def modified_dh_matrix(a, d, alpha, theta) -> jnp.ndarray:
    """Craig's modified DH transform: Rx(alpha) Tx(a) Rz(theta) Tz(d)."""
    ct, st = jnp.cos(theta), jnp.sin(theta)
    ca, sa = jnp.cos(alpha), jnp.sin(alpha)
    zero = jnp.zeros_like(ct)
    one = jnp.ones_like(ct)
    return jnp.stack(
        [
            jnp.stack([ct, -st, zero, a * one]),
            jnp.stack([st * ca, ct * ca, -sa, -d * sa]),
            jnp.stack([st * sa, ct * sa, ca, d * ca]),
            jnp.stack([zero, zero, zero, one]),
        ]
    )

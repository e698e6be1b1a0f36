"""GPU-free binary morphology (erode / dilate) on device.

Replaces the reference's box-convolution morphology (utils/util.py:73-89)
with a windowed sum via ``lax.reduce_window`` — identical outputs for the
binary masks used throughout (erode: window sum == ks²; dilate: sum >= 1),
including the asymmetric padding values (1 for erode, 0 for dilate).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("ks", "mode"))
def morph(mask: jax.Array, ks: int, mode: str = "erode") -> jax.Array:
    """mask: (B, H, W, 1) float in {0,1}; ks: odd kernel size."""
    pad = ks // 2
    n_ks = float(ks * ks)
    pad_value = 1.0 if mode == "erode" else 0.0
    padded = jnp.pad(
        mask,
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
        constant_values=pad_value,
    )
    sums = jax.lax.reduce_window(
        padded, 0.0, jax.lax.add,
        window_dimensions=(1, ks, ks, 1),
        window_strides=(1, 1, 1, 1),
        padding="VALID",
    )
    if mode == "erode":
        return (sums == n_ks).astype(mask.dtype)
    return (sums >= 1.0).astype(mask.dtype)

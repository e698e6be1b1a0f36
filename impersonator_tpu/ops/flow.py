"""Correspondence-flow field T and fim encodings.

The reference computes the liquid-warping flow with a per-sample python
loop (``SMPLRenderer.cal_bc_transform``, utils/nmr.py:617-659) — its
second hot spot after the rasterizer. On TPU the whole thing is a single
batched gather + weighted reduce, fully fused by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BG_FLOW = -2.0  # background flow value; lands outside [-1,1] so the
                # zero-padding grid_sample writes 0 there (nmr.py:600,627)


def correspondence_flow(src_f2pts: jax.Array, dst_fim: jax.Array, dst_wim: jax.Array):
    """Build T: for every target pixel covered by face f, the source-image
    position of that face blended by the barycentric weights.

    src_f2pts: (B, nf, 3, 2) source-image xy of each face's vertices
    dst_fim:   (B, H, W) int32 (-1 = background)
    dst_wim:   (B, H, W, 3)
    Returns T: (B, H, W, 2), background = -2.

    Equivalent to cal_bc_transform (nmr.py:617-659) without the loop.
    """
    covered = dst_fim >= 0
    safe_idx = jnp.where(covered, dst_fim, 0)
    # gather (B, H, W, 3, 2) then reduce over the 3 vertices
    gathered = jnp.take_along_axis(
        src_f2pts[:, :, None, None, :, :],  # (B, nf, 1, 1, 3, 2)
        safe_idx[:, None, :, :, None, None].astype(jnp.int32),
        axis=1,
    )[:, 0]  # (B, H, W, 3, 2)
    t = jnp.einsum("bhwk,bhwkc->bhwc", dst_wim, gathered)
    return jnp.where(covered[..., None], t, BG_FLOW)


def identity_flow(batch: int, image_size: int, dtype=jnp.float32) -> jax.Array:
    """Identity sampling grid in [-1, 1], (B, S, S, 2) with (x, y) order.

    Matches SMPLRenderer.create_meshgrid (nmr.py:491-504)."""
    f = (jnp.arange(image_size, dtype=dtype) / (image_size - 1) - 0.5) * 2.0
    yv, xv = jnp.meshgrid(f, f, indexing="ij")
    grid = jnp.stack([xv, yv], axis=-1)
    return jnp.broadcast_to(grid, (batch, image_size, image_size, 2))


def face_visibility(fim: jax.Array, nf: int) -> jax.Array:
    """(B, H, W) fim -> (B, nf) bool: face appears in the map.

    Replaces the ``fim.unique()`` python loops of get_vis_f2pts /
    set_null_f2pts (nmr.py:506-585) with a scatter."""
    b = fim.shape[0]
    flat = fim.reshape(b, -1)
    safe = jnp.where(flat >= 0, flat, nf)
    vis = jnp.zeros((b, nf + 1), jnp.int32)
    vis = vis.at[jnp.arange(b)[:, None], safe].add(1)
    return vis[:, :nf] > 0


def visible_f2pts(f2pts: jax.Array, fim: jax.Array) -> jax.Array:
    """Keep only faces visible in fim; others get -2 (get_vis_f2pts)."""
    nf = f2pts.shape[1]
    vis = face_visibility(fim, nf)
    return jnp.where(vis[:, :, None, None], f2pts, BG_FLOW)


def null_visible_f2pts(f2pts: jax.Array, fim: jax.Array) -> jax.Array:
    """Null out faces visible in fim (set_null_f2pts, nmr.py:548-585)."""
    nf = f2pts.shape[1]
    vis = face_visibility(fim, nf)
    return jnp.where(vis[:, :, None, None], BG_FLOW, f2pts)


def encode_fim(fim: jax.Array, map_fn: jax.Array) -> jax.Array:
    """Gather the face→code table by face index.

    fim: (B, H, W) int32 with -1 background; map_fn: (nf+1, C) whose last
    row is the background code (torch indexes it via fim==-1 negative
    indexing — SMPLRenderer.encode_fim, nmr.py:328-341).
    Returns (B, H, W, C) float (NHWC; the reference transposes to NCHW).
    """
    nf = map_fn.shape[0] - 1
    idx = jnp.where(fim < 0, nf, fim)
    return map_fn[idx]


def masked_identity_and_swap_flows(
    part_mask_src: jax.Array,
    t21: jax.Array,
    identity_grid: jax.Array,
):
    """Compose the swapper's T11 (identity grid on kept parts) given a
    source part mask; see Swapper.calculate_trans (swapper.py:242-253)."""
    return jnp.where(part_mask_src[..., None] > 0, identity_grid, BG_FLOW), t21

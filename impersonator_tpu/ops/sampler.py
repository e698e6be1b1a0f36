"""Bilinear sampling/warping with PyTorch-1.2 semantics.

The Liquid Warping Block and every T-based warp in the reference use
``F.grid_sample`` under torch==1.2, whose defaults are
``align_corners=True`` + zero padding (SURVEY §7.4); the feature-pyramid
flow resize uses ``F.interpolate(..., align_corners=True)``
(generator.py:303-310). Both are reproduced here exactly, NHWC.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def grid_sample(x: jax.Array, grid: jax.Array) -> jax.Array:
    """Bilinear sample ``x`` at ``grid`` positions.

    x:    (B, H, W, C) — B may be 1 with a batched grid: the gather
          broadcasts over the batch axis WITHOUT materializing the
          broadcast image. (Materializing first is a TPU perf trap: XLA
          lays broadcast buffers out batch-minor, which turns every
          gathered C-element row into C strided reads — measured 40×
          slower inside the fused imitation step.)
    grid: (N, Ho, Wo, 2) in [-1, 1]; grid[..., 0] = x (width) coordinate,
          grid[..., 1] = y — the torch convention.
    Zero padding: any corner outside the image contributes 0, so grids set
    to -2 (the background flow) sample exactly 0.
    """
    b, h, w, c = x.shape
    gb = grid.shape[0]
    ob = max(b, gb)
    ho, wo = grid.shape[1], grid.shape[2]

    # align_corners=True: -1 -> 0, +1 -> size-1
    fx = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
    fy = (grid[..., 1] + 1.0) * 0.5 * (h - 1)

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    # lerp weights in the input dtype so bf16 features stay bf16
    # (coordinates themselves stay fp32 for index precision)
    tx = (fx - x0)[..., None].astype(x.dtype)
    ty = (fy - y0)[..., None].astype(x.dtype)

    flat = x.reshape(b, h * w, c)

    def corner(xc, yc):
        valid = ((xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1))
        xi = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
        lin = (yi * w + xi).reshape(gb, ho * wo)
        vals = jnp.take_along_axis(flat, lin[..., None], axis=1)
        vals = vals.reshape(ob, ho, wo, c)
        return vals * valid[..., None].astype(x.dtype)

    v00 = corner(x0, y0)
    v01 = corner(x0 + 1, y0)
    v10 = corner(x0, y0 + 1)
    v11 = corner(x0 + 1, y0 + 1)

    top = v00 * (1 - tx) + v01 * tx
    bot = v10 * (1 - tx) + v11 * tx
    return top * (1 - ty) + bot * ty


def grid_sample_patched(x: jax.Array, grid: jax.Array) -> jax.Array:
    """:func:`grid_sample` with ONE gather instead of four.

    TPU gathers cost per ROW (index staging + row fetch), not per byte:
    the four bilinear corner gathers of :func:`grid_sample` plus their
    s32 index staging copies measured ~18ms/step at batch 16×256² in the
    imitation loop. Here the image is zero-padded by 1 on every side and
    each padded position's 2×2 neighbourhood is packed into one 4C-row
    table, so all four corners arrive in a single row gather driven by a
    single index set. Padding doubles as the zero-padding boundary: any
    corner outside the image reads a zero row, and fully-background
    grids (-2) clip to the all-zero top-left patch, scaled to 0 by the
    validity mask exactly as in :func:`grid_sample`.

    Numerically identical to :func:`grid_sample` (same weights, same
    corner values — tested bit-exact). Table build is 4C/C times the
    image bytes — use for small C (the full-res RGB warps); for wide
    feature maps the 4× table traffic cancels the row savings.
    """
    b, h, w, c = x.shape
    gb = grid.shape[0]
    ob = max(b, gb)
    ho, wo = grid.shape[1], grid.shape[2]

    fx = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
    fy = (grid[..., 1] + 1.0) * 0.5 * (h - 1)
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = (fx - x0)[..., None].astype(x.dtype)
    ty = (fy - y0)[..., None].astype(x.dtype)

    # patch table over the 1-padded image: row (y, x) of the (H+1, W+1)
    # table holds the padded pixels [(y,x), (y,x+1), (y+1,x), (y+1,x+1)],
    # i.e. original corners [(y-1,x-1) .. (y,x)]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    table = jnp.concatenate(
        [xp[:, :-1, :-1], xp[:, :-1, 1:], xp[:, 1:, :-1], xp[:, 1:, 1:]],
        axis=-1)                                   # (B, H+1, W+1, 4C)
    flat = table.reshape(b, (h + 1) * (w + 1), 4 * c)

    xi = jnp.clip(x0 + 1, 0, w).astype(jnp.int32)  # padded coords
    yi = jnp.clip(y0 + 1, 0, h).astype(jnp.int32)
    lin = (yi * (w + 1) + xi).reshape(gb, ho * wo)
    patch = jnp.take_along_axis(flat, lin[..., None], axis=1)
    patch = patch.reshape(ob, ho, wo, 4 * c)

    def vmask(xc, yc):
        # identical per-corner validity to grid_sample; when the patch
        # index clipped (x0 < -1 or > w-1), every corner is out of range
        # so the wrong-patch values are zeroed regardless
        ok = (xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1)
        return ok[..., None].astype(x.dtype)

    # static channel slices, not a (..., 4, c) reshape — the 5-D view
    # forces an XLA relayout of the gathered rows (~2.8ms/step at 256²)
    v00 = patch[..., 0 * c:1 * c] * vmask(x0, y0)
    v01 = patch[..., 1 * c:2 * c] * vmask(x0 + 1, y0)
    v10 = patch[..., 2 * c:3 * c] * vmask(x0, y0 + 1)
    v11 = patch[..., 3 * c:4 * c] * vmask(x0 + 1, y0 + 1)

    top = v00 * (1 - tx) + v01 * tx
    bot = v10 * (1 - tx) + v11 * tx
    return top * (1 - ty) + bot * ty


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_bilinear_align(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize with align_corners=True, NHWC.

    Equivalent to torch F.interpolate(mode='bilinear', align_corners=True).
    """
    b, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x

    def axis_coords(n_in, n_out):
        if n_out == 1:
            return jnp.zeros((1,), jnp.float32)
        return jnp.arange(n_out, dtype=jnp.float32) * ((n_in - 1) / (n_out - 1))

    fy = axis_coords(h, out_h)
    fx = axis_coords(w, out_w)

    def interp_axis(arr, coords, axis):
        lo = jnp.floor(coords).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, arr.shape[axis] - 1)
        t = (coords - lo).reshape(
            [-1 if i == axis else 1 for i in range(arr.ndim)]
        ).astype(arr.dtype)
        a = jnp.take(arr, lo, axis=axis)
        b_ = jnp.take(arr, hi, axis=axis)
        return a * (1 - t) + b_ * t

    x = interp_axis(x, fy, axis=1)
    x = interp_axis(x, fx, axis=2)
    return x


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_bilinear_torch(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize with align_corners=False (half-pixel centers), no
    antialiasing — torch F.interpolate(mode='bilinear') default. Used by
    the metric preprocessors (his_evaluators metrics.py:666,737: resize to
    299² before InceptionV3)."""
    b, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x

    def axis_coords(n_in, n_out):
        scale = n_in / n_out
        src = (jnp.arange(n_out, dtype=jnp.float32) + 0.5) * scale - 0.5
        return jnp.clip(src, 0.0, n_in - 1)

    fy = axis_coords(h, out_h)
    fx = axis_coords(w, out_w)

    def interp_axis(arr, coords, axis):
        lo = jnp.floor(coords).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, arr.shape[axis] - 1)
        t = (coords - lo).reshape(
            [-1 if i == axis else 1 for i in range(arr.ndim)]
        ).astype(arr.dtype)
        a = jnp.take(arr, lo, axis=axis)
        b_ = jnp.take(arr, hi, axis=axis)
        return a * (1 - t) + b_ * t

    x = interp_axis(x, fy, axis=1)
    x = interp_axis(x, fx, axis=2)
    return x


def resize_flow(t: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Resize a flow field T (B, H, W, 2) to feature resolution.

    Matches ImpersonatorGenerator.resize_trans (generator.py:303-310):
    channel-wise bilinear with align_corners=True; values are positions in
    [-1, 1] so no magnitude rescaling is needed.
    """
    return resize_bilinear_align(t, out_h, out_w)


def warp_feature(x: jax.Array, t: jax.Array) -> jax.Array:
    """Liquid Warping Block primitive: resize T to x's spatial dims and
    bilinearly warp (generator.py:312-320)."""
    b, h, w, c = x.shape
    return grid_sample(x, resize_flow(t, h, w))

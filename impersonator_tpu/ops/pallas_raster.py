"""Pallas TPU kernels for the rasterizer's z-buffer stage.

Two generations:

* :func:`zbuffer_tiles` — fixed-slot design: every 8×8 tile gets a
  dense ``cap``-slot candidate array (built by the XLA pair-sort), and
  the kernel scans all slots. Kept for the XLA-path comparison tests.

* :func:`zbuffer_bucket_rows` — the production work-efficient design.
  Faces are sorted ONCE by their top-left covered tile ("bucket"), so a
  tile's candidates are ``span`` CONTIGUOUS row-ranges of the sorted
  table (plus one shared oversized range). The kernel slices the
  VMEM-resident sorted table directly via 128-aligned dynamic slices —
  no per-tile candidate materialization, no big gather, and per-tile
  work proportional to REAL occupancy (fori_loop over only the chunks a
  range needs; empty ranges cost nothing). Each program covers ``txb``
  adjacent tiles of one tile-row to amortize grid overhead.
  Aligned windows may include stray faces from neighbouring buckets;
  every stray is either re-filtered by the exact per-pixel tests
  (inside/z-range decide coverage, same formulas as the brute kernel;
  back faces never reach the kernel — the bucket sort routes them past
  the end sentinel) or a duplicate of another range's candidate — and duplicates
  are idempotent under the (z, face-id) lexicographic min. Ties break to
  the LOWEST FACE ID explicitly (the CUDA kernel's tie-break,
  rasterize_cuda_kernel.cu:160-170), independent of slot order.

Measured on v5e at 256², batch 16, 12.9k faces: 24ms/batch vs 222ms for
the fixed-slot pipeline (the pair-sort and its 226MB gather dominated).
Parity vs the brute z-buffer on TPU: fim bit-exact (face ids match
everywhere), wim within 2.8e-3 (barycentric solve order differs;
bench.py asserts < 5e-3 every run). ``interpret=True`` runs either
kernel on CPU for tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = (1 << 30)  # python literal: jnp constants would be captured tracers


def _make_kernel(s: int, g: int, tile: int, n_chunks: int, chunk: int,
                 near: float, far: float):
    tpx = tile * tile

    def kernel(cdata_ref, cand_ref, valid_ref, fim_ref, w0_ref, w1_ref, w2_ref):
        t = pl.program_id(1)
        ty = t // g
        tx = t % g

        # pixel coordinates of this tile, (tpx, 1), row-major (y, x).
        # Built via div/mod on a flat iota — Mosaic rejects (t, t)->(tpx, 1)
        # shape casts, and TPU iota must be integer-typed.
        pidx = jax.lax.broadcasted_iota(jnp.int32, (tpx, 1), 0)
        yi = (pidx // tile + ty * tile).astype(jnp.float32)
        xi = (pidx % tile + tx * tile).astype(jnp.float32)
        sf = float(s)
        xp = (2.0 * xi + 1.0 - sf) / sf
        yp = (2.0 * yi + 1.0 - sf) / sf

        lane = jax.lax.broadcasted_iota(jnp.int32, (tpx, chunk), 1)

        best_z = jnp.full((tpx, 1), far, jnp.float32)
        best_i = jnp.full((tpx, 1), -1, jnp.int32)
        best_w0 = jnp.zeros((tpx, 1), jnp.float32)
        best_w1 = jnp.zeros((tpx, 1), jnp.float32)
        best_w2 = jnp.zeros((tpx, 1), jnp.float32)

        for c in range(n_chunks):
            sl = pl.ds(c * chunk, chunk)
            d = cdata_ref[0, 0, :, sl]         # (9, C)
            ids = cand_ref[0, 0, :, sl]        # (1, C)
            ok = valid_ref[0, 0, :, sl] > 0    # (1, C)

            fx0, fy0, fz0 = d[0:1, :], d[1:2, :], d[2:3, :]
            fx1, fy1, fz1 = d[3:4, :], d[4:5, :], d[5:6, :]
            fx2, fy2, fz2 = d[6:7, :], d[7:8, :], d[8:9, :]

            # inverse-barycentric rows (pixel-index space), per (1, C)
            p0x = 0.5 * (fx0 * sf + sf - 1.0)
            p0y = 0.5 * (fy0 * sf + sf - 1.0)
            p1x = 0.5 * (fx1 * sf + sf - 1.0)
            p1y = 0.5 * (fy1 * sf + sf - 1.0)
            p2x = 0.5 * (fx2 * sf + sf - 1.0)
            p2y = 0.5 * (fy2 * sf + sf - 1.0)
            denom = (p2x * (p0y - p1y) + p0x * (p1y - p2y)
                     + p1x * (p2y - p0y))
            rden = 1.0 / jnp.where(denom == 0.0, 1.0, denom)

            # inside test at pixel centers, (tpx, C)
            t0 = (yp - fy0) * (fx1 - fx0) - (xp - fx0) * (fy1 - fy0)
            t1 = (yp - fy1) * (fx2 - fx1) - (xp - fx1) * (fy2 - fy1)
            t2 = (yp - fy2) * (fx0 - fx2) - (xp - fx2) * (fy0 - fy2)
            inside = (t0 >= 0) & (t1 >= 0) & (t2 >= 0)

            w0 = jnp.clip(((p1y - p2y) * rden) * xi + ((p2x - p1x) * rden) * yi
                          + (p1x * p2y - p2x * p1y) * rden, 0.0, 1.0)
            w1 = jnp.clip(((p2y - p0y) * rden) * xi + ((p0x - p2x) * rden) * yi
                          + (p2x * p0y - p0x * p2y) * rden, 0.0, 1.0)
            w2 = jnp.clip(((p0y - p1y) * rden) * xi + ((p1x - p0x) * rden) * yi
                          + (p0x * p1y - p1x * p0y) * rden, 0.0, 1.0)
            wsum = w0 + w1 + w2
            wsum = jnp.where(wsum == 0.0, 1.0, wsum)
            w0, w1, w2 = w0 / wsum, w1 / wsum, w2 / wsum

            inv_z = w0 / fz0 + w1 / fz1 + w2 / fz2
            zp = 1.0 / inv_z
            valid = inside & ok & (zp > near) & (zp < far)
            zp = jnp.where(valid, zp, far)

            # lane-wise winner: min depth, then lowest slot on ties
            lz = jnp.min(zp, axis=1, keepdims=True)          # (tpx, 1)
            at_min = zp == lz
            li = jnp.min(jnp.where(at_min, lane, BIG), axis=1,
                         keepdims=True)                      # (tpx, 1)
            sel = lane == li

            def pick(v):
                return jnp.sum(jnp.where(sel, v, 0.0), axis=1, keepdims=True)

            lid = jnp.sum(jnp.where(sel, jnp.broadcast_to(ids, (tpx, chunk)),
                                    0), axis=1, keepdims=True)

            better = lz < best_z
            best_w0 = jnp.where(better, pick(w0), best_w0)
            best_w1 = jnp.where(better, pick(w1), best_w1)
            best_w2 = jnp.where(better, pick(w2), best_w2)
            best_i = jnp.where(better, lid.astype(jnp.int32), best_i)
            best_z = jnp.where(better, lz, best_z)

        fim_ref[0, 0] = best_i
        w0_ref[0, 0] = best_w0
        w1_ref[0, 0] = best_w1
        w2_ref[0, 0] = best_w2

    return kernel


@partial(jax.jit, static_argnames=("s", "tile", "near", "far", "chunk",
                                   "interpret"))
def zbuffer_tiles(cdata_t, cand_t, valid_t, s: int, tile: int,
                  near: float, far: float, chunk: int = 128,
                  interpret: bool = False):
    """Run the z-buffer over all tiles.

    cdata_t: (B, n_tiles, 9, cap_pad) packed candidate verts (transposed
             so lanes index candidates)
    cand_t:  (B, n_tiles, 1, cap_pad) int32 face ids
    valid_t: (B, n_tiles, 1, cap_pad) int32 validity
    Returns flat per-tile maps: fim (B, n_tiles, tpx, 1) int32 and
    w0/w1/w2 (B, n_tiles, tpx, 1) float32 (row-major pixels within tile).
    """
    b, n_tiles, _, cap_pad = cdata_t.shape
    g = int(round((n_tiles) ** 0.5))
    assert g * g == n_tiles
    assert cap_pad % chunk == 0
    n_chunks = cap_pad // chunk

    kernel = _make_kernel(s, g, tile, n_chunks, chunk, near, far)
    grid = (b, n_tiles)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 9, cap_pad), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, cap_pad), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, cap_pad), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((1, 1, tile * tile, 1), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM) for _ in range(4)),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_tiles, tile * tile, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, n_tiles, tile * tile, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, n_tiles, tile * tile, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, n_tiles, tile * tile, 1), jnp.float32),
        ),
        interpret=interpret,
    )(cdata_t, cand_t, valid_t)


# ---------------------------------------------------------------------------
# Bucket-row kernel (production TPU path)
# ---------------------------------------------------------------------------


def _make_bucket_kernel(s, g, tile, span, chunk, near, far, txb,
                        flow=False):
    """Bucket-row z-buffer kernel body. ``flow=False`` emits
    (fim, w0, w1, w2); ``flow=True`` additionally consumes a per-face
    source-xy table and emits (fim, tx, ty) — the winner's barycentric
    blend of its SOURCE-image vertex positions, i.e. the liquid-warping
    correspondence flow T fused into the raster (replaces the 1M-index
    per-pixel gather + einsum of ops.flow.correspondence_flow on the
    imitation hot path; background = -2)."""
    tpb = tile * tile * txb      # pixels per program (txb adjacent tiles)

    def kernel(*refs):
        if flow:
            (starts_ref, verts_ref, fid_ref, srcxy_ref,
             fim_ref, w0_ref, w1_ref) = refs
            w2_ref = None
        else:
            (starts_ref, verts_ref, fid_ref,
             fim_ref, w0_ref, w1_ref, w2_ref) = refs
        ty = pl.program_id(1)
        txg = pl.program_id(2)
        tx0 = txg * txb

        # pixel coords: rows [ty*tile, +tile) x cols [tx0*tile, +txb*tile)
        pidx = jax.lax.broadcasted_iota(jnp.int32, (tpb, 1), 0)
        w = tile * txb
        yi = (pidx // w + ty * tile).astype(jnp.float32)
        xi = (pidx % w + tx0 * tile).astype(jnp.float32)
        sf = float(s)
        xp = (2.0 * xi + 1.0 - sf) / sf
        yp = (2.0 * yi + 1.0 - sf) / sf

        lane = jax.lax.broadcasted_iota(jnp.int32, (tpb, chunk), 1)

        def process_chunk(carry, c0, r1):
            best_z, best_i, best_w0, best_w1, best_w2 = carry
            d = verts_ref[0, :, pl.ds(c0, chunk)]          # (9, C)
            ids = fid_ref[0, :, pl.ds(c0, chunk)]          # (1, C)
            sxy = srcxy_ref[0, :, pl.ds(c0, chunk)] if flow else None
            in_range = (lane + c0) < r1

            fx0, fy0, fz0 = d[0:1, :], d[1:2, :], d[2:3, :]
            fx1, fy1, fz1 = d[3:4, :], d[4:5, :], d[5:6, :]
            fx2, fy2, fz2 = d[6:7, :], d[7:8, :], d[8:9, :]

            # No in-kernel backface cull: the bucket sort already routes
            # non-front faces to the cull bucket past the end sentinel
            # (rasterizer._bucket_sort `base`), no scanned range reaches
            # them, and in_range masks the zero padding — every candidate
            # the kernel sees is front-facing by construction.

            p0x = 0.5 * (fx0 * sf + sf - 1.0)
            p0y = 0.5 * (fy0 * sf + sf - 1.0)
            p1x = 0.5 * (fx1 * sf + sf - 1.0)
            p1y = 0.5 * (fy1 * sf + sf - 1.0)
            p2x = 0.5 * (fx2 * sf + sf - 1.0)
            p2y = 0.5 * (fy2 * sf + sf - 1.0)
            denom = (p2x * (p0y - p1y) + p0x * (p1y - p2y)
                     + p1x * (p2y - p0y))
            rden = 1.0 / jnp.where(denom == 0.0, 1.0, denom)

            t0 = (yp - fy0) * (fx1 - fx0) - (xp - fx0) * (fy1 - fy0)
            t1 = (yp - fy1) * (fx2 - fx1) - (xp - fx1) * (fy2 - fy1)
            t2 = (yp - fy2) * (fx0 - fx2) - (xp - fx2) * (fy0 - fy2)
            inside = (t0 >= 0) & (t1 >= 0) & (t2 >= 0)

            w0 = jnp.clip(((p1y - p2y) * rden) * xi
                          + ((p2x - p1x) * rden) * yi
                          + (p1x * p2y - p2x * p1y) * rden, 0.0, 1.0)
            w1 = jnp.clip(((p2y - p0y) * rden) * xi
                          + ((p0x - p2x) * rden) * yi
                          + (p2x * p0y - p0x * p2y) * rden, 0.0, 1.0)
            w2 = jnp.clip(((p0y - p1y) * rden) * xi
                          + ((p1x - p0x) * rden) * yi
                          + (p0x * p1y - p1x * p0y) * rden, 0.0, 1.0)
            wsum = w0 + w1 + w2
            wsum = jnp.where(wsum == 0.0, 1.0, wsum)
            # one reciprocal + 3 muls instead of 3 (tpb, C) divides; fz
            # reciprocals are per-face (1, C) rows — the same trick the
            # tiled XLA path uses (rasterizer.py:655-678), which bit-
            # matches the division-form brute oracle on body meshes
            rws = 1.0 / wsum
            w0, w1, w2 = w0 * rws, w1 * rws, w2 * rws

            rz0 = 1.0 / fz0
            rz1 = 1.0 / fz1
            rz2 = 1.0 / fz2
            inv_z = w0 * rz0 + w1 * rz1 + w2 * rz2
            zp = 1.0 / inv_z
            valid = inside & in_range & (zp > near) & (zp < far)
            zp = jnp.where(valid, zp, far)

            # lane winner: min z, then lowest face id on exact z ties.
            # Each face appears exactly once in the sorted table, so ids
            # are unique within a chunk and (at_min & id == li_id) already
            # selects a single lane — no second lane-reduction needed.
            lz = jnp.min(zp, axis=1, keepdims=True)
            at_min = (zp == lz) & valid
            idb = jnp.broadcast_to(ids, (tpb, chunk))
            li_id = jnp.min(jnp.where(at_min, idb, BIG), axis=1,
                            keepdims=True)
            sel = at_min & (idb == li_id)

            def pick(v):
                return jnp.sum(jnp.where(sel, v, 0.0), axis=1,
                               keepdims=True)

            lid = jnp.sum(jnp.where(sel, idb, 0), axis=1, keepdims=True)
            has = lz < far
            better = has & ((lz < best_z)
                            | ((lz == best_z) & (best_i >= 0)
                               & (lid < best_i)))
            if flow:
                tx = w0 * sxy[0:1, :] + w1 * sxy[2:3, :] + w2 * sxy[4:5, :]
                ty = w0 * sxy[1:2, :] + w1 * sxy[3:4, :] + w2 * sxy[5:6, :]
                best_w0 = jnp.where(better, pick(tx), best_w0)
                best_w1 = jnp.where(better, pick(ty), best_w1)
            else:
                best_w0 = jnp.where(better, pick(w0), best_w0)
                best_w1 = jnp.where(better, pick(w1), best_w1)
                best_w2 = jnp.where(better, pick(w2), best_w2)
            best_i = jnp.where(better, lid.astype(jnp.int32), best_i)
            best_z = jnp.where(better, lz, best_z)
            return best_z, best_i, best_w0, best_w1, best_w2

        bg = -2.0 if flow else 0.0   # uncovered pixels: BG_FLOW vs w=0
        carry = (jnp.full((tpb, 1), far, jnp.float32),
                 jnp.full((tpb, 1), -1, jnp.int32),
                 jnp.full((tpb, 1), bg, jnp.float32),
                 jnp.full((tpb, 1), bg, jnp.float32),
                 jnp.zeros((tpb, 1), jnp.float32))

        # span merged row-ranges + the shared oversized bucket at T
        for dy in range(span + 1):
            if dy < span:
                row = ty - dy
                ok_row = row >= 0
                lo_idx = row * g + jnp.maximum(tx0 - (span - 1), 0)
                hi_idx = row * g + jnp.minimum(tx0 + txb - 1, g - 1)
            else:
                ok_row = True
                lo_idx = g * g
                hi_idx = g * g
            r0 = starts_ref[0, 0, jnp.maximum(lo_idx, 0)]
            r1 = starts_ref[0, 0, jnp.maximum(hi_idx, 0) + 1]
            a0 = (r0 // chunk) * chunk
            # empty ranges skip entirely — the aligned window would
            # otherwise still schedule one chunk
            n_ch = jnp.where(ok_row & (r1 > r0),
                             (r1 - a0 + chunk - 1) // chunk, 0)

            def body(ci, carry):
                c0 = pl.multiple_of(a0 + ci * chunk, chunk)
                return process_chunk(carry, c0, r1)

            carry = jax.lax.fori_loop(0, n_ch, body, carry)

        _, best_i, best_w0, best_w1, best_w2 = carry
        fim_ref[0, 0, 0] = best_i
        w0_ref[0, 0, 0] = best_w0
        w1_ref[0, 0, 0] = best_w1
        if w2_ref is not None:
            w2_ref[0, 0, 0] = best_w2

    return kernel


@partial(jax.jit, static_argnames=("s", "tile", "span", "near", "far",
                                   "chunk", "txb", "interpret"))
def zbuffer_bucket_rows(verts_t, fid_t, starts, s: int, tile: int,
                        span: int, near: float, far: float,
                        chunk: int = 128, txb: int = 4,
                        interpret: bool = False):
    """Work-efficient z-buffer over bucket-sorted faces.

    verts_t: (B, 9, nf_pad) packed verts sorted by bucket key
    fid_t:   (B, 1, nf_pad) original face ids in the same order
    starts:  (B, 1, T+2) int32 bucket range starts (cumulative),
             entry T = oversized bucket, entry T+1 = end sentinel
    Returns fim (B, g, g//txb, tile*tile*txb, 1) int32 and three weight
    maps of the same shape (row-major pixels within each program block).
    """
    b, _, nf_pad = verts_t.shape
    g = s // tile
    n_tiles = g * g
    assert g % txb == 0
    assert nf_pad % chunk == 0
    tpb = tile * tile * txb
    kernel = _make_bucket_kernel(s, g, tile, span, chunk, near, far, txb)
    nxg = g // txb
    return pl.pallas_call(
        kernel,
        grid=(b, g, nxg),
        in_specs=[
            pl.BlockSpec((1, 1, n_tiles + 2), lambda i, j, k: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 9, nf_pad), lambda i, j, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nf_pad), lambda i, j, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((1, 1, 1, tpb, 1),
                         lambda i, j, k: (i, j, k, 0, 0),
                         memory_space=pltpu.VMEM) for _ in range(4)),
        out_shape=(
            jax.ShapeDtypeStruct((b, g, nxg, tpb, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, g, nxg, tpb, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, g, nxg, tpb, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, g, nxg, tpb, 1), jnp.float32),
        ),
        interpret=interpret,
    )(starts, verts_t, fid_t)


@partial(jax.jit, static_argnames=("s", "tile", "span", "near", "far",
                                   "chunk", "txb", "interpret"))
def zbuffer_bucket_flow(verts_t, fid_t, srcxy_t, starts, s: int, tile: int,
                        span: int, near: float, far: float,
                        chunk: int = 128, txb: int = 4,
                        interpret: bool = False):
    """Fused z-buffer + correspondence flow over bucket-sorted faces.

    Same candidate layout as :func:`zbuffer_bucket_rows`, plus
    srcxy_t: (B, 6, nf_pad) per-face SOURCE-image vertex xy
    ([x0 y0 x1 y1 x2 y2]) in the same sorted order. Returns
    fim (B, g, g//txb, tpb, 1) int32 and tx/ty maps of the same shape:
    the winning face's barycentric blend of its source positions
    (= the liquid-warping flow T), -2 on background.
    """
    b, _, nf_pad = verts_t.shape
    g = s // tile
    n_tiles = g * g
    assert g % txb == 0
    assert nf_pad % chunk == 0
    tpb = tile * tile * txb
    kernel = _make_bucket_kernel(s, g, tile, span, chunk, near, far, txb,
                                 flow=True)
    nxg = g // txb
    return pl.pallas_call(
        kernel,
        grid=(b, g, nxg),
        in_specs=[
            pl.BlockSpec((1, 1, n_tiles + 2), lambda i, j, k: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 9, nf_pad), lambda i, j, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nf_pad), lambda i, j, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6, nf_pad), lambda i, j, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((1, 1, 1, tpb, 1),
                         lambda i, j, k: (i, j, k, 0, 0),
                         memory_space=pltpu.VMEM) for _ in range(3)),
        out_shape=(
            jax.ShapeDtypeStruct((b, g, nxg, tpb, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, g, nxg, tpb, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, g, nxg, tpb, 1), jnp.float32),
        ),
        interpret=interpret,
    )(starts, verts_t, fid_t, srcxy_t)

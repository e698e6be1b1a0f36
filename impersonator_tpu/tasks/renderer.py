"""Renderer facade: the device-side state + pure functions that every
task shares.

This is the TPU-native replacement for the reference's ``SMPLRenderer``
module (utils/nmr.py:103-663): an immutable bundle of constant arrays
(faces, map-function tables, UV samplers) plus jit-friendly methods that
compose ``ops.rasterizer`` / ``ops.flow``. There is no hidden state — all
methods are pure in (state, inputs).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from impersonator_tpu.assets import SMPLAssets
from impersonator_tpu.ops import flow as flow_ops
from impersonator_tpu.ops import rasterizer as rast
from impersonator_tpu.ops.projection import DEFAULT_EYE_Z, eye_z
from impersonator_tpu.ops.sampler import grid_sample


@dataclasses.dataclass(frozen=True)
class SMPLRenderer:
    """Constant renderer state. Construct once per task via ``create``."""

    faces: jax.Array          # (nf, 3) int32
    map_fn: jax.Array         # (nf+1, C) — default conditioning encoding
    back_map_fn: jax.Array    # (nf+1, 1)
    front_map_fn: jax.Array | None
    f2uvs: jax.Array          # (nf, 3, 2)
    image_size: int = 256
    tex_size: int = 3
    near: float = rast.DEFAULT_NEAR
    far: float = rast.DEFAULT_FAR
    eye_z_value: float = DEFAULT_EYE_Z

    @classmethod
    def create(cls, assets: SMPLAssets, image_size: int = 256,
               map_name: str = "uv_seg", tex_size: int = 3,
               has_front: bool = False, viewing_angle: float = 30.0):
        """Mirrors SMPLRenderer.__init__ (nmr.py:104-177)."""
        return cls(
            faces=jnp.asarray(assets.faces, jnp.int32),
            map_fn=jnp.asarray(assets.map_fn(map_name)),
            back_map_fn=jnp.asarray(assets.map_fn("back")),
            front_map_fn=(jnp.asarray(assets.map_fn("front"))
                          if has_front else None),
            f2uvs=jnp.asarray(assets.f2uvs),
            image_size=image_size,
            tex_size=tex_size,
            eye_z_value=eye_z(viewing_angle),
        )

    # -- geometry ----------------------------------------------------------

    def render_fim_wim(self, cam, verts):
        """(cam (B,3), verts (B,nv,3)) -> (f2verts, fim, wim)
        (nmr.py:263-278). f2verts is in raster space; use
        :meth:`f2pts_from_f2verts` for source-image coordinates.

        Uses the tiled/culled rasterizer when the image tiles evenly;
        falls back to the brute reference path otherwise (tiny test
        sizes)."""
        f2verts = rast.project_to_raster_space(
            verts, cam, self.faces, self.eye_z_value)
        s = self.image_size
        nf = self.faces.shape[0]
        tile, cap, span = self.tile_params()
        bucket = self._bucket_config()
        if bucket is not None:
            # Production TPU path: bucket-sorted work-efficient kernel
            # (ops/pallas_raster.zbuffer_bucket_rows; 8.9x the fixed-slot
            # pipeline at 256²).
            tile, span, txb = bucket
            fim, wim = rast.rasterize_fim_wim_bucket(
                f2verts, s, self.near, self.far, tile=tile, span=span,
                txb=txb)
        elif tile and nf > 256:
            # The tile side scales with resolution so per-tile face
            # occupancy is resolution-invariant (8px at 256² — measured
            # max 270 < cap 288 — 16px at 512², ...); tile_stats()
            # verifies headroom for any new geometry regime.
            fim, wim = rast.rasterize_fim_wim_tiled(
                f2verts, s, self.near, self.far, tile=tile,
                cap=min(cap, nf), span=span, backend="xla")
        else:
            fim, wim = rast.rasterize_fim_wim(
                f2verts, s, self.near, self.far)
        return f2verts, fim, wim

    def tile_params(self):
        """(tile, cap, span) of the production tiled path; tile=0 means
        the brute path is used (image doesn't tile evenly).

        * tile scales with resolution (8px at 256²) so per-tile face
          occupancy is resolution-invariant;
        * span scales with mesh coarseness: face linear size (in tiles)
          grows as sqrt(nf_ref / nf), so coarser-than-SMPL meshes widen
          the enumeration window; key-sort cost stays ~nf·span² ≈ const.
        """
        s = self.image_size
        tile = 8 * max(1, s // 256)
        if s % tile:
            tile = 8
        if s % tile:
            return 0, 0, 0
        nf = self.faces.shape[0]
        span = max(2, int(np.ceil(2.0 * np.sqrt(13776.0 / max(nf, 1)))))
        return tile, 288, span

    def _bucket_config(self):
        """(tile, span, txb) of the production bucket-Pallas path, or
        ``None`` where it doesn't apply — the ONE gate shared by
        render_fim_wim and render_flow so both always pick the same
        kernel for the same geometry. Conditions: image tiles evenly,
        mesh is big enough to amortize the sort (nf > 256) yet small
        enough for the sorted face table to stay VMEM-resident
        (nf ≤ 60000), and the backend is TPU (Mosaic).

        The schedule is sweep-tuned (tools/bench_breakdown.py --sweep,
        v5e, 256², batch 16, 12.9k faces; fused raster+flow ms/batch):
        tile=8:  txb=1: 26.4, txb=2: 21.7, txb=4: 22.3, txb=8: 30.7
        tile=16: txb=1: 18.3, txb=2: 23.5 (txb>=4 fails Mosaic
        lowering at tpb>=1024)
        ⇒ 16-px tiles with ONE tile per program win by ~16%: quadruple
        the pixels per candidate-row scan with no extra neighbour-row
        width. The bucket tile is chosen INDEPENDENTLY of
        ``tile_params`` — the fixed-slot XLA path must keep 8-px tiles
        (its 288-candidate occupancy cap would overflow at 16), while
        the bucket kernel has no cap. Span generalizes the tile_params
        formula to any (tile, s): face linear size in TILES scales as
        sqrt(13776/nf) · (s/256) · (8/tile)."""
        nf = self.faces.shape[0]
        tile8, _, _ = self.tile_params()
        if not (tile8 and 256 < nf <= 60000
                and jax.default_backend() == "tpu"):
            return None
        s = self.image_size
        tile = 16 if s % 16 == 0 else tile8
        span = max(2, int(np.ceil(2.0 * np.sqrt(13776.0 / max(nf, 1))
                                  * (s / 256.0) * (8.0 / tile))))
        txb = 1 if tile >= 16 else 2
        return tile, span, txb

    def tile_stats(self, f2verts):
        """Overflow diagnostics of the production tiled configuration —
        call from tests/bench/debug to assert the cap has headroom
        (ops.rasterizer.raster_tile_stats)."""
        tile, cap, span = self.tile_params()
        if not tile:
            return None
        return rast.raster_tile_stats(
            f2verts, self.image_size, self.far, tile=tile, cap=cap,
            span=span)

    @staticmethod
    def f2pts_from_f2verts(f2verts):
        """xy of projected face verts with y back in image-up convention
        (imitator.py:106-107: p2verts = f2verts[..., :2]; y *= -1)."""
        return f2verts[..., 0:2] * jnp.asarray([1.0, -1.0], f2verts.dtype)

    # -- encodings -----------------------------------------------------------

    def encode_fim(self, fim, map_fn=None):
        """fim -> conditioning map, NHWC (encode_fim, nmr.py:328-341)."""
        return flow_ops.encode_fim(fim, self.map_fn if map_fn is None else map_fn)

    def encode_front_fim(self, fim, front_fn: bool = True):
        """(encode_front_fim, nmr.py:343-352)."""
        table = self.front_map_fn if front_fn else self.back_map_fn
        if table is None:
            raise ValueError("renderer built without front map (has_front=False)")
        return flow_ops.encode_fim(fim, table)

    # -- flow ----------------------------------------------------------------

    def cal_bc_transform(self, src_f2pts, dst_fim, dst_wim):
        return flow_ops.correspondence_flow(src_f2pts, dst_fim, dst_wim)

    def render_flow(self, cam, verts, src_f2pts):
        """(cam (B,3), verts (B,nv,3), src_f2pts (Bs,nf,3,2)) ->
        (fim, T): the target-pose face-index map and the liquid-warping
        flow in one pass. On TPU this runs the fused raster+flow kernel
        (ops/rasterizer.rasterize_flow_bucket) — the z-buffer winner's
        source positions come straight out of the kernel instead of a
        per-pixel gather over fim/wim; elsewhere it composes the classic
        render_fim_wim + correspondence_flow pair (bit-compatible
        semantics, ULP-level T drift between the two — tested)."""
        s = self.image_size
        bucket = self._bucket_config()
        if bucket is not None:
            tile, span, txb = bucket
            f2verts = rast.project_to_raster_space(
                verts, cam, self.faces, self.eye_z_value)
            fim, t = rast.rasterize_flow_bucket(
                f2verts, src_f2pts, s, self.near, self.far, tile=tile,
                span=span, txb=txb)
            return fim, t
        _, fim, wim = self.render_fim_wim(cam, verts)
        return fim, flow_ops.correspondence_flow(src_f2pts, fim, wim)

    def get_vis_f2pts(self, f2pts, fim):
        return flow_ops.visible_f2pts(f2pts, fim)

    def set_null_f2pts(self, f2pts, fim):
        return flow_ops.null_visible_f2pts(f2pts, fim)

    # -- texture (debug / texture-warp ablation) ------------------------------

    def dynamic_sampler_grid(self, cam, verts):
        """Per-face T×T barycentric sample positions on the source image,
        (B, nf, T*T, 2) — SMPLRenderer.dynamic_sampler (nmr.py:382-388)."""
        from impersonator_tpu.ops.smpl import batch_orth_proj_idrot
        pts = batch_orth_proj_idrot(verts, cam)       # (B, nv, 2)
        fpts = pts[:, self.faces]                      # (B, nf, 3, 2)
        t = self.tex_size
        step = 1.0 if t == 1 else 1.0 / (t - 1)
        ab = jnp.arange(0.0, 1.0 + step, step)[:t]
        av, bv = jnp.meshgrid(ab, ab, indexing="ij")
        coords = jnp.stack([av.reshape(-1), bv.reshape(-1)], axis=0)  # (2, T*T)
        v2 = fpts[:, :, 2]
        edges = jnp.stack([fpts[:, :, 0] - v2, fpts[:, :, 1] - v2], axis=-1)
        samples = jnp.einsum("bfce,et->bfct", edges, coords) + v2[..., None]
        return jnp.clip(samples.transpose(0, 1, 3, 2), -1.0, 1.0)

    def extract_texture(self, images, cam, verts):
        """Sample per-face texels from an image (extract_tex_from_image,
        nmr.py:354-380). Returns (B, nf, T*T, 3)."""
        sampler = self.dynamic_sampler_grid(cam, verts)  # (B, nf, T*T, 2)
        b, nf, tt, _ = sampler.shape
        grid = sampler.reshape(b, nf, tt, 2)
        return grid_sample(images, grid.reshape(b, nf * tt, 1, 2)).reshape(
            b, nf, tt, images.shape[-1])

    def render_textured(self, fim, wim, tex):
        """Paint covered pixels by bilinearly sampling their face's T×T
        barycentric texture patch at the pixel's barycentrics — the
        textured forward render feeding the texture-warping baseline
        (reference models/baseline.py:571,1071: render.render(tgt_cam,
        tgt_verts, src_tex); CUDA forward_texture_sampling semantics).
        One gather per bilinear corner — no per-pixel loops, MXU-free
        and fully fused by XLA.

        fim (B,S,S) int face ids (-1 bg), wim (B,S,S,3) barycentrics,
        tex (B,nf,T*T,C) from :meth:`extract_texture` (grid laid out
        a-major over (a,b)=(w0,w1), dynamic_sampler_grid). Background
        pixels are 0."""
        b, s, _ = fim.shape
        c = tex.shape[-1]
        t = self.tex_size
        f = jnp.maximum(fim, 0).astype(jnp.int32)
        flat = tex.reshape(b, -1, c)

        def gather(ia, ib):
            idx = (f * (t * t) + ia * t + ib).reshape(b, -1)
            out = jnp.take_along_axis(flat, idx[..., None], axis=1)
            return out.reshape(b, s, s, c)

        if t == 1:
            img = gather(jnp.zeros_like(f), jnp.zeros_like(f))
        else:
            fa = jnp.clip(wim[..., 0], 0.0, 1.0) * (t - 1)
            fb = jnp.clip(wim[..., 1], 0.0, 1.0) * (t - 1)
            ia = jnp.clip(jnp.floor(fa).astype(jnp.int32), 0, t - 2)
            ib = jnp.clip(jnp.floor(fb).astype(jnp.int32), 0, t - 2)
            da = (fa - ia)[..., None]
            db = (fb - ib)[..., None]
            img = ((1 - da) * (1 - db) * gather(ia, ib)
                   + (1 - da) * db * gather(ia, ib + 1)
                   + da * (1 - db) * gather(ia + 1, ib)
                   + da * db * gather(ia + 1, ib + 1))
        return img * (fim >= 0).astype(img.dtype)[..., None]

    def render_depth(self, cam, verts):
        """Perspective-correct depth map (B, S, S), ``far`` on
        background. Implements what the reference's facade stubs out
        (``SMPLRenderer.render_depth`` raises NotImplementedError,
        utils/nmr.py:280-293) by reconstructing depth from the z-buffer
        winners — see :func:`rast.depth_from_fim_wim`."""
        f2verts, fim, wim = self.render_fim_wim(cam, verts)
        return rast.depth_from_fim_wim(f2verts, fim, wim, self.far)

    def render_rgb(self, cam, verts, images, intensity_ambient: float = 1.0,
                   intensity_directional: float = 0.0):
        """Full textured debug render — extract per-face texels from
        ``images``, light them, rasterize (nr.Renderer.render,
        renderer.py:11-?, as driven by the reference's debug overlay
        tool tools/visual_iPER.py). Lambert normals are taken in raster
        space (post-projection), which for the weak-perspective camera
        differs from the reference's world-space normals only by the
        fixed look_at rotation — fold it into ``direction`` if exact
        shading parity matters; the default is unlit (ambient 1).

        Returns (rgb (B,S,S,C), silhouette (B,S,S))."""
        f2verts, fim, wim = self.render_fim_wim(cam, verts)
        tex = self.extract_texture(images, cam, verts)
        if intensity_ambient != 1.0 or intensity_directional != 0.0:
            tex = lighting(f2verts, tex,
                           intensity_ambient=intensity_ambient,
                           intensity_directional=intensity_directional)
        return (self.render_textured(fim, wim, tex),
                rast.render_silhouette(fim))


def lighting(face_verts, tex, intensity_ambient: float = 0.5,
             intensity_directional: float = 0.5,
             color_ambient=(1.0, 1.0, 1.0),
             color_directional=(1.0, 1.0, 1.0),
             direction=(0.0, 1.0, 1.0)):
    """Ambient + directional per-face lighting on texel colors — the
    debug-render path of the reference renderer (neural_renderer/
    lighting.py:6-58, applied by renderer.py's RGB mode before
    rasterization). Flat shading: one Lambert term per face from its
    geometric normal; texels of the face are scaled uniformly.

    face_verts (B, nf, 3, 3) camera-space xyz; tex (B, nf, T*T, C)
    from :meth:`SMPLRenderer.extract_texture`. Pure elementwise +
    one small cross product per face — XLA fuses it into the texture
    gather, no MXU involvement.
    """
    amb = jnp.asarray(color_ambient, tex.dtype) * intensity_ambient
    light = jnp.broadcast_to(amb, face_verts.shape[:2] + (3,))
    if intensity_directional != 0.0:
        v10 = face_verts[:, :, 1] - face_verts[:, :, 0]
        v21 = face_verts[:, :, 2] - face_verts[:, :, 1]
        n = jnp.cross(v10, v21)
        n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-10)
        d = jnp.asarray(direction, tex.dtype)
        d = d / (jnp.linalg.norm(d) + 1e-10)
        cos = jax.nn.relu(jnp.einsum("bfc,c->bf", n, d))
        light = light + (intensity_directional
                         * jnp.asarray(color_directional, tex.dtype)
                         * cos[..., None])
    if tex.shape[-1] == 3:
        return tex * light[:, :, None, :]
    return tex * jnp.mean(light, axis=-1)[:, :, None, None]


def batched_pinned(state: SMPLRenderer):
    """Convenience: jitted (cam, verts) -> (f2verts, fim, wim) closure."""

    @jax.jit
    def run(cam, verts):
        return state.render_fim_wim(cam, verts)

    return run

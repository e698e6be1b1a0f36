"""Differentiable soft-rasterizer tests.

The reference exercises silhouette gradients through its CUDA
``backward_pixel_map`` kernel (test_rasterize_silhouettes.py checks
grads numerically); here the relaxation is the forward and XLA autodiff
supplies the gradient, so the tests assert (a) the relaxation converges
to the hard coverage mask and (b) the gradients are *useful* — a
camera-fitting problem actually descends.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from impersonator_tpu.ops import rasterizer as rast
from impersonator_tpu.ops import smpl as smpl_ops
from impersonator_tpu.ops.soft_raster import soft_silhouette
from impersonator_tpu.tasks.renderer import SMPLRenderer

S = 64


def _posed(assets, cam_scale=0.9, tx=0.0, ty=0.0):
    params = smpl_ops.SMPLParams.from_assets(assets)
    theta = np.zeros((1, 85), np.float32)
    theta[:, 0] = cam_scale
    theta[:, 1] = tx
    theta[:, 2] = ty
    info = smpl_ops.get_details(params, jnp.asarray(theta), assets.parents)
    return info["cam"], info["verts"]


def test_soft_matches_hard(assets):
    """σ→0 limit: soft coverage binarizes to the hard z-buffer's
    silhouette (away from the sub-pixel edge band)."""
    cam, verts = _posed(assets)
    f2verts = rast.project_to_raster_space(verts, cam,
                                           jnp.asarray(assets.faces))
    fim, _ = rast.rasterize_fim_wim(f2verts, S)
    hard = np.asarray(rast.render_silhouette(fim))

    soft = np.asarray(soft_silhouette(f2verts, S, sigma=1e-6))
    assert soft.shape == hard.shape
    assert soft.min() >= 0.0 and soft.max() <= 1.0
    agree = ((soft > 0.5) == (hard > 0.5)).mean()
    assert agree > 0.98, f"binarized agreement {agree:.3f}"
    # a genuinely soft sigma blurs edges but keeps interior/exterior
    blurry = np.asarray(soft_silhouette(f2verts, S, sigma=3e-4))
    assert blurry[hard > 0.5].mean() > 0.8
    assert blurry[hard < 0.5].mean() < 0.2


def test_soft_silhouette_gradients_fit_camera(assets):
    """Gradient descent through the soft rasterizer recovers the weak-
    perspective camera from a target silhouette — the capability the
    reference's backward_pixel_map kernel exists for
    (rasterize_cuda_kernel.cu:263-521), reached here via autodiff."""
    faces = jnp.asarray(assets.faces)
    cam_t, verts = _posed(assets, cam_scale=0.9, tx=0.0, ty=0.0)
    f2v_t = rast.project_to_raster_space(verts, cam_t, faces)
    fim_t, _ = rast.rasterize_fim_wim(f2v_t, S)
    target = rast.render_silhouette(fim_t)

    def loss_fn(cam):
        f2v = rast.project_to_raster_space(verts, cam, faces)
        soft = soft_silhouette(f2v, S, sigma=3e-4)
        return jnp.mean((soft - target) ** 2)

    cam = jnp.asarray([[0.7, 0.12, -0.1]], jnp.float32)
    opt = optax.adam(3e-2)
    opt_state = opt.init(cam)
    step = jax.jit(lambda c, s: _step(c, s, loss_fn, opt))

    l0 = float(loss_fn(cam))
    for _ in range(60):
        cam, opt_state, l = step(cam, opt_state)
    l1 = float(l)
    assert l1 < 0.25 * l0, f"loss {l0:.4f} -> {l1:.4f}"
    np.testing.assert_allclose(np.asarray(cam[0]), np.asarray(cam_t[0]),
                               atol=0.08)


def _step(cam, opt_state, loss_fn, opt):
    l, g = jax.value_and_grad(loss_fn)(cam)
    updates, opt_state = opt.update(g, opt_state)
    return optax.apply_updates(cam, updates), opt_state, l

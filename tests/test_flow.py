"""Correspondence-flow tests: python-loop reference vs batched gather,
identity-pose property, visibility masking, fim encoding."""

import jax.numpy as jnp
import numpy as np

from impersonator_tpu.ops import flow, rasterizer as rast, smpl as smpl_ops


def loop_reference(src_f2pts, fim, wim):
    """Transliteration of cal_bc_transform's python loop (nmr.py:617-659)."""
    b, s = fim.shape[0], fim.shape[1]
    T = np.full((b, s * s, 2), -2.0, np.float32)
    for i in range(b):
        fidx = fim[i].reshape(-1)
        w = wim[i].reshape(-1, 3)
        mask = fidx != -1
        gathered = src_f2pts[i][fidx[mask]]  # (n, 3, 2)
        T[i, mask] = (gathered * w[mask][:, :, None]).sum(1)
    return T.reshape(b, s, s, 2)


def test_matches_loop_reference(rng):
    b, nf, s = 2, 17, 24
    f2pts = rng.uniform(-1, 1, (b, nf, 3, 2)).astype(np.float32)
    fim = rng.integers(-1, nf, (b, s, s)).astype(np.int32)
    wim = rng.uniform(0, 1, (b, s, s, 3)).astype(np.float32)
    wim /= wim.sum(-1, keepdims=True)

    ours = np.asarray(flow.correspondence_flow(
        jnp.asarray(f2pts), jnp.asarray(fim), jnp.asarray(wim)))
    ref = loop_reference(f2pts, fim, wim)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_self_flow_is_near_identity(assets):
    """T(src -> src) must reproduce the pixel grid on covered pixels:
    warping the source by its own correspondence field is identity."""
    params = smpl_ops.SMPLParams.from_assets(assets)
    s = 64
    verts, _, _ = smpl_ops.smpl_forward(
        params, jnp.zeros((1, 10)), jnp.zeros((1, 72)), assets.parents)
    cam = jnp.asarray([[0.9, 0.0, 0.0]])
    fv = rast.project_to_raster_space(verts, cam, params.faces)
    fim, wim = rast.rasterize_fim_wim(fv, s)

    # source-image positions of face verts: xy of projection, y re-flipped
    # (imitator.py:106-107: p2verts = f2verts.xy; y *= -1)
    f2pts = fv[..., 0:2] * jnp.asarray([1.0, -1.0])
    t = flow.correspondence_flow(f2pts, fim, wim)

    grid = np.asarray(flow.identity_flow(1, s))
    covered = np.asarray(fim) >= 0
    err = np.abs(np.asarray(t)[covered] - grid[covered])
    # pixel-center vs grid-corner conventions differ by <= 1 pixel (2/s)
    assert err.max() < 2.5 / s * 2


def test_visibility_masks(assets, rng):
    nf = 11
    f2pts = rng.uniform(-1, 1, (1, nf, 3, 2)).astype(np.float32)
    fim = np.full((1, 8, 8), -1, np.int32)
    fim[0, :2, :2] = 3
    fim[0, 5, 5] = 7

    vis = np.asarray(flow.visible_f2pts(jnp.asarray(f2pts), jnp.asarray(fim)))
    np.testing.assert_allclose(vis[0, 3], f2pts[0, 3])
    np.testing.assert_allclose(vis[0, 7], f2pts[0, 7])
    np.testing.assert_allclose(vis[0, 0], -2.0)

    nulled = np.asarray(flow.null_visible_f2pts(jnp.asarray(f2pts), jnp.asarray(fim)))
    np.testing.assert_allclose(nulled[0, 3], -2.0)
    np.testing.assert_allclose(nulled[0, 0], f2pts[0, 0])


def test_encode_fim_background_row(assets):
    map_fn = jnp.asarray(assets.map_fn("uv_seg"))
    fim = np.full((1, 4, 4), -1, np.int32)
    fim[0, 0, 0] = 0
    enc = np.asarray(flow.encode_fim(jnp.asarray(fim), map_fn))
    assert enc.shape == (1, 4, 4, 3)
    np.testing.assert_allclose(enc[0, 1, 1], [0, 0, 1])  # bg code
    np.testing.assert_allclose(enc[0, 0, 0], np.asarray(map_fn)[0])


def test_map_fn_dims(assets):
    for name, dim in [("uv", 2), ("seg", 1), ("uv_seg", 3), ("par", 11),
                      ("front", 1), ("back", 1), ("head", 1), ("ids", 1)]:
        m = assets.map_fn(name)
        assert m.shape == (assets.nf + 1, dim), name


def test_binary_and_ids_maps(assets):
    import math
    width = len(np.binary_repr(assets.nf))
    m = assets.map_fn("binary")
    assert m.shape == (assets.nf + 1, width)
    # row i encodes i in binary
    row = m[5][:width]
    assert int("".join(str(int(v)) for v in row), 2) == 5
    np.testing.assert_allclose(m[-1], -1.0)


def test_texture_extraction(assets, rng):
    from impersonator_tpu.tasks.renderer import SMPLRenderer
    from impersonator_tpu.ops import smpl as smpl_ops
    renderer = SMPLRenderer.create(assets, image_size=32, tex_size=3)
    params = smpl_ops.SMPLParams.from_assets(assets)
    verts, _, _ = smpl_ops.smpl_forward(
        params, jnp.zeros((1, 10)), jnp.zeros((1, 72)), assets.parents)
    cam = jnp.asarray([[0.9, 0.0, 0.0]])
    img = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)), jnp.float32)
    tex = renderer.extract_texture(img, cam, verts)
    assert tex.shape == (1, assets.nf, 9, 3)
    assert np.isfinite(np.asarray(tex)).all()

"""Sampling-semantics parity vs torch==(cpu) — the LWB depends on exact
grid_sample/interpolate behaviour (align_corners=True, zero padding)."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from impersonator_tpu.ops import sampler  # noqa: E402
from impersonator_tpu.ops import morphology  # noqa: E402


def test_grid_sample_matches_torch(rng):
    x = rng.standard_normal((2, 9, 11, 3)).astype(np.float32)
    grid = rng.uniform(-1.4, 1.4, (2, 7, 5, 2)).astype(np.float32)

    ours = np.asarray(sampler.grid_sample(jnp.asarray(x), jnp.asarray(grid)))

    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    tg = torch.from_numpy(grid)
    theirs = torch.nn.functional.grid_sample(
        tx, tg, mode="bilinear", padding_mode="zeros", align_corners=True
    ).numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_grid_sample_background_flow_is_zero(rng):
    x = rng.standard_normal((1, 8, 8, 2)).astype(np.float32) + 5.0
    grid = np.full((1, 4, 4, 2), -2.0, np.float32)  # BG_FLOW
    out = np.asarray(sampler.grid_sample(jnp.asarray(x), jnp.asarray(grid)))
    np.testing.assert_allclose(out, 0.0)


@pytest.mark.parametrize("shape", [(1, 8, 8, 3), (2, 15, 9, 2)])
@pytest.mark.parametrize("out_size", [(4, 4), (16, 20), (15, 9)])
def test_resize_matches_torch(rng, shape, out_size):
    x = rng.standard_normal(shape).astype(np.float32)
    ours = np.asarray(sampler.resize_bilinear_align(jnp.asarray(x), *out_size))
    theirs = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        size=out_size, mode="bilinear", align_corners=True,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


@pytest.mark.parametrize("mode", ["erode", "dilate"])
@pytest.mark.parametrize("ks", [3, 15])
def test_morph_matches_torch(rng, mode, ks):
    mask = (rng.uniform(size=(2, 32, 32, 1)) > 0.6).astype(np.float32)
    ours = np.asarray(morphology.morph(jnp.asarray(mask), ks=ks, mode=mode))

    tm = torch.from_numpy(mask.transpose(0, 3, 1, 2))
    pad = ks // 2
    kernel = torch.ones(1, 1, ks, ks)
    if mode == "erode":
        padded = torch.nn.functional.pad(tm, [pad] * 4, value=1.0)
        out = torch.nn.functional.conv2d(padded, kernel)
        theirs = (out == ks * ks).float()
    else:
        padded = torch.nn.functional.pad(tm, [pad] * 4, value=0.0)
        out = torch.nn.functional.conv2d(padded, kernel)
        theirs = (out >= 1).float()
    np.testing.assert_allclose(ours, theirs.numpy().transpose(0, 2, 3, 1))


def test_grid_sample_patched_bitexact():
    """grid_sample_patched must reproduce grid_sample exactly: in-range,
    boundary-straddling, fully-out-of-range and BG_FLOW (-2) grids,
    batch-1 image broadcast over a batched grid."""
    import jax.numpy as jnp
    from impersonator_tpu.ops.sampler import grid_sample, grid_sample_patched
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 23, 17, 3)).astype(np.float32))
    grid = rng.uniform(-1.3, 1.3, (4, 9, 11, 2)).astype(np.float32)
    grid[0, :2, :2] = -2.0           # background flow sentinel
    grid[1, 0, 0] = [1.0, 1.0]       # exact far corner
    grid[1, 0, 1] = [-1.0, -1.0]     # exact near corner
    grid[2, 0, 0] = [5.0, 5.0]       # far out of range
    grid = jnp.asarray(grid)
    a = np.asarray(grid_sample(x, grid))
    b = np.asarray(grid_sample_patched(x, grid))
    np.testing.assert_array_equal(a, b)
    # batched image too
    xb = jnp.asarray(rng.uniform(-1, 1, (4, 23, 17, 3)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(grid_sample(xb, grid)),
                                  np.asarray(grid_sample_patched(xb, grid)))

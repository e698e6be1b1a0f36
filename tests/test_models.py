"""Network shape/parity smoke tests (tiny resolutions keep CPU fast)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from impersonator_tpu.models import (
    ImpersonatorGenerator,
    PatchDiscriminator,
    InpaintSANet,
    HumanModelRecovery,
)
from impersonator_tpu.models.layers import ConvTransposeTorch, InstanceNorm
from impersonator_tpu.models.facenet import Sphere20a

S = 32  # tiny working resolution


@pytest.fixture(scope="module")
def gen_and_params():
    gen = ImpersonatorGenerator(bg_dim=4, src_dim=6, tsf_dim=6,
                                conv_dim=8, repeat_num=2)
    rng = jax.random.PRNGKey(0)
    bg = jnp.zeros((1, S, S, 4))
    src = jnp.zeros((1, S, S, 6))
    tsf = jnp.zeros((1, S, S, 6))
    t = jnp.zeros((1, S, S, 2))
    params = gen.init(rng, bg, src, tsf, t)
    return gen, params


def test_generator_forward_shapes(gen_and_params):
    gen, params = gen_and_params
    bg = jnp.ones((2, S, S, 4)) * 0.1
    src = jnp.ones((2, S, S, 6)) * 0.1
    tsf = jnp.ones((2, S, S, 6)) * 0.1
    t = jnp.zeros((2, S, S, 2))
    img_bg, s_img, s_mask, t_img, t_mask = gen.apply(params, bg, src, tsf, t)
    assert img_bg.shape == (2, S, S, 3)
    assert s_img.shape == (2, S, S, 3)
    assert s_mask.shape == (2, S, S, 1)
    assert t_img.shape == (2, S, S, 3)
    assert t_mask.shape == (2, S, S, 1)
    assert np.abs(np.asarray(img_bg)).max() <= 1.0
    m = np.asarray(t_mask)
    assert (m >= 0).all() and (m <= 1).all()


def test_generator_cached_inference_matches_infer_front(gen_and_params):
    """inference() with cached source features must equal infer_front()'s
    tsf stream (imitator hot path vs trainer path; generator.py:277-301)."""
    gen, params = gen_and_params
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((1, S, S, 6)), jnp.float32)
    tsf = jnp.asarray(rng.standard_normal((1, S, S, 6)), jnp.float32)
    t = jnp.asarray(rng.uniform(-1, 1, (1, S, S, 2)), jnp.float32)

    _, _, tsf_img_a, tsf_mask_a = gen.apply(
        params, src, tsf, t, method="infer_front")
    enc, res = gen.apply(params, src, method="encode_src")
    tsf_img_b, tsf_mask_b = gen.apply(
        params, enc, res, tsf, t, method="inference")
    np.testing.assert_allclose(np.asarray(tsf_img_a), np.asarray(tsf_img_b),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(tsf_mask_a), np.asarray(tsf_mask_b),
                               atol=1e-5)


def test_generator_swap_shapes(gen_and_params):
    gen, params = gen_and_params
    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.standard_normal((1, S, S, 6)), jnp.float32)
    tsf = jnp.asarray(rng.standard_normal((1, S, S, 6)), jnp.float32)
    t = jnp.zeros((1, S, S, 2))
    enc, res = gen.apply(params, src, method="encode_src")
    img, mask = gen.apply(params, tsf, enc, enc, res, res, t, t, method="swap")
    assert img.shape == (1, S, S, 3)
    assert mask.shape == (1, S, S, 1)


def test_patch_discriminator_shapes():
    d = PatchDiscriminator(ndf=8, n_layers=4)
    x = jnp.zeros((2, 64, 64, 6))
    params = d.init(jax.random.PRNGKey(0), x)
    out = d.apply(params, x)
    assert out.shape[0] == 2 and out.shape[-1] == 1


def test_inpaintor_shapes():
    net = InpaintSANet(c_dim=4, cnum=8)
    imgs = jnp.zeros((1, S, S, 3))
    masks = jnp.zeros((1, S, S, 1))
    params = net.init(jax.random.PRNGKey(0), imgs, masks)
    out = net.apply(params, imgs, masks, only_x=True)
    assert out.shape == (1, S, S, 3)
    coarse, x, comp = net.apply(params, imgs, masks)
    assert coarse.shape == comp.shape == (1, S, S, 3)


def test_hmr_output_shape():
    net = HumanModelRecovery()
    x = jnp.zeros((1, 224, 224, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    theta = net.apply(variables, x)
    assert theta.shape == (1, 85)


def test_sphere20a_feature_shapes():
    net = Sphere20a()
    x = jnp.zeros((1, 112, 96, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    feats = net.apply(params, x)
    assert [f.shape for f in feats] == [
        (1, 56, 48, 64), (1, 28, 24, 128), (1, 14, 12, 256),
        (1, 7, 6, 512), (1, 512)]


def test_senet50_shapes_and_face_loss():
    """SENet50 stage/embed shapes (reference facenet.py:165-190
    get_feat contract) + the senet FaceLoss branch (networks.py:214-222)."""
    from impersonator_tpu.models.facenet import SENet50
    from impersonator_tpu.models import losses as L

    net = SENet50()
    x = jnp.zeros((1, 64, 64, 3))
    tree = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    feats, embed = net.apply(tree, x)
    assert [f.shape for f in feats] == [
        (1, 16, 16, 64), (1, 16, 16, 256), (1, 8, 8, 512),
        (1, 4, 4, 1024), (1, 2, 2, 2048)]
    assert embed.shape == (1, 2048)

    imgs = jnp.linspace(-1, 1, 2 * 64 * 64 * 3).reshape(2, 64, 64, 3)
    bbox = jnp.asarray([[0.2, 0.8, 0.1, 0.5]] * 2, jnp.float32)
    loss = L.face_loss(net, tree, imgs, imgs[::-1], bbox1=bbox, bbox2=bbox)
    assert np.isfinite(float(loss))


def test_conv_transpose_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    for k in (3, 4):
        x = rng.standard_normal((1, 5, 7, 3)).astype(np.float32)
        w = rng.standard_normal((3, 4, k, k)).astype(np.float32)  # (in,out,k,k)

        layer = ConvTransposeTorch(features=4, kernel_size=k, stride=2,
                                   padding=1, output_padding=1, use_bias=False)
        params = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 0, 1))}}
        ours = np.asarray(layer.apply(params, jnp.asarray(x)))

        tconv = torch.nn.functional.conv_transpose2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w),
            stride=2, padding=1, output_padding=1)
        theirs = tconv.numpy().transpose(0, 2, 3, 1)
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_instance_norm_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 6, 5, 4)).astype(np.float32)
    layer = InstanceNorm()
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(layer.apply(params, jnp.asarray(x)))
    tin = torch.nn.InstanceNorm2d(4, affine=True)
    theirs = tin(torch.from_numpy(x.transpose(0, 3, 1, 2))
                 ).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_narrow_head_conv_matches_direct():
    """The space-to-depth phase form of the narrow regress head must
    equal the direct 'same' conv on both the phase path (H,W % 4 == 0)
    and the fallback path (indivisible / tiny inputs)."""
    from impersonator_tpu.models.layers import narrow_head_conv

    rng = np.random.default_rng(7)
    for shape, cout in [((2, 64, 48, 8), 4), ((1, 30, 28, 8), 3),
                        ((1, 12, 16, 5), 1)]:
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        k = jnp.asarray(
            rng.standard_normal((7, 7, shape[-1], cout)), jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, k, (1, 1), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = narrow_head_conv(x, k, force_phase=True)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-5)

"""Converter parity: a torch checkpoint (reference key naming) run through
tools/convert_weights must yield a flax model with IDENTICAL outputs."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/repo")
from tools import convert_weights as cw  # noqa: E402
from impersonator_tpu.models.generator import (  # noqa: E402
    ImpersonatorGenerator,
    ResNetGenerator,
    ResUnetGenerator,
)
import torch_ref  # noqa: E402

S = 16
CONV_DIM = 8
REPEAT = 2


def test_resunet_converted_weights_match_torch(rng):
    sd = torch_ref.make_resunet_sd(rng, "src_model", c_dim=6,
                                   conv_dim=CONV_DIM, repeat=REPEAT)
    params = {}
    cw._convert_resunet(sd, "src_model", params, "net",
                        n_down=3, repeat=REPEAT)
    flax_params = {"params": params["net"]}

    x = rng.standard_normal((1, S, S, 6)).astype(np.float32)
    net = ResUnetGenerator(conv_dim=CONV_DIM, repeat_num=REPEAT, k_size=3)
    rgb_j, mask_j = net.apply(flax_params, jnp.asarray(x))

    rgb_t, mask_t = torch_ref.resunet_forward(
        sd, "src_model", torch.from_numpy(x.transpose(0, 3, 1, 2)),
        repeat=REPEAT)
    np.testing.assert_allclose(
        np.asarray(rgb_j), rgb_t.numpy().transpose(0, 2, 3, 1), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(mask_j), mask_t.numpy().transpose(0, 2, 3, 1), atol=2e-4)


def test_bg_model_converted_weights_match_torch(rng):
    sd = torch_ref.make_bg_sd(rng, c_dim=4, conv_dim=CONV_DIM, repeat=REPEAT)
    full = cw.convert_generator(
        {**sd,
         **torch_ref.make_resunet_sd(rng, "src_model", 6, CONV_DIM, REPEAT),
         **torch_ref.make_resunet_sd(rng, "tsf_model", 6, CONV_DIM, REPEAT)},
        repeat=REPEAT)
    x = rng.standard_normal((1, S, S, 4)).astype(np.float32)

    net = ResNetGenerator(conv_dim=CONV_DIM, repeat_num=REPEAT, k_size=3)
    out_j = net.apply({"params": full["params"]["bg_model"]}, jnp.asarray(x))
    out_t = torch_ref.bg_forward(
        sd, torch.from_numpy(x.transpose(0, 3, 1, 2)), repeat=REPEAT)
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy().transpose(0, 2, 3, 1), atol=2e-4)


def test_full_generator_conversion_loads(rng):
    """Converted param tree must be exactly shape-compatible with a
    fresh flax init (catches naming drift)."""
    import jax
    sd = {**torch_ref.make_bg_sd(rng, 4, CONV_DIM, REPEAT),
          **torch_ref.make_resunet_sd(rng, "src_model", 6, CONV_DIM, REPEAT),
          **torch_ref.make_resunet_sd(rng, "tsf_model", 6, CONV_DIM, REPEAT)}
    tree = cw.convert_generator(sd, repeat=REPEAT)

    gen = ImpersonatorGenerator(bg_dim=4, src_dim=6, tsf_dim=6,
                                conv_dim=CONV_DIM, repeat_num=REPEAT)
    ref = gen.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, S, S, 4)), jnp.zeros((1, S, S, 6)),
                   jnp.zeros((1, S, S, 6)), jnp.zeros((1, S, S, 2)))

    ref_flat = jax.tree_util.tree_leaves_with_path(ref)
    got_flat = dict(
        (jax.tree_util.keystr(p), v.shape)
        for p, v in jax.tree_util.tree_leaves_with_path(tree))
    for path, leaf in ref_flat:
        key = jax.tree_util.keystr(path)
        assert key in got_flat, f"converter missing {key}"
        assert got_flat[key] == leaf.shape, (
            f"shape mismatch at {key}: {got_flat[key]} vs {leaf.shape}")
    assert len(got_flat) == len(ref_flat)


def test_senet50_converted_weights_match_torch():
    rng = np.random.default_rng(50)  # own stream: order-independent draws
    """senet50 (VGGFace2 SE-ResNet-50, reference networks/facenet.py:193)
    converter parity: stage feats + 2048-d embedding bit-close."""
    from impersonator_tpu.models.facenet import SENet50

    sd = torch_ref.make_senet50_sd(rng)
    tree = cw.convert_senet50(sd)

    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    net = SENet50()
    feats_j, embed_j = net.apply(tree, jnp.asarray(x))
    feats_t, embed_t = torch_ref.senet50_forward(
        sd, torch.from_numpy(x.transpose(0, 3, 1, 2)))

    assert len(feats_j) == 5
    for fj, ft in zip(feats_j, feats_t):
        np.testing.assert_allclose(
            np.asarray(fj), ft.numpy().transpose(0, 2, 3, 1), atol=3e-4)
    np.testing.assert_allclose(np.asarray(embed_j), embed_t.numpy(),
                               atol=3e-4)


def test_osnet_converted_weights_match_torch():
    rng = np.random.default_rng(51)  # own stream: order-independent draws
    """osnet_ibn_x1_0 (reference OSreid/OSNet.py:336) converter parity:
    the 512-d reid embedding matches the functional-torch oracle."""
    from impersonator_tpu.metrics.reid import OSNet

    sd = torch_ref.make_osnet_sd(rng)
    tree = cw.convert_osnet(sd)

    x = rng.standard_normal((1, 64, 32, 3)).astype(np.float32)
    v_j = OSNet().apply(tree, jnp.asarray(x))
    v_t = torch_ref.osnet_forward(sd, torch.from_numpy(
        x.transpose(0, 3, 1, 2)))
    assert v_j.shape == (1, 512)
    np.testing.assert_allclose(np.asarray(v_j), v_t.numpy(), atol=3e-4)


def test_pcb_converted_weights_match_torch():
    rng = np.random.default_rng(52)  # own stream: order-independent draws
    """PCB reid (reference PCBreid/model.py PCB_test) converter parity:
    6-part features + normalized embedding match the torch oracle."""
    from impersonator_tpu.metrics.reid import PCBReid, pcb_embed

    sd = torch_ref.make_pcb_sd(rng)
    tree = cw.convert_pcb(sd)

    x = rng.standard_normal((1, 96, 48, 3)).astype(np.float32)
    parts_j = PCBReid().apply(tree, jnp.asarray(x))
    parts_t = torch_ref.pcb_forward(sd, torch.from_numpy(
        x.transpose(0, 3, 1, 2)))
    assert parts_j.shape == (1, 6, 2048)
    # 16 blocks of an unnormalized random net reach O(100) magnitudes;
    # relative tolerance is the meaningful check there
    np.testing.assert_allclose(np.asarray(parts_j),
                               parts_t.numpy().transpose(0, 2, 1),
                               rtol=3e-3, atol=1e-3)

    # embedding normalization parity (person_dist.py:138-142)
    ff = parts_t
    fnorm = ff.norm(p=2, dim=1, keepdim=True) * np.sqrt(6)
    ff_t = (ff / fnorm).reshape(1, -1).numpy()
    np.testing.assert_allclose(np.asarray(pcb_embed(parts_j)), ff_t,
                               rtol=3e-3, atol=1e-5)


def test_facenet_ir_converted_weights_match_torch():
    rng = np.random.default_rng(53)  # own stream: order-independent draws
    """InceptionResnetV1 (facenet-pytorch, the reference's face-CS/FD
    embedder) converter parity, normalize=False contract."""
    from impersonator_tpu.metrics.zoo import InceptionResnetV1

    sd = torch_ref.make_facenet_ir_sd(rng)
    tree = cw.convert_facenet_ir(sd)

    x = rng.standard_normal((1, 160, 160, 3)).astype(np.float32)
    v_j = InceptionResnetV1().apply(tree, jnp.asarray(x))
    v_t = torch_ref.facenet_ir_forward(sd, torch.from_numpy(
        x.transpose(0, 3, 1, 2)))
    assert v_j.shape == (1, 512)
    np.testing.assert_allclose(np.asarray(v_j), v_t.numpy(),
                               rtol=3e-3, atol=5e-4)

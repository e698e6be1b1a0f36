"""Functional torch evaluators used ONLY as converter-parity oracles.

These build state dicts with the reference checkpoints' exact key naming
(including the 'attetion_reg' typo) and evaluate them with torch
functional ops, so tests can verify that tools/convert_weights.py maps a
torch checkpoint onto our flax modules with numerically identical
outputs — without needing the actual released checkpoint files.

This is original test scaffolding written from the architecture spec
(SURVEY §2.1), not reference code.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def _conv(sd, key, x, stride=1, padding=0, dilation=1):
    w = sd[f"{key}.weight"]
    b = sd.get(f"{key}.bias")
    return F.conv2d(x, w, b, stride=stride, padding=padding,
                    dilation=dilation)


def _convt(sd, key, x, stride=2, padding=1, output_padding=1):
    return F.conv_transpose2d(x, sd[f"{key}.weight"], sd.get(f"{key}.bias"),
                              stride=stride, padding=padding,
                              output_padding=output_padding)


def _inorm(sd, key, x):
    return F.instance_norm(x, weight=sd[f"{key}.weight"],
                           bias=sd[f"{key}.bias"], eps=1e-5)


def _bn_eval(sd, key, x):
    return F.batch_norm(x, sd[f"{key}.running_mean"], sd[f"{key}.running_var"],
                        sd[f"{key}.weight"], sd[f"{key}.bias"],
                        training=False, eps=1e-5)


# ---------------------------------------------------------------------------
# state-dict builders (reference key naming, random values)
# ---------------------------------------------------------------------------

def make_resunet_sd(rng, prefix, c_dim, conv_dim=8, repeat=2, n_down=3,
                    k_size=3):
    sd = {}

    def t(*shape):
        return torch.from_numpy(rng.standard_normal(shape).astype(np.float32) * 0.1)

    d = conv_dim
    sd[f"{prefix}.encoders.0.0.weight"] = t(d, c_dim, 7, 7)
    sd[f"{prefix}.encoders.0.1.weight"] = t(d) + 1.0
    sd[f"{prefix}.encoders.0.1.bias"] = t(d)
    for i in range(1, n_down + 1):
        sd[f"{prefix}.encoders.{i}.0.weight"] = t(d * 2, d, k_size, k_size)
        sd[f"{prefix}.encoders.{i}.1.weight"] = t(d * 2) + 1.0
        sd[f"{prefix}.encoders.{i}.1.bias"] = t(d * 2)
        d *= 2
    for i in range(repeat):
        sd[f"{prefix}.resnets.{i}.main.0.weight"] = t(d, d, 3, 3)
        sd[f"{prefix}.resnets.{i}.main.1.weight"] = t(d) + 1.0
        sd[f"{prefix}.resnets.{i}.main.1.bias"] = t(d)
        sd[f"{prefix}.resnets.{i}.main.3.weight"] = t(d, d, 3, 3)
        sd[f"{prefix}.resnets.{i}.main.4.weight"] = t(d) + 1.0
        sd[f"{prefix}.resnets.{i}.main.4.bias"] = t(d)
    for i in range(n_down):
        sd[f"{prefix}.decoders.{i}.0.weight"] = t(d, d // 2, k_size, k_size)
        sd[f"{prefix}.decoders.{i}.1.weight"] = t(d // 2) + 1.0
        sd[f"{prefix}.decoders.{i}.1.bias"] = t(d // 2)
        sd[f"{prefix}.skippers.{i}.0.weight"] = t(d // 2, d, k_size, k_size)
        sd[f"{prefix}.skippers.{i}.1.weight"] = t(d // 2) + 1.0
        sd[f"{prefix}.skippers.{i}.1.bias"] = t(d // 2)
        d //= 2
    sd[f"{prefix}.img_reg.0.weight"] = t(3, d, 7, 7)
    sd[f"{prefix}.attetion_reg.0.weight"] = t(1, d, 7, 7)
    return sd


def make_bg_sd(rng, c_dim=4, conv_dim=8, repeat=2, n_down=3, k_size=3):
    sd = {}

    def t(*shape):
        return torch.from_numpy(rng.standard_normal(shape).astype(np.float32) * 0.1)

    idx = 0
    d = conv_dim
    sd[f"bg_model.model.{idx}.weight"] = t(d, c_dim, 7, 7)
    sd[f"bg_model.model.{idx + 1}.weight"] = t(d) + 1.0
    sd[f"bg_model.model.{idx + 1}.bias"] = t(d)
    idx += 3
    for _ in range(n_down):
        sd[f"bg_model.model.{idx}.weight"] = t(d * 2, d, k_size, k_size)
        sd[f"bg_model.model.{idx + 1}.weight"] = t(d * 2) + 1.0
        sd[f"bg_model.model.{idx + 1}.bias"] = t(d * 2)
        d *= 2
        idx += 3
    for _ in range(repeat):
        sd[f"bg_model.model.{idx}.main.0.weight"] = t(d, d, 3, 3)
        sd[f"bg_model.model.{idx}.main.1.weight"] = t(d) + 1.0
        sd[f"bg_model.model.{idx}.main.1.bias"] = t(d)
        sd[f"bg_model.model.{idx}.main.3.weight"] = t(d, d, 3, 3)
        sd[f"bg_model.model.{idx}.main.4.weight"] = t(d) + 1.0
        sd[f"bg_model.model.{idx}.main.4.bias"] = t(d)
        idx += 1
    for _ in range(n_down):
        sd[f"bg_model.model.{idx}.weight"] = t(d, d // 2, k_size, k_size)
        sd[f"bg_model.model.{idx + 1}.weight"] = t(d // 2) + 1.0
        sd[f"bg_model.model.{idx + 1}.bias"] = t(d // 2)
        d //= 2
        idx += 3
    sd[f"bg_model.model.{idx}.weight"] = t(3, d, 7, 7)
    return sd


# ---------------------------------------------------------------------------
# functional torch forwards
# ---------------------------------------------------------------------------

def resunet_forward(sd, prefix, x, repeat=2, n_down=3, k_size=3):
    """Full ResUnet fwd: encode -> resnets -> decode -> (rgb, mask)."""
    enc = []
    h = F.relu(_inorm(sd, f"{prefix}.encoders.0.1",
                      _conv(sd, f"{prefix}.encoders.0.0", x, 1, 3)))
    enc.append(h)
    for i in range(1, n_down + 1):
        h = F.relu(_inorm(sd, f"{prefix}.encoders.{i}.1",
                          _conv(sd, f"{prefix}.encoders.{i}.0", h, 2, 1)))
        enc.append(h)
    for i in range(repeat):
        r = F.relu(_inorm(sd, f"{prefix}.resnets.{i}.main.1",
                          _conv(sd, f"{prefix}.resnets.{i}.main.0", h, 1, 1)))
        r = _inorm(sd, f"{prefix}.resnets.{i}.main.4",
                   _conv(sd, f"{prefix}.resnets.{i}.main.3", r, 1, 1))
        h = h + r
    for i in range(n_down):
        h = F.relu(_inorm(sd, f"{prefix}.decoders.{i}.1",
                          _convt(sd, f"{prefix}.decoders.{i}.0", h)))
        skip = enc[n_down - 1 - i]
        h = torch.cat([skip, h], dim=1)
        h = F.relu(_inorm(sd, f"{prefix}.skippers.{i}.1",
                          _conv(sd, f"{prefix}.skippers.{i}.0", h, 1, 1)))
    rgb = torch.tanh(_conv(sd, f"{prefix}.img_reg.0", h, 1, 3))
    mask = torch.sigmoid(_conv(sd, f"{prefix}.attetion_reg.0", h, 1, 3))
    return rgb, mask


def bg_forward(sd, x, repeat=2, n_down=3, k_size=3):
    idx = 0
    h = F.relu(_inorm(sd, f"bg_model.model.{idx + 1}",
                      _conv(sd, f"bg_model.model.{idx}", x, 1, 3)))
    idx += 3
    for _ in range(n_down):
        h = F.relu(_inorm(sd, f"bg_model.model.{idx + 1}",
                          _conv(sd, f"bg_model.model.{idx}", h, 2, 1)))
        idx += 3
    for _ in range(repeat):
        r = F.relu(_inorm(sd, f"bg_model.model.{idx}.main.1",
                          _conv(sd, f"bg_model.model.{idx}.main.0", h, 1, 1)))
        r = _inorm(sd, f"bg_model.model.{idx}.main.4",
                   _conv(sd, f"bg_model.model.{idx}.main.3", r, 1, 1))
        h = h + r
        idx += 1
    for _ in range(n_down):
        h = F.relu(_inorm(sd, f"bg_model.model.{idx + 1}",
                          _convt(sd, f"bg_model.model.{idx}", h)))
        idx += 3
    return torch.tanh(_conv(sd, f"bg_model.model.{idx}", h, 1, 3))


# ---------------------------------------------------------------------------
# LPIPS (alex backbone + lin heads) oracle
# ---------------------------------------------------------------------------

_ALEX_SPEC = [  # (torch features idx, in, out, k, stride, pad)
    (0, 3, 64, 11, 4, 2),
    (3, 64, 192, 5, 1, 2),
    (6, 192, 384, 3, 1, 1),
    (8, 384, 256, 3, 1, 1),
    (10, 256, 256, 3, 1, 1),
]


def make_alexnet_sd(rng):
    """torchvision alexnet.features conv weights (random)."""
    sd = {}
    for ti, cin, cout, k, _, _ in _ALEX_SPEC:
        sd[f"features.{ti}.weight"] = torch.from_numpy(
            rng.standard_normal((cout, cin, k, k)).astype(np.float32) * 0.05)
        sd[f"features.{ti}.bias"] = torch.from_numpy(
            rng.standard_normal((cout,)).astype(np.float32) * 0.05)
    return sd


def make_lpips_lin_sd(rng):
    """Official LPIPS alex.pth lin-head naming: lin{i}.model.1.weight."""
    sd = {}
    for i, c in enumerate((64, 192, 384, 256, 256)):
        sd[f"lin{i}.model.1.weight"] = torch.from_numpy(
            np.abs(rng.standard_normal((1, c, 1, 1))).astype(np.float32) * 0.1)
    return sd


def alex_forward(sd, x):
    """LPIPS alexnet slices: 5 relu outputs (pretrained_networks.py
    alexnet, slices [0:2][2:5][5:8][8:10][10:12])."""
    feats = []
    for i, (ti, _, _, _, s, p) in enumerate(_ALEX_SPEC):
        if i in (1, 2):
            x = F.max_pool2d(x, 3, 2)
        x = F.relu(_conv(sd, f"features.{ti}", x, stride=s, padding=p))
        feats.append(x)
    return feats


# torchvision vgg16.features conv layout: (features idx, in, out); all
# k3/s1/p1, 2x2/2 maxpools at idx 4/9/16/23 (LPIPS slice boundaries,
# pretrained_networks.py vgg16)
_VGG16_SPEC = [
    (0, 3, 64), (2, 64, 64),
    (5, 64, 128), (7, 128, 128),
    (10, 128, 256), (12, 256, 256), (14, 256, 256),
    (17, 256, 512), (19, 512, 512), (21, 512, 512),
    (24, 512, 512), (26, 512, 512), (28, 512, 512),
]
_VGG16_SLICE_LAST = {2, 7, 14, 21, 28}   # relu outputs LPIPS consumes
_VGG16_POOL_BEFORE = {5, 10, 17, 24}

# squeezenet1_1 Fires: (features idx, in, squeeze, expand); stem conv at
# idx 0 (3->64, k3/s2/p0); 3x3/2 ceil-mode pools before fires 3/6/9
_SQUEEZE_FIRES_T = [(3, 64, 16, 64), (4, 128, 16, 64), (6, 128, 32, 128),
                    (7, 256, 32, 128), (9, 256, 48, 192),
                    (10, 384, 48, 192), (11, 384, 64, 256),
                    (12, 512, 64, 256)]
_SQUEEZE_SLICE_LAST = {0, 4, 7, 9, 10, 11, 12}


def make_vgg16_sd(rng):
    """torchvision vgg16.features conv weights (random)."""
    sd = {}
    for ti, cin, cout in _VGG16_SPEC:
        sd[f"features.{ti}.weight"] = torch.from_numpy(
            rng.standard_normal((cout, cin, 3, 3)).astype(np.float32) * 0.05)
        sd[f"features.{ti}.bias"] = torch.from_numpy(
            rng.standard_normal((cout,)).astype(np.float32) * 0.05)
    return sd


def make_squeeze_sd(rng):
    """torchvision squeezenet1_1.features weights (random)."""
    sd = {
        "features.0.weight": torch.from_numpy(
            rng.standard_normal((64, 3, 3, 3)).astype(np.float32) * 0.05),
        "features.0.bias": torch.from_numpy(
            rng.standard_normal((64,)).astype(np.float32) * 0.05),
    }
    for ti, cin, sq, ex in _SQUEEZE_FIRES_T:
        for sub, ci, co, k in (("squeeze", cin, sq, 1),
                               ("expand1x1", sq, ex, 1),
                               ("expand3x3", sq, ex, 3)):
            sd[f"features.{ti}.{sub}.weight"] = torch.from_numpy(
                rng.standard_normal((co, ci, k, k)).astype(np.float32)
                * 0.05)
            sd[f"features.{ti}.{sub}.bias"] = torch.from_numpy(
                rng.standard_normal((co,)).astype(np.float32) * 0.05)
    return sd


def make_lpips_lin_sd(rng, chns=(64, 192, 384, 256, 256)):
    """Official LPIPS lin-head naming: lin{i}.model.1.weight. Default
    chns = alex; pass the vgg (64,128,256,512,512) or squeeze
    (64,128,256,384,384,512,512) channel lists for those nets."""
    sd = {}
    for i, c in enumerate(chns):
        sd[f"lin{i}.model.1.weight"] = torch.from_numpy(
            np.abs(rng.standard_normal((1, c, 1, 1))).astype(np.float32) * 0.1)
    return sd


def vgg16_forward(sd, x):
    """LPIPS vgg16 slices (pretrained_networks.py vgg16)."""
    feats = []
    for ti, _, _ in _VGG16_SPEC:
        if ti in _VGG16_POOL_BEFORE:
            x = F.max_pool2d(x, 2, 2)
        x = F.relu(_conv(sd, f"features.{ti}", x, stride=1, padding=1))
        if ti in _VGG16_SLICE_LAST:
            feats.append(x)
    return feats


def squeeze_forward(sd, x):
    """LPIPS squeezenet1_1 slices (pretrained_networks.py squeezenet)."""
    x = F.relu(_conv(sd, "features.0", x, stride=2, padding=0))
    feats = [x]
    for ti, _, _, _ in _SQUEEZE_FIRES_T:
        if ti in (3, 6, 9):
            x = F.max_pool2d(x, 3, 2, ceil_mode=True)
        s = F.relu(_conv(sd, f"features.{ti}.squeeze", x))
        e1 = F.relu(_conv(sd, f"features.{ti}.expand1x1", s))
        e3 = F.relu(_conv(sd, f"features.{ti}.expand3x3", s, padding=1))
        x = torch.cat([e1, e3], dim=1)
        if ti in _SQUEEZE_SLICE_LAST:
            feats.append(x)
    return feats


_LPIPS_FORWARDS = {"alex": alex_forward, "vgg": vgg16_forward,
                   "squeeze": squeeze_forward}


def lpips_forward(backbone_sd, lin_sd, a, b, net="alex"):
    """PNetLin v0.1 forward (networks_basic.py:122-168)."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    fwd = _LPIPS_FORWARDS[net]
    fa = fwd(backbone_sd, (a - shift) / scale)
    fb = fwd(backbone_sd, (b - shift) / scale)
    val = 0.0
    for i, (x, y) in enumerate(zip(fa, fb)):
        xn = x / (torch.sqrt(torch.sum(x ** 2, dim=1, keepdim=True)) + 1e-10)
        yn = y / (torch.sqrt(torch.sum(y ** 2, dim=1, keepdim=True)) + 1e-10)
        d = (xn - yn) ** 2
        w = lin_sd[f"lin{i}.model.1.weight"]
        val = val + torch.mean(torch.mean(F.conv2d(d, w), dim=3), dim=2)
    return val.squeeze(1)


# ---------------------------------------------------------------------------
# InceptionV3 oracle (torchvision architecture, eval mode)
# ---------------------------------------------------------------------------

def _inception_convs():
    """(name, in, out, kernel(h,w), stride, pad(h,w)) for every
    BasicConv2d of torchvision inception_v3 (no aux head)."""
    specs = [
        ("Conv2d_1a_3x3", 3, 32, (3, 3), 2, (0, 0)),
        ("Conv2d_2a_3x3", 32, 32, (3, 3), 1, (0, 0)),
        ("Conv2d_2b_3x3", 32, 64, (3, 3), 1, (1, 1)),
        ("Conv2d_3b_1x1", 64, 80, (1, 1), 1, (0, 0)),
        ("Conv2d_4a_3x3", 80, 192, (3, 3), 1, (0, 0)),
    ]

    def a_block(name, cin, pool):
        return [
            (f"{name}.branch1x1", cin, 64, (1, 1), 1, (0, 0)),
            (f"{name}.branch5x5_1", cin, 48, (1, 1), 1, (0, 0)),
            (f"{name}.branch5x5_2", 48, 64, (5, 5), 1, (2, 2)),
            (f"{name}.branch3x3dbl_1", cin, 64, (1, 1), 1, (0, 0)),
            (f"{name}.branch3x3dbl_2", 64, 96, (3, 3), 1, (1, 1)),
            (f"{name}.branch3x3dbl_3", 96, 96, (3, 3), 1, (1, 1)),
            (f"{name}.branch_pool", cin, pool, (1, 1), 1, (0, 0)),
        ]

    def c_block(name, c7):
        return [
            (f"{name}.branch1x1", 768, 192, (1, 1), 1, (0, 0)),
            (f"{name}.branch7x7_1", 768, c7, (1, 1), 1, (0, 0)),
            (f"{name}.branch7x7_2", c7, c7, (1, 7), 1, (0, 3)),
            (f"{name}.branch7x7_3", c7, 192, (7, 1), 1, (3, 0)),
            (f"{name}.branch7x7dbl_1", 768, c7, (1, 1), 1, (0, 0)),
            (f"{name}.branch7x7dbl_2", c7, c7, (7, 1), 1, (3, 0)),
            (f"{name}.branch7x7dbl_3", c7, c7, (1, 7), 1, (0, 3)),
            (f"{name}.branch7x7dbl_4", c7, c7, (7, 1), 1, (3, 0)),
            (f"{name}.branch7x7dbl_5", c7, 192, (1, 7), 1, (0, 3)),
            (f"{name}.branch_pool", 768, 192, (1, 1), 1, (0, 0)),
        ]

    def e_block(name, cin):
        return [
            (f"{name}.branch1x1", cin, 320, (1, 1), 1, (0, 0)),
            (f"{name}.branch3x3_1", cin, 384, (1, 1), 1, (0, 0)),
            (f"{name}.branch3x3_2a", 384, 384, (1, 3), 1, (0, 1)),
            (f"{name}.branch3x3_2b", 384, 384, (3, 1), 1, (1, 0)),
            (f"{name}.branch3x3dbl_1", cin, 448, (1, 1), 1, (0, 0)),
            (f"{name}.branch3x3dbl_2", 448, 384, (3, 3), 1, (1, 1)),
            (f"{name}.branch3x3dbl_3a", 384, 384, (1, 3), 1, (0, 1)),
            (f"{name}.branch3x3dbl_3b", 384, 384, (3, 1), 1, (1, 0)),
            (f"{name}.branch_pool", cin, 192, (1, 1), 1, (0, 0)),
        ]

    specs += a_block("Mixed_5b", 192, 32)
    specs += a_block("Mixed_5c", 256, 64)
    specs += a_block("Mixed_5d", 288, 64)
    specs += [
        ("Mixed_6a.branch3x3", 288, 384, (3, 3), 2, (0, 0)),
        ("Mixed_6a.branch3x3dbl_1", 288, 64, (1, 1), 1, (0, 0)),
        ("Mixed_6a.branch3x3dbl_2", 64, 96, (3, 3), 1, (1, 1)),
        ("Mixed_6a.branch3x3dbl_3", 96, 96, (3, 3), 2, (0, 0)),
    ]
    specs += c_block("Mixed_6b", 128)
    specs += c_block("Mixed_6c", 160)
    specs += c_block("Mixed_6d", 160)
    specs += c_block("Mixed_6e", 192)
    specs += [
        ("Mixed_7a.branch3x3_1", 768, 192, (1, 1), 1, (0, 0)),
        ("Mixed_7a.branch3x3_2", 192, 320, (3, 3), 2, (0, 0)),
        ("Mixed_7a.branch7x7x3_1", 768, 192, (1, 1), 1, (0, 0)),
        ("Mixed_7a.branch7x7x3_2", 192, 192, (1, 7), 1, (0, 3)),
        ("Mixed_7a.branch7x7x3_3", 192, 192, (7, 1), 1, (3, 0)),
        ("Mixed_7a.branch7x7x3_4", 192, 192, (3, 3), 2, (0, 0)),
    ]
    specs += e_block("Mixed_7b", 1280)
    specs += e_block("Mixed_7c", 2048)
    return specs


INCEPTION_CONV_SPECS = {s[0]: s for s in _inception_convs()}


def make_inception_sd(rng):
    """Random torchvision inception_v3 state dict (no AuxLogits)."""
    sd = {}
    for name, cin, cout, k, _, _ in _inception_convs():
        sd[f"{name}.conv.weight"] = torch.from_numpy(
            rng.standard_normal((cout, cin, k[0], k[1])).astype(np.float32)
            * 0.05)
        sd[f"{name}.bn.weight"] = torch.from_numpy(
            (1.0 + 0.1 * rng.standard_normal(cout)).astype(np.float32))
        sd[f"{name}.bn.bias"] = torch.from_numpy(
            (0.1 * rng.standard_normal(cout)).astype(np.float32))
        sd[f"{name}.bn.running_mean"] = torch.from_numpy(
            (0.1 * rng.standard_normal(cout)).astype(np.float32))
        sd[f"{name}.bn.running_var"] = torch.from_numpy(
            (1.0 + 0.1 * np.abs(rng.standard_normal(cout))).astype(np.float32))
    sd["fc.weight"] = torch.from_numpy(
        rng.standard_normal((1000, 2048)).astype(np.float32) * 0.02)
    sd["fc.bias"] = torch.from_numpy(
        rng.standard_normal((1000,)).astype(np.float32) * 0.02)
    return sd


def _basic(sd, name, x):
    _, _, _, k, stride, pad = INCEPTION_CONV_SPECS[name]
    w = sd[f"{name}.conv.weight"]
    x = F.conv2d(x, w, None, stride=stride, padding=pad)
    x = F.batch_norm(x, sd[f"{name}.bn.running_mean"],
                     sd[f"{name}.bn.running_var"], sd[f"{name}.bn.weight"],
                     sd[f"{name}.bn.bias"], training=False, eps=1e-3)
    return F.relu(x)


def _incep_a(sd, n, x):
    b1 = _basic(sd, f"{n}.branch1x1", x)
    b5 = _basic(sd, f"{n}.branch5x5_2", _basic(sd, f"{n}.branch5x5_1", x))
    bd = _basic(sd, f"{n}.branch3x3dbl_3", _basic(
        sd, f"{n}.branch3x3dbl_2", _basic(sd, f"{n}.branch3x3dbl_1", x)))
    bp = _basic(sd, f"{n}.branch_pool", F.avg_pool2d(x, 3, 1, 1))
    return torch.cat([b1, b5, bd, bp], 1)


def _incep_c(sd, n, x):
    b1 = _basic(sd, f"{n}.branch1x1", x)
    b7 = x
    for i in (1, 2, 3):
        b7 = _basic(sd, f"{n}.branch7x7_{i}", b7)
    bd = x
    for i in (1, 2, 3, 4, 5):
        bd = _basic(sd, f"{n}.branch7x7dbl_{i}", bd)
    bp = _basic(sd, f"{n}.branch_pool", F.avg_pool2d(x, 3, 1, 1))
    return torch.cat([b1, b7, bd, bp], 1)


def _incep_e(sd, n, x):
    b1 = _basic(sd, f"{n}.branch1x1", x)
    b3 = _basic(sd, f"{n}.branch3x3_1", x)
    b3 = torch.cat([_basic(sd, f"{n}.branch3x3_2a", b3),
                    _basic(sd, f"{n}.branch3x3_2b", b3)], 1)
    bd = _basic(sd, f"{n}.branch3x3dbl_2",
                _basic(sd, f"{n}.branch3x3dbl_1", x))
    bd = torch.cat([_basic(sd, f"{n}.branch3x3dbl_3a", bd),
                    _basic(sd, f"{n}.branch3x3dbl_3b", bd)], 1)
    bp = _basic(sd, f"{n}.branch_pool", F.avg_pool2d(x, 3, 1, 1))
    return torch.cat([b1, b3, bd, bp], 1)


def inception_forward(sd, x):
    """Eval inception_v3: returns (pool3 (B,2048), logits (B,1000))."""
    for n in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3"):
        x = _basic(sd, n, x)
    x = F.max_pool2d(x, 3, 2)
    x = _basic(sd, "Conv2d_4a_3x3", _basic(sd, "Conv2d_3b_1x1", x))
    x = F.max_pool2d(x, 3, 2)
    for n in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        x = _incep_a(sd, n, x)
    b3 = _basic(sd, "Mixed_6a.branch3x3", x)
    bd = _basic(sd, "Mixed_6a.branch3x3dbl_3", _basic(
        sd, "Mixed_6a.branch3x3dbl_2", _basic(sd, "Mixed_6a.branch3x3dbl_1", x)))
    x = torch.cat([b3, bd, F.max_pool2d(x, 3, 2)], 1)
    for n in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = _incep_c(sd, n, x)
    b3 = _basic(sd, "Mixed_7a.branch3x3_2",
                _basic(sd, "Mixed_7a.branch3x3_1", x))
    b7 = x
    for i in (1, 2, 3, 4):
        b7 = _basic(sd, f"Mixed_7a.branch7x7x3_{i}", b7)
    x = torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)
    x = _incep_e(sd, "Mixed_7b", x)
    x = _incep_e(sd, "Mixed_7c", x)
    pool = F.adaptive_avg_pool2d(x, (1, 1)).flatten(1)
    logits = F.linear(pool, sd["fc.weight"], sd["fc.bias"])
    return pool, logits


# ---------------------------------------------------------------------------
# senet50 (reference networks/facenet.py:66-197 — VGGFace2 SE-ResNet-50)
# ---------------------------------------------------------------------------

_SENET_LAYERS = (3, 4, 6, 3)
_SENET_PLANES = (64, 128, 256, 512)


def make_senet50_sd(rng):
    sd = {}

    def t(*shape):
        # fan-in-scaled so activations stay O(1) through all 16 blocks —
        # an unconditioned random net amplifies fp error ~10x per stage
        # and the parity tolerance becomes meaningless
        scale = (1.0 / np.sqrt(np.prod(shape[1:]))) if len(shape) > 1 else 0.05
        return torch.from_numpy(
            (rng.standard_normal(shape) * scale).astype(np.float32))

    def bn(key, c):
        sd[f"{key}.weight"] = t(c) + 1.0
        sd[f"{key}.bias"] = t(c)
        sd[f"{key}.running_mean"] = t(c)
        sd[f"{key}.running_var"] = torch.abs(t(c)) + 0.5

    sd["conv1.weight"] = t(64, 3, 7, 7)
    bn("bn1", 64)
    inplanes = 64
    for li, nb in enumerate(_SENET_LAYERS, start=1):
        planes = _SENET_PLANES[li - 1]
        for bi in range(nb):
            p = f"layer{li}.{bi}"
            sd[f"{p}.conv1.weight"] = t(planes, inplanes if bi == 0 else planes * 4, 1, 1)
            bn(f"{p}.bn1", planes)
            sd[f"{p}.conv2.weight"] = t(planes, planes, 3, 3)
            bn(f"{p}.bn2", planes)
            sd[f"{p}.conv3.weight"] = t(planes * 4, planes, 1, 1)
            bn(f"{p}.bn3", planes * 4)
            sd[f"{p}.conv4.weight"] = t(planes * 4 // 16, planes * 4, 1, 1)
            sd[f"{p}.conv4.bias"] = t(planes * 4 // 16)
            sd[f"{p}.conv5.weight"] = t(planes * 4, planes * 4 // 16, 1, 1)
            sd[f"{p}.conv5.bias"] = t(planes * 4)
            if bi == 0:
                sd[f"{p}.downsample.0.weight"] = t(planes * 4, inplanes, 1, 1)
                bn(f"{p}.downsample.1", planes * 4)
        inplanes = planes * 4
    return sd


def senet50_forward(sd, x):
    """Eval-mode senet50 (include_top=False): returns (stage feats, embed)."""

    def bottleneck(p, x, stride):
        out = F.relu(_bn_eval(sd, f"{p}.bn1", _conv(sd, f"{p}.conv1", x,
                                                    stride=stride)))
        out = F.relu(_bn_eval(sd, f"{p}.bn2", _conv(sd, f"{p}.conv2", out,
                                                    padding=1)))
        out = _bn_eval(sd, f"{p}.bn3", _conv(sd, f"{p}.conv3", out))
        se = F.avg_pool2d(out, out.size(2))
        se = torch.sigmoid(_conv(sd, f"{p}.conv5",
                                 F.relu(_conv(sd, f"{p}.conv4", se))))
        if f"{p}.downsample.0.weight" in sd:
            residual = _bn_eval(sd, f"{p}.downsample.1",
                                _conv(sd, f"{p}.downsample.0", x,
                                      stride=stride))
        else:
            residual = x
        return F.relu(se * out + residual)

    x = F.relu(_bn_eval(sd, "bn1", _conv(sd, "conv1", x, stride=2,
                                         padding=3)))
    x = F.max_pool2d(x, 3, 2, ceil_mode=True)
    feats = [x]
    for li, nb in enumerate(_SENET_LAYERS, start=1):
        stride = 1 if li == 1 else 2
        for bi in range(nb):
            x = bottleneck(f"layer{li}.{bi}", x, stride if bi == 0 else 1)
        feats.append(x)
    embed = F.adaptive_avg_pool2d(x, (1, 1)).flatten(1)
    return feats, embed


# ---------------------------------------------------------------------------
# osnet_ibn_x1_0 (reference his_evaluators/metrics/OSreid/OSNet.py)
# ---------------------------------------------------------------------------

_OSNET_CH = (64, 256, 384, 512)


def make_osnet_sd(rng):
    sd = {}

    def t(*shape):
        scale = (1.0 / np.sqrt(np.prod(shape[1:]))) if len(shape) > 1 else 0.05
        return torch.from_numpy(
            (rng.standard_normal(shape) * scale).astype(np.float32))

    def bn(key, c, running=True):
        sd[f"{key}.weight"] = t(c) + 1.0
        sd[f"{key}.bias"] = t(c)
        if running:
            sd[f"{key}.running_mean"] = t(c)
            sd[f"{key}.running_var"] = torch.abs(t(c)) + 0.5

    def cbr(key, cin, cout, k, running=True):
        sd[f"{key}.conv.weight"] = t(cout, cin, k, k)
        bn(f"{key}.bn", cout, running)

    def light(key, cin, cout):
        sd[f"{key}.conv1.weight"] = t(cout, cin, 1, 1)
        sd[f"{key}.conv2.weight"] = t(cout, 1, 3, 3)
        bn(f"{key}.bn", cout)

    def osblock(key, cin, cout, use_in):
        mid = cout // 4
        cbr(f"{key}.conv1", cin, mid, 1)
        light(f"{key}.conv2a", mid, mid)
        for si, depth in (("b", 2), ("c", 3), ("d", 4)):
            for d in range(depth):
                light(f"{key}.conv2{si}.{d}", mid, mid)
        sd[f"{key}.gate.fc1.weight"] = t(mid // 16, mid, 1, 1)
        sd[f"{key}.gate.fc1.bias"] = t(mid // 16)
        sd[f"{key}.gate.fc2.weight"] = t(mid, mid // 16, 1, 1)
        sd[f"{key}.gate.fc2.bias"] = t(mid)
        cbr(f"{key}.conv3", mid, cout, 1)
        if cin != cout:
            cbr(f"{key}.downsample", cin, cout, 1)
        if use_in:
            bn(f"{key}.IN", cout, running=False)

    c = _OSNET_CH
    cbr("conv1", 3, c[0], 7, running=False)   # IBN stem: InstanceNorm
    for stage, cin, cout, use_in, has_t in (
            (2, c[0], c[1], True, True), (3, c[1], c[2], False, True),
            (4, c[2], c[3], False, False)):
        osblock(f"conv{stage}.0", cin, cout, use_in)
        osblock(f"conv{stage}.1", cout, cout, use_in)
        if has_t:
            cbr(f"conv{stage}.2.0", cout, cout, 1)
    cbr("conv5", c[3], c[3], 1)
    sd["fc.0.weight"] = t(512, c[3])
    sd["fc.0.bias"] = t(512)
    bn("fc.1", 512)
    return sd


def osnet_forward(sd, x):
    """Eval-mode osnet_ibn_x1_0 embedding (OSNet.py:282-299)."""

    def cbr(key, x, stride=1, padding=0, relu=True):
        x = _conv(sd, f"{key}.conv", x, stride=stride, padding=padding)
        if f"{key}.bn.running_mean" in sd:
            x = _bn_eval(sd, f"{key}.bn", x)
        else:
            x = _inorm(sd, f"{key}.bn", x)
        return F.relu(x) if relu else x

    def light(key, x):
        x = _conv(sd, f"{key}.conv1", x)
        w = sd[f"{key}.conv2.weight"]
        x = F.conv2d(x, w, padding=1, groups=w.shape[0])
        return F.relu(_bn_eval(sd, f"{key}.bn", x))

    def gate(key, x):
        g = F.adaptive_avg_pool2d(x, 1)
        g = F.relu(_conv(sd, f"{key}.fc1", g))
        g = torch.sigmoid(_conv(sd, f"{key}.fc2", g))
        return x * g

    def osblock(key, x, use_in):
        residual = x
        x1 = cbr(f"{key}.conv1", x)
        streams = []
        h = light(f"{key}.conv2a", x1)
        streams.append(h)
        for si, depth in (("b", 2), ("c", 3), ("d", 4)):
            h = x1
            for d in range(depth):
                h = light(f"{key}.conv2{si}.{d}", h)
            streams.append(h)
        x2 = sum(gate(f"{key}.gate", s) for s in streams)
        x3 = cbr(f"{key}.conv3", x2, relu=False)
        if f"{key}.downsample.conv.weight" in sd:
            residual = cbr(f"{key}.downsample", residual, relu=False)
        out = x3 + residual
        if use_in:
            out = _inorm(sd, f"{key}.IN", out)
        return F.relu(out)

    x = cbr("conv1", x, stride=2, padding=3)
    x = F.max_pool2d(x, 3, 2, padding=1)
    for stage, use_in, has_t in ((2, True, True), (3, False, True),
                                 (4, False, False)):
        x = osblock(f"conv{stage}.0", x, use_in)
        x = osblock(f"conv{stage}.1", x, use_in)
        if has_t:
            x = cbr(f"conv{stage}.2.0", x)
            x = F.avg_pool2d(x, 2, 2)
    x = cbr("conv5", x)
    v = F.adaptive_avg_pool2d(x, 1).flatten(1)
    v = F.linear(v, sd["fc.0.weight"], sd["fc.0.bias"])
    v = F.batch_norm(v, sd["fc.1.running_mean"], sd["fc.1.running_var"],
                     sd["fc.1.weight"], sd["fc.1.bias"], training=False,
                     eps=1e-5)
    return F.relu(v)


# ---------------------------------------------------------------------------
# PCB (torchvision resnet50, layer4 stride 1, 6-part pool)
# ---------------------------------------------------------------------------


def make_pcb_sd(rng):
    sd = {}

    def t(*shape):
        scale = (1.0 / np.sqrt(np.prod(shape[1:]))) if len(shape) > 1 else 0.05
        return torch.from_numpy(
            (rng.standard_normal(shape) * scale).astype(np.float32))

    def bn(key, c):
        sd[f"{key}.weight"] = t(c) + 1.0
        sd[f"{key}.bias"] = t(c)
        sd[f"{key}.running_mean"] = t(c)
        sd[f"{key}.running_var"] = torch.abs(t(c)) + 0.5

    sd["model.conv1.weight"] = t(64, 3, 7, 7)
    bn("model.bn1", 64)
    inplanes = 64
    for li, nb in enumerate((3, 4, 6, 3), start=1):
        planes = (64, 128, 256, 512)[li - 1]
        for bi in range(nb):
            p = f"model.layer{li}.{bi}"
            cin = inplanes if bi == 0 else planes * 4
            sd[f"{p}.conv1.weight"] = t(planes, cin, 1, 1)
            bn(f"{p}.bn1", planes)
            sd[f"{p}.conv2.weight"] = t(planes, planes, 3, 3)
            bn(f"{p}.bn2", planes)
            sd[f"{p}.conv3.weight"] = t(planes * 4, planes, 1, 1)
            bn(f"{p}.bn3", planes * 4)
            if bi == 0:
                sd[f"{p}.downsample.0.weight"] = t(planes * 4, cin, 1, 1)
                bn(f"{p}.downsample.1", planes * 4)
        inplanes = planes * 4
    return sd


def pcb_forward(sd, x, parts=6):
    """PCB_test eval forward (model.py:207-220): 6-part features."""

    def bottleneck(p, x, stride):
        out = F.relu(_bn_eval(sd, f"{p}.bn1", _conv(sd, f"{p}.conv1", x)))
        out = F.relu(_bn_eval(sd, f"{p}.bn2",
                              _conv(sd, f"{p}.conv2", out, stride=stride,
                                    padding=1)))
        out = _bn_eval(sd, f"{p}.bn3", _conv(sd, f"{p}.conv3", out))
        if f"{p}.downsample.0.weight" in sd:
            residual = _bn_eval(sd, f"{p}.downsample.1",
                                _conv(sd, f"{p}.downsample.0", x,
                                      stride=stride))
        else:
            residual = x
        return F.relu(out + residual)

    x = F.relu(_bn_eval(sd, "model.bn1",
                        _conv(sd, "model.conv1", x, stride=2, padding=3)))
    x = F.max_pool2d(x, 3, 2, padding=1)
    for li, nb in enumerate((3, 4, 6, 3), start=1):
        stride = 1 if li in (1, 4) else 2   # PCB: layer4 stride 1
        for bi in range(nb):
            x = bottleneck(f"model.layer{li}.{bi}", x,
                           stride if bi == 0 else 1)
    x = F.adaptive_avg_pool2d(x, (parts, 1))
    return x.squeeze(-1)   # (B, 2048, parts)


# ---------------------------------------------------------------------------
# InceptionResnetV1 (facenet-pytorch, vggface2 layout)
# ---------------------------------------------------------------------------


def make_facenet_ir_sd(rng):
    sd = {}

    def t(*shape):
        scale = (1.0 / np.sqrt(np.prod(shape[1:]))) if len(shape) > 1 else 0.05
        return torch.from_numpy(
            (rng.standard_normal(shape) * scale).astype(np.float32))

    def bn(key, c):
        sd[f"{key}.weight"] = t(c) + 1.0
        sd[f"{key}.bias"] = t(c)
        sd[f"{key}.running_mean"] = t(c)
        sd[f"{key}.running_var"] = torch.abs(t(c)) + 0.5

    def basic(key, cin, cout, k):
        kh, kw = (k, k) if isinstance(k, int) else k
        sd[f"{key}.conv.weight"] = t(cout, cin, kh, kw)
        bn(f"{key}.bn", cout)

    def seq(key, specs):
        for i, (cin, cout, k) in enumerate(specs):
            basic(f"{key}.{i}", cin, cout, k)

    basic("conv2d_1a", 3, 32, 3)
    basic("conv2d_2a", 32, 32, 3)
    basic("conv2d_2b", 32, 64, 3)
    basic("conv2d_3b", 64, 80, 1)
    basic("conv2d_4a", 80, 192, 3)
    basic("conv2d_4b", 192, 256, 3)
    for i in range(5):   # Block35
        p = f"repeat_1.{i}"
        basic(f"{p}.branch0", 256, 32, 1)
        seq(f"{p}.branch1", [(256, 32, 1), (32, 32, 3)])
        seq(f"{p}.branch2", [(256, 32, 1), (32, 32, 3), (32, 32, 3)])
        sd[f"{p}.conv2d.weight"] = t(256, 96, 1, 1)
        sd[f"{p}.conv2d.bias"] = t(256)
    basic("mixed_6a.branch0", 256, 384, 3)
    seq("mixed_6a.branch1", [(256, 192, 1), (192, 192, 3), (192, 256, 3)])
    for i in range(10):  # Block17
        p = f"repeat_2.{i}"
        basic(f"{p}.branch0", 896, 128, 1)
        seq(f"{p}.branch1", [(896, 128, 1), (128, 128, (1, 7)),
                             (128, 128, (7, 1))])
        sd[f"{p}.conv2d.weight"] = t(896, 256, 1, 1)
        sd[f"{p}.conv2d.bias"] = t(896)
    seq("mixed_7a.branch0", [(896, 256, 1), (256, 384, 3)])
    seq("mixed_7a.branch1", [(896, 256, 1), (256, 256, 3)])
    seq("mixed_7a.branch2", [(896, 256, 1), (256, 256, 3), (256, 256, 3)])
    for i in range(6):   # 5x Block8 + final block8
        p = f"repeat_3.{i}" if i < 5 else "block8"
        basic(f"{p}.branch0", 1792, 192, 1)
        seq(f"{p}.branch1", [(1792, 192, 1), (192, 192, (1, 3)),
                             (192, 192, (3, 1))])
        sd[f"{p}.conv2d.weight"] = t(1792, 384, 1, 1)
        sd[f"{p}.conv2d.bias"] = t(1792)
    sd["last_linear.weight"] = t(512, 1792)
    bn("last_bn", 512)
    return sd


def facenet_ir_forward(sd, x):
    """Eval InceptionResnetV1 embedding, normalize=False
    (inception_resnet_v1.py:271-302)."""
    EPS = 1e-3

    def bn_eval(key, x):
        return F.batch_norm(x, sd[f"{key}.running_mean"],
                            sd[f"{key}.running_var"], sd[f"{key}.weight"],
                            sd[f"{key}.bias"], training=False, eps=EPS)

    def basic(key, x, stride=1, padding=0):
        return F.relu(bn_eval(f"{key}.bn",
                              _conv(sd, f"{key}.conv", x, stride=stride,
                                    padding=padding)))

    def seq(key, x, specs):
        for i, (stride, padding) in enumerate(specs):
            x = basic(f"{key}.{i}", x, stride, padding)
        return x

    def resblock(key, x, branches, scale, relu=True):
        outs = [basic(f"{key}.branch0", x)]
        for bi, specs in enumerate(branches, start=1):
            outs.append(seq(f"{key}.branch{bi}", x, specs))
        out = _conv(sd, f"{key}.conv2d", torch.cat(outs, 1))
        out = out * scale + x
        return F.relu(out) if relu else out

    B35 = ([(1, 0), (1, 1)], [(1, 0), (1, 1), (1, 1)])
    B17 = ([(1, 0), (1, (0, 3)), (1, (3, 0))],)
    B8 = ([(1, 0), (1, (0, 1)), (1, (1, 0))],)

    x = basic("conv2d_1a", x, 2)
    x = basic("conv2d_2a", x)
    x = basic("conv2d_2b", x, 1, 1)
    x = F.max_pool2d(x, 3, 2)
    x = basic("conv2d_3b", x)
    x = basic("conv2d_4a", x)
    x = basic("conv2d_4b", x, 2)
    for i in range(5):
        x = resblock(f"repeat_1.{i}", x, B35, 0.17)
    x = torch.cat([basic("mixed_6a.branch0", x, 2),
                   seq("mixed_6a.branch1", x, [(1, 0), (1, 1), (2, 0)]),
                   F.max_pool2d(x, 3, 2)], 1)
    for i in range(10):
        x = resblock(f"repeat_2.{i}", x, B17, 0.10)
    x = torch.cat([seq("mixed_7a.branch0", x, [(1, 0), (2, 0)]),
                   seq("mixed_7a.branch1", x, [(1, 0), (2, 0)]),
                   seq("mixed_7a.branch2", x, [(1, 0), (1, 1), (2, 0)]),
                   F.max_pool2d(x, 3, 2)], 1)
    for i in range(5):
        x = resblock(f"repeat_3.{i}", x, B8, 0.20)
    x = resblock("block8", x, B8, 1.0, relu=False)
    v = F.adaptive_avg_pool2d(x, 1).flatten(1)
    v = F.linear(v, sd["last_linear.weight"])
    v = F.batch_norm(v, sd["last_bn.running_mean"],
                     sd["last_bn.running_var"], sd["last_bn.weight"],
                     sd["last_bn.bias"], training=False, eps=EPS)
    return v


# ---------------------------------------------------------------------------
# End-to-end imitation-chain oracle (personalize -> flow -> warp ->
# cached-feature LWB decode -> compositing): torch semantics of the full
# reference pipeline — cal_bc_transform (nmr.py:617-659), torch-1.2
# grid_sample(align_corners=True), ImpersonatorGenerator.inference
# (generator.py:277-301) and the mask compositing of imitator.forward
# (imitator.py:326-342). Used to prove the COMPOSITION of the jax stack
# (not just each net individually) against torch on random weights.
# ---------------------------------------------------------------------------

def morph_torch(mask, ks, mode="erode"):
    """Box-count morphology matching impersonator_tpu.ops.morphology.morph
    (erode pads 1, dilate pads 0; threshold on the ks² window sum)."""
    pad = ks // 2
    pad_value = 1.0 if mode == "erode" else 0.0
    x = F.pad(mask, (pad, pad, pad, pad), value=pad_value)
    sums = F.avg_pool2d(x, ks, stride=1) * float(ks * ks)
    if mode == "erode":
        return (sums > float(ks * ks) - 0.5).to(mask.dtype)
    return (sums >= 1.0).to(mask.dtype)


def cal_bc_transform_torch(src_f2pts, fim, wim, image_size):
    """SMPLRenderer.cal_bc_transform (nmr.py:617-659): per covered pixel,
    barycentric blend of the 3 source-image positions of its face."""
    bs = src_f2pts.shape[0]
    T = -2 * torch.ones((bs, image_size * image_size, 2),
                        dtype=src_f2pts.dtype)
    for i in range(bs):
        fidx = fim[i].long().reshape(-1)
        w = wim[i].reshape(-1, 3)
        mask = fidx != -1
        ex_idx = fidx[mask]
        ex_w = w[mask]
        T[i, mask] = (src_f2pts[i][ex_idx] * ex_w[:, :, None]).sum(dim=1)
    return T.view(bs, image_size, image_size, 2)


def _resize_T(T, h, w):
    """ImpersonatorGenerator.resize_trans (generator.py:303-310)."""
    Ts = T.permute(0, 3, 1, 2)
    Ts = F.interpolate(Ts, size=(h, w), mode="bilinear", align_corners=True)
    return Ts.permute(0, 2, 3, 1)


def _stn(x, T):
    """torch-1.2 default grid_sample semantics (align_corners=True,
    zero padding; generator.py:312-315 + SURVEY §7.4)."""
    return F.grid_sample(x, T, align_corners=True)


def resunet_encode(sd, prefix, x, repeat=2, n_down=3):
    """ResUnetGenerator.inference (generator.py:136-147): encoder stack
    outs + per-resblock outs (the cached source features)."""
    enc = []
    h = F.relu(_inorm(sd, f"{prefix}.encoders.0.1",
                      _conv(sd, f"{prefix}.encoders.0.0", x, 1, 3)))
    enc.append(h)
    for i in range(1, n_down + 1):
        h = F.relu(_inorm(sd, f"{prefix}.encoders.{i}.1",
                          _conv(sd, f"{prefix}.encoders.{i}.0", h, 2, 1)))
        enc.append(h)
    res = []
    for i in range(repeat):
        r = F.relu(_inorm(sd, f"{prefix}.resnets.{i}.main.1",
                          _conv(sd, f"{prefix}.resnets.{i}.main.0", h, 1, 1)))
        r = _inorm(sd, f"{prefix}.resnets.{i}.main.4",
                   _conv(sd, f"{prefix}.resnets.{i}.main.3", r, 1, 1))
        h = h + r
        res.append(h)
    return enc, res


def resunet_decode_regress(sd, prefix, h, enc, n_down=3):
    """ResUnetGenerator.decode + regress (generator.py:174-186)."""
    for i in range(n_down):
        h = F.relu(_inorm(sd, f"{prefix}.decoders.{i}.1",
                          _convt(sd, f"{prefix}.decoders.{i}.0", h)))
        h = torch.cat([enc[n_down - 1 - i], h], dim=1)
        h = F.relu(_inorm(sd, f"{prefix}.skippers.{i}.1",
                          _conv(sd, f"{prefix}.skippers.{i}.0", h, 1, 1)))
    rgb = torch.tanh(_conv(sd, f"{prefix}.img_reg.0", h, 1, 3))
    mask = torch.sigmoid(_conv(sd, f"{prefix}.attetion_reg.0", h, 1, 3))
    return rgb, mask


def generator_inference_torch(sd, src_enc, src_res, tsf_inputs, T,
                              repeat=2, n_down=3):
    """ImpersonatorGenerator.inference (generator.py:277-301): tsf stream
    with per-stage Liquid Warping adds from the cached source features."""
    tsf_x = F.relu(_inorm(sd, "tsf_model.encoders.0.1",
                          _conv(sd, "tsf_model.encoders.0.0",
                                tsf_inputs, 1, 3)))
    tsf_enc = [tsf_x]
    for i in range(1, n_down + 1):
        src_x = src_enc[i]
        warp = _stn(src_x, _resize_T(T, src_x.shape[2], src_x.shape[3]))
        tsf_x = F.relu(_inorm(sd, f"tsf_model.encoders.{i}.1",
                              _conv(sd, f"tsf_model.encoders.{i}.0",
                                    tsf_x, 2, 1))) + warp
        tsf_enc.append(tsf_x)
    T_scale = _resize_T(T, src_enc[-1].shape[2], src_enc[-1].shape[3])
    for i in range(repeat):
        r = F.relu(_inorm(sd, f"tsf_model.resnets.{i}.main.1",
                          _conv(sd, f"tsf_model.resnets.{i}.main.0",
                                tsf_x, 1, 1)))
        r = _inorm(sd, f"tsf_model.resnets.{i}.main.4",
                   _conv(sd, f"tsf_model.resnets.{i}.main.3", r, 1, 1))
        tsf_x = tsf_x + r + _stn(src_res[i], T_scale)
    return resunet_decode_regress(sd, "tsf_model", tsf_x, tsf_enc)


def imitate_chain_torch(sd, src_img, src_cond, src_p2verts, tsf_fim,
                        tsf_wim, tsf_cond, image_size,
                        bg_ks=13, ft_ks=3, repeat=2):
    """The full chain downstream of the rasterizer, in torch:
    personalize (bg inpaint via the generator BG stream + source feature
    cache, imitator.py:83-145) then one imitation step
    (imitator.py:236-342). Returns (preds, T, bg, syn)."""
    bg_mask = morph_torch(src_cond[:, -1:], bg_ks, "erode")
    bg_inputs = torch.cat([src_img * bg_mask, bg_mask], dim=1)
    bg = bg_forward(sd, bg_inputs, repeat=repeat)

    ft_mask = 1.0 - morph_torch(src_cond[:, -1:], ft_ks, "erode")
    src_inputs = torch.cat([src_img * ft_mask, src_cond], dim=1)
    src_enc, src_res = resunet_encode(sd, "src_model", src_inputs,
                                      repeat=repeat)

    T = cal_bc_transform_torch(src_p2verts, tsf_fim, tsf_wim, image_size)
    syn = _stn(src_img, T)
    tsf_inputs = torch.cat([syn, tsf_cond], dim=1)
    color, mask = generator_inference_torch(sd, src_enc, src_res,
                                            tsf_inputs, T, repeat=repeat)
    preds = mask * bg + (1 - mask) * color
    return preds, T, bg, syn


# ---------------------------------------------------------------------------
# MTCNN stage nets (facenet_pytorch models/mtcnn.py:9-154)
# ---------------------------------------------------------------------------


def _prelu(sd, key, x):
    return F.prelu(x, sd[f"{key}.weight"])


def _maxpool_ceil(x, k, s):
    return F.max_pool2d(x, k, s, ceil_mode=True)


def pnet_forward(sd, x):
    """mtcnn.py:37-48. x NCHW normalized; returns (reg, prob)."""
    x = _prelu(sd, "prelu1", _conv(sd, "conv1", x))
    x = _maxpool_ceil(x, 2, 2)
    x = _prelu(sd, "prelu2", _conv(sd, "conv2", x))
    x = _prelu(sd, "prelu3", _conv(sd, "conv3", x))
    a = torch.softmax(_conv(sd, "conv4_1", x), dim=1)
    b = _conv(sd, "conv4_2", x)
    return b, a


def rnet_forward(sd, x):
    """mtcnn.py:82-97 incl. the (B,C,H,W)->(B,W,H,C) flatten quirk."""
    x = _prelu(sd, "prelu1", _conv(sd, "conv1", x))
    x = _maxpool_ceil(x, 3, 2)
    x = _prelu(sd, "prelu2", _conv(sd, "conv2", x))
    x = _maxpool_ceil(x, 3, 2)
    x = _prelu(sd, "prelu3", _conv(sd, "conv3", x))
    x = x.permute(0, 3, 2, 1).contiguous().view(x.shape[0], -1)
    x = _prelu(sd, "prelu4", F.linear(x, sd["dense4.weight"],
                                      sd["dense4.bias"]))
    a = torch.softmax(F.linear(x, sd["dense5_1.weight"],
                               sd["dense5_1.bias"]), dim=1)
    b = F.linear(x, sd["dense5_2.weight"], sd["dense5_2.bias"])
    return b, a


def onet_forward(sd, x):
    """mtcnn.py:135-154."""
    x = _prelu(sd, "prelu1", _conv(sd, "conv1", x))
    x = _maxpool_ceil(x, 3, 2)
    x = _prelu(sd, "prelu2", _conv(sd, "conv2", x))
    x = _maxpool_ceil(x, 3, 2)
    x = _prelu(sd, "prelu3", _conv(sd, "conv3", x))
    x = _maxpool_ceil(x, 2, 2)
    x = _prelu(sd, "prelu4", _conv(sd, "conv4", x))
    x = x.permute(0, 3, 2, 1).contiguous().view(x.shape[0], -1)
    x = _prelu(sd, "prelu5", F.linear(x, sd["dense5.weight"],
                                      sd["dense5.bias"]))
    a = torch.softmax(F.linear(x, sd["dense6_1.weight"],
                               sd["dense6_1.bias"]), dim=1)
    b = F.linear(x, sd["dense6_2.weight"], sd["dense6_2.bias"])
    c = F.linear(x, sd["dense6_3.weight"], sd["dense6_3.bias"])
    return b, c, a


def _mt_layers(rng, spec):
    """spec rows: ('conv'|'dense'|'prelu', name, shape...)."""
    sd = {}
    for row in spec:
        kind, name = row[0], row[1]
        if kind == "conv":
            cin, cout, k = row[2:]
            sd[f"{name}.weight"] = torch.from_numpy(
                rng.standard_normal((cout, cin, k, k)).astype(np.float32)
                * 0.1)
            sd[f"{name}.bias"] = torch.from_numpy(
                rng.standard_normal((cout,)).astype(np.float32) * 0.1)
        elif kind == "dense":
            cin, cout = row[2:]
            sd[f"{name}.weight"] = torch.from_numpy(
                rng.standard_normal((cout, cin)).astype(np.float32) * 0.05)
            sd[f"{name}.bias"] = torch.from_numpy(
                rng.standard_normal((cout,)).astype(np.float32) * 0.05)
        else:                                            # prelu
            c = row[2]
            sd[f"{name}.weight"] = torch.from_numpy(
                np.abs(rng.standard_normal((c,))).astype(np.float32) * 0.25)
    return sd


def make_pnet_sd(rng):
    return _mt_layers(rng, [
        ("conv", "conv1", 3, 10, 3), ("prelu", "prelu1", 10),
        ("conv", "conv2", 10, 16, 3), ("prelu", "prelu2", 16),
        ("conv", "conv3", 16, 32, 3), ("prelu", "prelu3", 32),
        ("conv", "conv4_1", 32, 2, 1), ("conv", "conv4_2", 32, 4, 1)])


def make_rnet_sd(rng):
    return _mt_layers(rng, [
        ("conv", "conv1", 3, 28, 3), ("prelu", "prelu1", 28),
        ("conv", "conv2", 28, 48, 3), ("prelu", "prelu2", 48),
        ("conv", "conv3", 48, 64, 2), ("prelu", "prelu3", 64),
        ("dense", "dense4", 576, 128), ("prelu", "prelu4", 128),
        ("dense", "dense5_1", 128, 2), ("dense", "dense5_2", 128, 4)])


def make_onet_sd(rng):
    return _mt_layers(rng, [
        ("conv", "conv1", 3, 32, 3), ("prelu", "prelu1", 32),
        ("conv", "conv2", 32, 64, 3), ("prelu", "prelu2", 64),
        ("conv", "conv3", 64, 64, 3), ("prelu", "prelu3", 64),
        ("conv", "conv4", 64, 128, 2), ("prelu", "prelu4", 128),
        ("dense", "dense5", 1152, 256), ("prelu", "prelu5", 256),
        ("dense", "dense6_1", 256, 2), ("dense", "dense6_2", 256, 4),
        ("dense", "dense6_3", 256, 10)])


# ---------------------------------------------------------------------------
# Darknet / YOLOv3 functional interpreter (yolov3/models.py:12-260).
# Independent of metrics/yolo.py by construction: NCHW, explicit
# (unfolded) BatchNorm, torch ops throughout.
# ---------------------------------------------------------------------------


def darknet_load_torch(layers, path, ):
    """darknet .weights -> {conv{i}: tensors} keeping BN params separate
    (models.py:262-314 byte order)."""
    import numpy as _np
    with open(path, "rb") as f:
        _np.fromfile(f, dtype=_np.int32, count=5)
        w = _np.fromfile(f, dtype=_np.float32)
    sd, ptr = {}, 0

    def take(n):
        nonlocal ptr
        out = torch.from_numpy(w[ptr:ptr + n].copy())
        ptr += n
        return out

    for ld in layers:
        if ld["type"] != "convolutional":
            continue
        i, co, ci, k = ld["index"], ld["filters"], ld["in_ch"], ld["size"]
        if ld["bn"]:
            sd[f"{i}.bn_b"] = take(co)
            sd[f"{i}.bn_w"] = take(co)
            sd[f"{i}.bn_rm"] = take(co)
            sd[f"{i}.bn_rv"] = take(co)
        else:
            sd[f"{i}.b"] = take(co)
        sd[f"{i}.w"] = take(co * ci * k * k).view(co, ci, k, k)
    return sd


def _yolo_decode_torch(x, anchors, num_classes, img_dim):
    """YOLOLayer.forward eval path (models.py:131-176)."""
    b, _, g, _ = x.shape
    na = len(anchors)
    stride = img_dim / g
    p = (x.view(b, na, num_classes + 5, g, g)
         .permute(0, 1, 3, 4, 2).contiguous())
    grid_x = torch.arange(g).repeat(g, 1).view(1, 1, g, g).float()
    grid_y = torch.arange(g).repeat(g, 1).t().view(1, 1, g, g).float()
    aw = torch.tensor([a[0] / stride for a in anchors]).view(1, na, 1, 1)
    ah = torch.tensor([a[1] / stride for a in anchors]).view(1, na, 1, 1)
    boxes = torch.stack([torch.sigmoid(p[..., 0]) + grid_x,
                         torch.sigmoid(p[..., 1]) + grid_y,
                         torch.exp(p[..., 2]) * aw,
                         torch.exp(p[..., 3]) * ah], dim=-1)
    return torch.cat([boxes.view(b, -1, 4) * stride,
                      torch.sigmoid(p[..., 4]).view(b, -1, 1),
                      torch.sigmoid(p[..., 5:]).view(b, -1, num_classes)],
                     dim=-1)


def darknet_forward(layers, sd, x):
    """Darknet.forward eval path (models.py:251-260). x NCHW in [0,1]."""
    img_dim = x.shape[2]
    outs, dets = [], []
    for ld in layers:
        t = ld["type"]
        if t == "convolutional":
            i = ld["index"]
            pad = ld["pad"]
            x = F.conv2d(x, sd[f"{i}.w"], sd.get(f"{i}.b"),
                         stride=ld["stride"], padding=pad)
            if ld["bn"]:
                x = F.batch_norm(x, sd[f"{i}.bn_rm"], sd[f"{i}.bn_rv"],
                                 sd[f"{i}.bn_w"], sd[f"{i}.bn_b"],
                                 training=False, eps=1e-5)
            if ld["leaky"]:
                x = F.leaky_relu(x, 0.1)
        elif t == "maxpool":
            k, s = ld["size"], ld["stride"]
            if k == 2 and s == 1:
                x = F.pad(x, (0, 1, 0, 1))
                x = F.max_pool2d(x, k, s, padding=0)
            else:
                x = F.max_pool2d(x, k, s, padding=(k - 1) // 2)
        elif t == "upsample":
            x = F.interpolate(x, scale_factor=ld["stride"], mode="nearest")
        elif t == "route":
            x = torch.cat([outs[j] for j in ld["layers"]], dim=1)
        elif t == "shortcut":
            x = outs[-1] + outs[ld["frm"]]
        elif t == "yolo":
            x = _yolo_decode_torch(x, ld["anchors"], ld["classes"],
                                   img_dim)
            dets.append(x)
        outs.append(x)
    return torch.cat(dets, dim=1)

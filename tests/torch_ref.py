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

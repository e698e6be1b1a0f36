"""Convert reference PyTorch checkpoints into impersonator_tpu pytrees.

One-time converters for the six pretrained networks the reference ships
(SURVEY §2.5): HMR (hmr_tf2pt.pth), the LWB generator
(net_epoch_30_id_G.pth), deepfillv2 (net_epoch_50_id_G.pth), torchvision
VGG19, SphereFace-20a, and (via assets.load_smpl_assets) the SMPL pickle.

Usage:
    python tools/convert_weights.py hmr     hmr_tf2pt.pth      out.msgpack
    python tools/convert_weights.py gen     net_epoch_30_id_G.pth out.msgpack
    python tools/convert_weights.py bgnet   deepfillv2.pth     out.msgpack
    python tools/convert_weights.py vgg19   vgg19.pth          out.msgpack
    python tools/convert_weights.py sphere  sphere20a.pth      out.msgpack

Conventions:
    torch Conv2d weight  (O, I, kH, kW) -> flax HWIO  (kH, kW, I, O)
    torch ConvT2d weight (I, O, kH, kW) -> ConvTransposeTorch kernel
                                           (kH, kW, I, O) [flip applied at
                                           run time, not here]
    torch Linear weight  (O, I)         -> Dense kernel (I, O)
    BatchNorm weight/bias/running_*     -> scale/bias + batch_stats
    InstanceNorm weight/bias            -> scale/bias
"""

from __future__ import annotations

import argparse
import sys
from typing import Dict

import numpy as np


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                      np.float32)


def conv_w(t):
    return _np(t).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def convt_w(t):
    return _np(t).transpose(2, 3, 0, 1)  # IOHW -> HWIO (I on axis 2)


def dense_w(t):
    return _np(t).T


def _set(tree: Dict, path: str, value):
    node = tree
    parts = path.split("/")
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _strip_module(sd):
    return { (k[7:] if k.startswith("module.") else k): v for k, v in sd.items() }


# --------------------------------------------------------------------------
# HMR
# --------------------------------------------------------------------------

def convert_hmr(sd) -> dict:
    """hmr_tf2pt.pth -> {'params': ..., 'batch_stats': ...} for
    models.hmr.HumanModelRecovery."""
    sd = _strip_module(sd)
    params, stats = {}, {}

    def bn(src, dst):
        _set(params, dst + "/scale", _np(sd[src + ".weight"]))
        _set(params, dst + "/bias", _np(sd[src + ".bias"]))
        _set(stats, dst + "/mean", _np(sd[src + ".running_mean"]))
        _set(stats, dst + "/var", _np(sd[src + ".running_var"]))

    def conv(src, dst, bias=False):
        _set(params, dst + "/kernel", conv_w(sd[src + ".weight"]))
        if bias:
            _set(params, dst + "/bias", _np(sd[src + ".bias"]))

    conv("resnet.conv1", "resnet/conv1/conv", bias=True)
    num_blocks = (3, 4, 6, 3)
    in_planes = 64
    for li, nb in enumerate(num_blocks, start=1):
        planes = (64, 128, 256, 512)[li - 1]
        for bi in range(nb):
            src = f"resnet.layer{li}.{bi}"
            dst = f"resnet/layer{li}_{bi}"
            for k in (1, 2, 3):
                bn(f"{src}.bn{k}", f"{dst}/bn{k}")
            conv(f"{src}.conv1", f"{dst}/conv1/conv")
            conv(f"{src}.conv2", f"{dst}/conv2/conv")
            conv(f"{src}.conv3", f"{dst}/conv3/conv", bias=True)
            if in_planes != planes * 4:
                conv(f"{src}.shortcut.0", f"{dst}/shortcut/conv", bias=True)
            in_planes = planes * 4
    bn("resnet.post_bn", "resnet/post_bn")

    _set(params, "regressor/mean_theta", _np(sd["regressor.mean_theta"]))
    for k in (1, 2, 3):
        _set(params, f"regressor/fc{k}/kernel",
             dense_w(sd[f"regressor.fc_blocks.fc{k}.weight"]))
        _set(params, f"regressor/fc{k}/bias",
             _np(sd[f"regressor.fc_blocks.fc{k}.bias"]))
    return {"params": params, "batch_stats": stats}


# --------------------------------------------------------------------------
# Generator
# --------------------------------------------------------------------------

def _convert_resunet(sd, prefix: str, params: dict, out_prefix: str,
                     n_down: int = 3, repeat: int = 6):
    """ResUnetGenerator state_dict section -> our ResUnetGenerator names."""
    def conv(src, dst):
        _set(params, dst + "/kernel", conv_w(sd[src + ".weight"]))

    def convt(src, dst):
        _set(params, dst, convt_w(sd[src + ".weight"]))

    def inorm(src, dst):
        _set(params, dst + "/scale", _np(sd[src + ".weight"]))
        _set(params, dst + "/bias", _np(sd[src + ".bias"]))

    for i in range(n_down + 1):
        conv(f"{prefix}.encoders.{i}.0", f"{out_prefix}/enc_{i}/conv/conv")
        inorm(f"{prefix}.encoders.{i}.1", f"{out_prefix}/enc_{i}/norm")
    for i in range(repeat):
        conv(f"{prefix}.resnets.{i}.main.0", f"{out_prefix}/res_{i}/conv1/conv")
        inorm(f"{prefix}.resnets.{i}.main.1", f"{out_prefix}/res_{i}/norm1")
        conv(f"{prefix}.resnets.{i}.main.3", f"{out_prefix}/res_{i}/conv2/conv")
        inorm(f"{prefix}.resnets.{i}.main.4", f"{out_prefix}/res_{i}/norm2")
    for i in range(n_down):
        convt(f"{prefix}.decoders.{i}.0", f"{out_prefix}/dec_{i}/deconv/kernel")
        inorm(f"{prefix}.decoders.{i}.1", f"{out_prefix}/dec_{i}/norm")
        conv(f"{prefix}.skippers.{i}.0", f"{out_prefix}/skip_{i}/conv/conv")
        inorm(f"{prefix}.skippers.{i}.1", f"{out_prefix}/skip_{i}/norm")
    conv(f"{prefix}.img_reg.0", f"{out_prefix}/img_reg/conv")
    conv(f"{prefix}.attetion_reg.0", f"{out_prefix}/att_reg/conv")


def convert_generator(sd, n_down: int = 3, repeat: int = 6) -> dict:
    """net_epoch_*_id_G.pth (ImpersonatorGenerator) -> {'params': ...}."""
    sd = _strip_module(sd)
    params = {}

    # bg_model: flat Sequential index layout (generator.py:29-57)
    def conv(src, dst):
        _set(params, dst + "/kernel", conv_w(sd[src + ".weight"]))

    def convt(src, dst):
        _set(params, dst, convt_w(sd[src + ".weight"]))

    def inorm(src, dst):
        _set(params, dst + "/scale", _np(sd[src + ".weight"]))
        _set(params, dst + "/bias", _np(sd[src + ".bias"]))

    idx = 0
    conv(f"bg_model.model.{idx}", "bg_model/stem/conv/conv")
    inorm(f"bg_model.model.{idx + 1}", "bg_model/stem/norm")
    idx += 3
    for i in range(n_down):
        conv(f"bg_model.model.{idx}", f"bg_model/down_{i}/conv/conv")
        inorm(f"bg_model.model.{idx + 1}", f"bg_model/down_{i}/norm")
        idx += 3
    for i in range(repeat):
        conv(f"bg_model.model.{idx}.main.0", f"bg_model/res_{i}/conv1/conv")
        inorm(f"bg_model.model.{idx}.main.1", f"bg_model/res_{i}/norm1")
        conv(f"bg_model.model.{idx}.main.3", f"bg_model/res_{i}/conv2/conv")
        inorm(f"bg_model.model.{idx}.main.4", f"bg_model/res_{i}/norm2")
        idx += 1
    for i in range(n_down):
        convt(f"bg_model.model.{idx}", f"bg_model/up_{i}/deconv/kernel")
        inorm(f"bg_model.model.{idx + 1}", f"bg_model/up_{i}/norm")
        idx += 3
    conv(f"bg_model.model.{idx}", "bg_model/rgb/conv")

    _convert_resunet(sd, "src_model", params, "src_model", n_down, repeat)
    _convert_resunet(sd, "tsf_model", params, "tsf_model", n_down, repeat)
    return {"params": params}


# --------------------------------------------------------------------------
# deepfillv2
# --------------------------------------------------------------------------

_COARSE = [f"c{i}" for i in range(17)]
_REFINE = [f"r{i}" for i in range(11)]
_UP = [f"u{i}" for i in range(7)]
_DECONV_NAMES = {"c12", "c14", "u2", "u4"}


def convert_bgnet(sd) -> dict:
    """deepfillv2 net_epoch_50_id_G.pth -> {'params','batch_stats'} for
    models.inpaintor.InpaintSANet."""
    sd = _strip_module(sd)
    params, stats = {}, {}

    def gated(src, dst, has_bn=True):
        nested = ".conv2d" if dst.split("/")[-1] in _DECONV_NAMES else ""
        # GatedDeConv wraps a GatedConv named conv2d (inpaintor.py:60-69);
        # our GatedDeConv names its inner GatedConv "conv"
        if nested:
            dst = dst + "/conv"
        _set(params, dst + "/conv/kernel", conv_w(sd[f"{src}{nested}.conv2d.weight"]))
        _set(params, dst + "/conv/bias", _np(sd[f"{src}{nested}.conv2d.bias"]))
        _set(params, dst + "/mask_conv/kernel",
             conv_w(sd[f"{src}{nested}.mask_conv2d.weight"]))
        _set(params, dst + "/mask_conv/bias",
             _np(sd[f"{src}{nested}.mask_conv2d.bias"]))
        if has_bn:
            _set(params, dst + "/bn/scale",
                 _np(sd[f"{src}{nested}.batch_norm2d.weight"]))
            _set(params, dst + "/bn/bias",
                 _np(sd[f"{src}{nested}.batch_norm2d.bias"]))
            _set(stats, dst + "/bn/mean",
                 _np(sd[f"{src}{nested}.batch_norm2d.running_mean"]))
            _set(stats, dst + "/bn/var",
                 _np(sd[f"{src}{nested}.batch_norm2d.running_var"]))

    for i, name in enumerate(_COARSE):
        gated(f"coarse_net.{i}", name)
    for i, name in enumerate(_REFINE):
        gated(f"refine_conv_net.{i}", name)
    for i, name in enumerate(_UP):
        gated(f"refine_upsample_net.{i}", name)

    _set(params, "attn/query/kernel", conv_w(sd["refine_attn.query_conv.weight"]))
    _set(params, "attn/query/bias", _np(sd["refine_attn.query_conv.bias"]))
    _set(params, "attn/key/kernel", conv_w(sd["refine_attn.key_conv.weight"]))
    _set(params, "attn/key/bias", _np(sd["refine_attn.key_conv.bias"]))
    _set(params, "attn/value/kernel", conv_w(sd["refine_attn.value_conv.weight"]))
    _set(params, "attn/value/bias", _np(sd["refine_attn.value_conv.bias"]))
    _set(params, "attn/gamma", _np(sd["refine_attn.gamma"]))
    return {"params": params, "batch_stats": stats}


# --------------------------------------------------------------------------
# VGG19 / Sphere20a
# --------------------------------------------------------------------------

_VGG_FEATURE_IDS = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28]


def convert_vgg19(sd) -> dict:
    """torchvision vgg19 state_dict -> models.losses.Vgg19 params
    (only the first 14 convs used by the 5 slices)."""
    params = {}
    for our_i, torch_i in enumerate(_VGG_FEATURE_IDS):
        _set(params, f"conv_{our_i}/kernel",
             conv_w(sd[f"features.{torch_i}.weight"]))
        _set(params, f"conv_{our_i}/bias", _np(sd[f"features.{torch_i}.bias"]))
    return {"params": params}


_SPHERE_PAIRS = {
    "conv1_2": ("conv1_2", "conv1_3"), "conv2_2": ("conv2_2", "conv2_3"),
    "conv2_4": ("conv2_4", "conv2_5"), "conv3_2": ("conv3_2", "conv3_3"),
    "conv3_4": ("conv3_4", "conv3_5"), "conv3_6": ("conv3_6", "conv3_7"),
    "conv3_8": ("conv3_8", "conv3_9"), "conv4_2": ("conv4_2", "conv4_3"),
}


def convert_sphere(sd) -> dict:
    """sphere20a_20171020.pth (fc6 dropped) -> models.facenet.Sphere20a."""
    sd = {k: v for k, v in _strip_module(sd).items()
          if not k.startswith("fc6")}
    params = {}

    def unit(src_conv, dst):
        _set(params, dst + "/conv/kernel", conv_w(sd[src_conv + ".weight"]))
        _set(params, dst + "/conv/bias", _np(sd[src_conv + ".bias"]))
        relu = src_conv.replace("conv", "relu")
        _set(params, dst + "/prelu/alpha", _np(sd[relu + ".weight"]))

    for stage in ("conv1_1", "conv2_1", "conv3_1", "conv4_1"):
        unit(stage, stage)
    for our, (a, b) in _SPHERE_PAIRS.items():
        unit(a, our + "a")
        unit(b, our + "b")
    _set(params, "fc5/kernel", dense_w(sd["fc5.weight"]))
    _set(params, "fc5/bias", _np(sd["fc5.bias"]))
    return {"params": params}


def convert_senet50(sd) -> dict:
    """VGGFace2 senet50 checkpoint (reference networks/facenet.py:193-197,
    weights senet50_ft / senet50_scratch) -> models.facenet.SENet50
    {'params','batch_stats'} (include_top fc dropped)."""
    sd = _strip_module(sd)
    params, stats = {}, {}

    def bn(src, dst):
        _set(params, dst + "/scale", _np(sd[src + ".weight"]))
        _set(params, dst + "/bias", _np(sd[src + ".bias"]))
        _set(stats, dst + "/mean", _np(sd[src + ".running_mean"]))
        _set(stats, dst + "/var", _np(sd[src + ".running_var"]))

    def conv(src, dst, bias=False):
        _set(params, dst + "/kernel", conv_w(sd[src + ".weight"]))
        if bias:
            _set(params, dst + "/bias", _np(sd[src + ".bias"]))

    conv("conv1", "conv1")
    bn("bn1", "bn1")
    inplanes = 64
    for li, nb in enumerate((3, 4, 6, 3), start=1):
        planes = (64, 128, 256, 512)[li - 1]
        for bi in range(nb):
            src = f"layer{li}.{bi}"
            dst = f"layer{li}_{bi}"
            for k in (1, 2, 3):
                conv(f"{src}.conv{k}", f"{dst}/conv{k}")
                bn(f"{src}.bn{k}", f"{dst}/bn{k}")
            conv(f"{src}.conv4", f"{dst}/conv4", bias=True)
            conv(f"{src}.conv5", f"{dst}/conv5", bias=True)
            if bi == 0 and (li != 1 or inplanes != planes * 4):
                conv(f"{src}.downsample.0", f"{dst}/downsample_conv")
                bn(f"{src}.downsample.1", f"{dst}/downsample_bn")
        inplanes = planes * 4
    return {"params": params, "batch_stats": stats}


def convert_osnet(sd) -> dict:
    """osnet_ibn_x1_0 checkpoint (reference OSreid/OSNet.py:336, weights
    osnet_ibn_x1_0_imagenet.pth) -> metrics.reid.OSNet
    {'params','batch_stats'} (classifier head dropped)."""
    sd = _strip_module(sd)
    params, stats = {}, {}

    def bn(src, dst):
        _set(params, dst + "/scale", _np(sd[src + ".weight"]))
        _set(params, dst + "/bias", _np(sd[src + ".bias"]))
        if src + ".running_mean" in sd:          # absent for InstanceNorm
            _set(stats, dst + "/mean", _np(sd[src + ".running_mean"]))
            _set(stats, dst + "/var", _np(sd[src + ".running_var"]))

    def cbr(src, dst):                           # ConvLayer/Conv1x1(Linear)
        _set(params, dst + "/conv/kernel", conv_w(sd[src + ".conv.weight"]))
        bn(src + ".bn", dst + "/bn")

    def light(src, dst):                         # LightConv3x3
        _set(params, dst + "/conv1/kernel", conv_w(sd[src + ".conv1.weight"]))
        _set(params, dst + "/conv2/kernel", conv_w(sd[src + ".conv2.weight"]))
        bn(src + ".bn", dst + "/bn")

    def osblock(src, dst, use_in):
        cbr(src + ".conv1", dst + "/conv1")
        light(src + ".conv2a", dst + "/conv2a")
        for si, depth in (("b", 2), ("c", 3), ("d", 4)):
            for d in range(depth):
                light(f"{src}.conv2{si}.{d}", f"{dst}/conv2{si}_{d}")
        for fc in ("fc1", "fc2"):
            _set(params, f"{dst}/gate/{fc}/kernel",
                 conv_w(sd[f"{src}.gate.{fc}.weight"]))
            _set(params, f"{dst}/gate/{fc}/bias",
                 _np(sd[f"{src}.gate.{fc}.bias"]))
        cbr(src + ".conv3", dst + "/conv3")
        if src + ".downsample.conv.weight" in sd:
            cbr(src + ".downsample", dst + "/downsample")
        if use_in:
            bn(src + ".IN", dst + "/IN")

    cbr("conv1", "conv1")
    for stage, blocks, use_in, has_t in (
            (2, 2, True, True), (3, 2, False, True), (4, 2, False, False)):
        for b in range(blocks):
            osblock(f"conv{stage}.{b}", f"conv{stage}_{b}", use_in)
        if has_t:
            cbr(f"conv{stage}.{blocks}.0", f"conv{stage}_t")
    cbr("conv5", "conv5")
    _set(params, "fc/kernel", dense_w(sd["fc.0.weight"]))
    _set(params, "fc/bias", _np(sd["fc.0.bias"]))
    bn("fc.1", "fc_bn")
    return {"params": params, "batch_stats": stats}


def convert_pcb(sd) -> dict:
    """pcb_net_last.pth (reference PCBreid/model.py PCB; keys under
    'model.' = torchvision resnet50) -> metrics.reid.PCBReid
    {'params','batch_stats'} (the 6 training classifiers dropped —
    PCB_test uses only the backbone)."""
    sd = {k: v for k, v in _strip_module(sd).items()
          if k.startswith("model.")}
    params, stats = {}, {}

    def bn(src, dst):
        _set(params, dst + "/scale", _np(sd[src + ".weight"]))
        _set(params, dst + "/bias", _np(sd[src + ".bias"]))
        _set(stats, dst + "/mean", _np(sd[src + ".running_mean"]))
        _set(stats, dst + "/var", _np(sd[src + ".running_var"]))

    def conv(src, dst):
        _set(params, dst + "/kernel", conv_w(sd[src + ".weight"]))

    conv("model.conv1", "conv1")
    bn("model.bn1", "bn1")
    for li, nb in enumerate((3, 4, 6, 3), start=1):
        for bi in range(nb):
            src = f"model.layer{li}.{bi}"
            dst = f"layer{li}_{bi}"
            for k in (1, 2, 3):
                conv(f"{src}.conv{k}", f"{dst}/conv{k}")
                bn(f"{src}.bn{k}", f"{dst}/bn{k}")
            if f"{src}.downsample.0.weight" in sd:
                conv(f"{src}.downsample.0", f"{dst}/downsample_conv")
                bn(f"{src}.downsample.1", f"{dst}/downsample_bn")
    return {"params": params, "batch_stats": stats}


# --------------------------------------------------------------------------
# Metric zoo: LPIPS (alexnet + lin heads) and InceptionV3
# --------------------------------------------------------------------------

_ALEX_FEATURE_IDS = [0, 3, 6, 8, 10]


def convert_alexnet(sd) -> dict:
    """torchvision alexnet state_dict -> metrics.zoo.AlexFeatures params
    (the 5 feature convs used by the LPIPS slices)."""
    params = {}
    for i, ti in enumerate(_ALEX_FEATURE_IDS):
        _set(params, f"conv{i}/conv/kernel", conv_w(sd[f"features.{ti}.weight"]))
        _set(params, f"conv{i}/conv/bias", _np(sd[f"features.{ti}.bias"]))
    return {"params": params}


def convert_vgg16_features(sd) -> dict:
    """torchvision vgg16 state_dict -> metrics.zoo.VGG16Features params
    (the 13 feature convs used by the LPIPS vgg slices)."""
    from impersonator_tpu.metrics.zoo import _VGG16_SLICES
    params = {}
    for convs in _VGG16_SLICES:
        for ti, _ in convs:
            _set(params, f"conv{ti}/conv/kernel",
                 conv_w(sd[f"features.{ti}.weight"]))
            _set(params, f"conv{ti}/conv/bias", _np(sd[f"features.{ti}.bias"]))
    return {"params": params}


def convert_squeeze_features(sd) -> dict:
    """torchvision squeezenet1_1 state_dict -> metrics.zoo.
    SqueezeFeatures params (stem conv + the 8 Fire modules)."""
    from impersonator_tpu.metrics.zoo import _SQUEEZE_FIRES
    params = {}
    _set(params, "conv0/conv/kernel", conv_w(sd["features.0.weight"]))
    _set(params, "conv0/conv/bias", _np(sd["features.0.bias"]))
    for ti, _, _ in _SQUEEZE_FIRES:
        for sub in ("squeeze", "expand1x1", "expand3x3"):
            _set(params, f"fire{ti}/{sub}/conv/kernel",
                 conv_w(sd[f"features.{ti}.{sub}.weight"]))
            _set(params, f"fire{ti}/{sub}/conv/bias",
                 _np(sd[f"features.{ti}.{sub}.bias"]))
    return {"params": params}


_LPIPS_BACKBONE_CONVERTERS = {
    "alex": lambda sd: convert_alexnet(sd)["params"],
    "vgg": lambda sd: convert_vgg16_features(sd)["params"],
    "squeeze": lambda sd: convert_squeeze_features(sd)["params"],
}


def convert_lpips(lin_sd, backbone_sd=None, net: str = "alex") -> dict:
    """Official LPIPS {alex,vgg,squeeze}.pth (lin{i}.model.1.weight, both
    v0.0 and v0.1 namings) + the matching torchvision backbone ->
    metrics.zoo.LPIPS(net=...) params. The lin heads are (1,C,1,1) 1x1
    convs without bias (networks_basic.py:205-212) -> flattened (C,);
    head count follows the file (5 for alex/vgg, 7 for squeeze)."""
    lin_sd = _strip_module(lin_sd)
    params = {}
    i = 0
    while f"lin{i}.model.1.weight" in lin_sd:
        _set(params, f"lin{i}",
             _np(lin_sd[f"lin{i}.model.1.weight"]).reshape(-1))
        i += 1
    assert i in (5, 7), f"unexpected lin head count {i}"
    if backbone_sd is not None:
        params[net] = _LPIPS_BACKBONE_CONVERTERS[net](backbone_sd)
    return {"params": params}


def convert_inception(sd) -> dict:
    """torchvision inception_v3 state_dict -> metrics.zoo.InceptionV3
    {'params','batch_stats'} (AuxLogits skipped)."""
    params, stats = {}, {}
    for key, val in sd.items():
        if key.startswith("AuxLogits"):
            continue
        path = key.replace(".", "/")
        if key.endswith(".conv.weight"):
            _set(params, path[: -len("/weight")] + "/kernel", conv_w(val))
        elif key.endswith(".bn.weight"):
            _set(params, path[: -len("/weight")] + "/scale", _np(val))
        elif key.endswith(".bn.bias"):
            _set(params, path, _np(val))
        elif key.endswith(".bn.running_mean"):
            _set(stats, path[: -len("/running_mean")] + "/mean", _np(val))
        elif key.endswith(".bn.running_var"):
            _set(stats, path[: -len("/running_var")] + "/var", _np(val))
        elif key == "fc.weight":
            _set(params, "fc/kernel", dense_w(val))
        elif key == "fc.bias":
            _set(params, "fc/bias", _np(val))
        elif key.endswith("num_batches_tracked"):
            continue
    return {"params": params, "batch_stats": stats}


def convert_facenet_ir(sd) -> dict:
    """facenet-pytorch InceptionResnetV1 vggface2 checkpoint ->
    metrics.zoo.InceptionResnetV1 {'params','batch_stats'} (logits head
    dropped; classify=False contract)."""
    sd = _strip_module(sd)
    params, stats = {}, {}

    def bn(src, dst):
        _set(params, dst + "/scale", _np(sd[src + ".weight"]))
        _set(params, dst + "/bias", _np(sd[src + ".bias"]))
        _set(stats, dst + "/mean", _np(sd[src + ".running_mean"]))
        _set(stats, dst + "/var", _np(sd[src + ".running_var"]))

    def basic(src, dst):
        _set(params, dst + "/conv/kernel", conv_w(sd[src + ".conv.weight"]))
        bn(src + ".bn", dst + "/bn")

    def branch(src, dst, n):
        for i in range(n):
            basic(f"{src}.{i}", f"{dst}/{i}")

    for name in ("conv2d_1a", "conv2d_2a", "conv2d_2b", "conv2d_3b",
                 "conv2d_4a", "conv2d_4b"):
        basic(name, name)

    def resblock(src, dst, branches):
        basic(f"{src}.branch0", f"{dst}/branch0")
        for bi, n in enumerate(branches, start=1):
            branch(f"{src}.branch{bi}", f"{dst}/branch{bi}", n)
        _set(params, f"{dst}/conv2d/kernel",
             conv_w(sd[f"{src}.conv2d.weight"]))
        _set(params, f"{dst}/conv2d/bias", _np(sd[f"{src}.conv2d.bias"]))

    for i in range(5):
        resblock(f"repeat_1.{i}", f"repeat_1_{i}", (2, 3))  # Block35
    basic("mixed_6a.branch0", "mixed_6a_branch0")
    branch("mixed_6a.branch1", "mixed_6a_branch1", 3)
    for i in range(10):
        resblock(f"repeat_2.{i}", f"repeat_2_{i}", (3,))    # Block17
    branch("mixed_7a.branch0", "mixed_7a_branch0", 2)
    branch("mixed_7a.branch1", "mixed_7a_branch1", 2)
    branch("mixed_7a.branch2", "mixed_7a_branch2", 3)
    for i in range(5):
        resblock(f"repeat_3.{i}", f"repeat_3_{i}", (3,))    # Block8
    resblock("block8", "block8", (3,))
    _set(params, "last_linear/kernel", dense_w(sd["last_linear.weight"]))
    bn("last_bn", "last_bn")
    return {"params": params, "batch_stats": stats}


def convert_mtcnn_net(sd) -> dict:
    """One MTCNN stage net (facenet_pytorch pnet/rnet/onet .pt state
    dict, mtcnn.py:9-154) -> metrics.mtcnn.{P,R,O}Net params. The
    RNet/ONet dense layers need NO index remap despite torch's NCHW->
    (B,W,H,C) flatten quirk: the flax modules replicate the same
    permute before flattening, so feature order matches and Linear
    weights convert by plain transpose."""
    sd = _strip_module(sd)
    params = {}
    for k, v in sd.items():
        name = k.rsplit(".", 1)[0]
        if k.endswith(".weight") and getattr(v, "ndim", _np(v).ndim) == 4:
            _set(params, f"{name}/conv/kernel", conv_w(v))
        elif k.endswith(".weight") and name.startswith("prelu"):
            _set(params, f"{name}/alpha", _np(v))
        elif k.endswith(".weight"):
            _set(params, f"{name}/kernel", dense_w(v))
        elif k.endswith(".bias") and name.startswith("conv"):
            _set(params, f"{name}/conv/bias", _np(v))
        elif k.endswith(".bias"):
            _set(params, f"{name}/bias", _np(v))
    return {"params": params}


def convert_mtcnn(sds: Dict) -> dict:
    """{'pnet': sd, 'rnet': sd, 'onet': sd} -> one tree holding all
    three stage nets (metrics.mtcnn.MTCNNDetector / load_mtcnn)."""
    return {net: convert_mtcnn_net(sd) for net, sd in sds.items()}


CONVERTERS = {
    "hmr": convert_hmr,
    "gen": convert_generator,
    "bgnet": convert_bgnet,
    "vgg19": convert_vgg19,
    "sphere": convert_sphere,
    "senet50": convert_senet50,
    "osnet": convert_osnet,
    "pcb": convert_pcb,
    "facenet_ir": convert_facenet_ir,
    "alexnet": convert_alexnet,
    "vgg16_features": convert_vgg16_features,
    "squeeze_features": convert_squeeze_features,
    "lpips": convert_lpips,
    "inception": convert_inception,
    "mtcnn": convert_mtcnn,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("kind", choices=sorted(CONVERTERS))
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--src2", default=None,
                    help="lpips only: torchvision backbone .pth to embed "
                         "(alexnet / vgg16 / squeezenet1_1 per --net)")
    ap.add_argument("--net", default="alex",
                    choices=("alex", "vgg", "squeeze"),
                    help="lpips only: which backbone the lin heads "
                         "belong to")
    args = ap.parse_args()

    import torch
    from flax import serialization

    def load(p):
        if p.endswith(".pkl"):
            # the senet50 release is a pickle of numpy arrays keyed like a
            # state_dict (reference networks.py:372-385 load_senet_model)
            import pickle
            with open(p, "rb") as f:
                raw = pickle.load(f, encoding="latin1")
            return {k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in raw.items() if not k.startswith("fc")}
        sd = torch.load(p, map_location="cpu")
        return sd.state_dict() if hasattr(sd, "state_dict") else sd

    if args.kind == "mtcnn":
        # src = directory holding pnet.pt / rnet.pt / onet.pt (the
        # reference's facenet_pytorch/data layout)
        import os
        tree = convert_mtcnn({n: load(os.path.join(args.src, f"{n}.pt"))
                              for n in ("pnet", "rnet", "onet")})
    elif args.kind == "lpips":
        sd = load(args.src)
        tree = convert_lpips(sd, load(args.src2) if args.src2 else None,
                             net=args.net)
    else:
        sd = load(args.src)
        tree = CONVERTERS[args.kind](sd)
    with open(args.dst, "wb") as f:
        f.write(serialization.to_bytes(tree))
    print(f"converted {args.kind}: {args.src} -> {args.dst}")


if __name__ == "__main__":
    main()

"""Convert reference PyTorch UNet checkpoints into WeatherUNet param trees.

Lets users of the reference migrate trained `.pth` state dicts (sr3-family
UNet trunk: models/diffusion_models/sr3/unet.py + nn_modules/resnet.py) into
this framework, and powers the weight-level forward-parity tests.

Key mapping (torch registration order -> flax call order):
  noise_level_mlp.1 / .3                -> NoiseLevelMLP_0/Dense_0 / Dense_1
  downs.0 (stem conv)                   -> Conv_0
  downs/mid/ups ResnetBlocWithAttn      -> ResnetBlockWithAttn_{k} (k counts
                                           across downs+mid+ups, call order)
    res_block.block1.block.{0,3}        -> ResnetBlock_0/Block_0/{FusedGroupNorm_0, Conv_0}
    res_block.noise_func.noise_func.0   -> ResnetBlock_0/FeatureWiseAffine_0/Dense_0
    res_block.block2.block.{0,3}        -> ResnetBlock_0/Block_1/{FusedGroupNorm_0, Conv_0}
    res_block.res_conv                  -> ResnetBlock_0/Conv_0 (1x1 shortcut)
    attn.{norm,qkv,out}                 -> SelfAttention_0/{FusedGroupNorm_0, Conv_0, Conv_1}
  downs.* Downsample / ups.* Upsample   -> Downsample_{j} / Upsample_{j}
  final_conv.block.{0,3}                -> Block_0/{FusedGroupNorm_0, Conv_0}

Tensor layout: Conv2d [O,I,kh,kw] -> [kh,kw,I,O]; Linear [O,I] -> [I,O];
GroupNorm weight -> scale.
"""

from __future__ import annotations

import re
from collections import OrderedDict

import numpy as np


def _np(t):
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def _conv(w):
    return np.transpose(_np(w), (2, 3, 1, 0))


def _lin(w):
    return np.transpose(_np(w), (1, 0))


def _set(tree: dict, path: list[str], leaf, value) -> None:
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf] = value


def _block_into(tree, base, sd, prefix):
    """torch Block (GroupNorm @.block.0, Conv @.block.3) -> flax Block."""
    _set(tree, base + ["FusedGroupNorm_0"], "scale", _np(sd[f"{prefix}.block.0.weight"]))
    _set(tree, base + ["FusedGroupNorm_0"], "bias", _np(sd[f"{prefix}.block.0.bias"]))
    _set(tree, base + ["Conv_0"], "kernel", _conv(sd[f"{prefix}.block.3.weight"]))
    _set(tree, base + ["Conv_0"], "bias", _np(sd[f"{prefix}.block.3.bias"]))


def _rba_into(tree, k, sd, prefix):
    """torch ResnetBlocWithAttn -> flax ResnetBlockWithAttn_{k}."""
    base = [f"ResnetBlockWithAttn_{k}", "ResnetBlock_0"]
    _block_into(tree, base + ["Block_0"], sd, f"{prefix}.res_block.block1")
    _set(tree, base + ["FeatureWiseAffine_0", "Dense_0"], "kernel",
         _lin(sd[f"{prefix}.res_block.noise_func.noise_func.0.weight"]))
    _set(tree, base + ["FeatureWiseAffine_0", "Dense_0"], "bias",
         _np(sd[f"{prefix}.res_block.noise_func.noise_func.0.bias"]))
    _block_into(tree, base + ["Block_1"], sd, f"{prefix}.res_block.block2")
    if f"{prefix}.res_block.res_conv.weight" in sd:
        _set(tree, base + ["Conv_0"], "kernel",
             _conv(sd[f"{prefix}.res_block.res_conv.weight"]))
        _set(tree, base + ["Conv_0"], "bias",
             _np(sd[f"{prefix}.res_block.res_conv.bias"]))
    if f"{prefix}.attn.norm.weight" in sd:
        abase = [f"ResnetBlockWithAttn_{k}", "SelfAttention_0"]
        _set(tree, abase + ["FusedGroupNorm_0"], "scale",
             _np(sd[f"{prefix}.attn.norm.weight"]))
        _set(tree, abase + ["FusedGroupNorm_0"], "bias",
             _np(sd[f"{prefix}.attn.norm.bias"]))
        _set(tree, abase + ["Conv_0"], "kernel", _conv(sd[f"{prefix}.attn.qkv.weight"]))
        _set(tree, abase + ["Conv_1"], "kernel", _conv(sd[f"{prefix}.attn.out.weight"]))
        _set(tree, abase + ["Conv_1"], "bias", _np(sd[f"{prefix}.attn.out.bias"]))


def convert_sr3_unet_state(state_dict) -> dict:
    """Reference sr3 UNet state_dict -> WeatherUNet(variant='sr3') params."""
    sd = OrderedDict((k, v) for k, v in state_dict.items())
    tree: dict = {}

    _set(tree, ["NoiseLevelMLP_0", "Dense_0"], "kernel",
         _lin(sd["noise_level_mlp.1.weight"]))
    _set(tree, ["NoiseLevelMLP_0", "Dense_0"], "bias",
         _np(sd["noise_level_mlp.1.bias"]))
    _set(tree, ["NoiseLevelMLP_0", "Dense_1"], "kernel",
         _lin(sd["noise_level_mlp.3.weight"]))
    _set(tree, ["NoiseLevelMLP_0", "Dense_1"], "bias",
         _np(sd["noise_level_mlp.3.bias"]))

    # stem conv
    _set(tree, ["Conv_0"], "kernel", _conv(sd["downs.0.weight"]))
    _set(tree, ["Conv_0"], "bias", _np(sd["downs.0.bias"]))

    def indices(section):
        idx = set()
        for key in sd:
            m = re.match(rf"{section}\.(\d+)\.", key)
            if m:
                idx.add(int(m.group(1)))
        return sorted(idx)

    rba = 0
    down_n = up_n = 0
    for i in indices("downs"):
        if i == 0:
            continue
        if f"downs.{i}.res_block.block1.block.0.weight" in sd:
            _rba_into(tree, rba, sd, f"downs.{i}")
            rba += 1
        else:  # Downsample (stride-2 conv)
            _set(tree, [f"Downsample_{down_n}", "Conv_0"], "kernel",
                 _conv(sd[f"downs.{i}.conv.weight"]))
            _set(tree, [f"Downsample_{down_n}", "Conv_0"], "bias",
                 _np(sd[f"downs.{i}.conv.bias"]))
            down_n += 1
    for i in indices("mid"):
        _rba_into(tree, rba, sd, f"mid.{i}")
        rba += 1
    for i in indices("ups"):
        if f"ups.{i}.res_block.block1.block.0.weight" in sd:
            _rba_into(tree, rba, sd, f"ups.{i}")
            rba += 1
        else:  # Upsample (nearest + conv)
            _set(tree, [f"Upsample_{up_n}", "Conv_0"], "kernel",
                 _conv(sd[f"ups.{i}.conv.weight"]))
            _set(tree, [f"Upsample_{up_n}", "Conv_0"], "bias",
                 _np(sd[f"ups.{i}.conv.bias"]))
            up_n += 1

    _block_into(tree, ["Block_0"], sd, "final_conv")
    return tree

"""Convert reference PyTorch UNet checkpoints into WeatherUNet param trees.

Lets users of the reference migrate trained `.pth` state dicts for ALL FIVE
architectures (models/diffusion_models/{sr3,resdiff,phydiff,srdiff,
physrdiff}/unet.py + nn_modules/resnet.py) into this framework, and powers
the weight-level forward-parity tests.

Entry point: `convert_unet_state(state_dict, variant)`; the per-variant
extras on top of the shared trunk are

  fd_spliter.* (resdiff; physrdiff has the member undefined in the
  reference, physrdiff/unet.py:150)    -> FDInfoSpliter_0/*
    noise_func                         -> Dense_0
    noise_resSE / sigma_resSE /
    HF_guided_resSE (fc.0, fc.2)       -> ResSE_{0,1,2}/Dense_{0,1}
    channel_transform                  -> Conv_0
  hf_ca_list.{i} (resdiff/phydiff/
  physrdiff, guided_cross_attention.py)-> CrossAttention_{i}/
    {norm, kv, q, out}                 -> {FusedGroupNorm_0, Conv_0, Conv_1,
                                           Conv_2}
  cond_proj (srdiff/physrdiff,
  srdiff/unet.py:43-45)                -> ConvTranspose_0 (kernel
                                          transposed to [kh,kw,I,O] AND
                                          spatially flipped; flax
                                          ConvTranspose correlates where
                                          torch's transposed conv convolves)

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


def _convT(w):
    """torch ConvTranspose2d [I,O,kh,kw] -> flax ConvTranspose [kh,kw,I,O].

    The spatial flip makes flax's correlation-style conv_transpose equal to
    torch's convolution-style transposed conv (verified to float round-off
    for the cond_proj shape k=8 s=4 p=2 <-> padding='SAME').
    """
    return np.ascontiguousarray(np.transpose(_np(w), (2, 3, 0, 1))[::-1, ::-1])


def _resse_into(tree, base, sd, prefix):
    """torch ResSE (fc.0 / fc.2, both bias-free) -> flax ResSE."""
    _set(tree, base + ["Dense_0"], "kernel", _lin(sd[f"{prefix}.fc.0.weight"]))
    _set(tree, base + ["Dense_1"], "kernel", _lin(sd[f"{prefix}.fc.2.weight"]))


def _spliter_into(tree, sd, prefix="fd_spliter"):
    """torch FD_Info_Spliter -> flax FDInfoSpliter_0."""
    base = ["FDInfoSpliter_0"]
    _set(tree, base + ["Dense_0"], "kernel", _lin(sd[f"{prefix}.noise_func.weight"]))
    _set(tree, base + ["Dense_0"], "bias", _np(sd[f"{prefix}.noise_func.bias"]))
    _resse_into(tree, base + ["ResSE_0"], sd, f"{prefix}.noise_resSE")
    _resse_into(tree, base + ["ResSE_1"], sd, f"{prefix}.sigma_resSE")
    _resse_into(tree, base + ["ResSE_2"], sd, f"{prefix}.HF_guided_resSE")
    _set(tree, base + ["Conv_0"], "kernel", _conv(sd[f"{prefix}.channel_transform.weight"]))
    _set(tree, base + ["Conv_0"], "bias", _np(sd[f"{prefix}.channel_transform.bias"]))


def _hf_ca_into(tree, i, sd, prefix):
    """torch HF_guided_CA -> flax CrossAttention_{i} (call order: norm, kv, q, out)."""
    base = [f"CrossAttention_{i}"]
    _set(tree, base + ["FusedGroupNorm_0"], "scale", _np(sd[f"{prefix}.norm.weight"]))
    _set(tree, base + ["FusedGroupNorm_0"], "bias", _np(sd[f"{prefix}.norm.bias"]))
    _set(tree, base + ["Conv_0"], "kernel", _conv(sd[f"{prefix}.kv.weight"]))
    _set(tree, base + ["Conv_1"], "kernel", _conv(sd[f"{prefix}.q.weight"]))
    _set(tree, base + ["Conv_2"], "kernel", _conv(sd[f"{prefix}.out.weight"]))
    _set(tree, base + ["Conv_2"], "bias", _np(sd[f"{prefix}.out.bias"]))


def convert_unet_state(state_dict, variant: str = "sr3") -> dict:
    """Reference <variant> UNet state_dict -> WeatherUNet(variant=...) params.

    physrdiff: the reference UNet references an fd_spliter member it never
    defines (physrdiff/unet.py:150), so trained physrdiff checkpoints carry
    no spliter weights; the returned tree then omits FDInfoSpliter_0 and the
    caller must merge freshly initialized spliter params (see
    merge_with_init).
    """
    if variant not in ("sr3", "resdiff", "phydiff", "srdiff", "physrdiff"):
        raise ValueError(f"unknown variant {variant}")
    sd = OrderedDict((k, v) for k, v in state_dict.items())
    tree = _convert_trunk(sd)
    if f"fd_spliter.noise_func.weight" in sd:
        _spliter_into(tree, sd)
    for i in range(16):  # J=4 in all reference configs; scan defensively
        if f"hf_ca_list.{i}.norm.weight" in sd:
            _hf_ca_into(tree, i, sd, f"hf_ca_list.{i}")
    if "cond_proj.weight" in sd:
        _set(tree, ["ConvTranspose_0"], "kernel", _convT(sd["cond_proj.weight"]))
        _set(tree, ["ConvTranspose_0"], "bias", _np(sd["cond_proj.bias"]))
    return tree


def drop_unused_cross_attention(unet_tree: dict, n_boundaries: int) -> dict:
    """Drop converted CrossAttention_{i} entries the model does not define.

    The reference registers J=4 hf_ca_list modules unconditionally
    (resdiff/unet.py:72-76) but forward only uses len(channel_mults)-1 of
    them; checkpoints of configs with fewer than 5 mults carry trained-but-
    never-used CA weights that merge_with_init would (correctly) reject as
    'converted params not in model'.
    """
    return {
        k: v
        for k, v in unet_tree.items()
        if not (k.startswith("CrossAttention_") and int(k.split("_")[-1]) >= n_boundaries)
    }


def merge_with_init(converted: dict, init_params: dict) -> dict:
    """Fill converted-tree gaps (e.g. physrdiff's missing spliter) from an
    init tree; errors on leaves present in converted but absent in init."""
    import jax

    def merge(conv_node, init_node):
        if not isinstance(init_node, dict):
            return conv_node if conv_node is not None else init_node
        out = {}
        for k, v in init_node.items():
            c = conv_node.get(k) if isinstance(conv_node, dict) else None
            out[k] = merge(c, v)
        extra = set(conv_node or ()) - set(init_node)
        if extra:
            raise ValueError(f"converted params not in model: {sorted(extra)}")
        return out

    return jax.tree.map(lambda x: x, merge(converted, init_params))


def convert_sr3_unet_state(state_dict) -> dict:
    """Reference sr3 UNet state_dict -> WeatherUNet(variant='sr3') params."""
    return convert_unet_state(state_dict, "sr3")


def _convert_trunk(sd) -> dict:
    """Shared trunk (noise MLP, downs/mid/ups, final conv) of every variant."""
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


# --------------------------------------------------------------- encoders
def convert_simple_cnn_state(state_dict) -> dict:
    """Reference SimpleCNN (Simple_CNN.py:17-22) -> models.simple_cnn params.

    Direct conv1/2/3 -> Conv_0/1/2 map; the pixel shuffle on both sides
    uses torch's channel ordering, so no channel permutation is needed.
    """
    tree: dict = {}
    for i, name in enumerate(("conv1", "conv2", "conv3")):
        _set(tree, [f"Conv_{i}"], "kernel", _conv(state_dict[f"{name}.weight"]))
        _set(tree, [f"Conv_{i}"], "bias", _np(state_dict[f"{name}.bias"]))
    return tree


def convert_rrdb_state(state_dict) -> dict:
    """Reference RRDBNet (rrdb_encoder/RRDBNet.py:26-34) -> models.rrdb params.

    conv_first->Conv_0, RRDB_trunk.{i}.RDB{r}.conv{c} ->
    RRDB_{i}/ResidualDenseBlock5C_{r-1}/Conv_{c-1}, then trunk_conv/upconv1/
    upconv2/HRconv/conv_last -> Conv_1..Conv_5 (flax call order).
    """
    sd = state_dict
    tree: dict = {}
    _set(tree, ["Conv_0"], "kernel", _conv(sd["conv_first.weight"]))
    _set(tree, ["Conv_0"], "bias", _np(sd["conv_first.bias"]))
    nb = 0
    while f"RRDB_trunk.{nb}.RDB1.conv1.weight" in sd:
        nb += 1
    for i in range(nb):
        for r in range(1, 4):
            for c in range(1, 6):
                w = sd[f"RRDB_trunk.{i}.RDB{r}.conv{c}.weight"]
                b = sd[f"RRDB_trunk.{i}.RDB{r}.conv{c}.bias"]
                path = [f"RRDB_{i}", f"ResidualDenseBlock5C_{r - 1}", f"Conv_{c - 1}"]
                _set(tree, path, "kernel", _conv(w))
                _set(tree, path, "bias", _np(b))
    for j, name in enumerate(
        ("trunk_conv", "upconv1", "upconv2", "HRconv", "conv_last"), start=1
    ):
        _set(tree, [f"Conv_{j}"], "kernel", _conv(sd[f"{name}.weight"]))
        _set(tree, [f"Conv_{j}"], "bias", _np(sd[f"{name}.bias"]))
    return tree


# ------------------------------------------------- full diffusion checkpoint
# Schedule buffers registered by GaussianDiffusion (diffusion.py:49-96);
# derived from the beta schedule at runtime here, never loaded.
_SCHEDULE_BUFFERS = (
    "betas", "alphas_cumprod", "alphas_cumprod_prev",
    "sqrt_alphas_cumprod", "sqrt_one_minus_alphas_cumprod",
    "log_one_minus_alphas_cumprod", "sqrt_recip_alphas_cumprod",
    "sqrt_recipm1_alphas_cumprod", "posterior_variance",
    "posterior_log_variance_clipped", "posterior_mean_coef1",
    "posterior_mean_coef2",
)


def convert_diffusion_checkpoint(state_dict, variant: str) -> dict:
    """Reference `I{iter}_E{epoch}_gen.pth` (the <Arch>Diffusion state dict,
    DDPM.save_network at model.py:183-186) -> DiffusionModel params layout
    {'unet': ..., ['encoder': ...]}.

    Splits on the reference's member names: `denoise_fn.*` is the UNet,
    `cnn.*` (resdiff_diffusion.py:50) a SimpleCNN encoder, `rrdb_encoder.*`
    (srdiff_diffusion.py:69) an RRDBNet; schedule buffers are dropped
    (re-derived from config). Keys that fit none of these raise.
    """
    unet_sd, cnn_sd, rrdb_sd = {}, {}, {}
    for k, v in state_dict.items():
        if k.startswith("denoise_fn."):
            unet_sd[k[len("denoise_fn."):]] = v
        elif k.startswith("cnn."):
            cnn_sd[k[len("cnn."):]] = v
        elif k.startswith("rrdb_encoder."):
            rrdb_sd[k[len("rrdb_encoder."):]] = v
        elif k in _SCHEDULE_BUFFERS:
            continue
        else:
            raise ValueError(f"unrecognized checkpoint key: {k}")
    if not unet_sd:
        raise ValueError(
            "no denoise_fn.* keys — is this a _gen.pth diffusion checkpoint? "
            "(for encoder pretrain checkpoints use convert_rrdb_state / "
            "convert_simple_cnn_state directly)"
        )
    out = {"unet": convert_unet_state(unet_sd, variant)}
    if cnn_sd:
        out["encoder"] = convert_simple_cnn_state(cnn_sd)
    if rrdb_sd:
        out["encoder"] = convert_rrdb_state(rrdb_sd)
    return out

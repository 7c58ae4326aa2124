"""Flax NHWC model zoo for srewd_tpu.

Modules mirror the reference's capability surface (SURVEY.md §2.4-2.6) but
are designed TPU-first: NHWC layout, float32 params with configurable compute
dtype, static shapes, and conditioning work (DWT pyramids, RRDB features,
physics stencils) hoisted out of the sampling scan.
"""

from .blocks import (
    Block,
    Downsample,
    FeatureWiseAffine,
    PositionalEncoding,
    ResnetBlock,
    ResnetBlockWithAttn,
    SelfAttention,
    Upsample,
)
from .unet import WeatherUNet
from .simple_cnn import SimpleCNN
from .rrdb import RRDBNet
from .factory import build_model, DiffusionModel
from .phy_conv import PhyConv

__all__ = [
    "PhyConv",
    "Block",
    "Downsample",
    "FeatureWiseAffine",
    "PositionalEncoding",
    "ResnetBlock",
    "ResnetBlockWithAttn",
    "SelfAttention",
    "Upsample",
    "WeatherUNet",
    "SimpleCNN",
    "RRDBNet",
    "build_model",
    "DiffusionModel",
]

"""Helpers to run reference (PyTorch) UNets on CPU for weight-parity tests.

The reference hardcodes CUDA in three places that block CPU execution:
  * `dwt_f.cuda()` on every forward (resdiff/unet.py:130, phydiff/unet.py:266,
    physrdiff/unet.py:145)
  * `nn.GroupNorm(...).to('cuda')` in HF_guided_CA's ctor
    (resdiff/guided_cross_attention.py:19)
  * `torch.tensor(..., device='cuda')` FD kernels (physrdiff/unet.py:45-60)
`cuda_to_cpu()` is a TorchFunctionMode that rewrites every cuda placement to
cpu so the reference modules construct and run unmodified.

It also depends on `pytorch_wavelets` (absent in this image);
`install_pytorch_wavelets_stub()` registers a minimal exact stand-in for
DWTForward(wave='haar', mode='symmetric') on even-sized inputs, where
symmetric padding is a no-op (filter length 2) and each level is the 2x2
orthonormal block transform — the same first-principles math as
srewd_tpu/ops/wavelets.py, with pywt's (H, V, D) component order and the
correlation-filter sign convention (high = (x0 - x1)/sqrt(2)). NOTE: this is
a reconstruction of pytorch_wavelets' documented semantics, not a run of the
real library (unavailable here); the DWT itself is separately pinned by
perfect-reconstruction and known-block tests in tests/test_ops.py.
"""

from __future__ import annotations

import sys
import types

import torch
from torch import nn
from torch.overrides import TorchFunctionMode


class cuda_to_cpu(TorchFunctionMode):
    """Rewrite any explicit CUDA placement to CPU for the enclosed code."""

    def __torch_function__(self, func, types_, args=(), kwargs=None):
        kwargs = dict(kwargs or {})
        if _is_cuda(kwargs.get("device")):
            kwargs["device"] = "cpu"
        # Tensor.to / Module.to with a positional device, and Tensor.cuda
        name = getattr(func, "__name__", "")
        if name == "cuda":
            return args[0]
        if name == "to" and len(args) > 1 and _is_cuda(args[1]):
            args = (args[0], "cpu") + args[2:]
        return func(*args, **kwargs)


def _is_cuda(d) -> bool:
    return (isinstance(d, str) and d.startswith("cuda")) or (
        isinstance(d, torch.device) and d.type == "cuda"
    )


class _HaarDWTForward(nn.Module):
    """pytorch_wavelets.DWTForward stand-in for wave='haar' on even inputs.

    Returns (yl, yh) with yh[j] shaped [B, C, 3, H/2^(j+1), W/2^(j+1)] and
    component order (horizontal=rows-high, vertical=cols-high, diagonal).
    """

    def __init__(self, J: int = 1, wave: str = "haar", mode: str = "symmetric"):
        super().__init__()
        if wave != "haar":
            raise NotImplementedError("stub supports wave='haar' only")
        self.J = J

    def forward(self, x):
        yh = []
        ll = x
        for _ in range(self.J):
            b, c, h, w = ll.shape
            assert h % 2 == 0 and w % 2 == 0, "stub requires even spatial dims"
            blk = ll.reshape(b, c, h // 2, 2, w // 2, 2)
            a = blk[:, :, :, 0, :, 0]
            bb = blk[:, :, :, 0, :, 1]
            cc = blk[:, :, :, 1, :, 0]
            d = blk[:, :, :, 1, :, 1]
            ll = (a + bb + cc + d) * 0.5
            hh = (a + bb - cc - d) * 0.5  # rows-high (horizontal detail)
            vv = (a - bb + cc - d) * 0.5  # cols-high (vertical detail)
            dd = (a - bb - cc + d) * 0.5  # diagonal
            yh.append(torch.stack([hh, vv, dd], dim=2))
        return ll, yh

    def cuda(self, *a, **k):  # reference calls .cuda() unconditionally
        return self


def install_pytorch_wavelets_stub() -> None:
    if "pytorch_wavelets" in sys.modules:
        return
    mod = types.ModuleType("pytorch_wavelets")
    mod.DWTForward = _HaarDWTForward
    sys.modules["pytorch_wavelets"] = mod

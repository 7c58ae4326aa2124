"""Metric-semantics regression vs the reference's own metric classes.

The reference's validation call site is `val_metrics.update(HR, SR)`
(train.py:100) against a container whose signature is
`update(predicted, target)` (training/metrics.py:331-340) — i.e. predicted
binds to HR. That swap silently decides three quirky semantics we preserve
(srewd_tpu/training/metrics.py:125-130):
  * MR sign: mean(HR - SR), not mean(SR - HR)
  * PSNR data range: derived from the `target` slot = SR values seen so far
  * SSIM per-image data range: derived from `predicted[idx]` = HR

These tests stream random Kelvin batches through the REFERENCE classes
(imported from /root/reference) and ours with the reference's exact call
order and compare every value. torcheval and skimage are absent in this
image, so their two entry points are stubbed with documented faithful
stand-ins: torcheval.PeakSignalNoiseRatio(data_range=None) accumulates
sum-squared-error and tracks the target min/max across updates;
skimage.structural_similarity uses the same independent numpy re-derivation
already pinned in tests/test_ops.py::TestSSIM::test_matches_skimage_formula
(uniform 7x7 window, sample covariance, crop 3). MAE/MSE/RMSE/MR exercise
the reference's real torch code with no stubs involved.
"""

import math
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------- stubs
class _PeakSignalNoiseRatio:
    """torcheval.metrics.PeakSignalNoiseRatio stand-in (data_range=None:
    range = max-min of all `target` values seen across updates)."""

    def __init__(self, data_range=None, device=None):
        self.data_range = data_range
        self._reset()

    def _reset(self):
        self.sse, self.n = 0.0, 0
        self.tmin, self.tmax = math.inf, -math.inf

    def update(self, input, target):  # noqa: A002 - torcheval signature
        self.sse += float(((input - target) ** 2).sum())
        self.n += input.numel()
        self.tmin = min(self.tmin, float(target.min()))
        self.tmax = max(self.tmax, float(target.max()))

    def compute(self):
        dr = self.data_range if self.data_range is not None else self.tmax - self.tmin
        return torch.tensor(10.0 * math.log10(dr**2 / (self.sse / self.n)))


def _structural_similarity(im1, im2, data_range):
    """skimage.metrics.structural_similarity stand-in (defaults: uniform 7x7
    window, sample covariance, 3-pixel crop) — same formula as the numpy
    re-derivation golden-tested in tests/test_ops.py."""
    a = np.asarray(im1, np.float64)
    b = np.asarray(im2, np.float64)

    def win_mean(img):
        h, w = img.shape
        out = np.zeros((h - 6, w - 6))
        for i in range(h - 6):
            for j in range(w - 6):
                out[i, j] = img[i : i + 7, j : j + 7].mean()
        return out

    ux, uy = win_mean(a), win_mean(b)
    uxx, uyy, uxy = win_mean(a * a), win_mean(b * b), win_mean(a * b)
    cn = 49.0 / 48.0
    vx, vy, vxy = cn * (uxx - ux**2), cn * (uyy - uy**2), cn * (uxy - ux * uy)
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    return float(np.mean(
        ((2 * ux * uy + c1) * (2 * vxy + c2))
        / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
    ))


def _install_stubs():
    if "torcheval" not in sys.modules:
        te = types.ModuleType("torcheval")
        tem = types.ModuleType("torcheval.metrics")
        tem.PeakSignalNoiseRatio = _PeakSignalNoiseRatio
        tem.MeanSquaredError = object  # imported by the reference, unused
        tem.StructuralSimilarity = object
        te.metrics = tem
        sys.modules["torcheval"] = te
        sys.modules["torcheval.metrics"] = tem
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        skm = types.ModuleType("skimage.metrics")
        skm.structural_similarity = _structural_similarity
        sk.metrics = skm
        sys.modules["skimage"] = sk
        sys.modules["skimage.metrics"] = skm


_install_stubs()
sys.path.insert(0, "/root/reference")

try:
    from training.metrics import create_metric_dict as ref_create_metric_dict  # noqa: E402
    from training.metrics import ValidationMetrics as RefValidationMetrics  # noqa: E402
except Exception:  # pragma: no cover
    pytest.skip("reference repo not importable", allow_module_level=True)

from srewd_tpu.training.metrics import (  # noqa: E402
    ValidationMetrics,
    create_metric_dict,
)


def _batches(n=3, b=4, h=20, w=24, seed=0):
    """Kelvin-scale HR/SR pairs with a deliberate warm bias in SR."""
    rng = np.random.default_rng(seed)
    for _ in range(n):
        hr = 270.0 + 15.0 * rng.standard_normal((b, 1, h, w))
        sr = hr + 2.0 + 3.0 * rng.standard_normal((b, 1, h, w))
        yield hr.astype(np.float32), sr.astype(np.float32)


class TestMetricSemanticsVsReference:
    @pytest.fixture(scope="class")
    def computed(self):
        ref_vm = RefValidationMetrics(ref_create_metric_dict())
        our_vm = ValidationMetrics(create_metric_dict())
        for hr, sr in _batches():
            # reference call site order: update(HR, SR) (train.py:100)
            ref_vm.update(torch.from_numpy(hr), torch.from_numpy(sr))
            # ours consumes NHWC
            our_vm.update(np.transpose(hr, (0, 2, 3, 1)), np.transpose(sr, (0, 2, 3, 1)))
        ref = {k: float(v) for k, v in ref_vm.compute_metrics().items()}
        ours = our_vm.compute_metrics()
        return ref, ours

    def test_elementwise_metrics_match(self, computed):
        """MAE/MSE/RMSE/MR against the reference's REAL torch classes."""
        ref, ours = computed
        for k in ("MAE", "MSE", "RMSE", "MR"):
            assert ours[k] == pytest.approx(ref[k], rel=1e-5), k

    def test_mr_sign_is_hr_minus_sr(self, computed):
        """The swapped call order makes MR = mean(HR - SR): with SR biased
        +2 K warm, MR must come out NEGATIVE ~ -2."""
        ref, ours = computed
        assert ref["MR"] < -1.0
        assert ours["MR"] == pytest.approx(ref["MR"], rel=1e-5)

    def test_psnr_range_from_sr(self, computed):
        """PSNR data range derives from the target slot (= SR under the
        swap), streamed across updates."""
        ref, ours = computed
        assert ours["PSNR"] == pytest.approx(ref["PSNR"], rel=1e-5)

    def test_ssim_per_image_hr_range(self, computed):
        """SSIM per-image, channel 0, data range from predicted (= HR)."""
        ref, ours = computed
        assert ours["SSIM"] == pytest.approx(ref["SSIM"], abs=2e-4)

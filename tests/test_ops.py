"""Golden-parity tests for srewd_tpu.ops against torch CPU reference ops.

These pin the numerics the residual diffusion pipelines depend on
(SURVEY.md §7 "hard parts"): bicubic x4 feeds x0 = HR - bicubic(LR).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from srewd_tpu.ops.resize import bicubic_up4, resize2d, upsample_nearest2x
from srewd_tpu.ops.wavelets import haar_dwt2d, haar_dwt_pyramid, haar_idwt2d
from srewd_tpu.ops.finite_diff import fd_stencils
from srewd_tpu.ops.ssim import ssim

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _rand(b, h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((b, h, w, c)).astype(np.float32)


def _to_torch_nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _from_torch_nchw(t):
    return np.transpose(t.numpy(), (0, 2, 3, 1))


class TestResize:
    def test_bicubic_up4_matches_torch(self):
        x = _rand(2, 32, 64, 1)
        got = np.asarray(bicubic_up4(jnp.asarray(x)))
        want = _from_torch_nchw(
            F.interpolate(_to_torch_nchw(x), scale_factor=4, mode="bicubic")
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_bicubic_multichannel(self):
        x = _rand(3, 16, 24, 4, seed=3)
        got = np.asarray(resize2d(jnp.asarray(x), (64, 96), "bicubic"))
        want = _from_torch_nchw(
            F.interpolate(_to_torch_nchw(x), scale_factor=4, mode="bicubic")
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_bilinear_down2_matches_torch(self):
        x = _rand(2, 32, 64, 2, seed=1)
        got = np.asarray(resize2d(jnp.asarray(x), (16, 32), "bilinear"))
        want = _from_torch_nchw(
            F.interpolate(
                _to_torch_nchw(x), scale_factor=0.5, mode="bilinear", align_corners=False
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_nearest2x_matches_torch(self):
        x = _rand(2, 8, 12, 3, seed=2)
        got = np.asarray(upsample_nearest2x(jnp.asarray(x)))
        want = _from_torch_nchw(F.interpolate(_to_torch_nchw(x), scale_factor=2, mode="nearest"))
        np.testing.assert_allclose(got, want, rtol=0, atol=0)


class TestHaar:
    def test_perfect_reconstruction(self):
        x = jnp.asarray(_rand(2, 16, 32, 2, seed=4))
        ll, highs = haar_dwt2d(x)
        rec = haar_idwt2d(ll, highs)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(x), rtol=1e-6, atol=1e-6)

    def test_orthonormal_energy(self):
        x = jnp.asarray(_rand(1, 32, 32, 1, seed=5))
        ll, (h, v, d) = haar_dwt2d(x)
        e_in = float(jnp.sum(x**2))
        e_out = float(jnp.sum(ll**2) + jnp.sum(h**2) + jnp.sum(v**2) + jnp.sum(d**2))
        assert abs(e_in - e_out) / e_in < 1e-6

    def test_constant_image_has_no_detail(self):
        x = jnp.ones((1, 8, 8, 1)) * 3.0
        ll, (h, v, d) = haar_dwt2d(x)
        np.testing.assert_allclose(np.asarray(ll), 6.0)  # 2x lowpass gain per level
        assert float(jnp.max(jnp.abs(h))) == 0.0
        assert float(jnp.max(jnp.abs(v))) == 0.0
        assert float(jnp.max(jnp.abs(d))) == 0.0

    def test_pyramid_shapes(self):
        x = jnp.asarray(_rand(2, 128, 256, 1, seed=6))
        pyr = haar_dwt_pyramid(x, levels=4, combine="sum")
        shapes = [p.shape for p in pyr]
        assert shapes == [
            (2, 64, 128, 1),
            (2, 32, 64, 1),
            (2, 16, 32, 1),
            (2, 8, 16, 1),
        ]
        pyr3 = haar_dwt_pyramid(x, levels=2, combine="concat")
        assert pyr3[0].shape == (2, 64, 128, 3)

    def test_known_2x2_block(self):
        x = jnp.asarray(np.array([[1.0, 2.0], [3.0, 4.0]], np.float32).reshape(1, 2, 2, 1))
        ll, (h, v, d) = haar_dwt2d(x)
        assert float(ll[0, 0, 0, 0]) == pytest.approx(5.0)  # (1+2+3+4)/2
        assert float(h[0, 0, 0, 0]) == pytest.approx(-2.0)  # (1+2-3-4)/2
        assert float(v[0, 0, 0, 0]) == pytest.approx(-1.0)  # (1-2+3-4)/2
        assert float(d[0, 0, 0, 0]) == pytest.approx(0.0)


class TestFiniteDiff:
    def test_matches_torch_conv(self):
        x = _rand(2, 16, 24, 3, seed=7)
        got = np.asarray(fd_stencils(jnp.asarray(x)))

        t = _to_torch_nchw(x)
        c = t.shape[1]
        kx = torch.tensor([[0, 0, 0], [0, -1, 1], [0, 0, 0]], dtype=torch.float32).view(1, 1, 3, 3)
        ky = torch.tensor([[0, 0, 0], [0, -1, 0], [0, 1, 0]], dtype=torch.float32).view(1, 1, 3, 3)
        kxy = torch.tensor([[0, 1, 0], [1, -4, 1], [0, 1, 0]], dtype=torch.float32).view(1, 1, 3, 3)
        pad = F.pad(t, (1, 1, 1, 1), mode="reflect")
        outs = [F.conv2d(pad, k.repeat(1, c, 1, 1)) for k in (kx, ky, kxy)]
        want = _from_torch_nchw(torch.cat(outs, dim=1))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TestSSIM:
    def test_identical_images(self):
        x = jnp.asarray(np.abs(_rand(2, 32, 32, 1, seed=8)) + 1.0)
        s = ssim(x, x, data_range=1.0)
        np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-6)

    def test_matches_skimage_formula(self):
        # Independent numpy re-derivation of skimage's structural_similarity
        # (uniform 7x7, sample covariance, crop 3), per-image data range.
        rng = np.random.default_rng(9)
        a = rng.standard_normal((20, 24)).astype(np.float64)
        b = a + 0.1 * rng.standard_normal((20, 24))

        def win_mean(img):
            h, w = img.shape
            out = np.zeros((h - 6, w - 6))
            for i in range(h - 6):
                for j in range(w - 6):
                    out[i, j] = img[i : i + 7, j : j + 7].mean()
            return out

        dr = b.max() - b.min()
        ux, uy = win_mean(b), win_mean(a)
        uxx, uyy, uxy = win_mean(b * b), win_mean(a * a), win_mean(a * b)
        cn = 49 / 48
        vx, vy, vxy = cn * (uxx - ux**2), cn * (uyy - uy**2), cn * (uxy - ux * uy)
        c1, c2 = (0.01 * dr) ** 2, (0.03 * dr) ** 2
        want = np.mean(
            ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
        )

        got = float(
            ssim(
                jnp.asarray(b[None, :, :, None], jnp.float32),
                jnp.asarray(a[None, :, :, None], jnp.float32),
            )[0]
        )
        assert got == pytest.approx(want, abs=2e-5)


class TestMoments:
    """K2M/M2K kernel<->moment conversion (reference constrain_moments.py)."""

    def test_roundtrip(self):
        rng = np.random.default_rng(3)
        k = jnp.asarray(rng.standard_normal((4, 5, 5)), jnp.float32)
        from srewd_tpu.ops.moments import k2m, m2k

        np.testing.assert_allclose(np.asarray(m2k(k2m(k))), np.asarray(k), atol=1e-4)

    def test_derivative_kernel_moments(self):
        # the centered d/dx stencil [-1/2, 0, 1/2] (row y, col x) has moment
        # m[0,1]=1 and all other low-order moments 0; the 5-point Laplacian
        # has m[2,0]=m[0,2]=1 (moments scaled by 1/i! per axis).
        from srewd_tpu.ops.moments import k2m

        ddx = jnp.asarray([[0, 0, 0], [-0.5, 0, 0.5], [0, 0, 0]], jnp.float32)
        m = np.asarray(k2m(ddx))
        want = np.zeros((3, 3))
        want[0, 1] = 1.0
        np.testing.assert_allclose(m, want, atol=1e-6)

        lap = jnp.asarray([[0, 1, 0], [1, -4, 1], [0, 1, 0]], jnp.float32)
        m = np.asarray(k2m(lap))
        want = np.zeros((3, 3))
        want[2, 0] = want[0, 2] = 1.0
        np.testing.assert_allclose(m, want, atol=1e-6)

    def test_matches_reference_matrix_definition(self):
        # M[i, j] = (j - (l-1)//2)^i / i!  (constrain_moments.py:31-35)
        from math import factorial

        from srewd_tpu.ops.moments import _moment_matrices

        (m,), _ = _moment_matrices((5,))
        for i in range(5):
            for j in range(5):
                assert m[i, j] == pytest.approx((j - 2) ** i / factorial(i))


class TestPhyConv:
    def test_forward_shapes_and_moments(self):
        import jax

        from srewd_tpu.models.phy_conv import PhyConv

        mod = PhyConv(n_filters=3, kernel_size=5, in_channels=1, levels=2)
        x = jnp.ones((2, 32, 64, 2), jnp.float32)
        params = mod.init(jax.random.key(0), x)
        out, moments = mod.apply(params, x)
        assert out.shape == (2, 8, 16, 1)  # two bilinear halvings
        assert moments.shape == (3, 5, 5)

    def test_moment_constraint_loss_zero_at_target(self):
        from srewd_tpu.ops.moments import m2k, moment_constraint_loss

        target = np.zeros((2, 3, 3), np.float32)
        target[0, 0, 1] = 1.0  # d/dx
        target[1, 2, 0] = 1.0  # d2/dy2
        kernels = m2k(jnp.asarray(target))
        assert float(moment_constraint_loss(kernels, jnp.asarray(target))) < 1e-10


class TestPallasFusedGN:
    """Pallas GN(+Swish) kernel vs pure-JAX/flax reference (interpret mode)."""

    def test_parity_various_shapes(self):
        from srewd_tpu.ops.pallas_fused import (
            _pure_gn_swish,
            pallas_gn_swish_interpret,
        )

        rng = np.random.default_rng(0)
        for (b, h, w, c, g) in [(2, 8, 16, 64, 32), (1, 4, 4, 8, 4), (3, 16, 8, 32, 8)]:
            x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
            scale = jnp.asarray(rng.standard_normal(c), jnp.float32)
            bias = jnp.asarray(rng.standard_normal(c), jnp.float32)
            for sw in (True, False):
                pure = _pure_gn_swish(x, scale, bias, g, 1e-5, sw)
                pk = pallas_gn_swish_interpret(x, scale, bias, g, 1e-5, sw)
                np.testing.assert_allclose(
                    np.asarray(pk), np.asarray(pure), atol=3e-5
                )

    def test_matches_flax_groupnorm(self):
        from flax import linen as nn

        from srewd_tpu.ops.pallas_fused import pallas_gn_swish_interpret

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, 8, 16, 32)), jnp.float32)
        scale = jnp.asarray(rng.standard_normal(32), jnp.float32)
        bias = jnp.asarray(rng.standard_normal(32), jnp.float32)
        ref = nn.GroupNorm(num_groups=8, epsilon=1e-5).apply(
            {"params": {"scale": scale, "bias": bias}}, x
        )
        got = pallas_gn_swish_interpret(x, scale, bias, 8, 1e-5, False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)

    def test_grads_match_pure(self):
        import jax

        from srewd_tpu.ops.pallas_fused import (
            _pure_gn_swish,
            fused_groupnorm_swish,
        )

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((2, 4, 8, 16)), jnp.float32)
        s = jnp.ones(16, jnp.float32)
        b = jnp.zeros(16, jnp.float32)
        g1 = jax.grad(lambda a: jnp.sum(fused_groupnorm_swish(a, s, b, 4)))(x)
        g2 = jax.grad(lambda a: jnp.sum(_pure_gn_swish(a, s, b, 4, 1e-5, True)))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


class TestFlashAttention:
    """Pallas flash attention (interpret mode) vs monolithic softmax."""

    def _ref(self, q, k, v, scale):
        import jax

        s = jnp.einsum("bic,bjc->bij", q, k, preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s * scale, -1).astype(v.dtype)
        return jnp.einsum(
            "bij,bjc->bic", p, v, preferred_element_type=jnp.float32
        ).astype(q.dtype)

    def test_parity(self):
        import math

        from srewd_tpu.ops.flash_attention import _pick_qb, flash_attention

        rng = np.random.default_rng(0)
        for (b, n, d) in [(2, 512, 64), (1, 1024, 32), (2, 256, 16)]:
            q, k, v = (
                jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
                for _ in range(3)
            )
            scale = 1.0 / math.sqrt(d)
            assert _pick_qb(n) is not None
            out = flash_attention(q, k, v, scale, interpret=True)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(self._ref(q, k, v, scale)), atol=2e-5
            )

    def test_eligibility_gates(self):
        from srewd_tpu.ops.flash_attention import flash_eligible

        # CPU platform in tests -> never eligible (falls back to XLA path)
        assert not flash_eligible(8, 8192, 64, 2)

    def test_backward_parity(self):
        """Custom-VJP grads (Pallas bwd kernel, interpret) vs autodiff of
        the monolithic reference, all three operands."""
        import math

        import jax

        from srewd_tpu.ops.flash_attention import (
            _pick_qb,
            _SCORE_BYTES_BWD,
            flash_attention_trainable,
        )

        rng = np.random.default_rng(3)
        for (b, n, d) in [(2, 512, 64), (1, 1024, 32)]:
            q, k, v, co = (
                jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
                for _ in range(4)
            )
            scale = 1.0 / math.sqrt(d)
            assert _pick_qb(n, _SCORE_BYTES_BWD) is not None

            def loss_flash(q, k, v):
                return jnp.sum(
                    flash_attention_trainable(q, k, v, scale, True) * co
                )

            def loss_ref(q, k, v):
                return jnp.sum(self._ref(q, k, v, scale) * co)

            g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
            g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
            for got, want, name in zip(g_flash, g_ref, "qkv"):
                np.testing.assert_allclose(
                    np.asarray(got), np.asarray(want), atol=5e-4,
                    err_msg=f"d{name} mismatch at {(b, n, d)}",
                )

    def test_s2d_conv_exact(self):
        """W-paired conv rewrite (ops/s2d_conv.py) == direct SAME 3x3 conv."""
        import jax

        from srewd_tpu.ops.s2d_conv import conv3x3_s2d, s2d_profitable

        rng = np.random.default_rng(9)
        for (b, h, w, c, o) in [(2, 8, 16, 5, 7), (1, 4, 6, 64, 64),
                                (2, 6, 8, 128, 64)]:
            x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
            k = jnp.asarray(rng.standard_normal((3, 3, c, o)) * 0.1, jnp.float32)
            bias = jnp.asarray(rng.standard_normal((o,)), jnp.float32)
            want = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias
            got = conv3x3_s2d(x, k, bias)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-4)
        assert s2d_profitable(64, 64) and s2d_profitable(128, 64)
        assert not s2d_profitable(128, 128)

    def test_s2d_conv_grads_flow(self):
        """The kernel transform is differentiable (training-safe)."""
        import jax

        from srewd_tpu.ops.s2d_conv import conv3x3_s2d

        rng = np.random.default_rng(10)
        x = jnp.asarray(rng.standard_normal((1, 4, 6, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.1, jnp.float32)

        def loss_s2d(k):
            return jnp.sum(conv3x3_s2d(x, k) ** 2)

        def loss_ref(k):
            return jnp.sum(jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) ** 2)

        np.testing.assert_allclose(
            np.asarray(jax.grad(loss_s2d)(k)),
            np.asarray(jax.grad(loss_ref)(k)), atol=1e-3)

    def test_s2d_routing_conv_same_tree_and_output(self, monkeypatch):
        """blocks.Conv (the nn.Conv subclass that routes eligible shapes
        through the s2d rewrite) must keep the identical param tree AND
        output as nn.Conv — forced on CPU via SREWD_S2D_CONV=force."""
        import jax
        from flax import linen

        from srewd_tpu.models import blocks

        rng = np.random.default_rng(12)
        x = jnp.asarray(rng.standard_normal((2, 8, 16, 64)), jnp.float32)
        key = jax.random.key(0)

        plain = linen.Conv(64, (3, 3), padding=1)
        routed = blocks.Conv(64, (3, 3), padding=1)

        monkeypatch.setenv("SREWD_S2D_CONV", "force")
        params_routed = routed.init(key, x)
        monkeypatch.setenv("SREWD_S2D_CONV", "0")
        params_plain = plain.init(key, x)

        # identical tree (names + shapes) -> checkpoints/converters unaffected
        assert jax.tree_util.tree_structure(params_plain) == \
            jax.tree_util.tree_structure(params_routed)
        want = plain.apply(params_plain, x)
        monkeypatch.setenv("SREWD_S2D_CONV", "force")
        got = routed.apply(params_plain, x)  # same weights, routed math
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
        # ineligible shape falls back identically under force
        x5 = jnp.asarray(rng.standard_normal((2, 8, 15, 64)), jnp.float32)  # odd W
        got5 = routed.apply(params_plain, x5)
        want5 = plain.apply(params_plain, x5)
        np.testing.assert_allclose(np.asarray(got5), np.asarray(want5), atol=1e-4)

    def test_s2d_unet_forward_equivalence(self, monkeypatch):
        """Full WeatherUNet forward: routed (forced) == unrouted, same params."""
        import jax

        from srewd_tpu.models.unet import WeatherUNet

        net = WeatherUNet(
            variant="sr3", in_channel=2, out_channel=1, inner_channel=16,
            norm_groups=8, channel_mults=(1, 2), attn_res=(4,), res_blocks=1,
            dropout=0.0, image_height=8, image_width=16, image_channels=1,
        )
        rng = np.random.default_rng(13)
        x = jnp.asarray(rng.standard_normal((2, 8, 16, 2)), jnp.float32)
        lvl = jnp.asarray([0.5, 0.9], jnp.float32)
        monkeypatch.setenv("SREWD_S2D_CONV", "0")
        params = net.init(jax.random.key(0), x, lvl)
        want = net.apply(params, x, lvl, train=False)
        monkeypatch.setenv("SREWD_S2D_CONV", "force")
        got = net.apply(params, x, lvl, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)

    def test_train_route_knob(self):
        """SREWD_FLASH_TRAIN routes training-path CA through the trainable
        kernel only when eligible (never on CPU)."""
        from srewd_tpu.ops.flash_attention import flash_eligible_train

        assert not flash_eligible_train(8, 8192, 64, 2)  # CPU platform

    def test_inference_context_routes(self):
        """The trace-time context flag controls routing (pure path on CPU)."""
        import math

        from srewd_tpu.models.blocks import _chunked_attention, inference_attention

        rng = np.random.default_rng(1)
        q, k, v = (
            jnp.asarray(rng.standard_normal((1, 64, 8)), jnp.float32)
            for _ in range(3)
        )
        with inference_attention():
            a = _chunked_attention(q, k, v, 1.0 / math.sqrt(8))
        b = _chunked_attention(q, k, v, 1.0 / math.sqrt(8))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

"""End-to-end smoke tests of the five diffusion architectures on tiny shapes.

These replace (and exceed) the reference's __main__ smoke blocks
(SURVEY.md §4): init -> training loss -> short reverse sampling chain for
every arch, asserting shapes and finiteness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srewd_tpu.diffusion.schedule import Schedule
from srewd_tpu.models.factory import DiffusionModel
from srewd_tpu.models.rrdb import RRDBNet
from srewd_tpu.models.simple_cnn import SimpleCNN
from srewd_tpu.models.unet import WeatherUNet
from srewd_tpu.ops.resize import bicubic_up4

B, H, W, C = 2, 32, 64, 1
LH, LW = H // 4, W // 4


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    hr = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    lr = jnp.asarray(rng.standard_normal((B, LH, LW, C)), jnp.float32)
    return {"HR": hr, "LR": lr, "SR": bicubic_up4(lr)}


def _unet(variant, **kw):
    base = dict(
        variant=variant,
        out_channel=C,
        inner_channel=32,
        norm_groups=32,
        channel_mults=(1, 2),
        attn_res=(16,),
        res_blocks=2,
        dropout=0.1,
        image_height=H,
        image_width=W,
        image_channels=C,
    )
    base.update(kw)
    return WeatherUNet(**base)


def _model(arch):
    if arch in ("srdiff", "physrdiff"):
        enc = RRDBNet(in_nc=C, out_nc=C, nf=32, nb=2, gc=16)
        unet = _unet(arch, rrdb_num_feats=32, rrdb_num_blocks=2)
        return DiffusionModel(arch=arch, unet=unet, encoder=enc)
    if arch == "resdiff":
        return DiffusionModel(arch=arch, unet=_unet(arch), encoder=SimpleCNN(4, C))
    return DiffusionModel(arch=arch, unet=_unet(arch))


@pytest.mark.parametrize("arch", ["sr3", "resdiff", "phydiff", "srdiff", "physrdiff"])
def test_arch_loss_and_sample(arch):
    model = _model(arch)
    batch = _batch()
    sched = Schedule.create("linear", n_timestep=8, linear_start=1e-4, linear_end=5e-2)

    params = model.init(jax.random.key(0), batch)
    loss = model.loss(params, batch, jax.random.key(1), sched, train=True)
    assert jnp.isfinite(loss), f"{arch} loss not finite"
    assert loss.shape == ()

    sr = jax.jit(
        lambda p, b, k: model.generate_sr(p, b, k, sched)
    )(params, batch, jax.random.key(2))
    assert sr.shape == (B, H, W, C)
    assert bool(jnp.all(jnp.isfinite(sr))), f"{arch} sample not finite"


def test_loss_grads_flow():
    model = _model("sr3")
    batch = _batch()
    sched = Schedule.create("linear", n_timestep=8)
    params = model.init(jax.random.key(0), batch)
    g = jax.grad(lambda p: model.loss(p, batch, jax.random.key(1), sched, train=False))(params)
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert total > 0.0


def test_locked_encoder_gets_no_grads():
    model = _model("srdiff")
    assert model.lock_encoder
    batch = _batch()
    sched = Schedule.create("linear", n_timestep=8)
    params = model.init(jax.random.key(0), batch)
    g = jax.grad(lambda p: model.loss(p, batch, jax.random.key(1), sched, train=False))(params)
    enc_norm = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(g["encoder"]))
    assert enc_norm == 0.0
    unet_norm = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(g["unet"]))
    assert unet_norm > 0.0


def test_unconditional_sample_and_loss():
    """DDPM.sample parity (model.py:87-100) incl. non-square shapes."""
    unet = _unet("sr3", in_channel=C)  # denoiser sees only the noisy map
    m = DiffusionModel(arch="sr3", unet=unet, conditional=False)
    sched = Schedule.create("linear", n_timestep=4)
    batch = _batch()
    params = m.init(jax.random.key(0), batch)
    loss = m.loss(params, batch, jax.random.key(1), sched)
    assert np.isfinite(float(loss))
    out = m.sample(params, 2, jax.random.key(2), sched)
    assert out.shape == (2, H, W, C)  # height != width: square-only bug fixed
    assert bool(jnp.all(jnp.isfinite(out)))

    cond_model = _model("sr3")
    p2 = cond_model.init(jax.random.key(0), batch)
    with pytest.raises(ValueError):
        cond_model.sample(p2, 2, jax.random.key(2), sched)


@pytest.mark.parametrize("arch", ["resdiff", "phydiff", "physrdiff"])
def test_hoisted_cond_features_bitwise(arch):
    """Scan-invariant conditioning hoisting is exact.

    generate_sr computes the FD-spliter frequency features (resdiff/
    physrdiff) and the phydiff stencil maps ONCE per chain instead of per
    UNet call (the reference recomputes them every step,
    resdiff/fd_info_spliter.py:49-96, phydiff/unet.py:311-314). The hoisted
    call must be bitwise-identical to the inline recompute.
    """
    from srewd_tpu.ops.finite_diff import fd_stencils

    model = _model(arch)
    batch = _batch()
    params = model.init(jax.random.key(0), batch)
    cond = model.condition(params, batch)
    xt = jnp.asarray(np.random.default_rng(3).standard_normal(cond.shape), jnp.float32)
    nl = jnp.full((B,), 0.7, jnp.float32)
    x_in, kwargs = model._unet_inputs(params, batch, cond, xt)
    up = {"params": params["unet"]}

    y_inline = model.unet.apply(up, x_in, nl, **kwargs)
    if arch == "phydiff":
        kwargs["fd_maps"] = fd_stencils(cond)
    else:
        kwargs["cond_feats"] = model.unet.apply(up, cond, cond_features_only=True)
    y_hoisted = model.unet.apply(up, x_in, nl, **kwargs)
    assert float(jnp.max(jnp.abs(y_inline - y_hoisted))) == 0.0

"""Paired-level execution (ops/paired.py + the blocks/unet routing).

Pins that the W-paired full-resolution level is EXACT against the direct
path — same outputs, same gradients, identical parameter tree — for every
architecture, plus unit parity of each paired-native op. CPU tests route
via SREWD_PAIRED_LEVEL=force (the TPU gate is "1"; see
models/blocks.paired_level_enabled).
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
from srewd_tpu.ops.paired import (
    conv1x1_paired,
    conv3x3_paired,
    pair,
    paired_concat,
    paired_gn_swish,
    unpair,
)
from srewd_tpu.ops.pallas_fused import fused_groupnorm_swish
from srewd_tpu.ops.resize import bicubic_up4

B, H, W, C = 2, 32, 64, 1
LH, LW = H // 4, W // 4


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    hr = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    lr = jnp.asarray(rng.standard_normal((B, LH, LW, C)), jnp.float32)
    return {"HR": hr, "LR": lr, "SR": bicubic_up4(lr)}


def _model(arch):
    base = dict(
        variant=arch,
        out_channel=C,
        inner_channel=32,
        norm_groups=8,
        channel_mults=(1, 2),
        attn_res=(16,),
        res_blocks=2,
        dropout=0.0,
        image_height=H,
        image_width=W,
        image_channels=C,
    )
    if arch in ("srdiff", "physrdiff"):
        enc = RRDBNet(in_nc=C, out_nc=C, nf=32, nb=2, gc=16)
        unet = WeatherUNet(**base, rrdb_num_feats=32, rrdb_num_blocks=2)
        return DiffusionModel(arch=arch, unet=unet, encoder=enc)
    if arch == "resdiff":
        return DiffusionModel(arch=arch, unet=WeatherUNet(**base), encoder=SimpleCNN(4, C))
    return DiffusionModel(arch=arch, unet=WeatherUNet(**base))


# ---------------------------------------------------------------- op units


def test_pair_unpair_roundtrip():
    x = jnp.arange(2 * 4 * 6 * 3, dtype=jnp.float32).reshape(2, 4, 6, 3)
    xp = pair(x)
    assert xp.shape == (2, 4, 3, 6)
    # phase-major: first C channels are the even columns
    np.testing.assert_array_equal(np.asarray(xp[..., :3]), np.asarray(x[:, :, 0::2, :]))
    np.testing.assert_array_equal(np.asarray(xp[..., 3:]), np.asarray(x[:, :, 1::2, :]))
    np.testing.assert_array_equal(np.asarray(unpair(xp)), np.asarray(x))


def test_paired_concat_is_phase_major():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((2, 4, 8, 3)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((2, 4, 8, 5)), jnp.float32)
    got = paired_concat(pair(a), pair(b))
    want = pair(jnp.concatenate([a, b], axis=-1))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_conv3x3_paired_matches_direct():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 5)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 5, 7)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((7,)), jnp.float32)
    direct = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + bias
    got = unpair(conv3x3_paired(pair(x), k, bias))
    np.testing.assert_allclose(np.asarray(got), np.asarray(direct), atol=1e-4)


def test_conv1x1_paired_matches_direct():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 6, 10, 4)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 1, 4, 6)), jnp.float32)
    direct = jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    got = unpair(conv1x1_paired(pair(x), k))
    np.testing.assert_allclose(np.asarray(got), np.asarray(direct), atol=1e-5)


@pytest.mark.parametrize("apply_swish", [False, True])
def test_paired_gn_matches_pure(apply_swish):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 6, 8, 12)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal((12,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((12,)), jnp.float32)
    want = fused_groupnorm_swish(x, scale, bias, 4, 1e-5, apply_swish)
    got = unpair(paired_gn_swish(pair(x), scale, bias, 4, 1e-5, apply_swish))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


# ------------------------------------------------ segmented (plain-concat)
# The hot path never re-canonicalizes a concat of paired tensors (the
# channel slices land on half-tile boundaries -> TPU relayouts, measured in
# scripts/profile_paired_chain.py); instead the consuming op permutes its
# WEIGHTS via segments=. These pin the segmented ops against the
# re-canonicalized reference with DISTINCT a/b tensors (a==b would hide a
# segment-permutation bug).


def _seg_inputs(seed=7, ca=6, cb=10):
    rng = np.random.default_rng(seed)
    a = jnp.asarray(rng.standard_normal((2, 6, 8, ca)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((2, 6, 8, cb)), jnp.float32)
    plain = jnp.concatenate([pair(a), pair(b)], axis=-1)
    canonical = paired_concat(pair(a), pair(b))
    return plain, canonical, (ca, cb)


def test_conv3x3_segmented_matches_canonical():
    plain, canonical, segs = _seg_inputs()
    rng = np.random.default_rng(8)
    k = jnp.asarray(rng.standard_normal((3, 3, sum(segs), 5)), jnp.float32)
    want = conv3x3_paired(canonical, k)
    got = conv3x3_paired(plain, k, segments=segs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_conv1x1_segmented_matches_canonical():
    plain, canonical, segs = _seg_inputs(seed=9)
    rng = np.random.default_rng(10)
    k = jnp.asarray(rng.standard_normal((1, 1, sum(segs), 5)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((5,)), jnp.float32)
    want = conv1x1_paired(canonical, k, bias)
    got = conv1x1_paired(plain, k, bias, segments=segs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("apply_swish", [False, True])
def test_gn_segmented_matches_canonical(apply_swish):
    plain, canonical, segs = _seg_inputs(seed=11)
    c = sum(segs)
    rng = np.random.default_rng(12)
    scale = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    want = paired_gn_swish(canonical, scale, bias, 4, 1e-5, apply_swish)
    got = paired_gn_swish(plain, scale, bias, 4, 1e-5, apply_swish,
                          segments=segs)
    # GN preserves its input layout: got is segmented, want phase-major
    got_canonical = paired_concat(got[..., : 2 * segs[0]],
                                  got[..., 2 * segs[0]:])
    np.testing.assert_allclose(
        np.asarray(got_canonical), np.asarray(want), atol=1e-5)


# ------------------------------------------------------- model-level parity

ARCHS = ["sr3", "resdiff", "phydiff", "srdiff", "physrdiff"]


@pytest.mark.parametrize("arch", ARCHS)
def test_model_parity_paired_vs_direct(arch, monkeypatch):
    """Same params: loss, gradient, and a short sampling chain all match."""
    model = _model(arch)
    batch = _batch()
    sched = Schedule.create("linear", n_timestep=6)

    monkeypatch.setenv("SREWD_PAIRED_LEVEL", "0")
    params = model.init(jax.random.key(0), batch)
    loss0 = model.loss(params, batch, jax.random.key(1), sched, train=False)
    g0 = jax.grad(
        lambda p: model.loss(p, batch, jax.random.key(1), sched, train=False)
    )(params)
    sr0 = model.generate_sr(params, batch, jax.random.key(2), sched)

    monkeypatch.setenv("SREWD_PAIRED_LEVEL", "force")
    params_p = model.init(jax.random.key(0), batch)
    # identical tree: names AND shapes (checkpoints interchangeable)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_p)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params_p)):
        assert a.shape == b.shape and a.dtype == b.dtype
    loss1 = model.loss(params, batch, jax.random.key(1), sched, train=False)
    g1 = jax.grad(
        lambda p: model.loss(p, batch, jax.random.key(1), sched, train=False)
    )(params)
    sr1 = model.generate_sr(params, batch, jax.random.key(2), sched)

    np.testing.assert_allclose(float(loss1), float(loss0), rtol=1e-5)
    gmax = max(
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1))
    )
    assert gmax < 1e-4, f"{arch} grad diff {gmax}"
    np.testing.assert_allclose(np.asarray(sr1), np.asarray(sr0), atol=1e-3)


def test_paired_skipped_when_full_res_attention(monkeypatch):
    """attn at full res -> the region must not activate (token count)."""
    monkeypatch.setenv("SREWD_PAIRED_LEVEL", "force")
    net = WeatherUNet(
        variant="sr3", in_channel=2, out_channel=1, inner_channel=8,
        norm_groups=4, channel_mults=(1, 2), attn_res=(16,), res_blocks=1,
        image_height=16, image_width=32, image_channels=1,
    )
    x = jnp.ones((1, 16, 32, 2))
    lvl = jnp.array([0.5])
    params = net.init(jax.random.key(0), x, lvl)
    out = net.apply(params, x, lvl)
    assert out.shape == (1, 16, 32, 1)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_paired_under_8dev_mesh_matches_direct(monkeypatch):
    """GSPMD shards the paired program identically: the 8-virtual-device
    train step with the paired level routed matches the direct path."""
    import optax

    from srewd_tpu.parallel.mesh import make_mesh
    from srewd_tpu.training.trainer import DiffusionTrainer

    def trainer():
        sched = Schedule.create("linear", n_timestep=6)
        unet = WeatherUNet(
            variant="sr3", out_channel=1, inner_channel=8, norm_groups=4,
            channel_mults=(1, 2), attn_res=(8,), res_blocks=1, dropout=0.0,
            image_height=16, image_width=32, image_channels=1,
        )
        return DiffusionTrainer(
            model=DiffusionModel(arch="sr3", unet=unet), schedule_train=sched,
            schedule_val=sched, optimizer=optax.adam(1e-3),
            mesh=make_mesh(8), seed=0,
        )

    def batch(seed):
        rng = np.random.default_rng(seed)
        return {
            "HR": rng.standard_normal((8, 16, 32, 1)).astype(np.float32),
            "LR": rng.standard_normal((8, 4, 8, 1)).astype(np.float32),
            "months": np.ones((8,), np.int32),
        }

    monkeypatch.setenv("SREWD_PAIRED_LEVEL", "0")
    ta = trainer()
    ta.init_params(batch(0))
    monkeypatch.setenv("SREWD_PAIRED_LEVEL", "force")
    tb = trainer()
    tb.init_params(batch(0))
    for a, b in zip(jax.tree.leaves(ta.params), jax.tree.leaves(tb.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    losses = []
    for i in range(2):
        monkeypatch.setenv("SREWD_PAIRED_LEVEL", "0")
        la = ta.train_on_batch(batch(i))
        monkeypatch.setenv("SREWD_PAIRED_LEVEL", "force")
        lb = tb.train_on_batch(batch(i))
        losses.append((float(la), float(lb)))
        assert la == pytest.approx(lb, rel=2e-4), losses
    for a, b in zip(jax.tree.leaves(ta.params), jax.tree.leaves(tb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)
    sr = tb.sample_batch(batch(3))
    assert sr.shape == (8, 16, 32, 1)
    assert bool(jnp.all(jnp.isfinite(sr)))


def test_paired_under_tensor_parallel_matches_direct(monkeypatch):
    """TP (column-parallel output channels over the 'model' axis) composes
    with the paired level: the kernel transforms are pure gathers over the
    ORIGINAL [3,3,C,O] params, so GSPMD must propagate the O-dim sharding
    through them. Pins a (data=4, model=2) paired train step against the
    same-mesh direct path, and that params stay genuinely sharded."""
    import optax

    from srewd_tpu.parallel.mesh import make_mesh
    from srewd_tpu.training.trainer import DiffusionTrainer

    def trainer():
        sched = Schedule.create("linear", n_timestep=6)
        unet = WeatherUNet(
            variant="sr3", out_channel=1, inner_channel=8, norm_groups=4,
            channel_mults=(1, 2), attn_res=(8,), res_blocks=1, dropout=0.0,
            image_height=16, image_width=32, image_channels=1,
        )
        return DiffusionTrainer(
            model=DiffusionModel(arch="sr3", unet=unet), schedule_train=sched,
            schedule_val=sched, optimizer=optax.adam(1e-3),
            mesh=make_mesh(8, model_parallel=2), model_shard_min_dim=8,
            seed=0,
        )

    def batch(seed):
        rng = np.random.default_rng(seed)
        return {
            "HR": rng.standard_normal((8, 16, 32, 1)).astype(np.float32),
            "LR": rng.standard_normal((8, 4, 8, 1)).astype(np.float32),
            "months": np.ones((8,), np.int32),
        }

    monkeypatch.setenv("SREWD_PAIRED_LEVEL", "0")
    ta = trainer()
    ta.init_params(batch(0))
    monkeypatch.setenv("SREWD_PAIRED_LEVEL", "force")
    tb = trainer()
    tb.init_params(batch(0))
    # the paired program must hold the same TP placement as the direct one
    sharded = [
        p for p in jax.tree.leaves(tb.params)
        if "model" in tuple(p.sharding.spec)
    ]
    assert sharded, "paired TP program holds no model-sharded param"
    for i in range(2):
        monkeypatch.setenv("SREWD_PAIRED_LEVEL", "0")
        la = ta.train_on_batch(batch(i))
        monkeypatch.setenv("SREWD_PAIRED_LEVEL", "force")
        lb = tb.train_on_batch(batch(i))
        assert la == pytest.approx(lb, rel=2e-4)
    for a, b in zip(jax.tree.leaves(ta.params), jax.tree.leaves(tb.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)
    sr = tb.sample_batch(batch(3))
    assert sr.shape == (8, 16, 32, 1)
    assert bool(jnp.all(jnp.isfinite(sr)))


def test_paired_parity_bf16():
    """bf16 compute dtype (the production setting) stays close."""
    import os

    net_kw = dict(
        variant="sr3", in_channel=2, out_channel=1, inner_channel=16,
        norm_groups=8, channel_mults=(1, 2), attn_res=(8,), res_blocks=2,
        image_height=16, image_width=32, image_channels=1,
        dtype=jnp.bfloat16,
    )
    net = WeatherUNet(**net_kw)
    x = jax.random.normal(jax.random.key(0), (2, 16, 32, 2))
    lvl = jnp.array([0.7, 0.4])
    old = os.environ.get("SREWD_PAIRED_LEVEL")
    try:
        os.environ["SREWD_PAIRED_LEVEL"] = "0"
        params = net.init(jax.random.key(1), x, lvl)
        y0 = net.apply(params, x, lvl)
        os.environ["SREWD_PAIRED_LEVEL"] = "force"
        y1 = net.apply(params, x, lvl)
    finally:
        if old is None:
            os.environ.pop("SREWD_PAIRED_LEVEL", None)
        else:
            os.environ["SREWD_PAIRED_LEVEL"] = old
    # bf16 rounding differs (different summation order); bound the drift
    assert float(jnp.abs(y1.astype(jnp.float32) - y0.astype(jnp.float32)).max()) < 0.1

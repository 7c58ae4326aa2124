"""Serving-layer tests: batching, padding, determinism, Kelvin boundary,
error propagation, and the HTTP front-end.

Beyond-reference subsystem (the reference stops at a one-shot sample.py);
these pin the deployment contract: a request's fields are bit-identical
to a direct generate_sr call with the same packing and key schedule."""

import json
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srewd_tpu.data.scalers import MonthlyScalerSet
from srewd_tpu.diffusion.schedule import Schedule
from srewd_tpu.models.factory import DiffusionModel
from srewd_tpu.models.unet import WeatherUNet
from srewd_tpu.parallel.mesh import make_mesh
from srewd_tpu.serving import SamplerService
from srewd_tpu.serving.http import _b64_decode, _b64_encode, make_server

H, W = 16, 32
LH, LW = H // 4, W // 4


@pytest.fixture(scope="module")
def stack():
    model = DiffusionModel(
        arch="sr3",
        unet=WeatherUNet(
            variant="sr3", out_channel=1, inner_channel=8, norm_groups=4,
            channel_mults=(1, 2), attn_res=(8,), res_blocks=1, dropout=0.0,
            image_height=H, image_width=W, image_channels=1,
        ),
    )
    batch = {
        "HR": np.zeros((4, H, W, 1), np.float32),
        "LR": np.zeros((4, LH, LW, 1), np.float32),
    }
    params = model.init(jax.random.key(0), batch)
    sched = Schedule.create("linear", n_timestep=6)
    return model, params, sched


def _lr(n, seed=0):
    return np.random.default_rng(seed).standard_normal(
        (n, LH, LW, 1)).astype(np.float32)


def _direct(stack_t, lr, seq):
    """What the service must produce for device batch `seq` holding `lr`."""
    model, params, sched = stack_t
    key = jax.random.fold_in(jax.random.key(0), seq)
    fn = jax.jit(lambda p, x, k: model.generate_sr(p, {"LR": x}, k, sched))
    return np.asarray(fn(params, jnp.asarray(lr), key))


class TestBatching:
    def test_single_batch_parity(self, stack):
        lr = _lr(4)
        with SamplerService(*stack, batch_size=4, mesh=make_mesh(1)) as svc:
            sr = svc.super_resolve(lr, np.ones(4, np.int32))
        assert sr.shape == (4, H, W, 1)
        np.testing.assert_allclose(sr, _direct(stack, lr, 0), atol=1e-5)

    def test_split_and_pad(self, stack):
        lr = _lr(6, seed=1)
        with SamplerService(*stack, batch_size=4, mesh=make_mesh(1)) as svc:
            sr = svc.super_resolve(lr, np.ones(6, np.int32))
            stats = svc.stats()
        assert sr.shape == (6, H, W, 1)
        assert stats["device_batches"] == 2
        assert stats["padded_fields"] == 2
        np.testing.assert_allclose(sr[:4], _direct(stack, lr[:4], 0), atol=1e-5)
        # tail batch: rows 4,5 padded with row 4 repeated
        padded = np.stack([lr[4], lr[5], lr[4], lr[4]])
        np.testing.assert_allclose(sr[4:], _direct(stack, padded, 1)[:2], atol=1e-5)

    def test_concurrent_requests_coalesce(self, stack):
        lr = _lr(4, seed=2)
        with SamplerService(*stack, batch_size=4, mesh=make_mesh(1),
                            linger_ms=500.0) as svc:
            futs = [svc.submit(lr[i:i + 1], np.ones(1, np.int32))
                    for i in range(4)]
            rows = [f.result() for f in futs]
            stats = svc.stats()
        assert stats["device_batches"] == 1
        assert stats["padded_fields"] == 0
        assert stats["requests"] == 4
        expected = _direct(stack, lr, 0)
        for i, row in enumerate(rows):
            np.testing.assert_allclose(row[0], expected[i], atol=1e-5)

    def test_hot_swap_params(self, stack):
        model, params, sched = stack
        params2 = model.init(jax.random.key(42), {
            "HR": np.zeros((4, H, W, 1), np.float32),
            "LR": np.zeros((4, LH, LW, 1), np.float32),
        })
        lr = _lr(4, seed=9)
        with SamplerService(*stack, batch_size=4, mesh=make_mesh(1)) as svc:
            first = svc.super_resolve(lr, np.ones(4, np.int32))
            svc.update_params(params2)
            second = svc.super_resolve(lr, np.ones(4, np.int32))
            # structure mismatch is rejected before it can poison the queue
            with pytest.raises(ValueError, match="tree mismatch"):
                svc.update_params({"wrong_key": params2["unet"]})
        np.testing.assert_allclose(first, _direct(stack, lr, 0), atol=1e-5)
        np.testing.assert_allclose(
            second, _direct((model, params2, sched), lr, 1), atol=1e-5)
        assert not np.allclose(first, second)

    def test_closed_service_rejects(self, stack):
        svc = SamplerService(*stack, batch_size=2, mesh=make_mesh(1))
        svc.close()
        with pytest.raises(RuntimeError, match="closed"):
            svc.submit(_lr(1), np.ones(1, np.int32))

    def test_mismatched_field_shape_rejected(self, stack):
        """A second request with a different LR grid must be rejected at
        submit() — coalesced into one batch it would kill the dispatcher's
        np.stack and brick the service (code-review r3 finding)."""
        with SamplerService(*stack, batch_size=4, mesh=make_mesh(1)) as svc:
            svc.super_resolve(_lr(2), np.ones(2, np.int32))
            bad = np.zeros((1, LH * 2, LW, 1), np.float32)
            with pytest.raises(ValueError, match="compiled shape"):
                svc.submit(bad, np.ones(1, np.int32))
            # service still serves after the rejection
            sr = svc.super_resolve(_lr(2, seed=5), np.ones(2, np.int32))
        assert sr.shape == (2, H, W, 1)

    def test_empty_request_rejected(self, stack):
        """n=0 enqueues no slots, so its future could never resolve."""
        with SamplerService(*stack, batch_size=2, mesh=make_mesh(1)) as svc:
            with pytest.raises(ValueError, match="non-empty"):
                svc.submit(np.zeros((0, LH, LW, 1), np.float32),
                           np.zeros(0, np.int32))

    def test_update_params_rejects_leaf_mismatch(self, stack):
        model, params, sched = stack
        import jax as _jax

        wider = _jax.tree.map(
            lambda x: np.concatenate([np.asarray(x)] * 2, axis=-1)
            if getattr(x, "ndim", 0) else x, params)
        with SamplerService(*stack, batch_size=2, mesh=make_mesh(1)) as svc:
            with pytest.raises(ValueError, match="leaf mismatch"):
                svc.update_params(wider)


class TestKelvinBoundary:
    def test_scalers_applied_both_ways(self, stack):
        rng = np.random.default_rng(3)
        mean = rng.normal(280, 5, (13, 1, 1, 1)).astype(np.float32)
        std = rng.uniform(2, 4, (13, 1, 1, 1)).astype(np.float32)
        sc_lr = MonthlyScalerSet(mean, std, "GlobalStandardScaling")
        sc_hr = MonthlyScalerSet(mean + 1, std * 2, "GlobalStandardScaling")
        months = np.array([1, 2, 3, 4], np.int32)
        lr_kelvin = (rng.standard_normal((4, LH, LW, 1)) * 3 + 280).astype(np.float32)
        with SamplerService(*stack, batch_size=4, mesh=make_mesh(1),
                            transform_lr=sc_lr.transform,
                            inverse_hr=sc_hr.inverse) as svc:
            sr = svc.super_resolve(lr_kelvin, months)
        norm = sc_lr.transform(lr_kelvin, months)
        expected = sc_hr.inverse(_direct(stack, norm, 0), months)
        np.testing.assert_allclose(sr, expected, atol=1e-4)

    def test_partial_failure_of_split_request_keeps_resolver_alive(self, stack):
        """A request spanning two device batches whose FIRST batch fails:
        the future carries the error, the second batch's resolution must
        not kill the resolver (set_result on a done future), and the
        service keeps serving."""
        calls = {"n": 0}

        def bad_inverse(x, m):
            calls["n"] += 1
            if calls["n"] == 1:
                raise ValueError("first batch explodes")
            return x

        with SamplerService(*stack, batch_size=2, mesh=make_mesh(1),
                            inverse_hr=bad_inverse) as svc:
            fut = svc.submit(_lr(4, seed=11), np.ones(4, np.int32))
            with pytest.raises(ValueError, match="first batch explodes"):
                fut.result(timeout=120)
            sr = svc.submit(_lr(2, seed=12), np.ones(2, np.int32)).result(timeout=120)
        assert sr.shape == (2, H, W, 1)

    def test_error_propagates_and_service_survives(self, stack):
        calls = {"n": 0}

        def bad_inverse(x, m):
            calls["n"] += 1
            if calls["n"] == 1:
                raise ValueError("scaler exploded")
            return x

        with SamplerService(*stack, batch_size=2, mesh=make_mesh(1),
                            inverse_hr=bad_inverse) as svc:
            with pytest.raises(ValueError, match="scaler exploded"):
                svc.super_resolve(_lr(2), np.ones(2, np.int32))
            # next request still works
            sr = svc.super_resolve(_lr(2, seed=5), np.ones(2, np.int32))
        assert sr.shape == (2, H, W, 1)


class TestHTTP:
    @pytest.fixture()
    def server(self, stack):
        svc = SamplerService(*stack, batch_size=2, mesh=make_mesh(1))
        srv = make_server(svc, port=0)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{srv.server_address[1]}", stack
        srv.shutdown()
        svc.close()

    def _post(self, url, payload):
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            return json.loads(r.read())

    def test_healthz_and_stats(self, server):
        url, _ = server
        with urllib.request.urlopen(url + "/healthz") as r:
            assert json.loads(r.read()) == {"ok": True}
        with urllib.request.urlopen(url + "/v1/stats") as r:
            assert json.loads(r.read())["batch_size"] == 2

    def test_super_resolve_json(self, server):
        url, stack_t = server
        lr = _lr(2, seed=7)
        out = self._post(url + "/v1/super_resolve",
                         {"lr": lr.tolist(), "months": [1, 1]})
        sr = np.asarray(out["sr"], np.float32)
        np.testing.assert_allclose(sr, _direct(stack_t, lr, 0), atol=1e-4)

    def test_super_resolve_b64(self, server):
        url, _ = server
        lr = _lr(2, seed=8)
        out = self._post(url + "/v1/super_resolve",
                         {"lr_b64": _b64_encode(lr), "months": [1, 1]})
        sr = _b64_decode(out["sr_b64"])
        assert sr.shape == (2, H, W, 1)

    def test_bad_request_is_400(self, server):
        url, _ = server
        req = urllib.request.Request(
            url + "/v1/super_resolve", data=b'{"months": [1]}')
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400

    def test_submit_validation_error_is_400_not_500(self, server):
        """Client-shape errors surface as 4xx (monitoring treats 5xx as
        server faults): lr of rank 2 parses as JSON but fails submit()."""
        url, _ = server
        req = urllib.request.Request(
            url + "/v1/super_resolve",
            data=json.dumps({"lr": [[1.0]], "months": [1]}).encode())
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400


class TestAOTExport:
    """jax.export artifact (serving/export.py): the serialized program must
    reproduce generate_sr exactly, bake the Kelvin scalers, and serve any
    batch size through the symbolic batch dim — with no model code."""

    def _export(self, stack_t, tmp_path, **kw):
        from srewd_tpu.serving.export import (
            export_sampler, load_sampler, save_sampler,
        )

        model, params, sched = stack_t
        exp = export_sampler(model, params, sched, (LH, LW, 1), **kw)
        path = str(tmp_path / "m.srexport")
        save_sampler(exp, path)
        return load_sampler(path)

    def test_roundtrip_matches_direct_any_batch(self, stack, tmp_path):
        model, params, sched = stack
        fn = self._export(stack, tmp_path)
        for b, seed in ((2, 7), (5, 9)):
            lr = _lr(b, seed=b)
            sr = np.asarray(fn(lr, seed=seed))
            direct = np.asarray(model.generate_sr(
                params, {"LR": jnp.asarray(lr)},
                jax.random.key(jnp.uint32(seed)), sched))
            assert sr.shape == (b, H, W, 1)
            np.testing.assert_allclose(sr, direct, atol=1e-5)

    def test_kelvin_scalers_baked_in(self, stack, tmp_path):
        model, params, sched = stack
        mean = np.zeros((13, 1, 1, 1), np.float32)
        std = np.ones((13, 1, 1, 1), np.float32)
        mean[3], std[3] = 280.0, 12.0
        lr_sc = MonthlyScalerSet(mean, std, "GlobalStandardScaling")
        hr_sc = MonthlyScalerSet(mean + 1.0, std * 2.0, "GlobalStandardScaling")
        fn = self._export(stack, tmp_path, lr_scaler=lr_sc, hr_scaler=hr_sc)
        lr_k = 280.0 + 12.0 * _lr(2, seed=3)
        months = np.full((2,), 3, np.int32)
        sr_k = np.asarray(fn(lr_k, months, seed=1))
        norm = lr_sc.transform(lr_k, months)
        direct = model.generate_sr(
            params, {"LR": jnp.asarray(norm)},
            jax.random.key(jnp.uint32(1)), sched)
        want = hr_sc.inverse(np.asarray(direct), months)
        np.testing.assert_allclose(sr_k, want, atol=1e-3)

    def test_static_batch_export(self, stack, tmp_path):
        fn = self._export(stack, tmp_path, symbolic_batch=False, batch_size=3)
        sr = np.asarray(fn(_lr(3, seed=2), seed=0))
        assert sr.shape == (3, H, W, 1)
        with pytest.raises(Exception):
            fn(_lr(2, seed=2), seed=0)

    def test_keep_every_rejected(self, stack):
        from srewd_tpu.serving.export import export_sampler

        model, params, sched = stack
        with pytest.raises(ValueError, match="keep_every"):
            export_sampler(model, params, sched, (LH, LW, 1),
                           sampler_kwargs={"keep_every": 2})

"""Chain-realistic A/B of the s2d conv rewrite at [8,128,256,64].

The first on-chip A/B showed a paradox: the s2d rewrite measured 1.29x
faster in isolation but REGRESSED end-to-end sampling 2.5x. The isolated
bench closed over the kernel (a jit constant -> the transform
constant-folds), while the real chain passes weights as jit arguments, so
the kernel transform is traced inside the lax.scan body. This script times
a K-iteration conv scan with the kernel as a real ARGUMENT for:

  direct    — plain conv_general_dilated
  s2d       — conv3x3_s2d (transform traced in the body; LICM must hoist)
  s2d-pre   — transform applied once OUTSIDE the scan (upper bound)

plus a null scan for RTT subtraction. Run on TPU.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, H, W, C = 8, 128, 256, 64
ITERS = int(os.environ.get("PROF_ITERS", "200"))


def main():
    import jax
    import jax.numpy as jnp

    from srewd_tpu.ops.s2d_conv import conv3x3_s2d, s2d_kernel

    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), dtype)
    k = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, dtype)

    def timed(body, x, *args):
        @jax.jit
        def run(x0, *a):
            def step(c, _):
                return body(c, *a), ()

            out, _ = jax.lax.scan(step, x0, None, length=ITERS)
            return jnp.sum(out.astype(jnp.float32))

        float(run(x, *args))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x, *args))
            ts.append(time.perf_counter() - t0)
        return min(ts) / ITERS

    null = timed(lambda y: y + 1.0, jnp.zeros((8, 128), jnp.float32))
    print(json.dumps({"variant": "null", "us": round(null * 1e6, 1),
                      "rtt_est_ms": round(null * ITERS * 1e3, 1)}))

    def direct(y, k):
        return jax.lax.conv_general_dilated(
            y, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ).astype(y.dtype)

    def s2d(y, k):
        return conv3x3_s2d(y, k).astype(y.dtype)

    kp = s2d_kernel(k)

    def s2d_pre(y, kp):
        b, h, w, c = y.shape
        yp = y.reshape(b, h, w // 2, 2 * c)
        out = jax.lax.conv_general_dilated(
            yp, kp, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return out.astype(y.dtype).reshape(b, h, w, c)

    for name, body, arg in [("direct", direct, k), ("s2d", s2d, k),
                            ("s2d-pre", s2d_pre, kp)]:
        dt = max(timed(body, x, arg) - null, 1e-9)
        print(json.dumps({"variant": name, "us": round(dt * 1e6, 1)}))

    # every eligible site shape of the real sr3 UNet at 128x256 — the
    # end-to-end A/B regressed even though 64->64 wins, so one of these
    # must be pathological. Bodies map C_out back to C_in via a 1x1 so the
    # scan carry keeps its shape.
    sites = [("stem 2->64", 2, 64), ("trunk 64->64", 64, 64),
             ("upcat 128->64", 128, 64), ("final 64->1", 64, 1)]
    for name, cin, cout in sites:
        xs = jnp.asarray(rng.standard_normal((B, H, W, cin)), dtype)
        ks = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05, dtype)
        back = jnp.asarray(rng.standard_normal((1, 1, cout, cin)) * 0.05, dtype)

        def direct_site(y, ks, back):
            h = jax.lax.conv_general_dilated(
                y, ks, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jax.lax.conv_general_dilated(
                h, back, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(y.dtype)

        def s2d_site(y, ks, back):
            h = conv3x3_s2d(y, ks)
            return jax.lax.conv_general_dilated(
                h, back, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(y.dtype)

        # pad-O variant: fill the 128-wide MXU output tile with a
        # zero-padded kernel, slice the real channels after — the INPUT
        # layout (unlike s2d) is untouched, so no relayout on the read side
        def pado_site(y, ks, back):
            kpad = jnp.pad(ks, ((0, 0), (0, 0), (0, 0), (0, 128 - ks.shape[-1]))) \
                if ks.shape[-1] < 128 else ks
            h = jax.lax.conv_general_dilated(
                y, kpad, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., :ks.shape[-1]]
            return jax.lax.conv_general_dilated(
                h, back, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(y.dtype)

        d0 = max(timed(direct_site, xs, ks, back) - null, 1e-9)
        d1 = max(timed(s2d_site, xs, ks, back) - null, 1e-9)
        d2 = max(timed(pado_site, xs, ks, back) - null, 1e-9)
        print(json.dumps({"site": name, "direct_us": round(d0 * 1e6, 1),
                          "s2d_us": round(d1 * 1e6, 1),
                          "pad_o_us": round(d2 * 1e6, 1)}))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Serve a trained SR diffusion model over HTTP (production inference).

Loads config + checkpoint the same way sample.py does, then keeps the
compiled sampler warm behind a batching service (srewd_tpu/serving):

    python scripts/serve.py -c <cfg>.json -m <checkpoint> --port 8000 \
        [--batch-size 8] [--sampler dpm --ddim-steps 25] [--use-ema]

    curl localhost:8000/healthz
    curl localhost:8000/v1/stats
    curl -X POST localhost:8000/v1/super_resolve \
        -d '{"lr": <[n,lh,lw,1] Kelvin nested list>, "months": [1, ...]}'
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("-m", "--model_path", default=None)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--linger-ms", type=float, default=5.0)
    ap.add_argument("--use-ema", action="store_true")
    ap.add_argument("--sampler", choices=["ddpm", "ddim", "dpm"], default=None)
    ap.add_argument("--ddim-steps", type=int, default=None,
                    help="fast-sampler step count (config default: 50); "
                         "applies even without --sampler")
    ap.add_argument("--ddim-eta", type=float, default=None,
                    help="DDIM stochasticity (config default: 0.0); "
                         "applies even without --sampler")
    ap.add_argument("--spacing", default=None,
                    choices=["linspace", "trailing", "quad", "logsnr"],
                    help="fast-sampler timestep spacing (gaussian.select_taus)")
    ap.add_argument("--no-clip-denoised", action="store_true",
                    help="disable the reference's x0 clamp to [-1,1] "
                         "(saturates standard-scaled fields beyond +-1 sigma)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax

        jax.config.update("jax_platforms", args.platform)

    from srewd_tpu.serving import SamplerService
    from srewd_tpu.serving.http import make_server

    overrides = {}
    if args.sampler:
        overrides["sampler"] = args.sampler
    if args.ddim_steps is not None:
        overrides["ddim_steps"] = args.ddim_steps
    if args.ddim_eta is not None:
        overrides["ddim_eta"] = args.ddim_eta
    if args.spacing:
        overrides["tau_spacing"] = args.spacing
    if args.no_clip_denoised:
        overrides["clip_denoised"] = False
    service = SamplerService.from_checkpoint(
        args.config, args.model_path, use_ema=args.use_ema,
        batch_size=args.batch_size, linger_ms=args.linger_ms, seed=args.seed,
        diffusion_overrides=overrides or None,
    )
    server = make_server(service, host=args.host, port=args.port)
    print(f"serving on http://{args.host}:{server.server_address[1]} "
          f"(batch {args.batch_size})", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        service.close()


if __name__ == "__main__":
    main()

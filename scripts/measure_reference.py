"""Measure the PyTorch reference's 1000-step DDPM sampling throughput.

The reference publishes no benchmark numbers (BASELINE.md), so we measure it
ourselves on this host. Only the sr3 family can run here: the resdiff/
phydiff/srdiff UNets import pytorch_wavelets (absent) and hardcode .cuda()
(resdiff/unet.py:128-130) — unrunnable on a CPU-only torch build.

We build the reference's SR3 UNet + SR3Diffusion at the real problem size
(t2m 1ch, 32x64 -> 128x256, inner_channel=64, mults (1,2,4,8,8), attn at 16,
res_blocks=2 — configs/experiment_configs/*train_example.json) and time its
`super_resolution` loop at a reduced T, extrapolating per-step cost to
T=1000 (the loop is T identical sequential UNet calls; per-step cost is
constant, diffusion.py:175-192).

Writes BASELINE_MEASURED.json at the repo root:
  {"reference_fields_per_sec_T1000": ..., "hardware": "cpu", ...}
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/reference")

import torch  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def measure_train_step(batch: int = 4, steps: int = 5):
    """Reference sr3 train step (p_losses fwd + backward + Adam) on CPU."""
    from models.diffusion_models.sr3.sr3_diffusion import SR3Diffusion
    from models.diffusion_models.sr3.unet import UNet

    unet = UNet(in_channel=2, out_channel=1, inner_channel=64, norm_groups=32,
                channel_mults=(1, 2, 4, 8, 8), attn_res=(16,), res_blocks=2,
                dropout=0, image_height=128, image_width=256, image_channels=1)
    diff = SR3Diffusion(unet, channels=1, image_height=128, image_width=256)
    diff.set_loss("cpu")
    diff.set_new_noise_schedule(
        {"schedule": "linear", "n_timestep": 1000,
         "linear_start": 1e-6, "linear_end": 1e-2}, "cpu")
    opt = torch.optim.Adam(diff.parameters(), lr=1e-4)
    x = {"HR": torch.randn(batch, 1, 128, 256),
         "SR": torch.randn(batch, 1, 128, 256)}

    def one_step():
        opt.zero_grad()
        l_pix = diff(x)
        (l_pix.sum() / (batch * 1 * 128 * 256)).backward()
        opt.step()

    one_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    return (time.perf_counter() - t0) / steps


def main(batch: int = 1, t_measure: int = 20, threads: int | None = None):
    if threads:
        torch.set_num_threads(threads)
    from models.diffusion_models.sr3.sr3_diffusion import SR3Diffusion
    from models.diffusion_models.sr3.unet import UNet

    unet = UNet(
        in_channel=2,
        out_channel=1,
        inner_channel=64,
        norm_groups=32,
        channel_mults=(1, 2, 4, 8, 8),
        attn_res=(16,),
        res_blocks=2,
        dropout=0,
        image_height=128,
        image_width=256,
        image_channels=1,
    )
    diff = SR3Diffusion(unet, channels=1, image_height=128, image_width=256)
    diff.set_loss("cpu")
    sched = {"schedule": "linear", "n_timestep": t_measure,
             "linear_start": 1e-6, "linear_end": 1e-2}
    diff.set_new_noise_schedule(sched, "cpu")
    diff.eval()

    x_in = {"SR": torch.randn(batch, 1, 128, 256)}
    with torch.no_grad():
        diff.super_resolution(x_in, continous=False)  # warmup
        t0 = time.perf_counter()
        diff.super_resolution(x_in, continous=False)
        dt = time.perf_counter() - t0

    train_batch = 4
    sec_per_train_step = measure_train_step(train_batch)

    per_step = dt / t_measure
    fields_per_sec_t1000 = batch / (per_step * 1000.0)
    out = {
        "reference_train_steps_per_sec": 1.0 / sec_per_train_step,
        "reference_train_batch": train_batch,
        "reference_fields_per_sec_T1000": fields_per_sec_t1000,
        "reference_sec_per_unet_step": per_step,
        "batch": batch,
        "t_measured": t_measure,
        "arch": "sr3",
        "image": [128, 256],
        "hardware": f"torch-{torch.__version__}-cpu ({torch.get_num_threads()} threads)",
        "note": "reference publishes no numbers; resdiff/phydiff unrunnable "
                "here (pytorch_wavelets + hardcoded .cuda())",
    }
    path = os.path.join(REPO, "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    main(b, t)

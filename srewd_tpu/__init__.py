"""srewd_tpu — TPU-native Super-Resolution Enhancement of Weather Data using
Diffusion Models.

A from-scratch JAX / Flax / Pallas re-design of the capabilities of
jellikus/Super-Resolution-Enhancement-of-Weather-Data-Using-Diffusion-Models
(probabilistic downscaling of WeatherBench climate fields with conditional
diffusion models: SR3, ResDiff, PhyDiff, SRDiff, PhySRDiff).

Layout (TPU-first conventions used throughout):
  - images are NHWC (channels last — native TPU conv layout); the reference
    uses NCHW torch tensors (see /root/reference data contract,
    data/dataset_builder.py:344-382).
  - parameters are float32; compute dtype is configurable (bfloat16 on TPU).
  - the 1000-step DDPM sampling chain is a single jax.lax.scan
    (reference: Python loop of p_sample, models/diffusion_models/diffusion.py:175).
  - data parallelism is SPMD over a jax.sharding.Mesh
    (reference: nn.DataParallel, models/diffusion_models/networks.py:166-168).

Subpackages:
  configs   — commented-JSON experiment configs + experiment dir scaffolding
  data      — WeatherBench npy storage, date-indexed datasets, scalers, pipeline
  ops       — numeric ops: exact-parity bicubic, Haar DWT, SSIM, Pallas kernels
  models    — Flax NHWC model zoo (UNets, SimpleCNN, RRDBNet, attention blocks)
  diffusion — beta schedules, Gaussian diffusion as pure functions, scan sampler
  parallel  — mesh construction and sharding rules
  training  — metrics, train/pretrain/eval loops, checkpointing, visualization
  utils     — logging, seeding, misc
"""

__version__ = "0.1.0"

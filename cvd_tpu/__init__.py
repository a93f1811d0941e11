"""cvd_tpu — TPU-native collaborative video diffusion framework.

A from-scratch JAX/Flax/Pallas re-design of the capabilities of CVD
(Collaborative Video Diffusion: consistent multi-video generation with
camera control, NeurIPS 2024). The compute path is jit-compiled XLA with
Pallas kernels for the epipolar cross-video attention; multi-chip scaling
uses `jax.sharding` meshes rather than process-level data parallelism.

Layering (bottom-up):
  geometry/    pure-function camera & epipolar math (no params)
  schedulers/  DDIM diffusion scheduler
  models/      Flax modules: UNet3D, motion / epi modules, pose encoder,
               VAE, CLIP text encoder
  ops/         attention kernels (XLA reference path + Pallas TPU kernels)
  pipelines/   jitted samplers (simple 2-view, advanced N-view)
  io/          checkpoint import (PyTorch ckpt trees -> Flax params), LoRA
  parallel/    device-mesh / sharding utilities
  train/       training loop, losses, optimizer state
  data/        RealEstate10K datasets (folded-pose trick) and validation
"""

__version__ = "0.1.0"

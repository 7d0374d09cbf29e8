"""VillanDiffusion-TPU: a TPU-native JAX/Flax/Pallas framework for unified
backdoor attacks on diffusion models.

A from-scratch re-design (NOT a port) of the capabilities of
IBM/VillanDiffusion (NeurIPS 2023) for TPU hardware:

- pure-function noise schedules and backdoor R-coefficient ladders
  (host fp64 precompute, device fp32/bf16 constants),
- Flax NHWC UNet2D models (DDPM / NCSN++ configs) with Pallas fused kernels,
- all samplers as `lax.scan` loops compiled by XLA,
- data-parallel training over a `jax.sharding.Mesh` with bf16 compute,
- orbax checkpointing and a CLI surface compatible with the reference.
"""

__version__ = "0.1.0"

from villandiffusion_tpu.core import schedules  # noqa: F401

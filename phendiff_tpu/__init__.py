"""PhenDiff-TPU: a TPU-native diffusion framework for phenotype discovery.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``thethomasboyer/PhenDiff`` (MICCAI 2024, arXiv:2312.08290):

* class-conditional diffusion training (pixel-space conditional DDIM from
  scratch, or SD-2.1 UNet + custom class embedding over a frozen VAE),
* image-to-image class transfer (DDIM inversion / DDIB, CFG forward start,
  reconstruction-guided sampling),
* FID / ISC / KID evaluation with feature caching.

Everything in the compute path is functional JAX: schedulers are pure
functions over precomputed tables, samplers are ``lax.scan`` loops, data
parallelism is a ``jax.sharding.Mesh``, and the hot kernels (attention,
GroupNorm+SiLU) have Pallas TPU implementations.
"""

__version__ = "0.1.0"

from phendiff_tpu.core.scheduler import (  # noqa: F401
    SchedulerConfig,
    NoiseSchedule,
    make_schedule,
)

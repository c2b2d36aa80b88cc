"""tapqir-tpu: TPU-native Bayesian analysis of CoSMoS single-molecule image data.

A ground-up JAX/XLA/Pallas re-design of the capabilities of Tapqir
(Ordabayev et al., eLife 2022;11:e73860): global fitting of stacks of AOI
images to causal generative models (K 2D-Gaussian spots + background + camera
gamma noise + empirical camera offset) by stochastic variational inference,
producing per-frame posterior probabilities p(specific) and credible
intervals for all physical parameters.

Unlike the reference (PyTorch/Pyro/funsor/pykeops, single device), this
implementation is TPU-first:

* discrete latents (z, theta, m) are marginalized by explicit closed-form
  sums written directly into a jit-compiled ELBO (no effect-handler
  enumeration machinery);
* the offset-marginalized Gamma image likelihood is a fused Pallas TPU
  kernel (the reference's pykeops C++/CUDA LogSumExp kernel equivalent);
* the HMM time-chain marginalization is a parallel associative scan
  (``jax.lax.associative_scan``) instead of funsor sum-product programs;
* scaling is via ``jax.sharding.Mesh`` + ``shard_map`` over AOI/frame axes
  with XLA collectives, instead of plate subsampling alone.
"""

__version__ = "0.1.0"

from tapqir_tpu.exceptions import (  # noqa: F401
    TapqirException,
    TapqirFileNotFoundError,
    TpuOutOfMemoryError,
)

"""Pallas TPU kernel for the offset-marginalized Gamma pixel likelihood.

This is the TPU-native equivalent of the reference's pykeops runtime-compiled
C++/CUDA LogSumExp kernel (tapqir/distributions/ksmogn.py:188-221). Stub for
now: raises NotImplementedError so callers fall back to the fused XLA path;
the real kernel lands with the performance milestone.
"""


def offset_gamma_log_prob_pallas(value, concentration, rate, offset_samples, offset_logits):
    raise NotImplementedError("Pallas offset-gamma kernel not yet implemented")

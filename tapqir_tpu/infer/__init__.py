"""Inference machinery: explicit discrete marginalization and SVI helpers.

TPU-native replacement for the reference's L2 layer (tapqir/infer/elbo.py,
tapqir/infer/sum_product.py, tapqir/handlers.py). Instead of effect-handler
enumeration + funsor sum-product programs, the discrete structure
(z, theta, m) is marginalized by explicit closed-form sums written directly
into jit-compiled ELBOs; the HMM time chain uses a parallel associative scan.
"""

from tapqir_tpu.infer.discrete import (  # noqa: F401
    NEG_INF,
    log_probs_m,
    log_probs_theta,
    log_probs_z,
    m_configs,
    safe_log,
)

"""KSMOGN: K-Spots Marginalized Offset Gamma Noise image likelihood.

TPU-native re-design of the reference distribution
(tapqir/distributions/ksmogn.py:21-238). The physics:

    mu^S_ij = m*h / (2 pi w^2) * exp(-((i-x-xt)^2 + (j-y-yt)^2) / (2 w^2))
    mu^I    = b + sum_k mu^S_k            (per-channel image mean)
    p(D)    = sum_delta w_delta * Gamma(D - delta | mu^I / g, 1 / g)

The offset delta is marginalized over an empirical histogram of camera
offset samples. The reference evaluates this with a runtime-compiled
pykeops C++/CUDA LogSumExp kernel (ksmogn.py:188-221) or a torch broadcast
fallback (ksmogn.py:222-236). Here the same math is a fused jnp expression
(XLA fuses the (..., J) broadcast + logsumexp reduction without
materializing) plus a Pallas TPU kernel for the hot path
(tapqir_tpu/ops/offset_gamma.py).
"""

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln, logsumexp

from tapqir_tpu.distributions.util import gaussian_spots

__all__ = [
    "offset_gamma_log_prob",
    "offset_gamma_log_prob_summed",
    "offset_gamma_factored_summed",
    "ksmogn_image",
    "ksmogn_log_prob",
    "KSMOGN",
]


def offset_gamma_log_prob(
    value, concentration, rate, offset_samples, offset_logits, use_pallas=None
):
    r"""Per-pixel log p(value) = log sum_j exp(logits_j) Gamma(value - g_j; a, b).

    Equivalent math to the reference's pykeops formula
    "wj + Log(Step(xi-gj-1)) + (ai-1)*Log(...) - bi*(xi-gj)" plus the
    a*log(b) - lgamma(a) outer terms (tapqir/distributions/ksmogn.py:189-221).

    :param value: (...) observed pixel values.
    :param concentration: (...) Gamma concentration mu/g (broadcasts with value).
    :param rate: scalar or broadcastable Gamma rate 1/g.
    :param offset_samples: (J,) empirical offset bin values.
    :param offset_logits: (J,) normalized log-weights of the bins.
    :param use_pallas: force (True) / forbid (False) the Pallas kernel;
        default auto-selects on TPU.
    :return: (...) log-probability per pixel.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from tapqir_tpu.ops.offset_gamma import offset_gamma_log_prob_pallas

        try:
            return offset_gamma_log_prob_pallas(
                value, concentration, rate, offset_samples, offset_logits
            )
        except NotImplementedError:
            pass
    return _offset_gamma_log_prob_xla(
        value, concentration, rate, offset_samples, offset_logits
    )


def offset_gamma_log_prob_summed(
    value, concentration, rate, offset_samples, offset_logits,
    event_ndims=2, use_pallas=None, ev=None,
):
    """log p summed over the trailing ``event_ndims`` dims, computed in a
    FLAT pixel layout end-to-end.

    Shapes: ``concentration`` is (M,) + batch + event, ``value`` is
    batch + event. Returns (M,) + batch.

    Reshaping the kernel output back to the 6-D (M, n, f, C, P, P) view and
    reducing it afterwards makes XLA materialize several 16-32 MB layout
    copies per step (profiled); summing pixel groups in the flat row-major
    layout avoids all of them.

    With ``ev`` set, the trailing axis is a LANE-PADDED flat event axis
    (a multiple of 128) of which only the first ``ev`` entries are real
    pixels; the rest are masked out of the sum, and the event reduction runs
    INSIDE the Pallas kernel (offset_gamma_summed_pallas) so the whole
    pipeline stays lane-aligned - no XLA relayout loops. Padded VALUE
    entries must exceed every offset sample so their (masked) log-probs stay
    finite; padded concentrations must be positive.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if ev is not None:
        assert event_ndims == 1
        M = concentration.shape[0]
        batch_shape = concentration.shape[1:-1]
        ev_pad = concentration.shape[-1]
        nb = 1
        for d in batch_shape:
            nb *= d
        if use_pallas:
            from tapqir_tpu.ops.offset_gamma import offset_gamma_summed_pallas

            try:
                out = offset_gamma_summed_pallas(
                    value.reshape(nb, ev_pad),
                    concentration.reshape(M, nb, ev_pad),
                    rate, offset_samples, offset_logits, ev,
                )  # (M, nb)
                return out.reshape((M,) + batch_shape)
            except NotImplementedError:
                pass
        mask = (jnp.arange(ev_pad) < ev).astype(concentration.dtype)
        lp = _offset_gamma_log_prob_xla(
            value, concentration, rate, offset_samples, offset_logits
        )
        return (lp * mask).sum(-1)
    M = concentration.shape[0]
    batch_shape = concentration.shape[1 : concentration.ndim - event_ndims]
    ev = 1
    for d in concentration.shape[concentration.ndim - event_ndims :]:
        ev *= d
    nb = 1
    for d in batch_shape:
        nb *= d
    if use_pallas:
        from tapqir_tpu.ops.offset_gamma import offset_gamma_log_prob_pallas

        try:
            flat = offset_gamma_log_prob_pallas(
                jnp.ravel(value),
                concentration.reshape(M, nb * ev),
                rate,
                offset_samples,
                offset_logits,
            )  # (M, nb * ev)
            return flat.reshape(M, nb, ev).sum(-1).reshape((M,) + batch_shape)
        except NotImplementedError:
            pass
    lp = _offset_gamma_log_prob_xla(
        value, concentration, rate, offset_samples, offset_logits
    )
    return lp.sum(tuple(range(-event_ndims, 0)))


def offset_gamma_factored_summed(
    value, base, deltas, mtab, rate, offset_samples, offset_logits,
    ev, use_pallas=None,
):
    """Event-summed offset-Gamma log-pdf over all spot-presence configs,
    with the per-config concentration a_m = base + sum_k mtab[m,k] deltas[k]
    built INSIDE the kernel from additive parts (ops/offset_gamma.py,
    factored variant) — 1 + Kf exponentials per (pixel, offset) instead of
    M = 2^Kf, and no (M, batch, EVP) concentration materialization.

    :param value: batch + (EVP,) lane-padded flat images.
    :param base: batch — per-image base concentration (no spots).
    :param deltas: (Kf,) + batch + (EVP,) per-spot contributions >= 0.
    :param mtab: static (M, Kf) 0/1 array of configs.
    :param ev: number of real pixels (static); the rest of EVP is masked.
    :return: (M,) + batch log-probabilities summed over each image's pixels.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    import numpy as _np

    mtab = _np.asarray(mtab)
    M = mtab.shape[0]
    Kf, batch_shape, ev_pad = deltas.shape[0], deltas.shape[1:-1], deltas.shape[-1]
    nb = 1
    for d in batch_shape:
        nb *= d
    if use_pallas:
        from tapqir_tpu.ops.offset_gamma import (
            offset_gamma_factored_summed_pallas,
        )

        try:
            out = offset_gamma_factored_summed_pallas(
                value.reshape(nb, ev_pad),
                base.reshape(nb),
                deltas.reshape(Kf, nb, ev_pad),
                mtab, rate, offset_samples, offset_logits, ev,
            )  # (M, nb)
            return out.reshape((M,) + batch_shape)
        except NotImplementedError:
            pass
    mt = jnp.asarray(mtab, deltas.dtype)  # (M, Kf)
    conc = base[..., None] + jnp.tensordot(mt, deltas, axes=(1, 0))
    mask = (jnp.arange(ev_pad) < ev).astype(deltas.dtype)
    lp = _offset_gamma_log_prob_xla(
        value, conc, rate, offset_samples, offset_logits
    )
    return (lp * mask).sum(-1)


def _offset_gamma_log_prob_xla(value, concentration, rate, offset_samples, offset_logits):
    """Pure-XLA path; numerical oracle for the Pallas kernel."""
    dtype = jnp.result_type(concentration)
    v = value.astype(dtype)[..., None]  # (..., 1)
    a = concentration[..., None]  # (..., 1)
    d = v - offset_samples.astype(dtype)  # (..., J)
    ok = d > 0
    d_safe = jnp.where(ok, d, 1.0)
    # Gamma log-pdf without the value-independent terms, plus bin weight
    inner = (a - 1.0) * jnp.log(d_safe) - rate * d_safe + offset_logits
    inner = jnp.where(ok, inner, -jnp.inf)
    lse = logsumexp(inner, axis=-1)
    return concentration * jnp.log(rate) - gammaln(concentration) + lse


def ksmogn_image(height, width, x, y, target_locs, background, P, m=None, alpha=None):
    """Expected image mu^I = b + sum_spots (optionally crosstalk-mixed).

    Without crosstalk: inputs batched (..., K), target_locs (..., 2),
    background (...); returns (..., P, P).

    With crosstalk (reference: ksmogn.py:95-106,158-165): inputs batched
    (..., Q, K) over dyes, alpha (Q, C) mixes dye signal into channels,
    target_locs (..., C, 2), background (..., C); returns (..., C, P, P).
    """
    if alpha is None:
        spots = gaussian_spots(height, width, x, y, target_locs, P, m)  # (..., K, P, P)
        return background[..., None, None] + spots.sum(-3)
    # crosstalk: mix per-dye heights into channels by alpha, render, sum dyes
    # height (..., Q, K) x alpha (Q, C) -> (..., Q, C, K)
    h_mixed = height[..., :, None, :] * alpha[..., :, :, None]
    spots = gaussian_spots(
        h_mixed,
        width[..., :, None, :],
        x[..., :, None, :],
        y[..., :, None, :],
        target_locs[..., None, :, :],  # (..., 1, C, 2)
        P,
        None if m is None else m[..., :, None, :],
    )  # (..., Q, C, K, P, P)
    return background[..., None, None] + spots.sum((-5, -3))


def ksmogn_log_prob(
    value,
    height,
    width,
    x,
    y,
    target_locs,
    background,
    gain,
    offset_samples,
    offset_logits,
    P,
    m=None,
    alpha=None,
    use_pallas=None,
):
    """Full image log-likelihood, summed over event dims (P, P) or (C, P, P)."""
    if alpha is None:
        mu = ksmogn_image(height, width, x, y, target_locs, background, P, m)
        event_axes = (-2, -1)
    else:
        # target_locs (..., C, 2) must broadcast against the per-dye K axis
        mu = ksmogn_image(height, width, x, y, target_locs, background, P, m, alpha)
        event_axes = (-3, -2, -1)
    concentration = mu / gain
    rate = 1.0 / gain
    lp = offset_gamma_log_prob(
        value, concentration, rate, offset_samples, offset_logits, use_pallas
    )
    return lp.sum(event_axes)


def ksmogn_sample(
    key,
    height,
    width,
    x,
    y,
    target_locs,
    background,
    gain,
    offset_samples,
    offset_logits,
    P,
    m=None,
    alpha=None,
):
    """Sample images: Gamma(mu/g, 1/g) + categorical offset per pixel.

    (reference: tapqir/distributions/ksmogn.py:171-185)
    """
    mu = ksmogn_image(height, width, x, y, target_locs, background, P, m, alpha)
    concentration = mu / gain
    k_gamma, k_off = jax.random.split(key)
    g = jax.random.gamma(k_gamma, concentration)
    val = jnp.maximum(g * gain, jnp.finfo(g.dtype).tiny)
    odx = jax.random.categorical(k_off, offset_logits, shape=val.shape)
    return val + offset_samples[odx]


@dataclass(frozen=True)
class KSMOGN:
    """Thin stateless wrapper mirroring the reference's distribution object
    API (log_prob / sample / mean), for users migrating from the reference.
    """

    height: jnp.ndarray
    width: jnp.ndarray
    x: jnp.ndarray
    y: jnp.ndarray
    target_locs: jnp.ndarray
    background: jnp.ndarray
    gain: jnp.ndarray
    offset_samples: jnp.ndarray
    offset_logits: jnp.ndarray
    P: int
    m: Optional[jnp.ndarray] = None
    alpha: Optional[jnp.ndarray] = None

    def log_prob(self, value, use_pallas=None):
        return ksmogn_log_prob(
            value,
            self.height,
            self.width,
            self.x,
            self.y,
            self.target_locs,
            self.background,
            self.gain,
            self.offset_samples,
            self.offset_logits,
            self.P,
            self.m,
            self.alpha,
            use_pallas,
        )

    def sample(self, key):
        return ksmogn_sample(
            key,
            self.height,
            self.width,
            self.x,
            self.y,
            self.target_locs,
            self.background,
            self.gain,
            self.offset_samples,
            self.offset_logits,
            self.P,
            self.m,
            self.alpha,
        )

    @property
    def mean(self):
        mu = ksmogn_image(
            self.height,
            self.width,
            self.x,
            self.y,
            self.target_locs,
            self.background,
            self.P,
            self.m,
            self.alpha,
        )
        offset_mean = jnp.sum(self.offset_samples * jnp.exp(self.offset_logits))
        return mu + offset_mean

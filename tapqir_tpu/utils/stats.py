"""Posterior summarization: credible intervals, SNR/chi2, accuracy metrics.

TPU-native port of the reference stats layer (tapqir/utils/stats.py:29-293).
Credible intervals are computed on the host with scipy from the fitted
variational parameters; SNR/chi2 run as a jitted chunked computation over
AOIs instead of the reference's per-AOI Python loop (stats.py:169-183).
"""

import logging
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats as st

from tapqir_tpu.distributions.util import gaussian_spots

logger = logging.getLogger(__name__)

__all__ = ["snr_and_chi2", "save_stats", "ci_from_scipy", "hpdi", "quantile"]


def quantile(samples, q):
    return np.quantile(np.asarray(samples, np.float64), q)


def hpdi(samples, prob):
    """Highest posterior density interval (pyro.ops.stats.hpdi analog)."""
    sorted_ = np.sort(np.asarray(samples, np.float64).ravel())
    n = len(sorted_)
    mass = max(1, int(np.floor(prob * n)))
    widths = sorted_[mass - 1 :] - sorted_[: n - mass + 1]
    start = int(np.argmin(widths))
    return sorted_[start], sorted_[start + mass - 1]


def ci_from_scipy(dist_name, CI, **kw):
    """(Mean, LL, UL) for a guide family (reference: stats.py:262-293 +
    cosmos.py:711-776).

    dist_name in {"gamma", "affine_beta", "dirichlet"}; kwargs are the
    family's constrained parameters.
    """
    if dist_name == "gamma":
        conc, rate = np.asarray(kw["concentration"]), np.asarray(kw["rate"])
        d = st.gamma(conc, scale=1.0 / rate)
        mean = conc / rate
    elif dist_name == "affine_beta":
        mean_p = np.asarray(kw["mean"])
        size = np.asarray(kw["sample_size"])
        low, high = kw["low"], kw["high"]
        c1 = size * (mean_p - low) / (high - low)
        c0 = size * (high - mean_p) / (high - low)
        d = st.beta(a=c1, b=c0, loc=low, scale=high - low)
        mean = mean_p
    elif dist_name == "dirichlet":
        conc = np.asarray(kw["concentration"])
        # per-component Beta marginals (reference: stats.py:280-287)
        d = st.beta(a=conc, b=conc.sum(-1, keepdims=True) - conc)
        mean = conc / conc.sum(-1, keepdims=True)
    else:
        raise NotImplementedError(dist_name)
    LL, UL = d.interval(CI)
    return {
        "Mean": np.asarray(mean),
        "LL": np.asarray(LL),
        "UL": np.asarray(UL),
    }


def snr_and_chi2(
    data, height, width, x, y, target_locs, background, gain,
    offset_mean, offset_var, P, theta_probs,
):
    r"""Signal-to-noise ratio and chi2 statistic per spot/AOI/frame.

    SNR_knf = (signal_knf) / sqrt(offset_var + b_nf * gain), with
    signal = sum_ij (D - b - mu_offset) * N(i, j | x, y, w)
    (reference: tapqir/utils/stats.py:29-86).

    Batched over whole chunks of AOIs; inputs use the (..., K)-last layout:
    height/width/x/y (N, F, Q, K), data (N, F, C, P, P), target_locs
    (N, F, C, 2), background (N, F, C). Returns snr (N, F, C, K) and
    chi2 (N, F, C).
    """
    del theta_probs  # selection applied by the caller, as in the reference
    gaussians = gaussian_spots(height, width, x, y, target_locs, P)  # (N,F,C,K,P,P)
    weights = gaussians / height[..., None, None]
    resid = (data - background[..., None, None] - offset_mean)[..., None, :, :]
    signal = (resid * weights).sum((-2, -1))  # (N, F, C, K)
    noise = jnp.sqrt(offset_var + background * gain)
    snr = signal / noise[..., None]

    img_ideal = background[..., None, None] + gaussians.sum(-3)  # (N, F, C, P, P)
    chi2 = ((data - img_ideal - offset_mean) ** 2 / img_ideal).mean((-2, -1))
    return snr, chi2


def _compute_snr_chi2(model, ci_stats, chunk=64):
    """Chunked whole-dataset SNR / chi2 (replaces reference per-AOI loop)."""
    data = model.data
    K, Q = model.K, model.Q
    height = np.moveaxis(ci_stats["height"]["Mean"], 0, -1)  # (Nt, F, Q, K)
    width = np.moveaxis(ci_stats["width"]["Mean"], 0, -1)
    xm = np.moveaxis(ci_stats["x"]["Mean"], 0, -1)
    ym = np.moveaxis(ci_stats["y"]["Mean"], 0, -1)
    bg = ci_stats["background"]["Mean"]  # (Nt, F, C)
    gain = float(np.asarray(ci_stats["gain"]["Mean"]))

    fn = jax.jit(
        lambda d, h, w, x, y, t, b: snr_and_chi2(
            d, h, w, x, y, t, b, gain,
            data.offset.mean, data.offset.var, data.P, None,
        )
    )
    snr = np.zeros((data.Nt, data.F, Q, K), np.float64)
    chi2 = np.zeros((data.Nt, data.F, Q), np.float64)
    for i in range(0, data.Nt, chunk):
        sl = slice(i, min(i + chunk, data.Nt))
        s, c = fn(
            jnp.asarray(data.images[sl], jnp.float32),
            jnp.asarray(height[sl], jnp.float32),
            jnp.asarray(width[sl], jnp.float32),
            jnp.asarray(xm[sl], jnp.float32),
            jnp.asarray(ym[sl], jnp.float32),
            jnp.asarray(data.xy[sl], jnp.float32),
            jnp.asarray(bg[sl], jnp.float32),
        )
        snr[sl] = np.asarray(s, np.float64)
        chi2[sl] = np.asarray(c, np.float64)
    return np.moveaxis(snr, -1, 0), chi2  # (K, Nt, F, Q), (Nt, F, Q)


def save_stats(model, path, CI=0.95, save_matlab=False):
    """Summary statistics + parameter export (reference: stats.py:89-259)."""
    import pandas as pd

    global_params = model._global_params
    ll_col = f"{int(100 * CI)}% LL"
    ul_col = f"{int(100 * CI)}% UL"
    summary = pd.DataFrame(
        index=global_params,
        columns=["Mean", ll_col, ul_col],
    )

    logger.info("- credible intervals & spot probabilities")
    ci_stats = model.compute_params(CI)

    for param in global_params:
        mean = ci_stats[param]["Mean"]
        if np.ndim(mean) == 0:
            summary.loc[param, "Mean"] = float(mean)
            summary.loc[param, ll_col] = float(ci_stats[param]["LL"])
            summary.loc[param, ul_col] = float(ci_stats[param]["UL"])
        else:
            summary.loc[param, "Mean"] = np.asarray(mean).tolist()
            summary.loc[param, ll_col] = np.asarray(ci_stats[param]["LL"]).tolist()
            summary.loc[param, ul_col] = np.asarray(ci_stats[param]["UL"]).tolist()

    # probabilistic rastergram (skipped under CI env, reference: stats.py:110)
    if path is not None and not os.environ.get("CI", None):
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            for c in range(model.data.C):
                fig, ax = plt.subplots()
                ax.imshow(
                    ci_stats["p_specific"][: model.data.N, :, c][
                        model.data.mask[: model.data.N]
                    ],
                    vmin=0,
                    vmax=1,
                    aspect="auto",
                    interpolation="none",
                )
                ax.set_xlabel("Time (frame)")
                ax.set_ylabel("AOI")
                ax.set_title(f"Channel {c}")
                fig.savefig(
                    Path(path) / f"{model.name}_rastergram-channel{c}.png", dpi=300
                )
                plt.close(fig)
        except Exception as err:  # plotting must never fail the pipeline
            logger.warning(f"rastergram plotting failed: {err}")

    # display ranges (reference: stats.py:130-146)
    theta_mask = ci_stats["theta_probs"] > 0.5
    hmax = (
        np.percentile(ci_stats["height"]["Mean"][theta_mask], 99)
        if theta_mask.sum()
        else 1.0
    )
    ci_stats["height"]["vmin"] = -0.03 * hmax
    ci_stats["height"]["vmax"] = 1.3 * hmax
    ci_stats["width"]["vmin"] = 0.5
    ci_stats["width"]["vmax"] = 2.5
    for p in ("x", "y"):
        ci_stats[p]["vmin"] = -9
        ci_stats[p]["vmax"] = 9
    bmax = np.percentile(np.asarray(ci_stats["background"]["Mean"]).ravel(), 99)
    ci_stats["background"]["vmin"] = -0.03 * bmax
    ci_stats["background"]["vmax"] = 1.3 * bmax

    if model.data.time1 is not None:
        ci_stats["time1"] = model.data.time1
    if model.data.ttb is not None:
        ci_stats["ttb"] = model.data.ttb

    model.params_stats = ci_stats

    logger.info("- SNR and Chi2-test")
    snr, chi2 = _compute_snr_chi2(model, ci_stats)
    for q in range(model.Q):
        sel = ci_stats["theta_probs"][..., q] > 0.5
        snr_masked = snr[..., q][sel]
        summary.loc[f"SNR_{q}", "Mean"] = (
            float(snr_masked.mean()) if snr_masked.size else float("nan")
        )
    cmax = quantile(chi2.ravel(), 0.99)
    ci_stats["chi2"] = {"values": chi2, "vmin": -0.03 * cmax, "vmax": 1.3 * cmax}

    # classification metrics vs ground-truth labels (reference: stats.py:194-226)
    if model.data.labels is not None:
        from sklearn.metrics import (
            confusion_matrix,
            matthews_corrcoef,
            precision_score,
            recall_score,
        )

        pred_labels = np.asarray(model.z_map)[model.data.is_ontarget].ravel()
        true_labels = model.data.labels["z"][: model.data.N].ravel()
        with np.errstate(divide="ignore", invalid="ignore"):
            summary.loc["MCC", "Mean"] = matthews_corrcoef(true_labels, pred_labels)
        summary.loc["Recall", "Mean"] = recall_score(
            true_labels, pred_labels, zero_division=0
        )
        summary.loc["Precision", "Mean"] = precision_score(
            true_labels, pred_labels, zero_division=0
        )
        (
            summary.loc["TN", "Mean"],
            summary.loc["FP", "Mean"],
            summary.loc["FN", "Mean"],
            summary.loc["TP", "Mean"],
        ) = confusion_matrix(true_labels, pred_labels, labels=(0, 1)).ravel()

        lbl_mask = model.data.labels["z"][: model.data.N] > 0
        z_arg = np.argmax(
            np.asarray(model.z_probs)[model.data.is_ontarget], axis=-1
        )
        samples = z_arg[lbl_mask]
        if len(samples):
            z_ll, z_ul = hpdi(samples, CI)
            summary.loc["p(specific)", "Mean"] = float(quantile(samples, 0.5))
            summary.loc["p(specific)", ll_col] = float(z_ll)
            summary.loc["p(specific)", ul_col] = float(z_ul)
        else:
            summary.loc["p(specific)", "Mean"] = 0.0
            summary.loc["p(specific)", ll_col] = 0.0
            summary.loc["p(specific)", ul_col] = 0.0

    model.summary = summary

    if path is not None:
        path = Path(path)
        param_path = path / f"{model.name}_params.tpqr"
        flat = {}
        for param, field in ci_stats.items():
            if isinstance(field, dict):
                for stat, value in field.items():
                    flat[f"{param}/{stat}"] = np.asarray(value)
            else:
                flat[param] = np.asarray(field)
        with open(param_path, "wb") as f:
            np.savez_compressed(f, **flat)
        logger.info(f"Parameters were saved in {param_path}")
        if save_matlab:
            from scipy.io import savemat

            mat = {k.replace("/", "_"): v for k, v in flat.items()}
            savemat(path / f"{model.name}_params.mat", mat)
            logger.info(f"Matlab parameters were saved in {model.name}_params.mat")
        summary.to_csv(path / f"{model.name}_summary.csv")
        logger.info(f"Summary statistics were saved in {model.name}_summary.csv")
    return summary

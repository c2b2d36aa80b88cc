"""Model base class: SVI lifecycle on TPU.

TPU-native re-design of the reference's Model base
(tapqir/models/model.py:31-371). The train loop is a jit-compiled
``lax.scan`` over checkpoint-interval chunks (200 steps per host round-trip)
instead of one Python-dispatched step per iteration; parameters are a flat
dict of unconstrained arrays optimized by optax Adam, mirroring pyro.param's
``transform_to`` semantics.

Retained reference behaviors:

* checkpoint every 200 iterations with rolling-window convergence test
  std(last 100 ckpts) / std(last 50 ckpts) < 1.05 on -ELBO and conv_params
  (reference: model.py:262-270);
* NaN parameters -> reload last checkpoint, reseed RNG, continue
  (reference: model.py:220-232, 246-250);
* device OOM -> typed exception with batch-size advice (model.py:233-235).
"""

import json
import logging
import random
from functools import partial
from pathlib import Path
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tapqir_tpu import __version__ as tapqir_version
from tapqir_tpu.exceptions import TapqirFileNotFoundError, TpuOutOfMemoryError
from tapqir_tpu.utils.dataset import load as load_dataset

logger = logging.getLogger(__name__)

CHECKPOINT_INTERVAL = 200  # reference: model.py:213-214
MAX_CONSECUTIVE_RESTARTS = 10  # NaN -> reload+reseed attempts before failing


def _fwin(sub, f0, f_b, axis):
    """Cyclic contiguous window of ``f_b`` frames starting at traced offset
    ``f0`` along ``axis`` - concat+dynamic-slice, all static shapes."""
    ext = jnp.concatenate(
        [sub, jax.lax.slice_in_dim(sub, 0, f_b, axis=axis)], axis=axis
    )
    return jax.lax.dynamic_slice_in_dim(ext, f0, f_b, axis=axis)


def _fsel(rows, f0, f_b, axis):
    """Frame selection along ``axis``: a cyclic contiguous window when ``f0``
    is a scalar offset, or an arbitrary (sorted) index gather when ``f0`` is
    an index array (``frame_sampling="random"``: independent subsets, the
    reference's sampling scheme — tapqir/models/cosmos.py:202-207)."""
    if jnp.ndim(f0) == 0:
        return _fwin(rows, f0, f_b, axis)
    return jnp.take(rows, f0, axis)


def _unfsel(rows, win, f0, axis):
    """Inverse of :func:`_fsel`: splice an updated frame window back into the
    full-frame ``rows``."""
    if jnp.ndim(f0) == 0:
        return _unfwin(rows, win, f0, axis)
    idx = (slice(None),) * axis + (f0,)
    return rows.at[idx].set(win, unique_indices=True)


def _unfwin(rows, win, f0, axis):
    """Inverse of :func:`_fwin`: splice an updated cyclic window back into
    the full-frame ``rows``, without data-dependent branching.

    Extend rows by ``f_b`` frames, dynamic-update-slice the window at
    ``f0`` (no wraparound in extended coordinates), then fold the tail back
    onto the front: tail position ``g`` holds the updated value for global
    frame ``g`` exactly when the window wrapped past it
    (``g < f0 + f_b - F``)."""
    F_l = rows.shape[axis]
    f_b = win.shape[axis]
    if f_b == F_l:
        return win
    ext = jnp.concatenate(
        [rows, jax.lax.slice_in_dim(rows, 0, f_b, axis=axis)], axis=axis
    )
    ext = jax.lax.dynamic_update_slice_in_dim(ext, win, f0, axis=axis)
    head = jax.lax.slice_in_dim(ext, 0, F_l, axis=axis)
    tail = jax.lax.slice_in_dim(ext, F_l, F_l + f_b, axis=axis)
    wrapped = jnp.arange(f_b) < (f0 + f_b - F_l)
    vshape = (1,) * axis + (f_b,) + (1,) * (rows.ndim - axis - 1)
    front = jnp.where(
        wrapped.reshape(vshape),
        tail,
        jax.lax.slice_in_dim(head, 0, f_b, axis=axis),
    )
    return jnp.concatenate(
        [front, jax.lax.slice_in_dim(head, f_b, F_l, axis=axis)], axis=axis
    )


def _default_progress(it):
    try:
        from tqdm import tqdm

        return tqdm(it)
    except ImportError:  # pragma: no cover
        return it


# bfloat16 is deliberately NOT offered: the likelihood is dominated by
# log/exp/lgamma transcendentals on the VPU (no MXU matmuls to speed up) and
# bf16's 8-bit mantissa is numerically poor for the logsumexp accumulations,
# so a bf16 fit would silently be both slower-to-converge and less accurate.
_DTYPES = {
    "float": jnp.float32,
    "float32": jnp.float32,
    "single": jnp.float32,
    "double": jnp.float64,
    "float64": jnp.float64,
}


class Model:
    """Base class for tapqir-tpu models.

    Derived models must implement:

    * :meth:`param_spec` - variational parameter shapes/inits/transforms
    * :meth:`elbo` - the marginalized ELBO for one random minibatch
    * :meth:`compute_probs_arrays` - posterior z/theta probabilities
    """

    name = "base"

    def __init__(
        self,
        S: int = 1,
        K: int = 2,
        Q: Optional[int] = None,
        device: Optional[str] = None,
        dtype: str = "float32",
        use_pallas: Optional[bool] = None,
        priors: Optional[dict] = None,
        vectorized: bool = True,
    ):
        self.S = S
        self.K = K
        self._Q = Q
        self.priors = dict(priors or {})
        self.use_pallas = use_pallas
        self.vectorized = vectorized
        self.nbatch_size = None
        self.fbatch_size = None
        # minibatch-sparse Adam (reference semantics: pyro only steps the
        # params in the trace); False falls back to dense optax.adam
        self.sparse_adam = True
        # frame minibatch scheme: "random" draws an independent uniform
        # frame subset per step (the reference's sampling,
        # tapqir/models/cosmos.py:202-207); "window" uses a cyclic
        # contiguous window at a random offset (cheaper gather/scatter,
        # temporally correlated batches). Both are unbiased.
        self.frame_sampling = "random"
        self.n = None  # fixed AOI subset (plotting/stats), as in the reference
        self.f = None
        self.data_path = None
        self.path = None
        self.run_path = None
        if dtype not in _DTYPES:
            raise ValueError(
                f"unsupported dtype {dtype!r}; choose from {sorted(_DTYPES)}"
            )
        self.dtype = _DTYPES[dtype]
        if self.dtype == jnp.float64 and not jax.config.jax_enable_x64:
            # the reference fits in double precision (main.py:428,542); x64
            # must be switched on or float64 arrays silently become float32
            jax.config.update("jax_enable_x64", True)
        if device == "cpu":
            self.device = jax.devices("cpu")[0]
        elif device in ("tpu", "cuda", "gpu"):
            self.device = jax.devices()[0]
        else:
            self.device = None  # default placement

    # -- data ----------------------------------------------------------------
    @property
    def Q(self):
        return self._Q or self.data.C

    def load(self, path: Union[str, Path], data_only: bool = True) -> None:
        """Load data (and optionally saved fit results) from an analysis folder."""
        self.path = Path(path)
        self.run_path = self.path / ".tapqir"
        self.data = load_dataset(self.path)
        logger.debug(f"Loaded data from {self.path / 'data.tpqr'}")
        if not data_only:
            params_path = self.path / f"{self.name}_params.tpqr"
            if not params_path.exists():
                raise TapqirFileNotFoundError("parameter", params_path)
            with np.load(params_path, allow_pickle=True) as z:
                self.params_stats = {k: z[k] for k in z.files}
            import pandas as pd

            summary_path = self.path / f"{self.name}_summary.csv"
            if not summary_path.exists():
                raise TapqirFileNotFoundError("summary", summary_path)
            self.summary = pd.read_csv(summary_path, index_col=0)

    def _device_image_stack(self):
        """Lane-padded flat device stack (Nt, F, C, EVP = ceil(P*P/128)*128).

        Every model feeds the in-kernel-reduced likelihood
        (offset_gamma_summed_pallas), which consumes flat pixel rows whose
        trailing axis is a multiple of 128 lanes; building that layout once
        on the host means the per-step batch extraction is a plain row
        gather (+ a frame dynamic-slice for the windowed models) with zero
        XLA relayouts. Padded pixels hold offset.max + 1 so their
        (masked-out) Gamma log-probs stay finite."""
        d = self.data
        Nt, F, C, P = d.Nt, d.F, d.C, d.P
        ev = P * P
        ev_pad = -(-ev // 128) * 128
        imgs = np.asarray(d.images, np.float64).reshape(Nt, F, C, ev)
        if ev_pad > ev:
            pad_val = float(np.max(np.asarray(d.offset.samples))) + 1.0
            imgs = np.concatenate(
                [imgs, np.full((Nt, F, C, ev_pad - ev), pad_val)], axis=-1
            )
        return imgs

    def _data_device_arrays(self):
        """Device-resident dataset arrays."""
        d = self.data
        dt = self.dtype
        arrays = dict(
            images=jnp.asarray(self._device_image_stack(), dt),
            xy=jnp.asarray(d.xy, dt),
            is_ontarget=jnp.asarray(d.is_ontarget, jnp.int32),
            mask=jnp.asarray(d.mask, dt),
            offset_samples=jnp.asarray(d.offset.samples, dt),
            offset_logits=jnp.asarray(d.offset.logits, dt),
        )
        if self.device is not None:
            arrays = {k: jax.device_put(v, self.device) for k, v in arrays.items()}
        return arrays

    # -- to be provided by subclasses -----------------------------------------
    def param_spec(self) -> dict:
        """name -> (init_constrained_value: np.ndarray, Transform)."""
        raise NotImplementedError

    def elbo(self, pc: dict, key, data: dict):
        """Marginalized ELBO estimate for one random minibatch."""
        raise NotImplementedError

    def compute_probs_arrays(self, num_particles=50, key=None):
        raise NotImplementedError

    # -- parameters -------------------------------------------------------------
    def init_parameters(self):
        spec = self.param_spec()
        self._transforms = {k: t for k, (v, t) in spec.items()}
        self.params = {
            k: jnp.asarray(t.inverse(np.asarray(v, np.float64)), self.dtype)
            for k, (v, t) in spec.items()
        }

    def constrained(self, params=None) -> dict:
        params = self.params if params is None else params
        return {k: self._transforms[k](v) for k, v in params.items()}

    def param(self, name):
        """Constrained value of a variational parameter (pyro.param analog).
        Mesh AOI padding (pad_for_mesh) is sliced off."""
        v = np.asarray(self._transforms[name](self.params[name]))
        return self._unpad_aoi_host({name: v})[name]

    # -- SVI ----------------------------------------------------------------------
    def init(
        self,
        lr: float = 0.005,
        nbatch_size: int = 5,
        fbatch_size: int = 512,
        jit: bool = True,
    ) -> None:
        """Initialize the SVI state (reference: model.py:153-186)."""
        self.lr = lr
        self.nbatch_size = min(nbatch_size, self.data.Nt)
        self.fbatch_size = min(fbatch_size, self.data.F)
        self.tx = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
        self._data_dev = self._data_device_arrays()

        # build transforms regardless (needed to interpret checkpoints)
        spec = self.param_spec()
        self._transforms = {k: t for k, (v, t) in spec.items()}

        ckpt_key = None
        try:
            ckpt_key = self.load_checkpoint()
        except TapqirFileNotFoundError:
            self.init_parameters()
            self.iter = 0
            self.converged = False
            self._rolling = {}
            self.opt_state = self._init_opt_state()

        # resume continues the RNG stream from the checkpoint (a fresh
        # PRNGKey(0) on every resume would replay the same minibatches)
        self._key = ckpt_key if ckpt_key is not None else jax.random.PRNGKey(0)
        self._jit = jit
        self._tb_writer = None
        self._tb_failed = False
        self._build_step()
        if getattr(self, "_mesh", None) is not None:
            # re-shard after a NaN-recovery reload (run() calls init())
            self._apply_mesh()

    def _row_groups(self):
        """Classify parameters by their minibatch row structure, derived from
        :meth:`param_partition`: ``("af", ax)`` for per-AOI-frame parameters
        (axes ``ax``/``ax+1`` are the Nt/F axes), ``("a", ax)`` for per-AOI
        parameters, ``("g", None)`` for globals."""
        groups = {}
        for name, pspec in self.param_partition().items():
            axes = tuple(pspec)
            if "aoi" not in axes:
                groups[name] = ("g", None)
                continue
            ax = axes.index("aoi")
            if "frame" in axes:
                if axes.index("frame") != ax + 1:
                    raise ValueError(
                        f"{name}: frame axis must follow the aoi axis"
                    )
                groups[name] = ("af", ax)
            else:
                groups[name] = ("a", ax)
        return groups

    def _window_spec(self):
        """name -> (aoi_axis, frame_axis or None) for batched parameters,
        derived from :meth:`param_partition`; global parameters are absent."""
        spec = {}
        for name, pspec in self.param_partition().items():
            axes = tuple(pspec)
            if "aoi" not in axes:
                continue
            a_ax = axes.index("aoi")
            f_ax = axes.index("frame") if "frame" in axes else None
            spec[name] = (a_ax, f_ax)
        return spec

    def gather_windows(self, tree, ndx, f0, f_b):
        """Minibatch windows of a parameter-shaped tree: AOI rows ``ndx``
        (x the cyclic ``f_b``-frame window at ``f0`` when frame subsampling
        is active, ``f0 is not None``). Globals pass through unchanged."""
        wspec = self._window_spec()
        out = {}
        for name, v in tree.items():
            if name not in wspec:
                out[name] = v
                continue
            a_ax, f_ax = wspec[name]
            rows = jnp.take(v, ndx, a_ax)
            if f0 is not None and f_ax is not None and f_b != v.shape[f_ax]:
                rows = _fsel(rows, f0, f_b, f_ax)
            out[name] = rows
        return out

    def scatter_windows(self, tree, win, ndx, f0, f_b):
        """Inverse of :meth:`gather_windows`: write updated windows back
        into the full arrays. The row re-gather here CSEs with the forward
        gather; the write is one n-row scatter per parameter."""
        wspec = self._window_spec()
        out = {}
        for name, v in tree.items():
            if name not in wspec:
                out[name] = win[name]
                continue
            a_ax, f_ax = wspec[name]
            w = win[name]
            if f0 is not None and f_ax is not None and f_b != v.shape[f_ax]:
                rows = jnp.take(v, ndx, a_ax)
                w = _unfsel(rows, w, f0, f_ax)
            idx = (slice(None),) * a_ax + (ndx,)
            out[name] = v.at[idx].set(w, unique_indices=True)
        return out

    def _init_opt_state(self):
        """Adam state; with sparse updates the bias-correction step count is
        per ROW (see :meth:`_build_step`), kept as one shared array per row
        group in the ScaleByAdamState.count slot."""
        base = self.tx.init(self.params)
        if not getattr(self, "sparse_adam", True):
            return base
        groups = self._row_groups()
        Nt, F = self.data.Nt, self.data.F
        counts = {"g": jnp.zeros((), jnp.int32)}
        if any(k == "a" for k, _ in groups.values()):
            counts["a"] = jnp.zeros((Nt,), jnp.int32)
        if any(k == "af" for k, _ in groups.values()):
            counts["af"] = jnp.zeros((Nt * F,), jnp.int32)
        adam = base[0]._replace(count=counts)
        return (adam,) + tuple(base[1:])

    def _coerce_opt_state(self, opt_state):
        """Convert a plain optax adam state (scalar step count, e.g. produced
        by the restarts/sharded paths) into the sparse per-row-count format;
        filling every row count with the global count is exact for rows that
        were stepped every iteration and only perturbs the (1 - beta^t) bias
        correction - negligible beyond the first few hundred steps."""
        if not getattr(self, "sparse_adam", True):
            return opt_state
        adam = opt_state[0]
        if isinstance(adam.count, dict):
            return opt_state
        fresh = self._init_opt_state()[0]
        counts = {
            k: jnp.full_like(v, adam.count.astype(jnp.int32))
            for k, v in fresh.count.items()
        }
        return (adam._replace(count=counts),) + tuple(opt_state[1:])

    def _build_step(self):

        # data must be an explicit jit argument (NOT a closure constant): a
        # closed-over dataset would be embedded into the HLO as literal
        # constants - hundreds of MB at production scale.
        sparse = getattr(self, "sparse_adam", True)
        b1, b2, eps = 0.9, 0.999, 1e-8
        lr = self.lr
        groups = self._row_groups() if sparse else None

        def loss_fn(params_u, key, data):
            return -self.elbo(params_u, key, data)

        def adam_math(g, mu, nu, p, t):
            """One Adam update on the given (sub)arrays; ``t`` broadcasts."""
            mu = b1 * mu + (1.0 - b1) * g
            nu = b2 * nu + (1.0 - b2) * g * g
            t = t.astype(p.dtype)
            mu_hat = mu / (1.0 - b1**t)
            nu_hat = nu / (1.0 - b2**t)
            return mu, nu, p - lr * mu_hat / (jnp.sqrt(nu_hat) + eps)

        def one_step_dense(data, carry, key):
            params_u, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params_u, key, data)
            updates, opt_state = self.tx.update(grads, opt_state)
            params_u = optax.apply_updates(params_u, updates)
            return (params_u, opt_state), loss

        def one_step_sparse(data, carry, key):
            """Minibatch-sparse Adam: only the rows subsampled THIS step move.
            The reference's optimizer has the same semantics (pyro steps
            exactly the params in the trace, i.e. the subsampled plate rows);
            plain dense Adam would keep decaying the momentum of untouched
            rows and drift them. Bias correction uses per-row step counts.

            Implemented in WINDOW space: the batch rows/frames of every
            parameter (and its mu/nu) are gathered with the same
            take + cyclic-window slices the forward pass uses, the gradient
            is taken w.r.t. the gathered windows (so the backward never
            materializes full-size scatter-add gradient arrays), Adam runs
            on the windows, and the results are spliced back with _unfwin +
            one n-row scatter per array. Untouched rows are never read or
            written - ~Nt/n times less optimizer HBM traffic than the
            masked-dense formulation this replaces (which cost ~0.6 ms/step
            of pure bandwidth at eLife scale, profiled round 4). Round 3's
            failed gather/scatter attempt scattered n*f individual
            frame-rows on a flat (Nt*F) view (0.2 ms/param relayouts); the
            window form scatters n whole AOI rows on the native layout."""
            params_u, opt_state = carry
            adam = opt_state[0]
            counts = adam.count
            Nt_l, F_l = data["xy"].shape[0], data["xy"].shape[1]
            ndx, f0, f_b, k_global, k_local = self._draw_batch(key, data)
            win = self.gather_windows(params_u, ndx, f0, f_b)

            def loss_fn_win(w):
                return -self.elbo_from_windows(
                    w, k_global, k_local, ndx, f0, f_b, data
                )

            loss, g_win = jax.value_and_grad(loss_fn_win)(win)
            # Non-finite gradient elements become zero (skip this step for
            # that element). They arise only from numerically degenerate
            # corner states - e.g. an empty frame's h_beta pinned at the
            # exp-transform rail feeds a ~1e-13 Gamma concentration whose
            # log-prob gradients overflow float32 - where the true signal
            # is meaningless anyway; an Inf gradient would otherwise turn
            # the parameter into NaN (p - lr*Inf/sqrt(Inf)) and force a
            # checkpoint rollback (observed every ~8k iters late in the
            # eLife-scale run). The whole-loss finite check in run() still
            # catches genuinely diverging fits.
            g_win = {
                k: jnp.where(jnp.isfinite(g), g, 0.0)
                for k, g in g_win.items()
            }
            mu_win = self.gather_windows(adam.mu, ndx, f0, f_b)
            nu_win = self.gather_windows(adam.nu, ndx, f0, f_b)

            # per-row-group step counts: bump the gathered window rows only
            new_counts = {"g": counts["g"] + 1}
            t_g = new_counts["g"]
            t_win = {}
            if "a" in counts:
                t_a = jnp.take(counts["a"], ndx) + 1
                new_counts["a"] = counts["a"].at[ndx].set(
                    t_a, unique_indices=True
                )
                t_win["a"] = t_a  # (n,)
            if "af" in counts:
                view = counts["af"].reshape(Nt_l, F_l)
                rows = jnp.take(view, ndx, 0)  # (n, F)
                if f_b is not None and f_b != F_l:
                    t_af = _fsel(rows, f0, f_b, 1) + 1
                    rows_new = _unfsel(rows, t_af, f0, 1)
                else:
                    t_af = rows + 1
                    rows_new = t_af
                new_counts["af"] = (
                    view.at[ndx].set(rows_new, unique_indices=True)
                ).reshape(-1)
                t_win["af"] = t_af  # (n, f_b) or (n, F)

            corr = {
                grp: (1.0 - b1 ** t.astype(jnp.float32),
                      1.0 - b2 ** t.astype(jnp.float32))
                for grp, t in t_win.items()
            }
            wspec = self._window_spec()

            p_w, mu_w, nu_w = {}, {}, {}
            for name, p in win.items():
                g, mu, nu = g_win[name], mu_win[name], nu_win[name]
                kind, _ = groups[name]
                if kind == "g":
                    mu_w[name], nu_w[name], p_w[name] = adam_math(
                        g, mu, nu, p, t_g
                    )
                    continue
                a_ax, f_ax = wspec[name]
                c1, c2 = corr[kind]
                bshape = [1] * p.ndim
                bshape[a_ax] = c1.shape[0]
                if kind == "af":
                    bshape[f_ax] = c1.shape[1]
                c1 = c1.reshape(bshape)
                c2 = c2.reshape(bshape)
                mu2 = b1 * mu + (1.0 - b1) * g
                nu2 = b2 * nu + (1.0 - b2) * g * g
                p_w[name] = p - lr * (mu2 / c1) / (jnp.sqrt(nu2 / c2) + eps)
                mu_w[name] = mu2
                nu_w[name] = nu2

            new_p = self.scatter_windows(params_u, p_w, ndx, f0, f_b)
            new_mu = self.scatter_windows(adam.mu, mu_w, ndx, f0, f_b)
            new_nu = self.scatter_windows(adam.nu, nu_w, ndx, f0, f_b)
            adam = adam._replace(count=new_counts, mu=new_mu, nu=new_nu)
            return (new_p, (adam,) + tuple(opt_state[1:])), loss

        one_step = one_step_sparse if sparse else one_step_dense

        def run_chunk_fn(params_u, opt_state, key, data, nsteps):
            keys = jax.random.split(key, nsteps)
            (params_u, opt_state), losses = jax.lax.scan(
                partial(one_step, data), (params_u, opt_state), keys
            )
            return params_u, opt_state, losses

        if self._jit:
            run_chunk_fn = jax.jit(run_chunk_fn, static_argnums=(4,))

        def run_chunk(params_u, opt_state, key, nsteps):
            return run_chunk_fn(params_u, opt_state, key, self._data_dev, nsteps)

        self._run_chunk = run_chunk

    # -- multi-chip ------------------------------------------------------------
    def mesh_aoi_padding(self, mesh) -> int:
        """Padded AOI count for the mesh's "aoi" axis (next multiple)."""
        n_aoi = int(mesh.shape["aoi"])
        Nt = self.data.Nt
        return -(-Nt // n_aoi) * n_aoi

    def pad_for_mesh(self, mesh) -> None:
        """Pad the AOI axis of params/optimizer/data with masked dead rows
        so ANY dataset shape can shard over the mesh (real DatasetA has a
        prime 857 AOIs — reference tutorial part_ii:76,102-103).

        Dead rows carry ``mask = 0``, which multiplies every per-AOI ELBO
        term (likelihood, priors, chain) to exactly zero — they cost a
        slice of batch slots but contribute no gradient and no bias (the
        plate scale Nt_pad/n is exact for the population including dead
        rows). Dead images hold offset.max + 1 so their (masked) Gamma
        log-probs stay finite; dead params replicate the last real row.
        Idempotent; :meth:`save_checkpoint` slices the padding back off so
        checkpoints stay interchangeable with single-device runs. The frame
        axis is NOT padded (the hmm chain and the sequence-parallel scan
        give dead frames nonzero chain terms); explicit AxB meshes must
        divide F."""
        Nt = self.data.Nt
        Nt_pad = self.mesh_aoi_padding(mesh)
        n_frame = int(mesh.shape["frame"])
        if self.data.F % n_frame:
            raise ValueError(
                f"mesh frame axis {n_frame} must divide F={self.data.F} "
                "(the frame axis is not padded); use an AOI-only mesh"
            )
        if Nt_pad == Nt:
            return
        pad = Nt_pad - Nt
        wspec = self._window_spec()

        def pad_edge(v, ax):
            if v.shape[ax] != Nt:  # already padded
                return v
            cfg = [(0, 0)] * v.ndim
            cfg[ax] = (0, pad)
            return jnp.pad(v, cfg, mode="edge")

        def pad_tree(tree):
            return {
                k: pad_edge(v, wspec[k][0]) if k in wspec else v
                for k, v in tree.items()
            }

        self.params = pad_tree(self.params)
        adam = self.opt_state[0]
        counts = adam.count
        if isinstance(counts, dict):  # sparse per-row counts
            new_counts = dict(counts)
            if "a" in counts and counts["a"].shape[0] == Nt:
                new_counts["a"] = jnp.pad(counts["a"], (0, pad))
            if "af" in counts and counts["af"].shape[0] == Nt * self.data.F:
                new_counts["af"] = jnp.pad(
                    counts["af"], (0, pad * self.data.F)
                )
            counts = new_counts
        adam = adam._replace(
            count=counts, mu=pad_tree(adam.mu), nu=pad_tree(adam.nu)
        )
        self.opt_state = (adam,) + tuple(self.opt_state[1:])

        d = self._data_dev
        pad_val = jnp.max(d["offset_samples"]) + 1.0
        imgs = d["images"]
        self._data_dev = dict(
            d,
            images=jnp.concatenate(
                [imgs, jnp.full((pad,) + imgs.shape[1:], pad_val,
                                imgs.dtype)], 0
            ),
            xy=jnp.pad(d["xy"], [(0, pad)] + [(0, 0)] * (d["xy"].ndim - 1),
                       mode="edge"),
            is_ontarget=jnp.pad(d["is_ontarget"], (0, pad)),
            mask=jnp.pad(d["mask"], (0, pad)),  # zeros: dead rows
        )
        self._aoi_pad = pad
        logger.info(
            f"Padded {Nt} AOIs with {pad} masked dead rows for the "
            f"{dict(mesh.shape)} mesh"
        )

    def _unpad_aoi_host(self, tree):
        """Slice mesh AOI padding off a host-side parameter-shaped tree."""
        if not getattr(self, "_aoi_pad", 0):
            return tree
        Nt = self.data.Nt
        wspec = self._window_spec()
        out = {}
        for k, v in tree.items():
            if k in wspec:
                ax = wspec[k][0]
                if v.shape[ax] > Nt:
                    sl = [slice(None)] * v.ndim
                    sl[ax] = slice(0, Nt)
                    v = v[tuple(sl)]
            out[k] = v
        return out

    def use_mesh(self, mesh) -> None:
        """Route training through an ("aoi", "frame") device mesh.

        Shards the dataset and the per-AOI/per-frame variational parameters
        (per :meth:`param_partition`) over the mesh, swaps ``_run_chunk``
        for the shard_map'd step (parallel/sharding.py), and switches the
        optimizer to the dense optax-Adam state the sharded step uses
        (checkpoints stay interchangeable: ``load_checkpoint`` +
        ``_coerce_opt_state`` read either format). Everything else -
        ``run``'s convergence loop, checkpointing, NaN recovery - is
        unchanged; ``jax.device_get`` gathers sharded arrays transparently.
        Call after :meth:`init`; survives the NaN reload path (``init``
        re-applies the mesh)."""
        self._mesh = mesh
        self._apply_mesh()

    def _apply_mesh(self):
        from tapqir_tpu.parallel.sharding import (
            make_sharded_train_fn,
            shard_params_and_data,
        )

        mesh = self._mesh
        self.pad_for_mesh(mesh)
        # the sharded step updates with plain optax Adam (scalar count)
        self.sparse_adam = False
        param_specs = self.param_partition()
        self.params, self._data_dev = shard_params_and_data(
            mesh, self.params, param_specs, self._data_dev
        )
        adam_old = self.opt_state[0]
        count = (
            adam_old.count["g"]
            if isinstance(adam_old.count, dict)
            else adam_old.count
        )
        from jax.sharding import NamedSharding

        def put(tree):
            return {
                k: jax.device_put(v, NamedSharding(mesh, param_specs[k]))
                for k, v in tree.items()
            }

        base = self.tx.init(self.params)
        self.opt_state = (
            base[0]._replace(
                count=jnp.asarray(count),
                mu=put(adam_old.mu),
                nu=put(adam_old.nu),
            ),
        ) + tuple(base[1:])

        sharded_chunk = make_sharded_train_fn(self, mesh, self.tx)

        def run_chunk(params_u, opt_state, key, nsteps):
            return sharded_chunk(
                params_u, opt_state, key, self._data_dev, nsteps
            )

        self._run_chunk = run_chunk

    def run(self, num_iter: int = 0, progress_bar=None) -> None:
        """Run SVI until ``num_iter`` or convergence (reference: model.py:188-237)."""
        use_crit = num_iter == 0
        if use_crit:
            num_iter = 100000

        logger.debug(f"tapqir-tpu version - {tapqir_version}")
        logger.debug(f"Model - {self.name}")
        logger.debug(f"Backend - {jax.default_backend()}")
        logger.debug(f"Floating precision - {self.dtype.__name__}")
        logger.debug(f"Optimizer - Adam, lr {self.lr}")
        logger.debug(f"AOI batch size - {self.nbatch_size}")
        logger.debug(f"Frame batch size - {self.fbatch_size}")

        if progress_bar is None:
            progress_bar = _default_progress
        # a restarts/sharded handoff leaves a plain optax state (scalar
        # step count); the sparse step needs per-row counts
        self.opt_state = self._coerce_opt_state(self.opt_state)
        remaining = num_iter
        pbar = progress_bar(range(num_iter))
        pbar_iter = iter(pbar)
        consecutive_failures = 0

        full_every = max(1, int(getattr(self, "full_checkpoint_every", 1)))
        n_ckpts = 0
        while remaining > 0:
            chunk = min(
                getattr(self, "checkpoint_interval", CHECKPOINT_INTERVAL),
                remaining,
            )
            try:
                self._key, sub = jax.random.split(self._key)
                params, opt_state, losses = self._run_chunk(
                    self.params, self.opt_state, sub, chunk
                )
                losses = np.asarray(losses)
                if not np.isfinite(losses).all():
                    raise ValueError(
                        f"Iteration #{self.iter}. Detected NaN/Inf loss values"
                    )
                self.params, self.opt_state = params, opt_state
                self.iter += chunk
                remaining -= chunk
                self.iter_loss = float(losses[-1])
                for _ in range(chunk):
                    next(pbar_iter, None)
                if hasattr(pbar, "set_postfix"):
                    pbar.set_postfix({"-ELBO": f"{self.iter_loss:.1f}"})
                n_ckpts += 1
                save_full = (
                    full_every == 1
                    or n_ckpts % full_every == 0
                    or remaining == 0
                )
                self.save_checkpoint(save_full=save_full)
                consecutive_failures = 0
                if use_crit and self.converged:
                    if not save_full:
                        self.save_checkpoint()
                    logger.info(f"Iteration #{self.iter} model converged.")
                    break
            except ValueError as err:
                logger.warning(str(err))
                consecutive_failures += 1
                if consecutive_failures >= MAX_CONSECUTIVE_RESTARTS:
                    # a checkpoint state that NaNs for every reseed will
                    # never recover: fail loudly instead of looping forever
                    raise RuntimeError(
                        f"Iteration #{self.iter}: loss is non-finite after "
                        f"{consecutive_failures} checkpoint-reload restarts; "
                        "the checkpointed state appears numerically "
                        "degenerate. Try a lower learning rate or "
                        "--dtype double."
                    ) from err
                # reload last checkpoint + reseed (reference: model.py:220-232)
                self.init(
                    lr=self.lr,
                    nbatch_size=self.nbatch_size,
                    fbatch_size=self.fbatch_size,
                    jit=self._jit,
                )
                new_seed = random.randint(0, 100)
                self._key = jax.random.PRNGKey(new_seed)
                logger.warning(
                    f"Iteration #{self.iter} restarting with a new seed: {new_seed}."
                )
            except RuntimeError as err:
                if "RESOURCE_EXHAUSTED" in str(err) or "out of memory" in str(err).lower():
                    raise TpuOutOfMemoryError() from err
                raise
        else:
            if use_crit:
                logger.warning(f"Iteration #{self.iter} model has not converged.")

    # -- checkpointing --------------------------------------------------------
    @property
    def _checkpoint_path(self):
        return self.run_path / f"{self.name}_model.tpqr"

    def _small_params(self):
        """Names of scalar/small constrained params worth logging per ckpt."""
        names = []
        for name in self._transforms:
            shp = jnp.shape(self.params[name])
            if len(shp) == 0 or (len(shp) == 1 and shp[0] <= self.Q * 2):
                names.append(name)
        return names

    def save_checkpoint(self, writer=None, save_full=True):
        """Checkpoint params + optimizer + convergence state
        (reference: model.py:239-323).

        Everything needed on the host - the finite-check verdict, small
        constrained params for the convergence series, and the full
        unconstrained state - is fetched in ONE batched device_get: per-array
        transfers pay a round-trip each over remote-device transports.

        ``save_full=False`` runs only the cheap part (finite check, rolling
        convergence series, metrics log) and skips the full-state fetch +
        npz write - at production scale the full unconstrained state is
        tens of MB, which costs seconds per checkpoint through a remote
        device transport (axon tunnel: ~15 MB/s). ``Model.run`` passes this
        per ``model.full_checkpoint_every`` and always writes a full
        checkpoint at convergence/completion."""
        small = self._small_params()
        adam_state = self.opt_state[0]
        finite = jnp.array(
            [jnp.isfinite(v).all() for v in self.params.values()]
        )
        if save_full:
            host = jax.device_get(
                (
                    finite,
                    {n: self._transforms[n](self.params[n]) for n in small},
                    self.params,
                    adam_state.mu,
                    adam_state.nu,
                    adam_state.count,
                )
            )
            finite_h, small_h, params_h, mu_h, nu_h, count_h = host
            # mesh AOI padding stays a device-side artifact: checkpoints
            # written at real dataset size stay interchangeable with
            # single-device runs (pad_for_mesh re-pads on reload)
            params_h = self._unpad_aoi_host(params_h)
            mu_h = self._unpad_aoi_host(mu_h)
            nu_h = self._unpad_aoi_host(nu_h)
        else:
            finite_h, small_h = jax.device_get(
                (finite, {n: self._transforms[n](self.params[n]) for n in small})
            )

        # NaN guard (reference: model.py:246-250)
        for ok, k in zip(finite_h, self.params):
            if not bool(ok):
                raise ValueError(
                    f"Iteration #{self.iter}. Detected NaN values in {k}"
                )

        # update rolling convergence series (constrained values, as pyro does)
        rolling_max = 100
        for name in self.conv_params:
            if name == "-ELBO":
                self._rolling.setdefault("-ELBO", []).append(float(self.iter_loss))
            else:
                val = np.asarray(small_h[name])
                if val.ndim == 1:
                    for i in range(len(val)):
                        self._rolling.setdefault(f"{name}_{i}", []).append(
                            float(val[i])
                        )
                else:
                    self._rolling.setdefault(name, []).append(float(val))
        for k in self._rolling:
            self._rolling[k] = self._rolling[k][-rolling_max:]

        # convergence criterion (reference: model.py:262-270)
        self.converged = False
        if len(self._rolling["-ELBO"]) == rolling_max:
            crit = all(
                np.std(v, ddof=1) / np.std(v[-50:], ddof=1) < 1.05
                for v in self._rolling.values()
            )
            if crit:
                self.converged = True

        if not save_full:
            self._log_metrics(small_h)
            logger.debug(f"Iteration #{self.iter}: Successful (light ckpt).")
            return

        # serialize
        self.run_path.mkdir(parents=True, exist_ok=True)
        flat = {}
        for k, v in params_h.items():
            flat[f"p::{k}"] = np.asarray(v)
        for k, v in mu_h.items():
            flat[f"mu::{k}"] = np.asarray(v)
        for k, v in nu_h.items():
            flat[f"nu::{k}"] = np.asarray(v)
        if isinstance(count_h, dict):  # sparse Adam: per-row-group counts
            for k, v in count_h.items():
                flat[f"count::{k}"] = np.asarray(v)
        else:
            flat["count"] = np.asarray(count_h)
        flat["rng::key"] = np.asarray(jax.device_get(self._key))
        meta = {
            "iter": self.iter,
            "rolling": self._rolling,
            "convergence_status": bool(self.converged),
            "version": tapqir_version,
        }
        flat["meta"] = np.frombuffer(json.dumps(meta).encode(), np.uint8)
        with open(self._checkpoint_path, "wb") as f:
            np.savez(f, **flat)

        self._log_metrics(small_h)
        logger.debug(f"Iteration #{self.iter}: Successful.")

    def _log_metrics(self, small_h=None):
        """Append scalar metrics to a CSV and (when tensorboard is
        available) TensorBoard (reference: model.py:285-298)."""
        log_dir = self.run_path / "logs" / self.name
        log_dir.mkdir(parents=True, exist_ok=True)
        csv_path = log_dir / "metrics.csv"
        scalars = {"iter": self.iter, "-ELBO": self.iter_loss}
        if small_h is None:
            small_h = jax.device_get(
                {n: self._transforms[n](self.params[n])
                 for n in self._small_params()}
            )
        for name, val in small_h.items():
            val = np.asarray(val)
            if val.ndim == 0:
                scalars[name] = float(val)
            elif val.ndim == 1 and val.size <= self.Q * 2:
                for i, x in enumerate(val.ravel()):
                    scalars[f"{name}_{i}"] = float(x)
        write_header = not csv_path.exists()
        with open(csv_path, "a") as f:
            if write_header:
                f.write(",".join(scalars.keys()) + "\n")
            f.write(",".join(str(v) for v in scalars.values()) + "\n")

        if self._tb_writer is None and not self._tb_failed:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb_writer = SummaryWriter(log_dir=str(log_dir))
            except Exception:
                self._tb_failed = True
        if self._tb_writer is not None:
            for k, v in scalars.items():
                if k != "iter":
                    self._tb_writer.add_scalar(k, v, self.iter)

    def profile_trace(self, num_steps: int = 20, log_dir=None):
        """Capture a jax profiler trace of the training step (SURVEY.md
        section 5.1: the TPU build adds jax.profiler hooks on top of the
        reference's scalar-only logging). View with TensorBoard's profile
        plugin or Perfetto."""
        log_dir = Path(log_dir) if log_dir else self.run_path / "profile"
        log_dir.mkdir(parents=True, exist_ok=True)
        self._key, sub = jax.random.split(self._key)
        # warmup/compile outside the trace
        p, o, losses = self._run_chunk(self.params, self.opt_state, sub, num_steps)
        np.asarray(losses)
        with jax.profiler.trace(str(log_dir)):
            p, o, losses = self._run_chunk(p, o, sub, num_steps)
            np.asarray(losses)
        logger.info(f"Saved a profiler trace of {num_steps} steps in {log_dir}")
        return log_dir

    def load_checkpoint(self, path=None, param_only=False, warnings=False):
        """Load checkpoint (reference: model.py:325-357)."""
        path = Path(path) if path else self.run_path
        model_path = path / f"{self.name}_model.tpqr"
        if not model_path.exists():
            raise TapqirFileNotFoundError("model", model_path)
        with np.load(model_path, allow_pickle=False) as z:
            flat = {k: z[k] for k in z.files}
        meta = json.loads(bytes(flat.pop("meta")).decode())
        ckpt_key = flat.pop("rng::key", None)
        if ckpt_key is not None:
            ckpt_key = jnp.asarray(ckpt_key)
        params = {
            k[3:]: jnp.asarray(v, self.dtype)
            for k, v in flat.items()
            if k.startswith("p::")
        }
        self.params = params
        if not param_only:
            mu = {
                k[4:]: jnp.asarray(v, self.dtype)
                for k, v in flat.items()
                if k.startswith("mu::")
            }
            nu = {
                k[4:]: jnp.asarray(v, self.dtype)
                for k, v in flat.items()
                if k.startswith("nu::")
            }
            base = self._init_opt_state()
            if any(k.startswith("count::") for k in flat):
                count = {
                    k[7:]: jnp.asarray(v)
                    for k, v in flat.items()
                    if k.startswith("count::")
                }
                if not isinstance(base[0].count, dict):  # sparse ckpt, dense run
                    count = count["g"]
            else:
                count = jnp.asarray(flat["count"])
            adam = base[0]._replace(count=count, mu=mu, nu=nu)
            self.opt_state = self._coerce_opt_state(
                (adam,) + tuple(base[1:])
            )
            self.converged = meta["convergence_status"]
            self._rolling = meta["rolling"]
            self.iter = meta["iter"]
            logger.info(
                f"Iteration #{self.iter}. Loaded a model checkpoint from {model_path}"
            )
        if warnings and not meta["convergence_status"]:
            logger.warning(f"Model at {path} has not been fully trained")
        return ckpt_key

    # -- stats -----------------------------------------------------------------
    def compute_stats(self, CI: float = 0.95, save_matlab: bool = False):
        """Compute credible regions and summary statistics
        (reference: model.py:359-371)."""
        from tapqir_tpu.utils.stats import save_stats

        summary = save_stats(self, self.path, CI=CI, save_matlab=save_matlab)
        logger.debug("Computing stats: Successful.")
        return summary

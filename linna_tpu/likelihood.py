"""Batched emulator likelihood — the sampling hot path.

Reference semantics (linna/util.py:953-1051 ``Log_prob``/``Dlnp``/``Ddlnp``):
whitened params -> physical transform -> emulator -> data-space prediction ->
Gaussian (or custom) log-likelihood tempered by 1/T, plus the whitened-space
unit-normal log-prior and optional external likelihood terms; NaN -> -inf.

The reference evaluates this one walker at a time through an MPI pool
(linna/util.py:990, SURVEY §3.2) — the design's central inefficiency.  Here
``make_log_prob`` builds ONE batch-native pure function (W, D) -> (W,): the
whole ensemble's emulator forward is a single stack of MXU matmuls inside the
sampler's jitted chunk, and gradients/Hessians for HMC/NUTS come from
``jax.grad``/``jax.hessian`` straight through it (replacing the reference's
per-row torch autograd loops, linna/util.py:1023-1051).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import nn as N
from . import priors as P
from .transforms import TransformSet

__all__ = ["gaussian_loglike", "make_log_prob", "make_grad_log_prob", "make_hessian_log_prob"]


def gaussian_loglike(m: jax.Array, data: jax.Array, inv_cov: jax.Array) -> jax.Array:
    """-0.5 (m-d)^T C^-1 (m-d), batched over leading axes
    (reference linna/util.py:953-955)."""
    d = m - data
    return -0.5 * jnp.einsum("...i,ij,...j->...", d, inv_cov, d)


def make_log_prob(
    spec: N.ModelSpec,
    params,
    transforms: TransformSet,
    prior_pack: P.PriorPack,
    data: np.ndarray,
    inv_cov: np.ndarray,
    temperature: float = 1.0,
    loglike_fn: Optional[Callable] = None,
    external_loglike: Optional[Callable] = None,
    linearmodel: Optional[Callable] = None,
    ensemble_k_std: float = 1.0,
    use_fused: bool = False,
    compute_dtype: Optional[str] = None,
    out_cut: Optional[int] = None,
) -> Callable[[jax.Array], jax.Array]:
    """Build the batched whitened-space log-posterior.

    ``loglike_fn(m, data, inv_cov)`` may override the Gaussian likelihood
    (reference ``loglikelihoodfunc``); ``external_loglike(x_physical)`` adds
    extra JAX-traceable terms (reference ``externalloglike``,
    linna/util.py:1004-1008) evaluated in physical space.

    ``use_fused=True`` dispatches to the single-kernel Pallas implementation
    (:func:`linna_tpu.ops.fused.fused_log_prob`) when a real TPU backend is
    present and the configuration is the plain single-emulator Gaussian path;
    otherwise it silently falls back to the XLA composition.  Measured on
    v5e (bench_fused.py -> FUSED_BENCH.json): the fused kernel is ~0.9x XLA
    inside sampler chunks and ~1.1x on raw dispatch at 1k-4k walkers, so the
    flag is off by default — XLA wins the production path.

    ``compute_dtype`` (opt-in, e.g. ``"bfloat16"``): run the emulator's
    matmuls in a reduced element type (accumulation stays float32 via
    ``preferred_element_type``; the chi^2/prior arithmetic stays float32).
    Measured verdict (BF16_BENCH.json, v5e, DES 27->457 shape): ~1.00x at
    production walker counts (4k-16k), ~1.1x only at small ensembles
    (256-1k walkers, where chunk launches not the MXU dominate), 1.01-1.06x
    for the K=2/K=4 ensemble likelihood, and noise-band results (0.84-1.03x)
    at the LSST 40->1560 shape — the sampler chunk is not MXU-bound at
    these widths, so the MXU's higher native bf16 rate does not convert to
    wall-clock.  The flag stays available for wider emulators where the
    matmuls do dominate; the rounding costs ~0.4% per-element prediction
    error (O(0.01*ndata) chi^2 perturbation — validate posterior parity
    before production use; the test suite pins parity statistically).

    ``out_cut``: when the checkpoint was trained with a WIDER output than the
    current data vector (a dimension-padded model retrieved via
    ``retrieve_model_exist`` — reference linna/util.py:641-713, whose
    returned ``outcut`` the reference then never applies, a latent shape
    crash at linna/main.py:254-263 + util.py:1014), the first ``out_cut``
    components of the data-space prediction are compared against ``data``;
    the saved y-transforms still run at the checkpoint's full width.

    **Ensemble likelihood** (extension beyond the reference): ``params`` may
    be a list/tuple of K independently trained parameter pytrees.  The
    effective chi^2 is ``mean_k chi2_k + ensemble_k_std * std_k chi2_k`` —
    a conservative combination that suppresses the emulator's "blind
    valleys": in high dimensions MCMC adversarially finds regions where a
    single NN extrapolates flat (measured on a 33-dim Gaussian: emulated
    chi2 ~ 28 at points whose true chi2 is ~1000, posterior 4-5x too wide
    regardless of training budget); disagreement between seeds marks
    exactly those regions (same benchmark with K=4: posterior moments
    accurate to 0.03 sigma).  Only available for the default Gaussian
    likelihood.
    """
    data_j = jnp.asarray(data, jnp.float32)
    inv_cov_j = jnp.asarray(inv_cov, jnp.float32)
    like = loglike_fn if loglike_fn is not None else gaussian_loglike
    temperature = float(temperature)

    is_ensemble = isinstance(params, (list, tuple)) and len(params) > 1
    if isinstance(params, (list, tuple)) and len(params) == 1:
        params = params[0]
    if is_ensemble:
        if loglike_fn is not None:
            raise ValueError("ensemble likelihood requires the default Gaussian loglike")
        stacked = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *params)

    cdtype = jnp.dtype(compute_dtype) if compute_dtype is not None else None
    if cdtype is not None:
        if use_fused:
            raise ValueError("use_fused supports float32 only; drop compute_dtype")
        cast = lambda tree: jax.tree_util.tree_map(
            lambda a: a.astype(cdtype), tree
        )
        if is_ensemble:
            stacked = cast(stacked)
        else:
            params = cast(params)

    if out_cut is not None:
        out_cut = int(out_cut)
        if out_cut > spec.out_size:
            raise ValueError(
                f"out_cut={out_cut} exceeds the model's output size "
                f"{spec.out_size}: the checkpoint cannot produce the "
                "requested data vector"
            )
        if out_cut == spec.out_size:
            out_cut = None  # no-op cut: keep the uncut (cachable) HLO

    if (
        use_fused
        and not is_ensemble
        and loglike_fn is None
        and external_loglike is None
        and linearmodel is None
        and out_cut is None  # the fused kernel computes chi^2 at full width
        # the fused trunk has no 1e-3 linear bypass (chto_v2_linear)
        and not spec.linear_bypass
    ):
        from .ops import fused

        if fused.pallas_available():
            return fused.fused_log_prob(
                spec, params, transforms, prior_pack, data, inv_cov,
                temperature=temperature,
            )

    # The run-dependent arrays (trained weights, fitted transforms, data,
    # covariance, schedule scalars) live in an ``env`` pytree and the
    # computation in a pure ``_pure(x, env)``.  The samplers thread ``env``
    # through their jitted chunk programs as a traced argument (run.py), so
    # the compiled HLO is data-independent: without this every iteration's
    # freshly trained weights embed as HLO literals and the sampler chunk
    # recompiles per iteration per run (~tens of seconds each on a
    # remote-compile device) with zero persistent-cache reuse.
    env = {
        "params": stacked if is_ensemble else params,
        "transforms": transforms,
        "priors": prior_pack,
        "data": data_j,
        "inv_cov": inv_cov_j,
        "temperature": jnp.asarray(temperature, jnp.float32),
        "k_std": jnp.asarray(ensemble_k_std, jnp.float32),
    }

    def _pure(x: jax.Array, env) -> jax.Array:
        tset = env["transforms"]
        x = jnp.asarray(x, jnp.float32)
        x_phys = P.transform(env["priors"], x)
        x_in = tset.x_transform(x_phys)
        if cdtype is not None:
            x_in = x_in.astype(cdtype)
        if is_ensemble:
            def chi2_one(p):
                pred = N.apply_model(spec, p, x_in, linearmodel=linearmodel)
                pred = pred.astype(jnp.float32)
                m = tset.y_data.inverse(tset.y_transform(pred))
                if out_cut is not None:
                    m = m[..., :out_cut]
                d = m - env["data"]
                return jnp.einsum("...i,ij,...j->...", d, env["inv_cov"], d)

            chi2 = jax.vmap(chi2_one)(env["params"])  # (K, ...)
            eff = jnp.mean(chi2, axis=0) + env["k_std"] * jnp.std(chi2, axis=0)
            lp = -0.5 * eff / env["temperature"] + P.lnprior(x)
        else:
            pred_std = N.apply_model(
                spec, env["params"], x_in, linearmodel=linearmodel
            ).astype(jnp.float32)
            # standardized -> sigma-scaled -> raw data space
            # (Predictor.predict's y_transform then Log_prob's
            #  y_invtransform_data, linna/predictor_gpu.py:500 + util.py:1012)
            m = tset.y_data.inverse(tset.y_transform(pred_std))
            if out_cut is not None:
                m = m[..., :out_cut]
            lp = like(m, env["data"], env["inv_cov"]) / env["temperature"]
            lp = lp + P.lnprior(x)
        if external_loglike is not None:
            lp = lp + external_loglike(x_phys)
        return jnp.where(jnp.isnan(lp), -jnp.inf, lp)

    def log_prob(x: jax.Array) -> jax.Array:
        return _pure(x, env)

    log_prob._pure = _pure
    log_prob._env = env
    return log_prob


def make_grad_log_prob(log_prob: Callable) -> Callable:
    """Batched gradient (W, D) -> (W, D) (reference ``Dlnp``,
    linna/util.py:1023-1035, one torch.autograd call per walker)."""
    single = lambda x: jnp.squeeze(log_prob(x[None, :]))
    return jax.vmap(jax.grad(single))


def make_hessian_log_prob(log_prob: Callable) -> Callable:
    """Batched Hessian (W, D) -> (W, D, D) (reference ``Ddlnp``,
    linna/util.py:1037-1051, row-by-row autograd loop)."""
    single = lambda x: jnp.squeeze(log_prob(x[None, :]))
    return jax.vmap(jax.hessian(single))

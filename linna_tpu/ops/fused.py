"""Fused Pallas kernels: emulator forward and full walker likelihood.

Two kernels, both gridded over the walker/batch axis with every weight
matrix resident in VMEM for the whole launch (the production emulator is
~1.3M params ~ 5 MB f32, comfortably under the ~16 MB/core budget):

- ``fused_apply``: the complete ChtoModelv2 trunk (input linear -> three
  residual blocks -> two ReLU linears -> output linear) as ONE kernel — no
  inter-layer HBM round trips.  XLA already fuses elementwise chains into
  matmuls, but it stages each layer's activations through HBM when the
  batch is large; here the (TILE_B, width) activations never leave VMEM.

- ``fused_log_prob``: the whole MCMC hot path per walker — whitened params
  -> prior transform (erf) -> input standardization -> MLP -> output
  destandardization -> sigma scaling -> chi^2 against the data with the
  inverse covariance -> tempered posterior + unit-normal ln prior.  Output
  is ONE f32 per walker: the 457-dim prediction never touches HBM, cutting
  the sampler's memory traffic by ~2 orders of magnitude.

Gradients: both ops carry a ``jax.custom_vjp`` whose backward pass is XLA
autodiff of the pure-jnp reference implementation (recompute-in-backward) —
HMC/NUTS gradients and trainer gradients stay exact.

Shapes need not be 128-aligned: Mosaic pads internally; the host wrapper
pads the walker axis to the batch tile.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn as N
from .. import priors as P

__all__ = ["fused_apply", "fused_log_prob", "pallas_available"]

# Walkers per grid step.  Measured on v5e (27 params -> 457-dim data vector):
# 128 gives the best large-batch throughput (16.1 M evals/s, ~XLA parity at
# the f32 roofline); in-sampler-chunk throughput is tile-insensitive.
#
# Verdict from the committed benchmark (bench_fused.py -> FUSED_BENCH.json,
# v5e, 100-step stretch chunks): the fused kernel is 0.89-0.98x XLA inside
# the sampler chunk at every walker count (128..16384) and 1.09-1.10x on raw
# single-dispatch evaluation at 1k-4k walkers.  XLA already fuses this MLP's
# elementwise chain into its matmuls and pipelines the scan, so the kernel
# buys nothing on the production path — ``use_fused`` therefore defaults to
# False and exists for the raw-dispatch regime and as the Pallas exemplar.
TILE_B = 128


def pallas_available() -> bool:
    """Pallas TPU kernels need a real TPU backend (interpret mode works
    anywhere but is for tests)."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _flatten_params(spec: N.ModelSpec, params):
    """Deterministic flat ordering of the weight arrays for pallas_call."""
    out = [params["layer1"]["w"], params["layer1"]["b"]]
    for rb in ("rb1", "rb2", "rb3"):
        p = params[rb]
        out += [p["lin1"]["w"], p["lin1"]["b"], p["lin2"]["w"], p["lin2"]["b"], p["skip_w"]]
    out += [
        params["layer6"]["w"], params["layer6"]["b"],
        params["layer7"]["w"], params["layer7"]["b"],
        params["layer8"]["w"], params["layer8"]["b"],
    ]
    return [jnp.asarray(a, jnp.float32) for a in out]


_N_WEIGHTS = 2 + 3 * 5 + 6  # layer1 + 3 resblocks + layers 6/7/8


def _erf(x):
    """f32 erf for Pallas (Mosaic has no erf lowering): Abramowitz & Stegun
    7.1.26, max abs error 1.5e-7 ~ f32 epsilon.  VPU ops only (exp, divide)."""
    sign = jnp.where(x < 0.0, -1.0, 1.0)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _trunk(x, w):
    """The MLP stack on VMEM-resident values (shared by both kernels).
    ``w`` is the flat weight list in ``_flatten_params`` order."""
    relu = lambda v: jnp.maximum(v, 0.0)
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    i = 0
    s = relu(dot(x, w[i]) + w[i + 1]); i += 2
    for _ in range(3):
        l1w, l1b, l2w, l2b, skw = w[i : i + 5]; i += 5
        h = relu(dot(s, l1w) + l1b)
        s = relu((dot(h, l2w) + l2b) * 0.1 + dot(s, skw))
    s = relu(dot(s, w[i]) + w[i + 1]); i += 2
    s = relu(dot(s, w[i]) + w[i + 1]); i += 2
    return dot(s, w[i]) + w[i + 1]


def _pad_batch(x, tile):
    b = x.shape[0]
    pad = (-b) % tile
    if pad:
        x = jnp.concatenate([x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])])
    return x, b


# ------------------------------------------------------------- fused forward


def _apply_impl(spec: N.ModelSpec, params, x, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    weights = _flatten_params(spec, params)
    x = jnp.asarray(x, jnp.float32)
    xp, b = _pad_batch(x, TILE_B)
    n_tiles = xp.shape[0] // TILE_B

    def kernel(x_ref, *refs):
        w = [r[:] for r in refs[:_N_WEIGHTS]]
        out_ref = refs[_N_WEIGHTS]
        out_ref[:] = _trunk(x_ref[:], w)

    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((TILE_B, spec.in_size), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [full(a) for a in weights],
        out_specs=pl.BlockSpec((TILE_B, spec.out_size), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], spec.out_size), jnp.float32),
        interpret=interpret,
    )(xp, *weights)
    return out[:b]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 3))
def _fused_apply(spec, params, x, interpret):
    return _apply_impl(spec, params, x, interpret)


def _fused_apply_fwd(spec, params, x, interpret):
    return _apply_impl(spec, params, x, interpret), (params, x)


def _fused_apply_bwd(spec, interpret, res, g):
    params, x = res
    _, vjp = jax.vjp(lambda p, xx: N.apply_model(spec, p, xx), params, x)
    return vjp(g)


_fused_apply.defvjp(_fused_apply_fwd, _fused_apply_bwd)


def fused_apply(spec: N.ModelSpec, params, x, interpret: bool = False):
    """Drop-in for :func:`linna_tpu.nn.apply_model` (no linearmodel) running
    the whole stack as one Pallas kernel."""
    if spec.linear_bypass:
        raise ValueError(
            "fused kernels do not implement chto_v2_linear's 1e-3 linear "
            "bypass; use nn.apply_model (the XLA path) for that spec"
        )
    return _fused_apply(spec, params, x, interpret)


# ---------------------------------------------------------- fused likelihood


def _log_prob_impl(
    spec, params, x, *, prior_args, xt_args, yt_args, data, inv_cov,
    inv_temperature, ypositive, interpret,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    weights = _flatten_params(spec, params)
    is_gauss, p_arg1, p_arg2 = prior_args
    xt_mean, xt_std, xt_log10 = xt_args
    yt_mean, yt_std, sigma = yt_args
    x = jnp.asarray(x, jnp.float32)
    xp, b = _pad_batch(x, TILE_B)
    n_tiles = xp.shape[0] // TILE_B
    sqrt2 = np.sqrt(2.0).astype(np.float32)
    inv_t = jnp.asarray(inv_temperature, jnp.float32).reshape(1, 1)

    def kernel(x_ref, is_gauss_ref, a1_ref, a2_ref, xm_ref, xs_ref, xl_ref,
               ym_ref, ys_ref, sg_ref, data_ref, ic_ref, it_ref, *refs):
        w = [r[:] for r in refs[:_N_WEIGHTS]]
        out_ref = refs[_N_WEIGHTS]
        xw = x_ref[:]  # (TILE_B, D) whitened params

        # prior transform (priors.transform: gauss x*sig+mu; flat via erf)
        u = 0.5 * (1.0 + _erf(xw / sqrt2))
        flat_val = u * (a2_ref[:] - a1_ref[:]) + a1_ref[:]
        gauss_val = xw * a2_ref[:] + a1_ref[:]
        x_phys = jnp.where(is_gauss_ref[:] != 0, gauss_val, flat_val)

        # input standardization with optional log10.  The clamp keeps the
        # kernel's arithmetic finite; reference semantics (log10(x<=0) = NaN
        # -> lp = -inf, the proposal is rejected) are restored by the
        # bad-row mask below.
        log10_lane = xl_ref[:] != 0
        bad = jnp.sum(
            jnp.where(jnp.logical_and(log10_lane, x_phys <= 0.0), 1.0, 0.0),
            axis=-1, keepdims=True,
        ) > 0.0
        x_in = jnp.where(
            log10_lane,
            jnp.log(jnp.maximum(x_phys, 1e-30)) * np.float32(1.0 / np.log(10.0)),
            x_phys,
        )
        x_in = (x_in - xm_ref[:]) / xs_ref[:]

        pred = _trunk(x_in, w)  # (TILE_B, N) standardized output

        # y destandardize -> sigma scale -> chi^2
        m = pred * ys_ref[:] + ym_ref[:]
        if ypositive:
            m = jnp.exp(m)
        m = m * sg_ref[:]
        delta = m - data_ref[:]
        chi2 = jnp.sum(
            jnp.dot(delta, ic_ref[:], preferred_element_type=jnp.float32) * delta,
            axis=-1, keepdims=True,
        )
        lnprior = -0.5 * jnp.sum(xw * xw, axis=-1, keepdims=True)
        lp = -0.5 * chi2 * it_ref[:] + lnprior
        lp = jnp.where(jnp.logical_or(jnp.isnan(lp), bad), -jnp.inf, lp)
        out_ref[:] = lp

    row = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                 memory_space=pltpu.VMEM)
    fixed = [is_gauss, p_arg1, p_arg2, xt_mean, xt_std, xt_log10,
             yt_mean, yt_std, sigma, data, inv_cov, inv_t]
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((TILE_B, spec.in_size), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [row(a) for a in fixed]
        + [row(a) for a in weights],
        out_specs=pl.BlockSpec((TILE_B, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], 1), jnp.float32),
        interpret=interpret,
    )(xp, *fixed, *weights)
    return out[:b, 0]


def fused_log_prob(
    spec: N.ModelSpec,
    params,
    transforms,
    prior_pack: P.PriorPack,
    data,
    inv_cov,
    temperature: float = 1.0,
    interpret: bool = False,
):
    """Build the fully fused batched log-posterior (W, D) -> (W,).

    Semantics match :func:`linna_tpu.likelihood.make_log_prob` with the
    default Gaussian likelihood and no external terms — including
    log10(x<=0) -> lp = -inf.  Gradients come from XLA autodiff of the
    non-fused reference composition (exact, recomputed in backward), for
    BOTH the walkers and the env — so the returned callable carries the same
    ``_pure``/``_env`` decomposition as ``make_log_prob`` and the samplers'
    compiled chunk programs stay weight-independent (no per-iteration
    recompiles; see samplers/run.py _lp_split).
    """
    if spec.linear_bypass:
        raise ValueError(
            "fused_log_prob does not implement chto_v2_linear's 1e-3 linear "
            "bypass; use make_log_prob's XLA path for that spec"
        )
    from .. import likelihood as LK

    reference = LK.make_log_prob(
        spec, params, transforms, prior_pack, np.asarray(data),
        np.asarray(inv_cov), temperature=temperature,
    )
    ref_pure, env = reference._pure, reference._env
    ypositive = bool(transforms.y_transform.ypositive)

    @jax.custom_vjp
    def lp_pure(x, env):
        tset = env["transforms"]
        pk = env["priors"]
        prior_args = (
            jnp.asarray(pk.is_gauss, jnp.int32).reshape(1, -1),
            jnp.asarray(pk.arg1, jnp.float32).reshape(1, -1),
            jnp.asarray(pk.arg2, jnp.float32).reshape(1, -1),
        )
        xt = tset.x_transform
        xt_args = (
            jnp.asarray(xt.mean, jnp.float32).reshape(1, -1),
            jnp.asarray(xt.std, jnp.float32).reshape(1, -1),
            jnp.asarray(xt.log10_mask, jnp.int32).reshape(1, -1),
        )
        yt = tset.y_transform
        yt_args = (
            jnp.asarray(yt.mean, jnp.float32).reshape(1, -1),
            jnp.asarray(yt.std, jnp.float32).reshape(1, -1),
            jnp.asarray(tset.y_data.sigma, jnp.float32).reshape(1, -1),
        )
        return _log_prob_impl(
            spec, env["params"], x,
            prior_args=prior_args, xt_args=xt_args, yt_args=yt_args,
            data=env["data"].reshape(1, -1), inv_cov=env["inv_cov"],
            inv_temperature=1.0 / env["temperature"],
            ypositive=ypositive, interpret=interpret,
        )

    def lp_fwd(x, env):
        return lp_pure(x, env), (x, env)

    def lp_bwd(res, g):
        x, env = res
        _, vjp = jax.vjp(ref_pure, x, env)
        return vjp(g)

    lp_pure.defvjp(lp_fwd, lp_bwd)

    def log_prob(x):
        return lp_pure(x, env)

    log_prob._pure = lp_pure
    log_prob._env = env
    return log_prob

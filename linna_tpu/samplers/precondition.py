"""MAP + Hessian-eigenbasis preconditioning for gradient samplers.

Reference ``calc_hess_mass_mat`` (linna/sampler.py:408-456): find the MAP
(Nelder-Mead then BFGS with the analytic gradient), take the Hessian there,
SVD it, and reparameterize the sampling space by the curvature eigenbasis so
HMC/NUTS run in an approximately unit-mass space; walker starts are drawn
with spread proportional to sqrt(1/eigenvalue).

Here the gradient and Hessian are exact ``jax.grad``/``jax.hessian`` through
the emulator (the reference used row-by-row torch autograd,
linna/util.py:1023-1051); the optimizer runs on host via scipy over the
jitted device functions.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Preconditioner", "calc_hess_mass_mat"]


class Preconditioner(NamedTuple):
    """Affine reparameterization y = sqrt(s) * U^T (x - center)."""

    center: np.ndarray  # f64[D] MAP point (whitened space)
    basis: np.ndarray  # f64[D, D] eigenbasis U (columns)
    scales: np.ndarray  # f64[D] sqrt of clipped Hessian eigenvalues

    def to_sampling(self, x: np.ndarray) -> np.ndarray:
        return (np.asarray(x) - self.center) @ self.basis * self.scales

    def to_original(self, y: np.ndarray) -> np.ndarray:
        return self.center + (np.asarray(y) / self.scales) @ self.basis.T

    def wrap_log_prob(self, log_prob_fn: Callable) -> Callable:
        """Batched log-prob in the preconditioned space (jit/vmap/grad-safe).

        Propagates the likelihood's ``(_pure, _env)`` decomposition (see
        likelihood.make_log_prob): the reparameterization arrays join the
        env so the sampler chunk HLO stays free of run-dependent constants."""
        center = jnp.asarray(self.center, jnp.float32)
        basis = jnp.asarray(self.basis, jnp.float32)
        inv_scales = jnp.asarray(1.0 / self.scales, jnp.float32)

        inner_pure = getattr(log_prob_fn, "_pure", None)
        if inner_pure is None:
            def wrapped(y):
                x = center + (y * inv_scales) @ basis.T
                return log_prob_fn(x)

            return wrapped

        def _pure(y, env):
            x = env["center"] + (y * env["inv_scales"]) @ env["basis"].T
            return inner_pure(x, env["inner"])

        env = {
            "center": center,
            "basis": basis,
            "inv_scales": inv_scales,
            "inner": log_prob_fn._env,
        }

        def wrapped(y):
            return _pure(y, env)

        wrapped._pure = _pure
        wrapped._env = env
        return wrapped

    def draw_x0(self, rng: np.random.Generator, nwalkers: int) -> np.ndarray:
        """Walker starts in sampling space ~ N(0, 1) per coordinate (the
        preconditioned posterior is approximately unit normal; reference
        resamples x0 with spread ~ sqrt(1/m), linna/sampler.py:446-453)."""
        return rng.standard_normal((nwalkers, len(self.center))).astype(np.float32)


def calc_hess_mass_mat(
    log_prob_fn: Callable,
    x0: np.ndarray,
    maxiter: int = 10_000,
    gtol: float = 1.0,
    eig_floor: float = 1e-6,
) -> Preconditioner:
    """MAP find + Hessian eigendecomposition (reference
    linna/sampler.py:408-445)."""
    from scipy import optimize

    x0 = np.asarray(x0, dtype=np.float64).reshape(-1)
    ndim = x0.size

    # the likelihood's (_pure, env) decomposition (likelihood.make_log_prob)
    # keeps the trained weights out of the MAP/Hessian programs' HLO so they
    # persist in the compilation cache across runs/iterations
    pure = getattr(log_prob_fn, "_pure", None)
    env = getattr(log_prob_fn, "_env", None)
    if pure is None:
        pure = lambda x, _env: log_prob_fn(x)

    def single(x, e):
        return jnp.squeeze(pure(jnp.asarray(x, jnp.float32)[None, :], e))

    neg = jax.jit(lambda x, e: -single(x, e))
    neg_grad = jax.jit(jax.grad(lambda x, e: -single(x, e), argnums=0))

    f = lambda x: float(neg(x, env))
    g = lambda x: np.asarray(neg_grad(x, env), dtype=np.float64)

    # Nelder-Mead warm start then gradient polish (reference order)
    res = optimize.minimize(
        f, x0, method="Nelder-Mead", options={"maxiter": min(maxiter, 200 * ndim)}
    )
    res = optimize.minimize(
        f, res.x, jac=g, method="BFGS", options={"maxiter": maxiter, "gtol": gtol}
    )
    center = np.asarray(res.x, dtype=np.float64)

    hess = np.asarray(
        jax.jit(jax.hessian(lambda x, e: -single(x, e), argnums=0))(
            jnp.asarray(center, jnp.float32), env
        ),
        dtype=np.float64,
    )
    hess = 0.5 * (hess + hess.T)
    eigval, eigvec = np.linalg.eigh(hess)
    # directions with non-positive curvature get unit scale (flat/unconstrained)
    floor = max(eig_floor, eig_floor * np.max(np.abs(eigval)))
    eigval = np.where(eigval <= floor, 1.0, eigval)
    return Preconditioner(center, eigvec, np.sqrt(eigval))

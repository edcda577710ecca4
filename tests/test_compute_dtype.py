"""Opt-in reduced-precision (bf16) emulator inference for sampling:
``make_log_prob(..., compute_dtype="bfloat16")`` runs the MLP matmuls at the
MXU's native bf16 rate with float32 accumulation; chi^2/prior arithmetic
stays float32.  Contracts pinned here: value parity within bf16 rounding,
gradient finiteness, statistical posterior parity, and the f32-only fused
kernel rejecting the combination."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from linna_tpu import likelihood as LK
from linna_tpu import nn as N
from linna_tpu import priors as P
from linna_tpu import transforms as T
from linna_tpu.samplers import stretch


def _setup(ndim=3, ndata=5):
    x_t = T.XTransform(jnp.zeros(ndim), jnp.ones(ndim), jnp.zeros(ndim, bool))
    y_t = T.YTransform(jnp.zeros(ndata), jnp.ones(ndata), False)
    y_d = T.YTransformData(jnp.ones(ndata))
    ts = T.TransformSet(x_t, y_t, y_d)
    pack = P.priors_from_list(
        [{"param": "a", "dist": "flat", "arg1": -2.0, "arg2": 2.0}] * ndim
    )
    spec = N.make_model_spec("chto_simple", ndim, ndata)
    data = 0.1 * np.arange(ndata) - 0.2
    inv_cov = np.eye(ndata)
    return spec, ts, pack, data, inv_cov


def test_bf16_value_parity():
    spec, ts, pack, data, inv_cov = _setup()
    params = N.init_model(jax.random.key(1), spec)
    lp32 = LK.make_log_prob(spec, params, ts, pack, data, inv_cov)
    lp16 = LK.make_log_prob(
        spec, params, ts, pack, data, inv_cov, compute_dtype="bfloat16"
    )
    x = jax.random.normal(jax.random.key(3), (64, 3))
    a, b = np.asarray(lp32(x)), np.asarray(lp16(x))
    assert b.dtype == np.float32  # output is always f32
    # bf16 has ~3 significant decimal digits; with f32 accumulation the
    # per-layer rounding stays at the percent level through this small net
    np.testing.assert_allclose(a, b, rtol=0.05, atol=0.05)


def test_bf16_ensemble_and_gradients():
    spec, ts, pack, data, inv_cov = _setup()
    ps = [N.init_model(jax.random.key(k), spec) for k in range(2)]
    lp16 = LK.make_log_prob(
        spec, ps, ts, pack, data, inv_cov, compute_dtype="bfloat16"
    )
    x = jax.random.normal(jax.random.key(5), (8, 3))
    assert np.all(np.isfinite(np.asarray(lp16(x))))
    g = LK.make_grad_log_prob(lp16)(x)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.asarray(g).dtype == np.float32


def test_bf16_posterior_parity_statistical():
    """Sampling the same emulator posterior in f32 and bf16 gives the same
    moments to well within the ensemble's Monte-Carlo error."""
    spec, ts, pack, data, inv_cov = _setup()
    params = N.init_model(jax.random.key(1), spec)
    lp32 = LK.make_log_prob(spec, params, ts, pack, data, inv_cov)
    lp16 = LK.make_log_prob(
        spec, params, ts, pack, data, inv_cov, compute_dtype="bfloat16"
    )
    x0 = 0.1 * jax.random.normal(jax.random.key(7), (32, 3))

    def run(lp):
        state = stretch.init_state(jax.random.key(11), x0, lp)
        _, chain, _ = stretch.stretch_chunk(lp, state, 600, 2.0)
        flat = np.asarray(chain[200:]).reshape(-1, 3)  # discard burn-in
        return flat.mean(axis=0), flat.std(axis=0)

    m32, s32 = run(lp32)
    m16, s16 = run(lp16)
    assert np.all(np.abs(m32 - m16) / s32 < 0.1)
    assert np.all(np.abs(s32 - s16) / s32 < 0.1)


def test_bf16_rejects_fused():
    spec, ts, pack, data, inv_cov = _setup()
    params = N.init_model(jax.random.key(1), spec)
    with pytest.raises(ValueError):
        LK.make_log_prob(
            spec, params, ts, pack, data, inv_cov,
            use_fused=True, compute_dtype="bfloat16",
        )


def test_bf16_training_compute_trains_to_similar_loss(tmp_path):
    """``Trainer(compute_dtype="bfloat16")``: forward/backward in bf16 with
    f32 master weights reaches a val loss in the same regime as the f32
    trainer on a small analytic problem (VERDICT r2 item 2 knob)."""
    from linna_tpu import losses as L
    from linna_tpu.train import Trainer

    rng = np.random.default_rng(5)
    ndim, ndata = 3, 5
    w = rng.standard_normal((ndim, ndata))
    tx = np.asarray(rng.uniform(-1, 1, (200, ndim)), np.float32)
    ty = np.asarray(tx @ w, np.float32)
    vx = np.asarray(rng.uniform(-1, 1, (40, ndim)), np.float32)
    vy = np.asarray(vx @ w, np.float32)
    spec, ts, pack, data, inv_cov = _setup(ndim, ndata)
    loss_state = L.build_loss_state(data, np.eye(ndata), ts)

    finals = {}
    for tag, cd in (("f32", None), ("bf16", "bfloat16")):
        tr = Trainer(
            spec, ts, loss_state, outdir=str(tmp_path / tag), seed=7,
            compute_dtype=cd,
        )
        _, vms = tr.train(
            tx, ty, vx, vy, num_epochs=60, batch_size=50,
            auto_lr=False, initfrombest=False,
        )
        finals[tag] = float(np.min(np.asarray(vms)[:, 0]))
    assert np.isfinite(finals["bf16"])
    # same regime: bf16 best-val within 3x of f32's (coarse tolerance — the
    # contract is "trains sanely", exact parity is impossible in bf16)
    assert finals["bf16"] < 3 * finals["f32"] + 1e-3


def test_bf16_training_stores_bf16_first_moment(tmp_path):
    """Under ``compute_dtype="bfloat16"`` both trainers store the AdamW
    first moment in bf16 (measured 10% off the bandwidth-floor-bound epoch
    at the LSST shape, docs/TRAINING_PERF.md); f32 training keeps f32
    moments, and the final forced checkpoint round-trips the bf16 state."""
    import jax.numpy as jnp

    from linna_tpu import losses as L
    from linna_tpu.train import Trainer
    from linna_tpu.utils import checkpoint as ckpt

    def mu_leaves(opt_state):
        return jax.tree.leaves(opt_state.inner_state[0].mu)

    spec, ts, pack, data, inv_cov = _setup()
    loss_state = L.build_loss_state(data, np.eye(5), ts)
    tr32 = Trainer(spec, ts, loss_state, seed=7)
    assert all(m.dtype == jnp.float32 for m in mu_leaves(tr32.opt_state))
    tr16 = Trainer(
        spec, ts, loss_state, outdir=str(tmp_path), seed=7,
        compute_dtype="bfloat16",
    )
    assert all(m.dtype == jnp.bfloat16 for m in mu_leaves(tr16.opt_state))

    rng = np.random.default_rng(5)
    w = rng.standard_normal((3, 5))
    tx = np.asarray(rng.uniform(-1, 1, (100, 3)), np.float32)
    vx = np.asarray(rng.uniform(-1, 1, (20, 3)), np.float32)
    tr16.train(
        tx, np.asarray(tx @ w, np.float32), vx, np.asarray(vx @ w, np.float32),
        num_epochs=10, batch_size=50, auto_lr=False, initfrombest=False,
    )
    # the final forced save carries the optimizer state; it must load back
    # with the bf16 moment dtype intact (tests the npz V-kind widening)
    _, opt, _ = ckpt.load_checkpoint(
        str(tmp_path / "last.ckpt.npz"), tr16.params, tr16.opt_state
    )
    assert all(m.dtype == jnp.bfloat16 for m in mu_leaves(opt))


def test_bf16_ensemble_trainer_moment_dtype():
    """EnsembleTrainer follows the same moment-dtype policy as Trainer."""
    import jax.numpy as jnp

    from linna_tpu import losses as L
    from linna_tpu.parallel.ensemble import EnsembleTrainer

    spec, ts, pack, data, inv_cov = _setup()
    loss_state = L.build_loss_state(data, np.eye(5), ts)
    et = EnsembleTrainer(
        spec, ts, loss_state, outdirs=[None, None], seeds=[0, 1],
        compute_dtype="bfloat16",
    )
    mus = jax.tree.leaves(et.opt_state.inner_state[0].mu)
    assert all(m.dtype == jnp.bfloat16 for m in mus)

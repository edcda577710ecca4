"""Compile-warming parity: the background warmer's lowered training programs
must be byte-identical to the ones the real EnsembleTrainer dispatches —
that equality IS the mechanism (identical HLO => identical persistent
compile-cache key => the foreground dispatch finds the warmed executable).
"""

import jax
import jax.numpy as jnp
import numpy as np

from linna_tpu import losses as L
from linna_tpu import nn as N
from linna_tpu import transforms as T
from linna_tpu.parallel import precompile
from linna_tpu.parallel.ensemble import EnsembleTrainer

NDIM, NDATA, K = 2, 3, 2
N_TRAIN, N_VAL, BATCH = 64, 16, 16


def _real_problem(seed=0):
    rng = np.random.default_rng(seed)
    tx = rng.uniform(-1, 1, (N_TRAIN, NDIM))
    ty = tx @ rng.standard_normal((NDIM, NDATA)) + 1.0
    vx = rng.uniform(-1, 1, (N_VAL, NDIM))
    vy = vx @ rng.standard_normal((NDIM, NDATA)) + 1.0
    data = rng.normal(1.0, 0.1, NDATA)
    cov = np.eye(NDATA) * 0.01
    sigma = np.sqrt(np.diag(cov))
    xt = T.fit_x_transform(tx)
    yt = T.fit_y_transform(ty / sigma)
    tset = T.TransformSet(xt, yt, T.YTransformData(jnp.asarray(sigma, jnp.float32)))
    lstate = L.build_loss_state(data, cov, tset)
    return tset, lstate, tx, ty, vx, vy


def _hlo(lowered) -> str:
    return lowered.as_text()


def test_warmed_hlo_matches_real_dispatch(tmp_path):
    """Dummy-trainer lowering == real-trainer lowering, for both the epoch
    chunk and the LR sweep, at a shape the warmer targets."""
    warmed = {
        label: _hlo(low)
        for label, low in precompile.iter_lowered(
            "chto_simple", NDIM, NDATA, K, [(N_TRAIN, N_VAL)], BATCH,
            chunk_lengths=[5], compute_dtype=None,
        )
    }
    assert set(warmed) == {f"epochs_n{N_TRAIN}_k5", f"lr_sweep_n{N_TRAIN}"}

    tset, lstate, tx, ty, vx, vy = _real_problem()
    spec = N.make_model_spec("chto_simple", NDIM, NDATA)
    tr = EnsembleTrainer(
        spec, tset, lstate,
        [str(tmp_path / f"m{k}") for k in range(K)], list(range(K)),
    )
    tr._batch_size = BATCH
    txj = jnp.asarray(tx, jnp.float32)
    tyj = jnp.asarray(ty, jnp.float32)
    vxj = jnp.asarray(vx, jnp.float32)
    vyj = jnp.asarray(vy, jnp.float32)
    ekeys = jnp.stack([jax.random.key(7 + m) for m in range(K)])

    real_epochs = EnsembleTrainer._epochs_members.lower(
        tr, tr.params, tr.opt_state, ekeys, txj, tyj, vxj, vyj, 5,
        tset, lstate,
    )
    assert _hlo(real_epochs) == warmed[f"epochs_n{N_TRAIN}_k5"]

    order = jnp.asarray(np.random.default_rng(1234).permutation(N_TRAIN))
    lrs = jnp.asarray(np.geomspace(1e-4, 5e-3, 100), jnp.float32)
    real_sweep = EnsembleTrainer._lr_sweep_members.lower(
        tr, tr.params, order, lrs, txj, tyj, 100, tset, lstate,
    )
    assert _hlo(real_sweep) == warmed[f"lr_sweep_n{N_TRAIN}"]


def test_warmed_hlo_matches_real_dispatch_bf16(tmp_path):
    """compute_dtype must thread into the warmed programs identically."""
    warmed = dict(
        precompile.iter_lowered(
            "chto_simple", NDIM, NDATA, K, [(N_TRAIN, N_VAL)], BATCH,
            chunk_lengths=[5], compute_dtype="bfloat16",
        )
    )
    tset, lstate, tx, ty, vx, vy = _real_problem(1)
    spec = N.make_model_spec("chto_simple", NDIM, NDATA)
    tr = EnsembleTrainer(
        spec, tset, lstate,
        [str(tmp_path / f"m{k}") for k in range(K)], list(range(K)),
        compute_dtype="bfloat16",
    )
    tr._batch_size = BATCH
    ekeys = jnp.stack([jax.random.key(m) for m in range(K)])
    real = EnsembleTrainer._epochs_members.lower(
        tr, tr.params, tr.opt_state, ekeys,
        jnp.asarray(tx, jnp.float32), jnp.asarray(ty, jnp.float32),
        jnp.asarray(vx, jnp.float32), jnp.asarray(vy, jnp.float32), 5,
        tset, lstate,
    )
    assert _hlo(real) == _hlo(warmed[f"epochs_n{N_TRAIN}_k5"])


def test_chunk_lengths():
    # DispatchSchedule quiet path: guard chunks through the flat-start
    # window, the configured max, the tail (the post-intervention guard
    # chunk equals the flat-window chunk size)
    assert precompile._chunk_lengths(1000, 50) == [10, 50, 30]
    assert sum(precompile._chunk_lengths(7, 5)[:2]) == 7  # [5, 2]
    assert precompile._chunk_lengths(7, 5) == [5, 2]
    assert precompile._chunk_lengths(3, 10) == [3]
    # every quiet-path chunk is warmable: lengths tile num_epochs exactly
    from linna_tpu.train import DispatchSchedule

    for ne, epd in [(1000, 50), (4500, 50), (400, 10), (37, 50)]:
        ks = DispatchSchedule(epd).quiet_path_lengths(ne)
        assert sum(ks) == ne
        assert set(ks) <= set(precompile._chunk_lengths(ne, epd))


def test_warm_thread_runs_and_is_silent(tmp_path, monkeypatch):
    """warm_ensemble_training compiles in a daemon thread without raising,
    and the LINNA_PRECOMPILE=0 kill switch disables it."""
    monkeypatch.setenv("LINNA_PRECOMPILE", "0")
    assert precompile.warm_ensemble_training(
        "chto_simple", NDIM, NDATA, K, [(N_TRAIN, N_VAL)], BATCH, 7, 5, None
    ) is None
    monkeypatch.delenv("LINNA_PRECOMPILE")
    # the test session disables the persistent compile cache (conftest), which
    # now also disables warming — point it at a scratch dir for this test
    monkeypatch.setenv("LINNA_COMPILE_CACHE", str(tmp_path / "cache"))
    t = precompile.warm_ensemble_training(
        "chto_simple", NDIM, NDATA, K, [(N_TRAIN, N_VAL)], BATCH, 7, 5, None
    )
    assert t is not None
    t.join(timeout=300)
    assert not t.is_alive()


def test_warmed_sampler_hlo_matches_real(tmp_path):
    """Sampler warming parity: the dummy likelihood/preconditioner must lower
    the zeus and NUTS device programs to byte-identical HLO vs a REAL
    trained-shape likelihood (random weights, fitted transforms, computed
    MAP preconditioner) — the property the compile-cache hit depends on."""
    from linna_tpu import likelihood as LK
    from linna_tpu import priors as P
    from linna_tpu.samplers import hmc, precondition, slicemove

    W = 8
    warmed = dict(
        precompile.iter_lowered_sampler(
            "chto_simple", NDIM, NDATA, K, W, ["zeus", "nuts"]
        )
    )
    assert {"zeus_init", "zeus_chunk", "nuts_init", "nuts_chunk",
            "nuts_map_f", "nuts_map_g", "nuts_map_h"} <= set(warmed)

    # real likelihood: fitted transforms, random member weights, real priors
    rng = np.random.default_rng(3)
    tx = rng.uniform(-1, 1, (32, NDIM))
    ty = tx @ rng.standard_normal((NDIM, NDATA)) + 2.0
    sigma = np.full(NDATA, 0.1)
    tset = T.TransformSet(
        T.fit_x_transform(tx),
        T.fit_y_transform(ty / sigma),
        T.YTransformData(jnp.asarray(sigma, jnp.float32)),
    )
    pack = P.priors_from_list(
        [{"dist": "flat", "arg1": -2.0, "arg2": 2.0}] * NDIM
    )
    spec = N.make_model_spec("chto_simple", NDIM, NDATA)
    members = [N.init_model(jax.random.key(40 + m), spec) for m in range(K)]
    lp = LK.make_log_prob(
        spec, members, tset, pack, rng.normal(0, 1, NDATA),
        np.linalg.inv(np.diag(sigma**2)),
    )
    lp_fn, env = lp._pure, lp._env
    key = jax.random.key(5)
    x0 = jnp.asarray(rng.standard_normal((W, NDIM)), jnp.float32)

    # zeus: init + chunk exactly as run.py dispatches them
    real_init = jax.jit(
        lambda k, x, e: slicemove.init_slice_state(
            k, x, lambda xx: lp_fn(xx, e)
        )
    ).lower(key, x0, env)
    assert real_init.as_text() == warmed["zeus_init"].as_text()
    state = jax.jit(
        lambda k, x, e: slicemove.init_slice_state(
            k, x, lambda xx: lp_fn(xx, e)
        )
    )(key, x0, env)
    real_chunk = slicemove.slice_chunk.lower(lp_fn, state, 100, 100, lp_env=env)
    assert real_chunk.as_text() == warmed["zeus_chunk"].as_text()

    # NUTS: a REAL MAP preconditioner wrapping, then init + chunk
    pre = precondition.calc_hess_mass_mat(lp, np.zeros(NDIM))
    wrapped = pre.wrap_log_prob(lp)
    wfn, wenv = wrapped._pure, wrapped._env
    real_ninit = jax.jit(
        lambda k, x, e: hmc.init_nuts_state(
            k, x, lambda xx: wfn(xx, e), m_adapt=100
        )
    ).lower(key, x0, wenv)
    assert real_ninit.as_text() == warmed["nuts_init"].as_text()
    nstate = jax.jit(
        lambda k, x, e: hmc.init_nuts_state(
            k, x, lambda xx: wfn(xx, e), m_adapt=100
        )
    )(key, x0, wenv)
    real_nchunk = hmc.nuts_chunk.lower(wfn, nstate, 100, 5, lp_env=wenv)
    assert real_nchunk.as_text() == warmed["nuts_chunk"].as_text()


def test_warming_disabled_when_compile_cache_off(monkeypatch):
    """Warming pays off only through the persistent compile cache; with
    LINNA_COMPILE_CACHE=0 the warm thread would be pure wasted compiles."""
    monkeypatch.delenv("LINNA_PRECOMPILE", raising=False)
    monkeypatch.setenv("LINNA_COMPILE_CACHE", "0")
    assert not precompile.enabled()
    assert precompile.warm_pipeline(
        "chto_v2", NDIM, NDATA, K, shapes=[(N_TRAIN, N_VAL)],
        batch_size=BATCH, num_epochs=4, epochs_per_dispatch=2,
        compute_dtype=None,
    ) is None
    monkeypatch.setenv("LINNA_COMPILE_CACHE", "/tmp/somewhere")
    assert precompile.enabled()
    monkeypatch.setenv("LINNA_PRECOMPILE", "0")
    assert not precompile.enabled()

"""Mesh-sharded training + sampling on the 8-virtual-device CPU mesh
(conftest forces JAX_PLATFORMS=cpu with xla_force_host_platform_device_count=8;
mirrors the driver's ``dryrun_multichip`` environment)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import linna_tpu.losses as L
import linna_tpu.nn as N
import linna_tpu.parallel as PX
import linna_tpu.transforms as T
from linna_tpu.parallel.dtrain import init_sharded


def _problem(ndim=4, ndata=8):
    spec = N.make_model_spec("chto_v2", ndim, ndata)
    x_t = T.XTransform(jnp.zeros(ndim), jnp.ones(ndim), jnp.zeros(ndim, bool))
    y_t = T.YTransform(jnp.zeros(ndata), jnp.ones(ndata), False)
    y_d = T.YTransformData(jnp.ones(ndata))
    transforms = T.TransformSet(x_t, y_t, y_d)
    data = np.linspace(-0.5, 0.5, ndata)
    loss_state = L.build_loss_state(data, np.eye(ndata), transforms)
    return spec, transforms, loss_state


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should give 8 virtual devices"
    return PX.make_mesh(jax.devices(), n_model=2)


def test_sharded_epoch_matches_single_device(mesh):
    """The mesh-sharded epoch must compute the same math as unsharded jit:
    same params in -> bitwise-comparable losses out (modulo reduction order:
    compare to 1e-5)."""
    spec, transforms, loss_state = _problem()
    optimizer = optax.adamw(1e-3)
    key = jax.random.key(0)
    k_init, k_epoch, k_x, k_y = jax.random.split(key, 4)

    train_x = jax.random.normal(k_x, (64, 4))
    train_y = jax.random.normal(k_y, (64, 8))

    # sharded run
    params_s, opt_s = init_sharded(k_init, spec, optimizer, mesh)
    epoch_s = PX.make_sharded_epoch(
        spec, transforms, loss_state, optimizer, mesh, batch_size=16
    )
    bsh = PX.batch_sharding(mesh)
    out_s = epoch_s(
        params_s,
        opt_s,
        k_epoch,
        jax.device_put(train_x, bsh),
        jax.device_put(train_y, bsh),
        jax.device_put(train_x[:16], bsh),
        jax.device_put(train_y[:16], bsh),
    )
    losses_s = np.asarray(out_s[2])

    # single-device reference (identical init key => identical params)
    params = N.init_model(k_init, spec)
    opt_state = optimizer.init(params)

    def loss_fn(p, bx, by):
        pred = N.apply_model(spec, p, transforms.x_transform(bx))
        return L.loss_fn(loss_state, transforms, pred, by)

    @jax.jit
    def epoch1(params, opt_state, key):
        perm = jax.random.permutation(key, 64)[:64].reshape(4, 16)

        def step(carry, idx):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(
                params, train_x[idx], train_y[idx]
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), perm)
        return params, losses

    _, losses_1 = epoch1(params, opt_state, k_epoch)
    np.testing.assert_allclose(losses_s, np.asarray(losses_1), rtol=1e-4, atol=1e-6)


def test_sharded_train_step_runs_and_updates(mesh):
    spec, transforms, loss_state = _problem()
    optimizer = optax.adamw(1e-3)
    params, opt_state = init_sharded(jax.random.key(1), spec, optimizer, mesh)
    step = PX.make_sharded_train_step(spec, transforms, loss_state, optimizer, mesh)
    bsh = PX.batch_sharding(mesh)
    bx = jax.device_put(jax.random.normal(jax.random.key(2), (32, 4)), bsh)
    by = jax.device_put(jax.random.normal(jax.random.key(3), (32, 8)), bsh)
    w_before = np.asarray(params["layer1"]["w"])
    params, opt_state, loss = step(params, opt_state, bx, by)
    assert np.isfinite(float(loss))
    assert not np.allclose(np.asarray(params["layer1"]["w"]), w_before)


def test_sharded_sampler_chunk(mesh):
    """Walker ensemble sharded over all 8 devices produces finite samples and
    matches the unsharded chunk exactly (same key => same randoms)."""
    from linna_tpu.samplers import stretch

    def log_prob(x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    x0 = jax.random.normal(jax.random.key(4), (64, 4), dtype=jnp.float32)
    x0_sharded = jax.device_put(x0, NamedSharding(mesh, P(("data", "model"), None)))

    s1 = stretch.init_state(jax.random.key(5), x0, log_prob)
    s1, chain1, lp1 = stretch.stretch_chunk(log_prob, s1, 10, 2.0)
    s2 = stretch.init_state(jax.random.key(5), x0_sharded, log_prob)
    s2, chain2, lp2 = stretch.stretch_chunk(log_prob, s2, 10, 2.0)
    np.testing.assert_allclose(np.asarray(chain1), np.asarray(chain2), rtol=2e-5, atol=1e-6)
    assert np.all(np.isfinite(np.asarray(lp2)))


def test_param_shardings_cover_tree(mesh):
    spec, *_ = _problem()
    params = N.init_model(jax.random.key(0), spec)
    sh = PX.param_shardings(params, mesh)
    flat_p = jax.tree_util.tree_leaves_with_path(params)
    flat_s = jax.tree_util.tree_leaves_with_path(sh)
    assert len(flat_p) == len(flat_s)


def test_run_ensemble_sharded_walkers(tmp_path):
    """run_ensemble auto-shards the ensemble over all 8 virtual devices and
    still produces a valid resumable chain."""
    import jax.numpy as jnp
    from linna_tpu.samplers import run as sampler_run

    def log_prob(x):
        return -0.5 * jnp.sum((x - 0.5) ** 2, axis=-1)

    x0 = np.asarray(
        0.1 * np.random.default_rng(1).standard_normal((32, 3)), np.float32
    )
    backend = sampler_run.run_ensemble(
        log_prob, x0, str(tmp_path), method="emcee",
        ntimes=3, tautol=0.5, meanshift=1.0, stdshift=1.0,
        check_every=50, max_iterations=300, seed=1, shard_walkers=True,
    )
    chain = backend.get_chain()
    assert chain.shape[1:] == (32, 3)
    flat = chain[len(chain) // 2:].reshape(-1, 3)
    np.testing.assert_allclose(flat.mean(axis=0), [0.5] * 3, atol=0.2)


def test_run_ensemble_warns_when_sharding_skipped(tmp_path):
    """A walker count not divisible by 2*device_count falls back to a single
    device — loudly (VERDICT r2 item 8), naming the next usable count."""
    import warnings

    import jax.numpy as jnp
    from linna_tpu.samplers import run as sampler_run

    def log_prob(x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    x0 = np.asarray(
        0.1 * np.random.default_rng(2).standard_normal((250, 3)), np.float32
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        sampler_run.run_ensemble(
            log_prob, x0, str(tmp_path), method="emcee",
            ntimes=1, tautol=10.0, meanshift=100.0, stdshift=100.0,
            check_every=10, max_iterations=10, seed=1, shard_walkers=True,
        )
    msgs = [str(w.message) for w in caught if "walker sharding skipped" in str(w.message)]
    assert msgs and "256" in msgs[0]  # 250 -> next multiple of 16


def _walker_mesh():
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), ("walkers",))


def test_shard_map_stretch_bitwise_matches_unsharded():
    """stretch_chunk(mesh=...) (shard_over_walkers, VERDICT r4 item 3) is
    bit-for-bit the single-device chunk: every random draw is step-fixed and
    pre-drawn globally, and the per-walker arithmetic is identical."""
    from linna_tpu.samplers import stretch

    mesh = _walker_mesh()

    def log_prob(x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    x0 = jax.random.normal(jax.random.key(4), (64, 4), dtype=jnp.float32)
    x0s = jax.device_put(x0, NamedSharding(mesh, P("walkers", None)))
    s1 = stretch.init_state(jax.random.key(5), x0, log_prob)
    s1, chain1, lp1 = stretch.stretch_chunk(log_prob, s1, 25, 2.0)
    s2 = stretch.init_state(jax.random.key(5), x0s, log_prob)
    s2, chain2, lp2 = stretch.stretch_chunk(log_prob, s2, 25, 2.0, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(chain1), np.asarray(chain2))
    np.testing.assert_array_equal(np.asarray(s1.accepted), np.asarray(s2.accepted))


def test_shard_map_slice_statistics_and_counters():
    """slice_chunk(mesh=...): device-local while_loops sample the same
    posterior (documented per-device shrink-draw streams — not bitwise), and
    the psum'd expansion/contraction counters feed mu tuning with GLOBAL
    counts that do not multiply the prior cumulative value."""
    from linna_tpu.samplers import slicemove

    mesh = _walker_mesh()

    def log_prob(x):
        return -0.5 * jnp.sum((x - 0.5) ** 2 / 0.25, axis=-1)

    x0 = 0.5 + 0.5 * jax.random.normal(jax.random.key(0), (64, 3), dtype=jnp.float32)
    x0s = jax.device_put(x0, NamedSharding(mesh, P("walkers", None)))
    zs = slicemove.init_slice_state(jax.random.key(3), x0s, log_prob)
    zs, chain_s, lps_s = slicemove.slice_chunk(log_prob, zs, 150, 100, mesh=mesh)
    zu = slicemove.init_slice_state(jax.random.key(3), x0, log_prob)
    zu, chain_u, _ = slicemove.slice_chunk(log_prob, zu, 150, 100)
    assert np.all(np.isfinite(np.asarray(chain_s)))
    m_s = np.asarray(chain_s[50:]).reshape(-1, 3).mean(0)
    m_u = np.asarray(chain_u[50:]).reshape(-1, 3).mean(0)
    np.testing.assert_allclose(m_s, 0.5, atol=0.15)
    np.testing.assert_allclose(m_u, 0.5, atol=0.15)
    # counter magnitudes agree between paths (same move, different streams)
    assert 0.5 < int(zs.n_expand) / max(int(zu.n_expand), 1) < 2.0
    assert 0.2 < (int(zs.n_contract) + 1) / (int(zu.n_contract) + 1) < 5.0
    # second chunk: cumulative counters grow, not multiply by device count
    zs2, _, _ = slicemove.slice_chunk(log_prob, zs, 10, 100, mesh=mesh)
    assert int(zs2.n_expand) < int(zs.n_expand) * 2 + 10000


def test_shard_map_chunk_collective_census():
    """The re-censused contract (VERDICT r4 item 3, target <= ~8/step): the
    walker-sharded stretch and slice chunks each dispatch exactly 2 per-step
    collectives — the two half-ensemble all-gathers — and nothing inside the
    while_loop bodies."""
    import re

    from linna_tpu.samplers import slicemove, stretch

    mesh = _walker_mesh()

    def log_prob(x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    x0 = jax.random.normal(jax.random.key(1), (64, 3), dtype=jnp.float32)
    x0s = jax.device_put(x0, NamedSharding(mesh, P("walkers", None)))

    opcodes = ("all-gather", "all-reduce", "reduce-scatter",
               "collective-permute", "all-to-all", "collective-broadcast")

    def per_step_collectives(txt):
        comp, n = "", 0
        for line in txt.splitlines():
            if not line.startswith(" ") and "{" in line:
                comp = line.split("(")[0].strip().lstrip("%")
            m = re.search(r"= \w+\[[\d,]*\]\S* ([a-z-]+)\(", line)
            if m and m.group(1) in opcodes and any(
                k in comp for k in ("while", "body", "cond", "region")
            ):
                n += 1
        return n

    st = stretch.init_state(jax.random.key(2), x0s, log_prob)
    txt = stretch.stretch_chunk.lower(
        log_prob, st, 8, 2.0, mesh=mesh
    ).compile().as_text()
    assert per_step_collectives(txt) == 2

    zs = slicemove.init_slice_state(jax.random.key(2), x0s, log_prob)
    txt = slicemove.slice_chunk.lower(
        log_prob, zs, 8, 100, mesh=mesh
    ).compile().as_text()
    assert per_step_collectives(txt) == 2


def test_pod_accept_structural(capsys):
    """The pod acceptance kit's structural gates (examples/pod_accept.py,
    VERDICT r4 item 6) pass on the 8-device virtual mesh — the same census
    code and thresholds a pod owner runs on real chips."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from examples import pod_accept

    rc = pod_accept.main(["--structural"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    report = json.loads(out)
    assert rc == 0, report
    assert report["pass"] is True
    s = report["structural"]
    assert s["n_devices"] == 8
    for method in ("emcee", "zeus", "hmc", "nuts"):
        assert s["sampler"][method]["pass"], s["sampler"]
    assert s["trainer"]["cross_member_collectives"] == 0

"""Worker program for the genuine two-process multi-host test.

Launched twice by tests/test_multihost_2proc.py with
LINNA_COORDINATOR_ADDRESS / LINNA_NUM_PROCESSES / LINNA_PROCESS_ID set and 4
virtual CPU devices per process.  Both processes execute the SAME program
(the docs/MULTIHOST.md SPMD model):

Phase 1 (shared outdir = argv[1]): the production ``train_emulator`` path —
EnsembleTrainer over the global ('ens','data') mesh spanning both processes —
then emulator retrieval from the shared filesystem and a walker-sharded
``run_ensemble`` chunk over all 8 global devices.

Phase 2 (per-process outdir = argv[2] + process id): EnsembleTrainer +
run_ensemble again with process-local output directories — proving that the
non-primary process writes NOTHING (the pytest side asserts its directory
stays file-free).
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # defeat the container sitecustomize

# Persistent compile cache for this SHORT-LIVED worker (the parent test
# overrides the session's cache-off default in the child env): the two
# fresh processes each paid the full mesh-program compile serially on the
# 1-core CI box — 260 s of the fast tier for one test.  The deserialize
# segfault the session-wide cache-off guards against has only ever been
# observed in LONG pytest sessions; short-lived processes (bench.py, this
# worker) run with the cache in production and have not reproduced it.
from linna_tpu.orchestrator import _enable_compile_cache  # noqa: E402

_enable_compile_cache()

from linna_tpu.parallel import multihost as MH  # noqa: E402

multi = MH.initialize()  # configured via LINNA_* env
assert multi, "expected multi-process initialization from env"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

import numpy as np  # noqa: E402

from linna_tpu import likelihood as LK  # noqa: E402
from linna_tpu import losses as L  # noqa: E402
from linna_tpu import nn as N  # noqa: E402
from linna_tpu import orchestrator as ORC  # noqa: E402
from linna_tpu import priors as P  # noqa: E402
from linna_tpu import transforms as T  # noqa: E402
from linna_tpu.parallel.ensemble import EnsembleTrainer  # noqa: E402
from linna_tpu.samplers import run as sampler_run  # noqa: E402

# broadcast_from_primary ships primary-loaded values bit-exactly across
# processes: full float64 (broadcast_one_to_all would truncate to f32 under
# the default x64-disabled config) and data-dependent structure
blob = MH.broadcast_from_primary(
    lambda: {"v": np.array([1.0 + 2.0**-52, -3.5], np.float64), "n": 7}
)
assert blob["n"] == 7 and blob["v"].dtype == np.float64
assert blob["v"][0] == 1.0 + 2.0**-52, "f64 payload must survive bit-exactly"

shared = sys.argv[1]
gate_base = sys.argv[2]
NDIM, NDATA = 3, 4
data_vec = np.zeros(NDATA)
cov = np.eye(NDATA)
sigma = np.sqrt(np.diag(cov))

# ----------------------------------------------------- phase 1: shared outdir
ORC.train_emulator(
    shared,
    [shared],
    data_vec,
    cov,
    sigma,
    dolog10index=None,
    ypositive=False,
    model_name="chto_simple",
    params={"nensemble": 2, "num_epochs": 6, "batch_size": 16},
)
# train_emulator ends with a barrier; the shared artifacts exist everywhere
assert os.path.isfile(os.path.join(shared, "finish.json"))
trainer = ORC.retrieve_model(shared, NDIM, NDATA, "chto_simple")
params_lp = ORC.retrieve_ensemble_params(shared, trainer)
assert len(params_lp) == 2, "both ensemble members' checkpoints readable"
pack = P.priors_from_list(
    [{"param": f"p{i}", "dist": "flat", "arg1": -2.0, "arg2": 2.0} for i in range(NDIM)]
)
log_prob = LK.make_log_prob(
    trainer.spec, params_lp, trainer.transforms, pack, data_vec, np.linalg.inv(cov)
)
x0 = np.asarray(
    0.05 * np.random.default_rng(3).standard_normal((32, NDIM)), np.float32
)
backend = sampler_run.run_ensemble(
    log_prob, x0, shared, method="emcee",
    ntimes=1, tautol=100.0, meanshift=1e9, stdshift=1e9,
    check_every=8, max_iterations=16, seed=5, shard_walkers=True,
)
MH.barrier("after-shared-mcmc")
chain = backend.get_chain()  # both processes read the shared HDF5
assert chain.shape[1:] == (32, NDIM), chain.shape
assert np.all(np.isfinite(chain))

# resume across processes: the second call takes the broadcast resume
# branch, the primary-loaded sampler-state blob + walker positions via
# broadcast_from_primary, and the exact per-walker state restore — all
# genuine 2-process collectives — then extends the shared chain without
# touching the existing prefix.
# convergence_check=False forces the extension: the first run's loose
# criteria converge immediately, and a converged chain resumed under the
# same criteria is (by design) an idempotent no-op.
backend = sampler_run.run_ensemble(
    log_prob, x0, shared, method="emcee",
    ntimes=1, tautol=100.0, meanshift=1e9, stdshift=1e9,
    check_every=8, max_iterations=32, seed=5, shard_walkers=True,
    convergence_check=False,
)
MH.barrier("after-shared-resume")
chain2 = backend.get_chain()
assert len(chain2) == 32, len(chain2)
assert np.array_equal(chain2[:16], chain), "resume must preserve the prefix"

# gradient-method resume across processes: a fresh NUTS run writes
# precond.npz (primary only), and the resume takes the primary-loaded
# broadcast of the preconditioner arrays + the exact NUTS state restore —
# the code path where a lagging non-primary filesystem view would
# otherwise crash or desynchronize the whitened space
nuts_dir = os.path.join(shared, "nuts")


def tilted(x):
    return -0.5 * jax.numpy.sum((x - 0.3) ** 2, axis=-1)


x0n = np.asarray(
    0.1 * np.random.default_rng(11).standard_normal((16, NDIM)), np.float32
)
kw_n = dict(
    method="nuts", ntimes=1, tautol=100.0, meanshift=1e9, stdshift=1e9,
    check_every=4, seed=13, shard_walkers=True, convergence_check=False,
    m_adapt=8,
)
sampler_run.run_ensemble(tilted, x0n, nuts_dir, max_iterations=8, **kw_n)
MH.barrier("after-nuts-fresh")
assert os.path.isfile(os.path.join(nuts_dir, "precond.npz"))
bn = sampler_run.run_ensemble(tilted, x0n, nuts_dir, max_iterations=16, **kw_n)
MH.barrier("after-nuts-resume")
assert bn.iteration == 16, bn.iteration

# ------------------------------------------- phase 2: per-process write gate
mine = os.path.join(gate_base + str(jax.process_index()))
rng = np.random.default_rng(7)
tx = np.asarray(rng.standard_normal((64, NDIM)), np.float32)
ty = np.asarray(tx @ rng.standard_normal((NDIM, NDATA)), np.float32)
xt = T.fit_x_transform(tx, None)
yt = T.fit_y_transform(ty / sigma, ypositive=False)
tset = T.TransformSet(xt, yt, T.YTransformData(jax.numpy.asarray(sigma, jax.numpy.float32)))
loss_state = L.build_loss_state(data_vec, cov, tset)
spec = N.make_model_spec("chto_simple", NDIM, NDATA)
ens = EnsembleTrainer(
    spec, tset, loss_state,
    [mine, os.path.join(mine, "ens_1")], [11, 12],
)
ens.train(tx, ty, tx[:16], ty[:16], num_epochs=4, batch_size=16)


# file-branch of the best-member loader across processes: only the
# PRIMARY's best.ckpt.npz exists (the non-primary's gate dir is file-free
# by the write gate), so True on BOTH processes proves the checkpoint
# payload rode broadcast_from_primary — a per-host filesystem check would
# return False here and silently reinit the member on the non-primary
# (divergent SPMD state)
ens2 = EnsembleTrainer(
    spec, tset, loss_state,
    [mine, os.path.join(mine, "ens_1")], [11, 12],
)
for m in (0, 1):
    assert ens2._load_best_member(m), f"broadcast best-member load (member {m})"


def analytic(x):
    return -0.5 * jax.numpy.sum(x**2, axis=-1)


sampler_run.run_ensemble(
    analytic, x0, mine, method="zeus",
    ntimes=1, tautol=100.0, meanshift=1e9, stdshift=1e9,
    check_every=8, max_iterations=8, seed=6, shard_walkers=True,
)
MH.barrier("done")
print(f"WORKER-OK p{jax.process_index()}", flush=True)

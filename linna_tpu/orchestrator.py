"""The LINNA outer loop: sample -> evaluate theory -> train emulator -> MCMC.

TPU-native rebuild of the reference orchestrator (linna/main.py:22-335):

- ``ml_sampler`` carries the paper's hyperparameters (linna/main.py:47-75);
- ``ml_sampler_core`` runs the iterative loop: per iteration, read + cut the
  previous chain, draw training points focused on the current posterior,
  fan the theory model out over the host pool, train the emulator, then run
  convergence-gated ensemble MCMC on the emulated likelihood with the
  iteration's temperature (squared before use, linna/main.py:153).

Differences by design:
- training runs IN PROCESS on the accelerator (no pickled-closure subprocess
  handoff / Slurm GPU co-allocation — reference linna/main.py:186-252,
  linna/train_gpu.py); the ``gpunode`` argument is accepted for API
  compatibility and ignored;
- MCMC runs fully on device (no pool in the sampling loop);
- artifacts are pickle-free (transforms.npz, *.ckpt.npz, finish.json) but the
  sample files and HDF5 chain layouts are byte-compatible with the reference
  for resume/analysis parity.

Every stage is file-gated for idempotent crash recovery, matching the
reference's restart contract (SURVEY §5.3).
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Optional, Sequence

import jax
import numpy as np

from . import data as D
from . import likelihood as LK
from . import losses as L
from . import nn as N
from . import priors as P
from . import sample_gen as SG
from . import transforms as T
from .parallel import multihost as MH
from .samplers import backends, convergence, run as sampler_run
from .train import BEST_CKPT, Trainer
from .utils.trace import PhaseTimer, device_profile

__all__ = [
    "ml_sampler",
    "ml_sampler_core",
    "train_emulator",
    "retrieve_model",
    "retrieve_model_exist",
    "retrieve_model_wrapper",
    "retrieve_ensemble_params",
    "read_chain_and_cut",
]

FINISH_MARKER = "finish.json"
TRANSFORMS_FILE = "transforms.npz"
LINEAR_MODEL_FILE = "linear_model.npz"


def _enable_compile_cache() -> None:
    """Turn on JAX's persistent compilation cache for every pipeline run.

    The training/sampling programs are compiled per shape; with the cache on
    (and the jitted programs keeping run-dependent data out of the HLO — see
    Trainer._loss) a shape compiles once ever per machine instead of once
    per run (~40 s per training program at the DES flagship shape on a
    remote-compile device).  Opt out / relocate with ``LINNA_COMPILE_CACHE``
    (set to ``0`` to disable)."""
    from .parallel.precompile import compile_cache_dir
    from .utils.runtime import check_map_count

    # long-lived production processes (multi-analysis servers, long sweeps)
    # hit the same vm.max_map_count JIT-mapping exhaustion the test suite
    # root-caused in round 4 — warn (or self-heal, opt-in) at startup
    check_map_count()

    cache_dir = compile_cache_dir()
    if cache_dir is None:
        return
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # persist EVERY compile, including sub-second tiny-op programs: on a
        # remote-compile device even trivial eager ops cost ~1 s each to
        # compile, and a fresh process re-pays dozens of them (measured
        # ~2 min of pre-pipeline wall at the flagship before this was 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # pragma: no cover - cache support is best-effort
        pass


# --------------------------------------------------------------------- chains


def _chain_filename(method: str) -> str:
    if method in ("emcee",) + sampler_run.GRADIENT_METHODS:
        return sampler_run.EMCEE_FILENAME
    if method == "zeus":
        return sampler_run.ZEUS_FILENAME
    raise NotImplementedError(method)


def _open_backend(chainname: str, method: str):
    if method in ("emcee",) + sampler_run.GRADIENT_METHODS:
        return backends.EmceeBackend(chainname)
    return backends.ZeusBackend(chainname)


def _chain_incomplete(chain_path: str, method: str) -> bool:
    """True when the chain file exists but its exact-resume state blob says
    the sampler died mid-run: no ``_finished`` terminal marker (stamped by
    run_ensemble on every legitimate exit — converged, max_iterations, or
    NaN-tau stop) and not ``_converged``.  A chain that stopped on purpose
    without converging keeps the reference's skip-on-existence semantics
    (linna/main.py:273-274) instead of being re-extended on every restart.
    Chains without a blob or without the flags (legacy files,
    reference-produced fixtures) are treated as complete."""
    try:
        blob = _open_backend(chain_path, method).load_state()
    except OSError:
        return False
    if blob is None or ("_converged" not in blob and "_finished" not in blob):
        return False
    done = bool(np.asarray(blob.get("_converged", False))) or bool(
        np.asarray(blob.get("_finished", False))
    )
    return not done


def get_good_walker_list(log_prob_samples: np.ndarray) -> np.ndarray:
    """Cluster walkers by (int-cast) mean log-prob and keep the cluster whose
    center is highest (reference linna/util.py:57-66, KMeans over mean logp).

    The reference selects ``labels[argmax(centers)]`` — indexing a *walker's*
    label by a *cluster* index, which picks an arbitrary cluster; the intended
    selection (argmax center IS the cluster id, since KMeans labels are center
    indices) is implemented here."""
    from sklearn.cluster import KMeans

    x = np.mean(log_prob_samples[-10000:, :], axis=0)
    X = np.stack([x, np.zeros_like(x)], axis=1).astype(int)
    n_clusters = min(8, len(np.unique(X[:, 0])))
    ms = KMeans(n_clusters=max(n_clusters, 1), n_init=10).fit(X)
    best = int(np.argmax(ms.cluster_centers_[:, 0]))
    return np.where(ms.labels_ == best)[0]


def read_chain_and_cut(
    chainname: str,
    nk: float,
    ntimes: float = 20,
    walkercut: bool = False,
    method: str = "emcee",
    flat: bool = False,
):
    """Keep the last ``nk * median(tau)`` steps of the physical-space chain
    (reference linna/util.py:68-94).  ``ntimes`` is diagnostic only, exactly
    as in the reference (linna/util.py:76-77): a keep factor beyond the
    convergence criterion's tau multiple would reach into burn-in."""
    import warnings

    reader = _open_backend(chainname, method)
    raw = reader.get_chain()
    tau = convergence.integrated_time(raw)
    med_tau = np.nanmedian(tau)
    if not np.isfinite(med_tau):
        # every parameter's tau estimate is NaN (a short or stuck chain read
        # outside the converged flow) — int(NaN) would crash after the whole
        # run finished; keep everything and say so instead
        warnings.warn(
            f"all tau estimates are NaN for {chainname}; keeping the full "
            "chain (burn-in included)",
            stacklevel=2,
        )
        nkeep = len(raw)
    else:
        # floor at 1: a well-decorrelated sampler (NUTS measures tau < 1 on
        # the trained emulator) can give tau*nk < 1, and int() -> 0 would
        # silently keep the ENTIRE chain via chain[-0:] — burn-in included
        nkeep = max(int(med_tau * nk), 1)
    if nk > ntimes:
        warnings.warn(
            f"nk={nk} exceeds ntimes={ntimes}: the kept window reaches "
            "beyond the converged span and will include burn-in steps",
            stacklevel=2,
        )
    chain = reader.get_value("chain_transformed")
    log_prob_samples = reader.get_log_prob()
    if walkercut:
        good = get_good_walker_list(log_prob_samples)
    else:
        good = np.arange(log_prob_samples.shape[1])
    chain = chain[-nkeep:, good, :].reshape(-1, chain.shape[-1])
    log_prob_samples = log_prob_samples[-nkeep:, good]
    if flat:
        log_prob_samples = log_prob_samples.reshape(-1, 1)
    return chain, log_prob_samples, reader


# ------------------------------------------------------------------- training


def train_emulator(
    outdir_in: str,
    outdir_list: Sequence[str],
    data_vec: np.ndarray,
    cov: np.ndarray,
    sigma: np.ndarray,
    dolog10index: Optional[Sequence[int]],
    ypositive: bool,
    model_name: str,
    params: dict,
    retrain: bool = False,
    usebest: bool = False,
    seed: int = 1234,
    verbose: bool = False,
    trace_rec: Optional[dict] = None,
) -> None:
    """In-process equivalent of the reference's pickled ``train_NN``
    subprocess (linna/util.py:1315-1472 + linna/train_gpu.py): stack all
    iterations' data, curate, fit transforms, train, drop a finish marker.

    ``trace_rec``: optional mutable dict (the record yielded by
    ``PhaseTimer.phase``) that receives this call's wall-time breakdown —
    data stack/curate/transform-fit seconds, the trainer's internal
    sub-phases and the epoch count — so every flagship run's ``trace.json``
    explains its own training wall (SURVEY §5.1)."""
    # file gates broadcast from the primary: per-host filesystem views can
    # lag on a shared filesystem, and a host that disagrees here would skip
    # (or join late) the global-mesh training collectives below — deadlock
    finish_path = os.path.join(outdir_in, FINISH_MARKER)
    if MH.primary_flag(os.path.isfile(finish_path)) and not retrain:
        return
    n_ensemble_gate = int(params.get("nensemble", 1))
    member_bests = [os.path.join(outdir_in, BEST_CKPT)] + [
        os.path.join(outdir_in, f"ens_{k}/", BEST_CKPT)
        for k in range(1, n_ensemble_gate)
    ]
    if MH.primary_flag(
        all(os.path.isfile(p) for p in member_bests)
    ) and not retrain:
        if MH.is_primary():
            _write_finish(finish_path)
        return

    # per-host stack read (NOT broadcast_from_primary): the sample files were
    # written and CLOSED by the primary before the training-points barrier,
    # so shared-filesystem close-to-open consistency guarantees every host
    # reads identical bytes — unlike the sampler's mid-run reads of a file
    # the primary still holds open (those go through the primary-only
    # loader).  Broadcasting the ~100 MB stacks would cost more than it buys.
    t0 = time.perf_counter()
    # cached fast path: previous iterations' files are immutable, so their
    # curated arrays are reused instead of re-read + re-clipped every
    # iteration (145 s of the LSST flagship's 587 s training wall)
    stack = D.load_curated_stack(outdir_list, ypositive, usebest=usebest)
    x_transform = T.fit_x_transform(stack.train_x, dolog10index)
    y_data = T.YTransformData(jax.numpy.asarray(sigma, dtype=jax.numpy.float32))
    scaled_stats = stack.train_y_for_stats / np.asarray(sigma)
    y_transform = T.fit_y_transform(scaled_stats, ypositive=ypositive)
    transforms = T.TransformSet(x_transform, y_transform, y_data)
    if MH.is_primary():
        T.save_transforms(os.path.join(outdir_in, TRANSFORMS_FILE), transforms)
    if trace_rec is not None:
        trace_rec["stack_fit_s"] = round(time.perf_counter() - t0, 3)

    # Optional PCA+polynomial pre-model under the NN (the reference's
    # ``ChtoModelv2(..., linearmodel=LinearModel(...))`` capability,
    # linna/nn.py:104-108 — production disables it, linna/util.py:1464).
    # ``params["linearmodel"]``: truthy to enable; a dict passes fit kwargs
    # (norder/npc).  The fitted model is persisted pickle-free and added to
    # every member's forward during training AND sampling.
    spec = N.make_model_spec(
        model_name, stack.train_x.shape[-1], stack.train_y.shape[-1]
    )
    linearmodel = None
    lm_cfg = params.get("linearmodel")
    if lm_cfg and spec.linear_bypass:
        # apply_model ignores the external pre-model for linear_bypass specs
        # (the reference's ChtoModelv2_linear.forward never calls
        # self.linearmodel, linna/nn.py:220-232) — silently accepting the
        # combination would train NN+LM but sample NN-only, biasing the
        # posterior.  Fail at configuration time instead.
        raise ValueError(
            f"params['linearmodel'] cannot be combined with the "
            f"'{model_name}' model: its built-in 1e-3 linear bypass replaces "
            f"the external pre-model slot (reference linna/nn.py:220-232). "
            f"Use 'chto_v2' or 'chto_simple' with linearmodel, or drop it."
        )
    if lm_cfg:
        from . import linear_model as LM
        from .losses import SENTINEL_HIGH, SENTINEL_LOW

        lm_path = os.path.join(outdir_in, LINEAR_MODEL_FILE)
        if MH.primary_flag(os.path.isfile(lm_path)):
            linearmodel = LM.load_linear_model(lm_path)
        else:
            # fit X-transformed inputs -> standardized targets (the NN's own
            # input/output spaces), excluding sentinel-carrying rows; the fit
            # is deterministic on the shared sample files, so every pod host
            # computes the identical model
            jnpf = jax.numpy.float32
            x_in = np.asarray(
                x_transform(jax.numpy.asarray(stack.train_x, jnpf))
            )
            y_raw = np.asarray(stack.train_y, np.float64)
            good = ~np.any(
                (y_raw == SENTINEL_LOW) | (y_raw == SENTINEL_HIGH), axis=1
            )
            y_std = np.asarray(
                y_transform.inverse(y_data(jax.numpy.asarray(y_raw[good], jnpf)))
            )
            lm_kwargs = dict(lm_cfg) if isinstance(lm_cfg, dict) else {}
            linearmodel = LM.fit_linear_model(x_in[good], y_std, **lm_kwargs)
            if MH.is_primary():
                LM.save_linear_model(lm_path, linearmodel)

    loss_state = L.build_loss_state(data_vec, cov, transforms)
    # nensemble > 1 trains K independently seeded emulators (member 0 in
    # outdir_in for reference artifact parity, members 1..K-1 in ens_k/);
    # sampling combines them conservatively — see likelihood.make_log_prob.
    n_ensemble = int(params.get("nensemble", 1))
    member_dirs = [outdir_in] + [
        os.path.join(outdir_in, f"ens_{k}/") for k in range(1, n_ensemble)
    ]
    seeds = [seed + 1000 * k for k in range(n_ensemble)]
    train_kwargs = dict(
        num_epochs=int(params.get("num_epochs", 4500)),
        batch_size=int(params.get("batch_size", 500)),
        initfrombest=True,
        epochs_per_dispatch=params.get("epochs_per_dispatch"),
        verbose=verbose,
    )
    # Mesh path: all ensemble members advance concurrently as one sharded
    # device program (member axis over 'ens', per-member batches over
    # 'data') — the multi-device activation of the DDP the reference
    # scaffolded (linna/predictor_gpu.py:264-267).  The serial path remains
    # for single-member single-chip runs and as the parity baseline
    # (params={"serial_members": True}).
    use_mesh = (n_ensemble > 1 or jax.device_count() > 1) and not params.get(
        "serial_members"
    )
    # opt-in bf16 forward/backward for training (f32 master weights);
    # see docs/TRAINING_PERF.md for the measured verdict at the DES shape
    train_cdtype = params.get("train_compute_dtype")
    if use_mesh:
        from .parallel.ensemble import EnsembleTrainer

        t0 = time.perf_counter()
        trainer = EnsembleTrainer(
            spec, transforms, loss_state, member_dirs, seeds,
            compute_dtype=train_cdtype, linearmodel=linearmodel,
        )
        if trace_rec is not None:
            # eager member-init device ops (init_model + vmapped optimizer
            # init) — on a tunneled device these pay per-op round trips
            trace_rec["trainer_init_s"] = round(time.perf_counter() - t0, 3)
        trainer.train(
            stack.train_x, stack.train_y, stack.val_x, stack.val_y, **train_kwargs
        )
        if trace_rec is not None:
            trace_rec["trainer"] = {
                k: round(v, 3) for k, v in trainer.phase_seconds.items()
            }
            trace_rec["epochs_run"] = trainer.epochs_run
    elif MH.is_primary():
        # the serial Trainer is a single-host program with no global-mesh
        # collectives — on a pod only the primary runs it (every host
        # training would race the same shared checkpoint files); the others
        # wait at the barrier below and read the primary's artifacts
        for mi, (member_dir, member_seed) in enumerate(zip(member_dirs, seeds)):
            os.makedirs(member_dir, exist_ok=True)
            t0 = time.perf_counter()
            trainer = Trainer(
                spec, transforms, loss_state, outdir=member_dir,
                seed=member_seed, compute_dtype=train_cdtype,
                linearmodel=linearmodel,
            )
            if trace_rec is not None:
                trace_rec[f"trainer_init_s_m{mi}"] = round(
                    time.perf_counter() - t0, 3
                )
            trainer.train(
                stack.train_x, stack.train_y, stack.val_x, stack.val_y,
                **train_kwargs,
            )
            if trace_rec is not None:
                trace_rec[f"trainer_m{mi}"] = {
                    k: round(v, 3) for k, v in trainer.phase_seconds.items()
                }
                trace_rec[f"epochs_run_m{mi}"] = trainer.epochs_run
    if MH.is_primary():
        _write_finish(finish_path)
    # non-primary pod hosts proceed only once the primary's checkpoints and
    # transforms are on the shared filesystem (they read them right after)
    MH.barrier("train-emulator")


def _write_finish(path: str) -> None:
    with open(path, "w") as f:
        json.dump({"status": "done"}, f)


def _train_in_subprocess(
    outdir_in, outdir_list, data, cov, sigma, dolog10index, ypositive,
    model_name, params, usebest, verbose,
) -> None:
    """Serialize the request and run ``python -m linna_tpu.train_entry``
    (the reference's GPU-process handoff, pickle-free)."""
    import subprocess
    import sys as _sys

    from . import train_entry as TE

    if os.path.isfile(os.path.join(outdir_in, FINISH_MARKER)):
        return
    TE.write_request(
        outdir_in, outdir_list, data, cov, sigma, dolog10index, ypositive,
        model_name, params, usebest,
    )
    cmd = [_sys.executable, "-m", "linna_tpu.train_entry", outdir_in]
    if verbose:
        cmd.append("--verbose")
    proc = subprocess.run(cmd, capture_output=not verbose)
    if proc.returncode != 0:
        tail = (proc.stderr or b"").decode(errors="replace")[-2000:]
        raise RuntimeError(f"training subprocess failed:\n{tail}")
    if not os.path.isfile(os.path.join(outdir_in, FINISH_MARKER)):
        raise RuntimeError("training subprocess exited without finish marker")


def retrieve_model(
    outdir: str, in_size: int, out_size: int, model_name: str = "chto_v2"
) -> Trainer:
    """Rebuild a trained emulator from artifacts (reference
    linna/util.py:611-639: unpickle transforms + load best checkpoint)."""
    transforms = T.load_transforms(os.path.join(outdir, TRANSFORMS_FILE))
    spec = N.make_model_spec(model_name, in_size, out_size)
    # loss state not needed for inference; build a trivial one
    trainer = Trainer.__new__(Trainer)
    trainer.spec = spec
    trainer.transforms = transforms
    trainer.loss_state = None
    trainer.linearmodel = None
    lm_path = os.path.join(outdir, LINEAR_MODEL_FILE)
    # linear_bypass specs never train with an external pre-model (the
    # constructors raise on the combination); a stale artifact from another
    # model config must not be attached, since apply_model would ignore it
    # while Trainer._loss would not
    if os.path.isfile(lm_path) and not spec.linear_bypass:
        from .linear_model import load_linear_model

        trainer.linearmodel = load_linear_model(lm_path)
    trainer.outdir = outdir
    trainer.seed = 0
    trainer.key = jax.random.key(0)
    trainer.params = N.init_model(jax.random.key(0), spec)
    trainer.best_val_loss = float("inf")
    trainer.lr = 1e-4
    trainer.wd = 1e-4
    from .utils import checkpoint as ckpt

    trainer.params, _, _ = ckpt.load_checkpoint(
        os.path.join(outdir, BEST_CKPT), trainer.params
    )
    return trainer


def retrieve_ensemble_params(outdir: str, trainer: Trainer) -> list:
    """Load all ensemble members' best params: member 0 is ``trainer``'s own
    checkpoint, further members live in ``ens_k/`` subdirs."""
    from .utils import checkpoint as ckpt

    params_list = [trainer.params]
    k = 1
    while True:
        path = os.path.join(outdir, f"ens_{k}/", BEST_CKPT)
        if not os.path.isfile(path):
            break
        member, _, _ = ckpt.load_checkpoint(path, trainer.params)
        params_list.append(member)
        k += 1
    return params_list


def _saved_shapes(outdir: str):
    # ndmin=2: a one-parameter run's single-column file must read as (N, 1)
    # (atleast_2d on the squeezed 1-D array would report N as the input size)
    x = np.loadtxt(os.path.join(outdir, "train_samples_x.txt"), ndmin=2)
    y = np.load(os.path.join(outdir, "train_samples_y.npy"))
    return int(x.shape[1]), int(np.atleast_2d(y).shape[1])


def retrieve_model_exist(
    outdir: str, in_size: int, out_size: int, model_name: str = "chto_v2"
):
    """Retrieval with shapes inferred from the saved training data, for
    models trained with padded dimensions (reference linna/util.py:641-713).

    Returns (trainer, incut, outcut): ``incut`` is the model's true input
    size (>= ``in_size`` when the checkpoint was trained with extra params),
    ``outcut`` the requested output size to cut predictions to (pass it as
    ``likelihood.make_log_prob(out_cut=...)``; the reference computed this
    value and then never applied it — a latent shape crash,
    linna/main.py:254-263 + util.py:1014).

    Raises ``ValueError`` when the checkpoint's output is NARROWER than the
    requested ``out_size`` — a cut cannot invent data-vector components.
    """
    in_saved, out_saved = _saved_shapes(outdir)
    if out_saved < out_size:
        raise ValueError(
            f"checkpoint under {outdir} was trained with a {out_saved}-point "
            f"output but a {out_size}-point data vector was requested; a "
            "narrower model cannot be cut up to the data size"
        )
    trainer = retrieve_model(outdir, in_saved, out_saved, model_name)
    incut = max(in_saved, in_size)
    return trainer, incut, out_size


def retrieve_model_wrapper(outdir: str, model_name: str = "chto_v2"):
    """User-facing retrieval (reference ``retrieve_model_wrapper_in``,
    linna/util.py:715-734): returns a pure, jit/grad-compatible function
    mapping physical parameters to the emulated data vector in raw data
    space (X_transform -> model -> y_transform -> y_invtransform_data)."""
    in_size, out_size = _saved_shapes(outdir)
    trainer = retrieve_model(outdir, in_size, out_size, model_name)
    spec, params, transforms = trainer.spec, trainer.params, trainer.transforms

    linearmodel = trainer.linearmodel

    def emulator(x):
        x = jax.numpy.asarray(x, jax.numpy.float32)
        one = x.ndim == 1
        if one:
            x = x[None, :]
        x_in = transforms.x_transform(x)
        pred = N.apply_model(spec, params, x_in, linearmodel=linearmodel)
        out = transforms.y_data.inverse(transforms.y_transform(pred))
        return out[0] if one else out

    return emulator


# ------------------------------------------------------------------ main loop


def ml_sampler(
    outdir: str,
    theory: Callable,
    priors: Sequence[dict],
    data: np.ndarray,
    cov: np.ndarray,
    init: np.ndarray,
    pool=None,
    nwalkers: int = 128,
    gpunode: Optional[str] = None,
    omegab2cut: Optional[Sequence] = None,
    nepoch: int = 4500,
    method: str = "zeus",
    nbest=None,
    chisqcut: Optional[float] = None,
    loglikelihoodfunc: Optional[Callable] = None,
):
    """LINNA with the To et al. 2022 hyperparameters baked in
    (reference linna/main.py:22-75).

    ``method`` may be a single sampler name or a 4-entry per-iteration list
    (``methodArr`` — extension beyond the reference's single-method table):
    e.g. ``["zeus", "zeus", "zeus", "nuts"]`` anneals with the ensemble
    slice sampler and draws the final posterior with NUTS gradients through
    the emulator — the framework's measured-best flagship path
    (docs/FLAGSHIP.md).  The gradient samplers (``hmc``/``nuts``) use the
    zeus convergence table: their integrated autocorrelation time on the
    trained emulator is O(1), so the tau-multiple criterion is loose by
    construction and the Delta-tau / split-half stationarity thresholds are
    the binding ones."""
    ntrainArr = [10000] * 4
    nvalArr = [500] * 4
    per_method = {
        "emcee": ([2, 2, 5, 4], [5, 5, 10, 15], [0.03, 0.03, 0.02, 0.01]),
        "zeus": ([2, 2, 5, 5], [5, 5, 10, 50], [0.03, 0.03, 0.02, 0.01]),
    }
    per_method["hmc"] = per_method["zeus"]
    per_method["nuts"] = per_method["zeus"]
    methods = [method] * 4 if isinstance(method, str) else [str(m) for m in method]
    if len(methods) != 4:
        raise ValueError(
            f"ml_sampler's paper schedule has 4 iterations; method list has "
            f"{len(methods)} entries (use ml_sampler_core for other schedules)"
        )
    unknown = [m for m in methods if m not in per_method]
    if unknown:
        raise NotImplementedError(unknown[0])
    nkeepArr = [per_method[m][0][i] for i, m in enumerate(methods)]
    ntimesArr = [per_method[m][1][i] for i, m in enumerate(methods)]
    ntautolArr = [per_method[m][2][i] for i, m in enumerate(methods)]
    temperatureArr = [4.0, 2.0, 1.0, 1.0]
    meanshiftArr = [0.2] * 4
    stdshiftArr = [0.15] * 4
    # nensemble=4 is an extension beyond the reference defaults: a 4-member
    # emulator ensemble with the conservative combined likelihood removes
    # the high-dimensional blind-valley bias (0.03-sigma posterior parity on
    # the 33-dim Gaussian vs 4-5x-too-wide for a single emulator); set
    # params["nensemble"]=1 via ml_sampler_core for strict reference behavior
    params = {
        "trainingoption": 1,
        "num_epochs": nepoch,
        "batch_size": 500,
        "nensemble": 4,
    }
    return ml_sampler_core(
        ntrainArr,
        nvalArr,
        nkeepArr,
        ntimesArr,
        ntautolArr,
        meanshiftArr,
        stdshiftArr,
        outdir,
        theory,
        priors,
        data,
        cov,
        init,
        pool,
        nwalkers,
        device=None,
        dolog10index=None,
        ypositive=False,
        temperatureArr=temperatureArr,
        omegab2cut=omegab2cut,
        gpunode=gpunode,
        nnmodel_in="chto_v2",
        params=params,
        method=methods,
        nbest=nbest,
        chisqcut=chisqcut,
        loglikelihoodfunc=loglikelihoodfunc,
    )


def ml_sampler_core(
    ntrainArr,
    nvalArr,
    nkeepArr,
    ntimesArr,
    ntautolArr,
    meanshiftArr,
    stdshiftArr,
    outdir: str,
    theory: Callable,
    priors: Sequence[dict],
    data: np.ndarray,
    cov: np.ndarray,
    init: np.ndarray,
    pool=None,
    nwalkers: int = 128,
    device=None,
    dolog10index: Optional[Sequence[int]] = None,
    ypositive: bool = False,
    temperatureArr: Sequence[float] = (4.0, 2.0, 1.0, 1.0),
    omegab2cut: Optional[Sequence] = None,
    docuda: bool = False,
    tsize: int = 1,
    gpunode: Optional[str] = None,
    nnmodel_in: str = "chto_v2",
    params: Optional[dict] = None,
    method: str = "emcee",
    nbest=None,
    chisqcut: Optional[float] = None,
    loglikelihoodfunc: Optional[Callable] = None,
    nsigma: float = 3,
    externalloglike: Optional[Callable] = None,
    seed: int = 0,
    verbose: bool = False,
):
    """Reference-parity iterative loop (linna/main.py:77-335).

    Returns (chain, log_prob) of the final iteration, chain in physical space.
    """
    _enable_compile_cache()
    D.clear_cache()  # never reuse a previous run's curated stacks
    params = dict(params or {})
    if not isinstance(nnmodel_in, str):
        nnmodel_in = getattr(nnmodel_in, "__name__", "chto_v2")
        nnmodel_in = {
            "ChtoModelv2": "chto_v2",
            "ChtoModelsimple": "chto_simple",
            "ChtoModelv2_linear": "chto_v2_linear",
        }.get(nnmodel_in, "chto_v2")
    data = np.asarray(data, dtype=np.float64)
    cov = np.asarray(cov, dtype=np.float64)
    init = np.asarray(init, dtype=np.float64)
    ndim = len(init)
    sigma = np.sqrt(np.diag(cov))
    inv_cov = np.linalg.inv(cov)
    pack = P.priors_from_list(priors)
    prior_range = P.prior_range(pack)
    init_white = np.atleast_1d(np.asarray(P.inv_transform(pack, init)))
    # ``method`` may be per-iteration (extension beyond the reference's
    # single method, linna/util.py:1474-1504): e.g. ["zeus","zeus","nuts",
    # "nuts"] samples the cheap annealed iterations with the ensemble slice
    # and the final posterior with the gradient sampler (~2x the ESS rate on
    # the trained emulator — docs/FLAGSHIP.md).
    if isinstance(method, str):
        methods = [method] * len(ntrainArr)
    else:
        methods = [str(m) for m in method]
        if len(methods) != len(ntrainArr):
            raise ValueError(
                f"method list has {len(methods)} entries for "
                f"{len(ntrainArr)} iterations"
            )
    for m in methods:
        _chain_filename(m)  # validate eagerly: unknown method fails fast
    # Two orthogonal gates (SURVEY §2.8 / docs/MULTIHOST.md): ``is_master``
    # is the *pool* master (controls the host-pool fan-out; with one pool per
    # pod host every host is its own master and runs the full compute path),
    # ``MH.is_primary()`` is the *multihost* process-0 gate for filesystem
    # writes (the reference's master-rank artifact gating, linna/util.py:1178).
    is_master = pool is None or pool.is_master()

    options = int(params.get("trainingoption", 0))
    timer = PhaseTimer(outdir if is_master and MH.is_primary() else None)
    rng = np.random.default_rng(seed)

    # Background compile warming: every iteration trains on a different
    # stacked shape, so on a fresh machine each pays a 30-60 s XLA compile
    # serially (measured: 152 s of the LSST flagship's training wall).  The
    # future shapes are known exactly from the schedule whenever nothing
    # data-dependent changes the row counts — warm them in a daemon thread
    # so the foreground dispatch finds the executables in the persistent
    # compilation cache.  See parallel/precompile.py for the gating story.
    n_ens_warm = int(params.get("nensemble", 1))
    use_mesh_warm = (
        n_ens_warm > 1 or jax.device_count() > 1
    ) and not params.get("serial_members")
    if (
        is_master
        and use_mesh_warm
        and MH.process_count() == 1
        and not params.get("train_subprocess")
        and not ypositive
        and nbest is None
        and chisqcut is None
        # a fitted linearmodel embeds in the trainer/sampler HLO as
        # constants, so the dummy-model warm programs would never match
        and not params.get("linearmodel")
    ):
        from .parallel import precompile

        # the sampler half is warmable only when its likelihood is the plain
        # ensemble-Gaussian one (user callables / fused / reduced-precision
        # variants trace to different HLO than the dummy)
        warm_methods = (
            methods
            if (
                loglikelihoodfunc is None
                and externalloglike is None
                and not params.get("use_fused")
                and params.get("compute_dtype") is None
            )
            else ()
        )
        precompile.warm_pipeline(
            nnmodel_in,
            ndim,
            int(np.asarray(data).shape[-1]),
            n_ens_warm,
            shapes=[
                (int(sum(ntrainArr[: i + 1])), int(sum(nvalArr[: i + 1])))
                for i in range(len(ntrainArr))
            ],
            batch_size=int(params.get("batch_size", 500)),
            num_epochs=int(params.get("num_epochs", 4500)),
            epochs_per_dispatch=int(params.get("epochs_per_dispatch") or 10),
            compute_dtype=params.get("train_compute_dtype"),
            methods=warm_methods,
            nwalkers=nwalkers,
        )

    chain = None
    for i, (nt, nv, nk, ntimes, tautol, temperature, meanshift, stdshift) in enumerate(
        zip(
            ntrainArr,
            nvalArr,
            nkeepArr,
            ntimesArr,
            ntautolArr,
            temperatureArr,
            meanshiftArr,
            stdshiftArr,
        )
    ):
        nbest_in = nbest[i] if isinstance(nbest, list) else nbest
        if isinstance(nbest, list) and nbest_in is not None and nbest_in <= 0:
            nbest_in = None
        negloglike = None
        if nbest_in is not None:
            import tempfile

            tempdir = tempfile.mkdtemp()

            def negloglike(x, _tmp=tempdir):
                d = data - theory([-1, x], _tmp)
                return float(d @ inv_cov @ d)

        temperature = float(temperature) ** 2  # linna/main.py:153
        outdir_in = os.path.join(outdir, f"iter_{i}/")
        if i == 0:
            chain = None
        elif MH.is_primary():
            # the cut chain only feeds the primary-gated training-point
            # generation below; the other pod hosts skip the full-chain
            # HDF5 read + tau estimate it costs.  Phase-timed: at flagship
            # scale these reads + their batched-FFT tau estimates are
            # multi-second host work that previously hid outside every
            # trace phase (the r04 run's ~60 s of unattributed wall).
            prev = os.path.join(
                outdir, f"iter_{i-1}/", _chain_filename(methods[i - 1])
            )
            with timer.phase("read_chain_and_cut", iteration=i - 1):
                chain, _, _ = read_chain_and_cut(
                    prev, nk, ntimes, method=methods[i - 1]
                )

        nnsampler = SG.NNSampler(outdir_in, prior_range)
        with timer.phase("generate_training_point", iteration=i, n=nt + nv):
            # theory fan-out is host-CPU work through the pool: the multihost
            # primary drives it and writes the sample files; other pod hosts
            # rendezvous and read them from the shared filesystem
            if MH.is_primary():
                SG.generate_training_point(
                    theory,
                    nnsampler,
                    pool,
                    outdir_in,
                    nt,
                    nv,
                    data,
                    inv_cov,
                    chain,
                    nsigma=nsigma,
                    omegab2cut=omegab2cut,
                    options=options,
                    negloglike=negloglike,
                    nbest_in=nbest_in,
                    chisqcut=chisqcut,
                )
            MH.barrier(f"training-points-{i}")
        chain = None

        if is_master:
            outdir_list = [os.path.join(outdir, f"iter_{m}/") for m in range(i + 1)]
            with timer.phase("train_emulator", iteration=i) as trec, \
                    device_profile(f"train_iter{i}"):
                if params.get("train_subprocess"):
                    # process-separated mode (reference train_gpu.py handoff,
                    # linna/main.py:186-252) — crash isolation / CLI parity.
                    # Pod: only the primary spawns the trainer (the child is
                    # single-process and writes the shared checkpoints); the
                    # other hosts rendezvous and read its artifacts.
                    if MH.is_primary():
                        _train_in_subprocess(
                            outdir_in, outdir_list, data, cov, sigma,
                            dolog10index, ypositive, nnmodel_in, params,
                            usebest=nbest_in is not None, verbose=verbose,
                        )
                    MH.barrier(f"train-subprocess-{i}")
                else:
                    train_emulator(
                        outdir_in,
                        outdir_list,
                        data,
                        cov,
                        sigma,
                        dolog10index,
                        ypositive,
                        nnmodel_in,
                        params,
                        usebest=nbest_in is not None,
                        verbose=verbose,
                        trace_rec=trec,
                    )

            # skip MCMC when this iteration's chain already exists AND is
            # complete (linna/main.py:273-274 file gating — the reference
            # skips on bare existence, so a crash mid-sampling silently
            # ships an unconverged chain on restart; here the exact-resume
            # state blob distinguishes a finished chain from one whose
            # sampler died mid-run, and the latter resumes through
            # run_ensemble's bitwise-exact resume path).  The primary's view
            # is broadcast — a host that disagreed would skip the sharded
            # sampler collectives the others dispatch.
            chain_path = os.path.join(outdir_in, _chain_filename(methods[i]))
            if not MH.primary_flag(
                os.path.isfile(chain_path)
                and not _chain_incomplete(chain_path, methods[i])
            ):
                # reference main.py:255-263: fall back to shape-inferred
                # retrieval with flat[-1,1]-padded priors when the saved
                # checkpoint was trained with more parameters than ``init``.
                # The reference used a blanket try/except here; an explicit
                # shape comparison keeps genuine retrieval failures
                # (corrupt checkpoint, missing transforms) loud.
                in_saved, out_saved = _saved_shapes(outdir_in)
                out_cut = len(data) if out_saved != len(data) else None
                if in_saved == ndim and out_cut is None:
                    trainer = retrieve_model(outdir_in, ndim, len(data), nnmodel_in)
                    pack_run, ndim_run, init_run = pack, ndim, init_white
                else:
                    # dimension-padded checkpoint: inputs get prior-padded
                    # walkers, predictions get cut to the data width
                    trainer, incut, _ = retrieve_model_exist(
                        outdir_in, ndim, len(data), nnmodel_in
                    )
                    priors_new = list(priors) + [
                        {"dist": "flat", "arg1": -1, "arg2": 1}
                        for _ in range(incut - ndim)
                    ]
                    pack_run = P.priors_from_list(priors_new)
                    ndim_run = incut
                    init_run = np.concatenate(
                        [init_white, np.zeros(incut - ndim)]
                    )
                params_lp = retrieve_ensemble_params(outdir_in, trainer)
                log_prob = LK.make_log_prob(
                    trainer.spec,
                    params_lp if len(params_lp) > 1 else trainer.params,
                    trainer.transforms,
                    pack_run,
                    data,
                    inv_cov,
                    temperature=temperature,
                    loglike_fn=loglikelihoodfunc,
                    external_loglike=externalloglike,
                    use_fused=bool(params.get("use_fused")),
                    compute_dtype=params.get("compute_dtype"),
                    out_cut=out_cut,
                    linearmodel=trainer.linearmodel,
                )
                jitter = 0.1 if methods[i] == "emcee" else 0.001
                x0 = init_run + jitter * rng.standard_normal((nwalkers, ndim_run))
                with timer.phase(
                    "mcmc", iteration=i, method=methods[i]
                ) as mrec, device_profile(f"mcmc_iter{i}"):
                    sampler_run.run_ensemble(
                        log_prob,
                        x0,
                        outdir_in,
                        method=methods[i],
                        transform=lambda x, _p=pack_run: P.transform_np(_p, x),
                        ntimes=ntimes,
                        tautol=tautol,
                        meanshift=meanshift,
                        stdshift=stdshift,
                        nk=nk,
                        seed=seed + i,
                        progress=verbose,
                        trace_rec=mrec,
                    )
            # iteration boundary: the next iteration (and the final read
            # below) reads this iteration's chain file on every pod host
            MH.barrier(f"mcmc-{i}")

    # final chain
    last = os.path.join(
        outdir, f"iter_{len(ntrainArr)-1}/", _chain_filename(methods[-1])
    )
    # the returned log-probs are the SAME cut rows as the chain.  (The
    # reference overwrites them with the full-chain flat array,
    # linna/main.py:291 — misaligned with the cut chain it returns next to
    # them; deliberate deviation.)
    with timer.phase("read_chain_and_cut", iteration=len(ntrainArr) - 1):
        chain, log_prob_samples, reader = read_chain_and_cut(
            last, nkeepArr[-1], ntimesArr[-1], method=methods[-1], flat=True
        )

    if "nimp" in params and is_master:
        imp_args = (
            outdir,
            last,
            params,
            nkeepArr[-1],
            ntimesArr[-1],
            methods[-1],
            theory,
            pool,
            priors,
            data,
            inv_cov,
            prior_range,
            rng,
        )
        if MH.is_primary():
            with timer.phase("importance_sampling", n=int(params["nimp"])):
                chain, log_prob_samples = _importance_sampling(*imp_args)
        # non-primary pod hosts rendezvous, then take the file-gated read
        # paths through the same function (samples/theory already on disk)
        MH.barrier("importance")
        if not MH.is_primary():
            chain, log_prob_samples = _importance_sampling(*imp_args)
    return chain, log_prob_samples


def _importance_sampling(
    outdir,
    chain_name,
    params,
    nk,
    ntimes,
    method,
    theory,
    pool,
    priors,
    data,
    inv_cov,
    prior_range,
    rng,
):
    """Exact-theory importance reweighting of the final chain
    (reference linna/main.py:297-334): subsample, evaluate the true theory,
    weight by exp(logp_true - logp_emulator), zero out 2-sigma log-weight
    outliers."""
    samples_path = os.path.join(outdir, "samples_im.npy")
    logp_path = os.path.join(outdir, "log_prob_samples_x.npy")
    if not os.path.isfile(samples_path):
        chain, log_prob_samples, _ = read_chain_and_cut(
            chain_name, nk, ntimes, method=method, flat=True
        )
        log_prob_samples = np.asarray(log_prob_samples).flatten()
        select = rng.integers(0, len(chain), int(params["nimp"]))
        chain = chain[select]
        log_prob_samples = log_prob_samples[select]
        np.save(samples_path, chain)
        np.save(logp_path, log_prob_samples)
    else:
        chain = np.load(samples_path)
        log_prob_samples = np.load(logp_path)

    outimp = os.path.join(outdir, "imp/")
    os.makedirs(outimp, exist_ok=True)
    theory_path = os.path.join(outdir, "theory.npy")
    nnsampler = SG.NNSampler(outimp, prior_range)
    if not os.path.isfile(theory_path):
        theory_vals = nnsampler.generate_training_data(
            zip(range(len(chain)), chain), theory, pool=pool, args=[outimp]
        )
        np.save(theory_path, theory_vals)
    else:
        theory_vals = np.load(theory_path)

    pack = P.priors_from_list(priors)
    logp = np.array(
        [
            -0.5 * float((t[: len(data)] - data) @ inv_cov @ (t[: len(data)] - data))
            + float(P.log_prior_physical(pack, jax.numpy.asarray(s, jax.numpy.float32)))
            for t, s in zip(theory_vals, chain)
        ]
    )
    # log-space weights: the reference's w=exp(logp-logp_em) then log(w)
    # (linna/main.py:331-333) overflows to inf/NaN for |Delta logp| beyond
    # ~709 — exactly the outliers the 2-sigma zeroing exists to catch — and
    # one such point poisons mean/std so nothing gets zeroed.  Computing
    # logw directly and shifting before exponentiation is exact for the
    # well-conditioned case and robust for the pathological one.
    logw = logp - log_prob_samples
    # a failed theory evaluation (NaN/inf data vector -> non-finite logp)
    # must not poison the outlier statistics: one NaN makes mean/std NaN and
    # the keep mask all-False (then max over an empty slice crashes).  Such
    # rows get weight 0 and the 2-sigma clip runs over the finite rest.
    finite = np.isfinite(logw)
    if not finite.any():
        raise RuntimeError(
            "importance sampling: every subsampled point produced a "
            f"non-finite log-weight; inspect {theory_path}"
        )
    ref = logw[finite]
    keep = finite & (np.abs(logw - np.mean(ref)) <= 2 * np.std(ref))
    w = np.zeros_like(logw)
    w[keep] = np.exp(logw[keep] - np.max(logw[keep]))
    w = w / np.sum(w)
    if MH.is_primary():
        np.save(os.path.join(outdir, "weight_im.npy"), [log_prob_samples, logp, w])
    return chain, log_prob_samples

"""Headline benchmark: emulator-likelihood throughput on the MCMC hot path.

Measures full ensemble-sampler walker updates (stretch move: proposal +
batched ChtoModelv2 forward + chi^2 + prior + accept) per second on a
DES-Y1-3x2pt-shaped problem (27 params, 457-point data vector, WALKERS=4096),
then compares against the reference's architecture on the same hardware
class: one emulator likelihood at a time through a torch CPU forward
(reference linna/util.py:990 ``Log_prob`` called per walker per move via the
MPI pool; inference path linna/predictor_gpu.py:461-504).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "evals/s", "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

NDIM = 27
NDATA = 457
# Production-scale ensemble: the batch-native design lets walker count be a
# throughput knob (measured scaling on v5e: 1024 -> ~4-8 M evals/s,
# 4096 -> ~12 M, 16384 -> ~23 M); 4096 is a realistic multi-chain ensemble.
WALKERS = 4096
CHUNK = 100  # sampler steps per device program (production check cadence)


def _enable_compile_cache():
    """Persist compiled programs so cold-start runs don't pay the remote
    compile twice (first compile over a tunneled TPU is minutes).  One
    source of truth: the orchestrator helper (honors LINNA_COMPILE_CACHE)."""
    from linna_tpu.orchestrator import _enable_compile_cache as enable

    enable()


def bench_tpu(reps: int = 5, chunks_per_rep: int = 3) -> tuple:
    """Walker log-prob evaluations/sec inside the jitted sampler chunk.

    Each repetition dispatches ``chunks_per_rep`` chunks back-to-back with
    one final synchronization — the r01/r02 pipelined-throughput methodology
    (a per-chunk sync would charge the host->device dispatch round-trip,
    ~20 ms over a tunneled link, against on-device compute) — and the
    median + IQR over ``reps`` repetitions makes measurement noise
    distinguishable from a real regression (single-shot timing hid a 12%
    r01->r02 swing)."""
    import jax

    from __graft_entry__ import _build_problem
    from linna_tpu.samplers import stretch

    *_, log_prob = _build_problem(NDIM, NDATA)
    x0 = jax.random.normal(jax.random.key(1), (WALKERS, NDIM), dtype="float32")
    state = stretch.init_state(jax.random.key(2), x0, log_prob)

    # warmup/compile (twice: first run pays compile, second warms caches)
    for _ in range(2):
        state, chain, _ = stretch.stretch_chunk(log_prob, state, CHUNK, 2.0)
        jax.block_until_ready(chain)

    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(chunks_per_rep):
            state, chain, _ = stretch.stretch_chunk(log_prob, state, CHUNK, 2.0)
        jax.block_until_ready(chain)
        dt = time.perf_counter() - t0
        # one stretch step evaluates log_prob for every walker once
        rates.append(WALKERS * CHUNK * chunks_per_rep / dt)
    rates = np.asarray(rates)
    q1, med, q3 = np.percentile(rates, [25, 50, 75])
    return float(med), float(q3 - q1)


BASELINE_FILE = "reference_baseline.json"


def pinned_baseline() -> float:
    """Reference-architecture baseline with a pinned methodology.

    The single-walker torch rate is host-load sensitive, so the value is
    measured once (4 torch threads, best of 3 repeats of >=300 evals) and
    stored in ``reference_baseline.json`` next to this script; subsequent
    bench runs report against the stored number.  Delete the file to
    re-measure on a new hardware class."""
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), BASELINE_FILE)
    if os.path.isfile(path):
        with open(path) as f:
            return float(json.load(f)["evals_per_sec"])
    import torch

    torch.set_num_threads(4)
    rate = max(bench_reference_style() for _ in range(3))
    with open(path, "w") as f:
        json.dump(
            {
                "evals_per_sec": round(rate, 2),
                "methodology": "single-walker torch CPU ChtoModelv2 likelihood "
                "(reference linna/util.py:990 architecture), torch.jit "
                "optimize_for_inference, 4 threads, best of 3 repeats",
            },
            f,
            indent=1,
        )
    return rate


def bench_reference_style(max_evals: int = 300, max_seconds: float = 30.0) -> float:
    """Reference-architecture baseline measured live: single-walker torch CPU
    emulator likelihood (same ChtoModelv2 topology/widths), eval-mode
    ``torch.jit`` inference like linna/predictor_gpu.py:480-490."""
    import torch

    h = 1000 if NDATA > 30 else max(32, 32 * NDATA)

    class ResBlock(torch.nn.Module):
        def __init__(self, n_in, ch, n_out):
            super().__init__()
            self.l1 = torch.nn.Linear(n_in, ch)
            self.l2 = torch.nn.Linear(ch, n_out)
            self.skip = torch.nn.Linear(n_in, n_out, bias=False)

        def forward(self, x):
            return torch.relu(0.1 * self.l2(torch.relu(self.l1(x))) + self.skip(x))

    class Model(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.l1 = torch.nn.Linear(NDIM, h)
            self.rb1 = ResBlock(h, 16, h // 2)
            self.rb2 = ResBlock(h // 2, 32, h // 4)
            self.rb3 = ResBlock(h // 4, 64, h // 8)
            self.l6 = torch.nn.Linear(h // 8, h // 2)
            self.l7 = torch.nn.Linear(h // 2, NDATA)
            self.l8 = torch.nn.Linear(NDATA, NDATA)

        def forward(self, x):
            s = torch.relu(self.l1(x))
            s = self.rb3(self.rb2(self.rb1(s)))
            s = torch.relu(self.l6(s))
            s = torch.relu(self.l7(s))
            return self.l8(s)

    # thread pinning happens once in pinned_baseline() (4 threads, best of
    # 3, quiet host) — the methodology recorded in reference_baseline.json
    model = Model().eval()
    try:
        model = torch.jit.optimize_for_inference(
            torch.jit.script(model)
        )  # reference's MKLDNN/TorchScript fast path
    except Exception:
        pass
    data = torch.randn(NDATA)
    inv_cov = torch.eye(NDATA)
    xs = [torch.randn(1, NDIM) for _ in range(max_evals)]
    with torch.no_grad():
        model(xs[0])  # warmup
        n = 0
        t0 = time.perf_counter()
        for x in xs:
            m = model(x)[0]
            d = m - data
            _ = -0.5 * (d @ inv_cov @ d) - 0.5 * (x**2).sum()
            n += 1
            if time.perf_counter() - t0 > max_seconds:
                break
        dt = time.perf_counter() - t0
    return n / dt


HISTORY_FILE = "bench_history.json"


def _update_history(value: float, spread: float) -> list:
    """Append this run to the per-run history file (last 20 entries kept) so
    cross-round moves are attributable to noise (within IQR) or real change."""
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), HISTORY_FILE)
    history = []
    if os.path.isfile(path):
        try:
            with open(path) as f:
                history = json.load(f)
        except Exception:
            history = []
    history.append({"value": round(value, 1), "spread": round(spread, 1)})
    history = history[-20:]
    try:
        with open(path, "w") as f:
            json.dump(history, f, indent=1)
    except OSError:
        pass
    return history


def main():
    _enable_compile_cache()
    value, spread = bench_tpu()
    try:
        baseline = pinned_baseline()
    except Exception:
        baseline = float("nan")
    vs = value / baseline if np.isfinite(baseline) and baseline > 0 else None
    history = _update_history(value, spread)
    note = None
    if len(history) > 1:
        prev = history[-2]
        move = value / prev["value"] - 1
        if abs(move) >= 0.05:
            noise = (spread + prev.get("spread", 0)) / prev["value"]
            note = (
                f"{move:+.1%} vs previous run "
                f"({'within' if abs(move) <= noise else 'exceeds'} combined IQR "
                f"{noise:.1%})"
            )
    print(
        json.dumps(
            {
                "metric": "emulator_loglike_evals_per_sec",
                "value": round(value, 1),
                "unit": "evals/s",
                "vs_baseline": round(vs, 1) if vs else None,
                "spread": round(spread, 1),
                "history": [h["value"] for h in history],
                **({"note": note} if note else {}),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())

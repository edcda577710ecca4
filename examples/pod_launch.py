"""Multi-host pod-slice entry point: run the full LINNA-TPU pipeline SPMD
over every host of a TPU pod slice.

The reference's cluster story was Slurm: 128 MPI ranks for theory fan-out +
one co-allocated GPU for training (reference jobscript/example_sampler.job,
linna/gpuscript.py).  On a pod slice the WHOLE pipeline is one program
started once per host:

    gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all --command \
      'cd linna-tpu && python examples/pod_launch.py zeus examples/des_synthetic.yaml examples'

For a manual (non-TPU-metadata) cluster, export on every host:

    LINNA_COORDINATOR_ADDRESS=host0:8476 LINNA_NUM_PROCESSES=N LINNA_PROCESS_ID=k

Execution model (docs/MULTIHOST.md): **every host runs the same program** —
the driver, the orchestrator loop, the sharded training and sampling
programs.  All hosts dispatch every global-mesh computation so the GSPMD
collectives line up; host-side decisions are made from ``multihost.fetch``-ed
(allgathered) values, so control flow is identical everywhere.  Only the
primary process writes artifacts (samples, checkpoints, HDF5 chains) and the
others read them from the shared filesystem (``outdir`` must be a common
NFS/GCS mount) after ``multihost.barrier`` phase boundaries — all of which is
wired inside the orchestrator itself; this script only initializes the
distributed runtime and launches the driver on every host.
"""

import sys


def main() -> None:
    from linna_tpu.parallel import multihost as MH

    # wire the hosts together BEFORE any other JAX use (initialize inspects
    # env/args only — touching any jax API first would bind the local-only
    # backend and make distributed init impossible)
    multi = MH.initialize()

    import jax

    print(
        f"process {jax.process_index()}/{jax.process_count()}: "
        f"{jax.local_device_count()} local / {jax.device_count()} global devices"
        f"{' (single-process)' if not multi else ''}",
        flush=True,
    )

    from linna_tpu import driver

    method = sys.argv[1] if len(sys.argv) > 1 else "zeus"
    yamlfile = sys.argv[2] if len(sys.argv) > 2 else "examples/des_synthetic.yaml"
    yamldir = sys.argv[3] if len(sys.argv) > 3 else "examples"

    # Every host runs the same driver: the theory fan-out pool from the YAML
    # (`pool: multiprocess`) is driven by the primary only (orchestrator
    # gates it), the device-side pipeline is SPMD over the global mesh, and
    # artifact writes are primary-gated inside the orchestrator.
    rc = driver.main([method, "None", yamlfile, yamldir])
    print(f"process {jax.process_index()} driver finished rc={rc}", flush=True)
    MH.barrier("pipeline-done")


if __name__ == "__main__":
    main()

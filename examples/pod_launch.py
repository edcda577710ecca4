"""Multi-host pod-slice entry point: run the full LINNA-TPU pipeline SPMD
over every host of a TPU pod slice.

The reference's cluster story was Slurm: 128 MPI ranks for theory fan-out +
one co-allocated GPU for training (reference jobscript/example_sampler.job,
linna/gpuscript.py).  On a pod slice the WHOLE pipeline is one program
started once per host:

    gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all --command \
      'cd linna-tpu && python examples/pod_launch.py zeus examples/des_synthetic.yaml examples'

Role split per host:

- every host participates in the global mesh: sharded ensemble-member
  training (parallel/ensemble.py) and walker-sharded MCMC chunks use all
  chips across all hosts via GSPMD collectives on ICI;
- each host runs its own theory pool over its local CPUs (the per-host
  analogue of the reference's MPI ranks) for the external theory fan-out;
- only process 0 writes artifacts (samples, checkpoints, HDF5 chains);
  the others synchronize on a collective barrier and read the shared
  filesystem (pods mount a common NFS/GCS path as ``outdir``).
"""

import sys


def main() -> None:
    from linna_tpu.parallel import multihost as MH

    # wire the hosts together BEFORE any other JAX use
    MH.initialize()

    import jax

    print(
        f"process {jax.process_index()}/{jax.process_count()}: "
        f"{jax.local_device_count()} local / {jax.device_count()} global devices",
        flush=True,
    )

    from linna_tpu import driver

    method = sys.argv[1] if len(sys.argv) > 1 else "zeus"
    yamlfile = sys.argv[2] if len(sys.argv) > 2 else "examples/des_synthetic.yaml"
    yamldir = sys.argv[3] if len(sys.argv) > 3 else "examples"

    # The theory fan-out pool comes from the YAML (`pool: multiprocess`) —
    # each host gets its own local-CPU pool; the device-side pipeline
    # (training, MCMC) is SPMD over the global mesh and needs no pool.
    if MH.is_primary():
        rc = driver.main([method, "None", yamlfile, yamldir])
        print(f"driver finished rc={rc}", flush=True)
        MH.barrier("pipeline-done")
    else:
        # Non-primary hosts keep their devices available to the cross-host
        # collectives (jax.distributed arranges dispatch); artifact writes
        # are primary-gated, so they only rendezvous at the end.
        MH.barrier("pipeline-done")


if __name__ == "__main__":
    main()

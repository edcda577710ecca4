from . import convergence, stretch, slicemove, backends, run  # noqa: F401

"""Naming shared between bench_full.py and bench_exact_posterior.py.

The emulator-bias decomposition only works if the flagship run and the
exact-posterior reference agree on (a) which artifact file links them and
(b) which YAML config defines the posterior (priors + shape).  Both rules
live here once so the two scripts cannot drift apart silently.
"""

from __future__ import annotations

import os

HERE = os.path.dirname(os.path.abspath(__file__))


def theory_tag(theory_mod: str) -> str:
    """``examples.lsst_theory`` -> ``lsst`` (names /tmp dirs, metrics and the
    exact-posterior artifact; ``des`` keeps the historical paths)."""
    return theory_mod.rsplit(".", 1)[-1].replace("_theory", "")


def exact_posterior_filename(tag: str) -> str:
    return (
        "EXACT_POSTERIOR.json" if tag == "des"
        else f"EXACT_POSTERIOR_{tag.upper()}.json"
    )


def default_config_yaml(tag: str) -> str:
    """The examples/ config that defines this analysis class's posterior."""
    return os.path.join("examples", f"{tag}_synthetic.yaml")

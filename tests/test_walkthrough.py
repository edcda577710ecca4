"""Executable-documentation honesty checks (VERDICT r4 item 9): the
walkthrough ships as BOTH a script and a notebook
(examples/walkthrough.{py,ipynb} — the reference's
docs/notebooks/multivariate_gaussian_distribution.ipynb role), and the slow
CI lane executes the notebook end-to-end so it can never rot."""

import os
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)


@pytest.mark.slow
def test_walkthrough_notebook_executes(tmp_path):
    import nbformat
    from nbclient import NotebookClient

    nb_path = os.path.join(ROOT, "examples", "walkthrough.ipynb")
    nb = nbformat.read(nb_path, as_version=4)
    # pin the kernel to the hermetic CPU test platform (the container's
    # sitecustomize would otherwise bind the tunneled device; an interactive
    # user running the notebook keeps whatever platform they launched with)
    nb.cells.insert(
        0,
        nbformat.v4.new_code_cell(
            'import os\n'
            'os.environ["JAX_PLATFORMS"] = "cpu"\n'
            'import jax\n'
            'jax.config.update("jax_platforms", "cpu")\n'
        ),
    )
    os.environ["LINNA_WALKTHROUGH_OUTDIR"] = str(tmp_path / "out")
    try:
        client = NotebookClient(
            nb,
            timeout=1200,
            kernel_name="python3",
            resources={"metadata": {"path": os.path.join(ROOT, "examples")}},
        )
        client.execute()
    finally:
        os.environ.pop("LINNA_WALKTHROUGH_OUTDIR", None)
    # the pipeline ran: the posterior-moment cell printed truth comparisons
    outs = [
        "".join(
            o.get("text", "") for o in c.get("outputs", []) if o.get("text")
        )
        for c in nb.cells
        if c.cell_type == "code"
    ]
    joined = "\n".join(outs)
    assert "posterior mean" in joined
    assert "grad log p at whitened 0" in joined
    assert os.path.isfile(tmp_path / "out" / "iter_1" / "zeus_256.h5")


@pytest.mark.slow
def test_walkthrough_script_executes(tmp_path, capsys):
    """The script twin stays runnable too (same content, CLI form)."""
    sys.path.insert(0, os.path.join(ROOT, "examples"))
    import walkthrough

    walkthrough.main(str(tmp_path / "out"))
    out = capsys.readouterr().out
    assert "posterior mean" in out
    assert os.path.isfile(tmp_path / "out" / "iter_1" / "zeus_256.h5")

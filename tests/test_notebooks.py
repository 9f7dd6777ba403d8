"""Notebook execution smoke: every demo notebook must run end-to-end.

The notebooks carry the framework's recorded accuracy numbers (the role the
reference's notebooks play upstream, SURVEY.md section 6/17) - so they are
code that must not rot. Full-size execution is minutes; here each notebook
is executed at shrunk collocation counts / GN iterations (literal
substitutions on the cell sources), which exercises every API the notebook
touches without asserting accuracy. Re-record real outputs with
``python notebooks/execute_all.py``.
"""

import re
from pathlib import Path

import pytest

nbformat = pytest.importorskip("nbformat")
nbclient = pytest.importorskip("nbclient")

NB_DIR = Path(__file__).resolve().parent.parent / "notebooks"

# (notebook, [(pattern, replacement), ...]) - shrink sizes and iterations
SHRINK = {
    "elliptic_demo.ipynb": [
        (r"PRNGKey\(0\), 900, 124", "PRNGKey(0), 80, 24"),
        (r"max_iter=4", "max_iter=2"),
        (r"test_grid\(60, 60\)", "test_grid(12, 12)"),
    ],
    "burgers_demo.ipynb": [
        (r"PRNGKey\(2\), 1000, 200", "PRNGKey(2), 100, 30"),
        (r"max_iter=12", "max_iter=2"),
        (r"test_grid\(60, 60", "test_grid(10, 10"),
    ],
    "eikonal_demo.ipynb": [
        (r"PRNGKey\(0\), 1000, 200", "PRNGKey(0), 100, 30"),
        (r"max_iter=8", "max_iter=2"),
        (r"eikonal_cole_hopf_solve\(58", "eikonal_cole_hopf_solve(12"),
    ],
    "darcy_inverse_demo.ipynb": [
        (r"PRNGKey\(9999\), 400, 100", "PRNGKey(9999), 60, 20"),
        (r"N_data, noise = 60, 1e-3", "N_data, noise = 15, 1e-3"),
        (r"max_iter=8", "max_iter=2"),
        (r"darcy_fd_solve\(78", "darcy_fd_solve(30"),
    ],
}


@pytest.mark.parametrize("name", sorted(SHRINK))
def test_notebook_executes(name, monkeypatch):
    monkeypatch.setenv("MPLBACKEND", "Agg")
    path = NB_DIR / name
    nb = nbformat.read(path, as_version=4)
    subs = SHRINK[name]
    hit = {pat: False for pat, _ in subs}
    for cell in nb.cells:
        if cell.cell_type != "code":
            continue
        src = cell.source
        for pat, rep in subs:
            if re.search(pat, src):
                hit[pat] = True
                src = re.sub(pat, rep, src)
        cell.source = src
    missed = [p for p, ok in hit.items() if not ok]
    assert not missed, f"shrink patterns out of date for {name}: {missed}"
    client = nbclient.NotebookClient(
        nb, timeout=600, kernel_name="python3",
        resources={"metadata": {"path": str(NB_DIR)}},
    )
    client.execute()  # raises CellExecutionError on any failure

#!/usr/bin/env python
"""Execute every demo notebook in place, recording outputs.

The reference's notebooks are the only place its accuracy numbers are
recorded (SURVEY.md section 6); these notebooks play the same role for this
framework, so they must carry executed outputs. Run after any change that
could shift the recorded numbers:

    python notebooks/execute_all.py            # all four, CPU f64
    python notebooks/execute_all.py elliptic   # substring filter

Each notebook forces `jax_platforms='cpu'` + x64 in its first cell, so the
recorded outputs are in the reference's precision regime regardless of the
host's accelerators. A fast execution *smoke* (tiny sizes, no recording)
runs in CI: tests/test_notebooks.py.
"""

import sys
import time
from pathlib import Path

import nbformat
from nbclient import NotebookClient

HERE = Path(__file__).resolve().parent


def execute(path: Path) -> float:
    nb = nbformat.read(path, as_version=4)
    t0 = time.time()
    client = NotebookClient(
        nb,
        timeout=1800,
        kernel_name="python3",
        resources={"metadata": {"path": str(HERE)}},
    )
    client.execute()
    nbformat.write(nb, path)
    return time.time() - t0


def main():
    pattern = sys.argv[1] if len(sys.argv) > 1 else ""
    for path in sorted(HERE.glob("*_demo.ipynb")):
        if pattern and pattern not in path.name:
            continue
        print(f"executing {path.name} ...", flush=True)
        dt = execute(path)
        print(f"  done in {dt:.1f}s", flush=True)


if __name__ == "__main__":
    main()

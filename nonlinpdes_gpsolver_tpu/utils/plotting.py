"""Optional matplotlib visualizations (lazy imports, no rc mutation).

Capability match for the reference's plotting (loss history, sample scatter,
error contours, Darcy 2x2 panels - ``src/solver.py:97-206``,
``main_DarcyFlow2d.py:139-172`` upstream) without its import-time LaTeX
rcParams requirement (``src/solver.py:17-39``, README warns LaTeX must be
installed). All functions take data, create a figure, and return it; callers
decide whether to ``show`` or ``savefig``.
"""

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use(matplotlib.get_backend())  # respect caller's backend
    import matplotlib.pyplot as plt

    return plt


def loss_history(losses, title="Gauss-Newton loss history"):
    plt = _plt()
    fig, ax = plt.subplots()
    ax.plot(np.arange(len(losses)), np.asarray(losses))
    ax.set_yscale("log")
    ax.set_xlabel("GN step")
    ax.set_ylabel("loss")
    ax.set_title(title)
    return fig


def sample_scatter(X_domain, X_boundary, title="collocation points"):
    plt = _plt()
    fig, ax = plt.subplots()
    ax.scatter(*np.asarray(X_domain).T, s=4, label="interior")
    ax.scatter(*np.asarray(X_boundary).T, s=4, label="boundary")
    ax.legend()
    ax.set_title(title)
    return fig


def contour_error(X_test, pred, truth, title="test error"):
    """X_test must be a flattened tensor grid (n0*n1, 2)."""
    plt = _plt()
    X = np.asarray(X_test)
    err = np.abs(np.asarray(pred) - np.asarray(truth))
    n = int(np.sqrt(X.shape[0]))
    fig, ax = plt.subplots()
    c = ax.tricontourf(X[:, 0], X[:, 1], err, 50, cmap="coolwarm")
    fig.colorbar(c)
    ax.set_xlabel("$x_1$")
    ax.set_ylabel("$x_2$")
    ax.set_title(title)
    return fig


def field_panels(X_test, fields, titles, ncols=2):
    """Grid of tricontourf panels (the Darcy truth/recovered 2x2 figure)."""
    plt = _plt()
    X = np.asarray(X_test)
    n = len(fields)
    nrows = (n + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(5 * ncols, 4 * nrows))
    for ax, f, t in zip(np.ravel(axes), fields, titles):
        c = ax.tricontourf(X[:, 0], X[:, 1], np.asarray(f), 50, cmap="coolwarm")
        fig.colorbar(c, ax=ax)
        ax.set_title(t)
    return fig

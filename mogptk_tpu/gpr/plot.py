"""Gram-matrix debug heatmap, rendered on Cholesky/numerics failure
(capability parity with mogptk/gpr/plot.py:6-33)."""
import numpy as np


def plot_gram(K):
    """Render a heatmap of a (possibly non-PSD) Gram matrix with NaN/Inf
    values highlighted. Called from Model.check_numerics on failure."""
    import matplotlib
    import matplotlib.pyplot as plt

    K = np.asarray(K)
    fig, ax = plt.subplots(1, 1, figsize=(8, 8))
    finite = np.isfinite(K)
    vmin = K[finite].min() if finite.any() else 0.0
    vmax = K[finite].max() if finite.any() else 1.0
    cmap = matplotlib.colormaps["viridis"].copy()
    try:
        cmap.set_bad(color="red")
    except Exception:
        pass
    masked = np.ma.masked_invalid(K)
    im = ax.imshow(masked, cmap=cmap, vmin=vmin, vmax=vmax)
    fig.colorbar(im, ax=ax)
    ax.set_title("Gram matrix (red = NaN/Inf)")
    plt.show()
    return fig, ax

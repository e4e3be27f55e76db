"""Force-coefficient analysis — the reference notebook as a library.

Replaces analysis/plot_coefficients.ipynb: load ``forces_vs_time.csv``
(same columns, src/NavierStokes.cpp:447), trim warm-up rows, plot Cd or Cl
vs time, save a PNG, and report the windowed mean — plus Strouhal-number
extraction for vortex-shedding cases (used by the Schaefer-Turek 2D-2
validation), which the notebook lacked.
"""

from __future__ import annotations

import numpy as np


def load_forces(csv_path: str, skip_rows: int = 0):
    import pandas as pd
    df = pd.read_csv(csv_path)
    return df.iloc[skip_rows:]


def mean_coefficient(csv_path: str, name: str = "Cd",
                     skip_rows: int = 10) -> float:
    df = load_forces(csv_path, skip_rows)
    return float(df[name].mean())


def plot_coefficient(csv_path: str, name: str = "Cd", skip_rows: int = 10,
                     out_png: str | None = None, title: str | None = None):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    df = load_forces(csv_path, skip_rows)
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.plot(df["time"], df[name], lw=1.2)
    ax.set_xlabel("time [s]")
    ax.set_ylabel(name)
    ax.set_title(title or f"{name} over time")
    ax.grid(alpha=0.3)
    fig.tight_layout()
    if out_png:
        fig.savefig(out_png, dpi=130)
    plt.close(fig)
    return float(df[name].mean())


def strouhal(csv_path: str, name: str = "Cl", skip_fraction: float = 0.5,
             ref_length: float = 0.1, u_mean: float = 1.0) -> float:
    """Shedding frequency from the dominant FFT peak of the lift trace:
    St = f * L / U."""
    df = load_forces(csv_path)
    n = len(df)
    df = df.iloc[int(n * skip_fraction):]
    t = df["time"].to_numpy()
    y = df[name].to_numpy()
    y = y - y.mean()
    if len(t) < 8:
        return float("nan")
    dt = float(np.median(np.diff(t)))
    freqs = np.fft.rfftfreq(len(y), dt)
    amp = np.abs(np.fft.rfft(y))
    f_peak = float(freqs[1:][np.argmax(amp[1:])])
    return f_peak * ref_length / u_mean


def richardson(values, ratios=None):
    """Richardson-style extrapolation of a convergent sequence of
    functionals f_1, f_2, ..., f_n (coarse -> fine).

    Fits the last three values to f_k = f_inf - C r^k (geometric
    increments) and returns (f_inf, r): the extrapolated limit and the
    measured increment ratio r = (f_n - f_{n-1}) / (f_{n-1} - f_{n-2}).
    With uniform refinement factor s and order p, r = s^{-p}; pass
    ``ratios`` (the per-level refinement factors, len n-1) to also get
    the observed order p = -log(r)/log(s) appended as a third element.

    Used for the 3D-1Z Cd mesh sequence and the 2D-2 Cl_max dt
    sequences (VALIDATION.md).  Reference counterpart: the published
    Schaefer-Turek compilations report grid-extrapolated bands
    (tests/3D/test_01/src/test_01.cpp:57-58 cites them)."""
    v = np.asarray(values, dtype=float)
    if len(v) < 3:
        raise ValueError("need at least 3 levels")
    d1, d2 = v[-2] - v[-3], v[-1] - v[-2]
    if d1 == 0.0 or np.sign(d1) != np.sign(d2) or abs(d2) >= abs(d1):
        return float("nan"), float("nan")  # not in the geometric regime
    r = d2 / d1
    f_inf = v[-1] + d2 * r / (1.0 - r)
    if ratios is not None:
        s = float(ratios[-1])
        return float(f_inf), float(r), float(-np.log(r) / np.log(s))
    return float(f_inf), float(r)

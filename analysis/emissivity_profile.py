"""Emissivity-profile overlays — counterpart of the reference's
``python/emissivity_profile.ipynb``: loglog overlays of emissivity /
arrival time / mean redshift for several runs, plus the Newtonian lamppost
check  eps(r) ~ h / (r^2 + h^2)^{3/2}  (with and without the g^3 redshift
boost) against a run's measured profile.

Usage:
    python analysis/emissivity_profile.py out.png run1.dat [run2.dat ...]
        [--h=5]     # adds the analytic lamppost comparison for that height
"""

from __future__ import annotations

import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def read_emissivity(filename):
    """7-column emissivity output (r, area, n_rays, flux, emissivity,
    redshift, time); rows with no hits dropped (emissivity.cpp:136-148)."""
    d = np.loadtxt(filename)
    d = d[d[:, 2] > 0]
    return dict(r=d[:, 0], area=d[:, 1], n_rays=d[:, 2], flux=d[:, 3],
                emissivity=d[:, 4], redshift=d[:, 5], time=d[:, 6])


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    h = None
    for a in list(argv):
        if a.startswith("--h="):
            h = float(a.split("=")[1])
            argv.remove(a)
    out, paths = argv[0], argv[1:]
    runs = {p: read_emissivity(p) for p in paths}

    fig, axes = plt.subplots(1, 3, figsize=(16, 5))
    for name, (key, ylabel) in zip(axes, [
        ("emissivity", "Emissivity (rest frame)"),
        ("time", "Time / rg/c"),
        ("redshift", "Redshift"),
    ]):
        for p, d in runs.items():
            name.loglog(d["r"], d[key], label=p.rsplit("/", 1)[-1])
        name.set_xlabel(r"Radius / $r_g$")
        name.set_ylabel(ylabel)
        name.legend(fontsize=7)

    if h is not None and runs:
        d = next(iter(runs.values()))
        r = d["r"]
        emis_lamp = h / (r ** 2 + h ** 2) ** 1.5
        emis_lamp_g = emis_lamp / d["redshift"] ** 3
        ax = axes[0]
        # normalise the analytic curves onto the measured profile at mid-radius
        mid = len(r) // 2
        for curve, label, ls in [(emis_lamp, f"lamppost h={h}", "--"),
                                 (emis_lamp_g, f"lamppost h={h} + g^3", ":")]:
            ax.loglog(r, curve * d["emissivity"][mid] / curve[mid], ls,
                      label=label)
        ax.legend(fontsize=7)

    fig.suptitle("Disc emissivity profiles")
    fig.tight_layout()
    fig.savefig(out, dpi=130)
    print(f"Saved {out}")


if __name__ == "__main__":
    main()

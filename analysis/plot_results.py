"""Plotting layer for the framework outputs (the reference's python/
directory counterpart). Usage:

    python analysis/plot_results.py emissivity dat/emissivity.dat out.png
    python analysis/plot_results.py image dat/disc_image.fits out.png
    python analysis/plot_results.py caustic dat/caustic_discplane.fits out.png
    python analysis/plot_results.py line dat/line.dat out.png
    python analysis/plot_results.py pcyg dat/pcyg.dat out.png
"""

from __future__ import annotations

import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def plot_emissivity(path, out):
    r, area, n, flux, emis, g, t = np.loadtxt(path).T
    ok = n > 0
    fig, axes = plt.subplots(2, 2, figsize=(10, 8))
    axes[0, 0].loglog(r[ok], emis[ok], "o-", ms=3)
    axes[0, 0].set(xlabel="r [rg]", ylabel="emissivity", title="Emissivity profile")
    axes[0, 1].semilogx(r[ok], g[ok], "o-", ms=3)
    axes[0, 1].set(xlabel="r [rg]", ylabel="<g>", title="Mean redshift")
    axes[1, 0].loglog(r[ok], flux[ok], "o-", ms=3)
    axes[1, 0].set(xlabel="r [rg]", ylabel="flux / area", title="Photon flux")
    axes[1, 1].semilogx(r[ok], t[ok], "o-", ms=3)
    axes[1, 1].set(xlabel="r [rg]", ylabel="<t> [rg/c]", title="Mean arrival time")
    fig.tight_layout()
    fig.savefig(out, dpi=130)


def plot_image(path, out):
    from raytrace_tpu.io import read_fits

    maps = read_fits(path)
    names = [n for n in ("FLUX", "RADIUS", "ENSHIFT", "TIME") if n in maps]
    fig, axes = plt.subplots(1, len(names), figsize=(4.5 * len(names), 4))
    for ax, name in zip(np.atleast_1d(axes), names):
        data = maps[name].astype(float)
        if name == "FLUX":
            data = np.log10(np.where(data > 0, data, np.nan))
        im = ax.imshow(data.T, origin="lower", cmap="inferno")
        ax.set_title(name)
        fig.colorbar(im, ax=ax, shrink=0.8)
    fig.tight_layout()
    fig.savefig(out, dpi=130)


def plot_caustic(path, out):
    from raytrace_tpu.io import read_fits

    maps = read_fits(path)
    fig, axes = plt.subplots(1, 3, figsize=(14, 4))
    dj = maps["DET_J"].astype(float)
    dj = np.where(np.abs(dj) > 1e29, np.nan, dj)
    mag = np.log10(np.abs(1.0 / np.where(dj == 0, np.nan, dj)))
    im = axes[0].imshow(mag.T, origin="lower", cmap="magma")
    axes[0].set_title("log10 |magnification|")
    fig.colorbar(im, ax=axes[0], shrink=0.8)
    im = axes[1].imshow(maps["SIGN_J"].astype(float).T, origin="lower", cmap="coolwarm")
    axes[1].set_title("sign det J (parity)")
    im = axes[2].imshow(maps["ORDER"].astype(float).T, origin="lower", cmap="viridis")
    axes[2].set_title("image order")
    fig.tight_layout()
    fig.savefig(out, dpi=130)


def plot_line(path, out):
    e, f = np.loadtxt(path).T
    plt.figure(figsize=(7, 4.5))
    plt.plot(e, f / max(f.max(), 1e-30))
    plt.xlabel("observed energy [keV]")
    plt.ylabel("relative flux")
    plt.title("Relativistic line profile")
    plt.tight_layout()
    plt.savefig(out, dpi=130)


def plot_pcyg(path, out):
    d = np.loadtxt(path)
    plt.figure(figsize=(7, 4.5))
    if d.shape[1] == 4:
        en, em, cont, tot = d.T
        plt.plot(en, tot / np.median(tot), label="total")
        plt.plot(en, cont / max(cont.max(), 1e-30), alpha=0.6, label="continuum")
    else:
        en, v, fl = d.T
        plt.plot(en, fl, label="flux")
    plt.axvline(1.0, ls=":", c="k")
    plt.xlabel("E / E_line")
    plt.ylabel("relative flux")
    plt.legend()
    plt.tight_layout()
    plt.savefig(out, dpi=130)


PLOTTERS = {
    "emissivity": plot_emissivity,
    "image": plot_image,
    "caustic": plot_caustic,
    "line": plot_line,
    "pcyg": plot_pcyg,
}

if __name__ == "__main__":
    kind, path, out = sys.argv[1:4]
    PLOTTERS[kind](path, out)
    print(f"wrote {out}")

"""Disc-image panels + integrator comparison — counterpart of the
reference's ``python/plot_imageplane.ipynb``: the 3x2 map panel (radius,
phi, enshift, time, flux, emis) with the notebook's redshift colormap, and
(given several files) per-quantity relative-difference statistics against
the last file as the reference integrator.

Usage:
    python analysis/plot_imageplane.py <disc_image.fits> [out.png]
    python analysis/plot_imageplane.py --compare euler.fits rk4.fits rk45.fits
"""

from __future__ import annotations

import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.colors as colors
import matplotlib.pyplot as plt
import numpy as np

from raytrace_tpu.io import read_fits

# The notebook's custom redshift colormap (plot_imageplane.ipynb cell 3).
_REDSHIFT_NORM = colors.Normalize(0.01, 1.2)
_REDSHIFT_MAP = colors.LinearSegmentedColormap(
    "redshift",
    {
        "blue": [(0.0, 0, 0), (0.35, 0, 0), (0.8, 0, 0), (0.97, 1, 1), (1.0, 0.6, 0.6)],
        "green": [(0.0, 0, 0), (0.2, 0, 0), (0.6, 1, 1), (0.75, 1, 1),
                  (0.8, 0.75, 0.75), (1.0, 0.2, 0.2)],
        "red": [(0.0, 0, 0), (0.2, 1, 1), (0.5, 1, 1), (0.75, 0.6, 0.6), (1.0, 0.2, 0.2)],
    },
)


def _load(path):
    maps = read_fits(path)
    out = {k.lower(): maps[k].astype(float)
           for k in ("RADIUS", "PHI", "ENSHIFT", "TIME", "FLUX", "EMIS") if k in maps}
    out["enshift"] = np.nan_to_num(out["enshift"])
    return out


def panel(path, out):
    d = _load(path)
    fig, ax = plt.subplots(3, 2, figsize=(12, 18))
    pos = lambda a: np.where(a > 0, a, np.nan)
    ax[0, 0].imshow(np.flipud(pos(d["radius"]).T), norm=colors.LogNorm(), cmap="viridis")
    ax[0, 0].set_title("RADIUS")
    ax[0, 1].imshow(np.flipud(d["phi"].T), norm=colors.Normalize(-np.pi, np.pi), cmap="viridis")
    ax[0, 1].set_title("PHI")
    ax[1, 0].imshow(np.flipud(d["enshift"].T), norm=_REDSHIFT_NORM, cmap=_REDSHIFT_MAP)
    ax[1, 0].set_title("ENSHIFT (1/g)")
    t = pos(d["time"])
    tn = colors.LogNorm(*np.nanpercentile(t, [5, 95])) if np.isfinite(t).any() else None
    ax[1, 1].imshow(np.flipud(t.T), norm=tn, cmap="viridis")
    ax[1, 1].set_title("TIME")
    ax[2, 0].imshow(np.flipud(pos(d["flux"]).T), norm=colors.LogNorm(), cmap="hot")
    ax[2, 0].set_title("FLUX")
    ax[2, 1].imshow(np.flipud(pos(d["emis"]).T), norm=colors.LogNorm(), cmap="hot")
    ax[2, 1].set_title("EMIS")
    fig.tight_layout()
    fig.savefig(out, dpi=130)
    print(f"Saved {out}")


def compare(paths):
    data = {p: _load(p) for p in paths}
    ref_name = paths[-1]
    ref = data[ref_name]
    mask = np.ones_like(ref["radius"], bool)
    for d in data.values():
        mask &= d["radius"] > 0
    print(f"Pixels with disc hits in all files: {int(mask.sum())}")
    print(f"{'File':<28}  {'Quantity':<10}  {'Mean |d|/ref':>14}  {'RMS d/ref':>12}  {'Max |d|/ref':>13}")
    print("-" * 85)
    for p in paths[:-1]:
        for qty in ("radius", "enshift", "flux"):
            r = ref[qty][mask]
            diff = (data[p][qty][mask] - r) / r
            print(f"{p[-27:]:<28}  {qty:<10}  {np.mean(np.abs(diff)):>14.6f}"
                  f"  {np.sqrt(np.mean(diff ** 2)):>12.6f}  {np.max(np.abs(diff)):>13.6f}")
        print()


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] == "--compare":
        compare(argv[1:])
        return
    path = argv[0]
    out = argv[1] if len(argv) > 1 else path.rsplit(".", 1)[0] + "_panels.png"
    panel(path, out)


if __name__ == "__main__":
    main()

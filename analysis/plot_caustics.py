"""Source-sphere caustic overview — counterpart of the reference's
``python/plot_caustics.py`` (3 zoomed panels: SIGN_J / ORDER / ESCAPED,
plus order-distribution and outer-parity statistics). Reads the FITS
written by rt-caustic-sourceplane.

Usage:
    python analysis/plot_caustics.py <caustic_sourceplane.fits> [out.png]
"""

from __future__ import annotations

import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from raytrace_tpu.io import read_fits


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    path = argv[0] if argv else "dat/caustic_sourceplane.fits"
    out = argv[1] if len(argv) > 1 else path.rsplit(".", 1)[0] + ".png"

    maps = read_fits(path)
    hdr = maps["_headers"].get("DET_J", {})
    sign_j, order = maps["SIGN_J"], maps["ORDER"]
    escaped = maps["ESCAPED"]
    x = np.linspace(float(hdr["X0"]), float(hdr["XMAX"]), int(hdr["NX"]))
    y = np.linspace(float(hdr["Y0"]), float(hdr["YMAX"]), int(hdr["NY"]))

    esc = escaped > 0.5
    print("ORDER distribution (escaped rays):")
    for o in range(-1, 5):
        n = int(np.sum(order[esc] == o))
        if n:
            print(f"  order={o}: {n:6d} pixels ({100 * n / esc.sum():.1f}%)")
    mask_outer = (np.sqrt(x[:, None] ** 2 + y[None, :] ** 2) > 8) & esc & np.isfinite(sign_j)
    print(
        f"Outer region (r>8 rg, escaped): sign=+1: {int((sign_j[mask_outer] > 0).sum())},"
        f" sign=-1: {int((sign_j[mask_outer] < 0).sum())}"
    )

    fig, axes = plt.subplots(1, 3, figsize=(15, 5))
    zoom = min(10.0, x[-1])

    def do_zoom(ax, data, cmap, vmin, vmax, title):
        ix0, ix1 = np.searchsorted(x, -zoom), np.searchsorted(x, zoom)
        iy0, iy1 = np.searchsorted(y, -zoom), np.searchsorted(y, zoom)
        im = ax.pcolormesh(x[ix0:ix1], y[iy0:iy1], data[ix0:ix1, iy0:iy1].T,
                           cmap=cmap, vmin=vmin, vmax=vmax)
        ax.set_title(title)
        ax.set_aspect("equal")
        ax.set_xlabel("x (rg)")
        ax.set_ylabel("y (rg)")
        plt.colorbar(im, ax=ax)

    do_zoom(axes[0], sign_j, "bwr", -1, 1, "SIGN_J")
    order_f = order.astype(float)
    order_f[~esc] = np.nan
    do_zoom(axes[1], order_f, "tab10", -0.5, 4.5, "ORDER")
    do_zoom(axes[2], escaped.astype(float), "Greys_r", 0, 1, "ESCAPED")

    plt.tight_layout()
    plt.savefig(out, dpi=130)
    print(f"Saved {out}")


if __name__ == "__main__":
    main()

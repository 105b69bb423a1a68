"""Source-plane caustic overview — counterpart of the reference's
``python/plot_caustic_plane.py`` (image-plane parity map, critical curves
mapped onto the source plane coloured by image order, image-order map).
Reads the FITS written by rt-caustic-plane.

Usage:
    python analysis/plot_caustic_plane.py <caustic_plane.fits> [out.png]
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
    path = argv[0] if argv else "dat/caustic_plane.fits"
    out = argv[1] if len(argv) > 1 else path.rsplit(".", 1)[0] + ".png"

    maps = read_fits(path)
    hdr = maps["_headers"].get("DET_J", {})
    phdr = maps["_headers"].get(0, {})
    det_j, sign_j = maps["DET_J"], maps["SIGN_J"]
    order, hit = maps["ORDER"], maps["HIT_PLANE"]
    x_s, y_s = maps["X_S"], maps["Y_S"]
    x = np.linspace(float(hdr["X0"]), float(hdr["XMAX"]), int(hdr["NX"]))
    y = np.linspace(float(hdr["Y0"]), float(hdr["YMAX"]), int(hdr["NY"]))
    hm = hit > 0.5

    print(f"Loaded {path}: {int(hm.sum())} rays reached the source plane")
    zoom = min(abs(x[0]), x[-1])
    fig, axes = plt.subplots(1, 3, figsize=(17, 5.5))

    def img_zoom(ax, data, cmap, vmin, vmax, title):
        ix0, ix1 = np.searchsorted(x, -zoom), np.searchsorted(x, zoom)
        iy0, iy1 = np.searchsorted(y, -zoom), np.searchsorted(y, zoom)
        im = ax.pcolormesh(x[ix0:ix1], y[iy0:iy1], data[ix0:ix1, iy0:iy1].T,
                           cmap=cmap, vmin=vmin, vmax=vmax, rasterized=True)
        ax.set_title(title, fontsize=9)
        ax.set_aspect("equal")
        ax.set_xlabel("x_img (rg)")
        ax.set_ylabel("y_img (rg)")
        plt.colorbar(im, ax=ax, fraction=0.046, pad=0.04)

    img_zoom(axes[0], np.where(hm, sign_j, np.nan), "bwr", -1, 1,
             "Image plane — parity sign(det J)")

    ax = axes[1]
    fin = hm & np.isfinite(det_j) & (np.abs(det_j) < 1e29)
    scale = np.nanpercentile(np.abs(det_j[fin]), 90) if fin.any() else 1.0
    crit = fin & (np.abs(det_j) < 0.01 * scale)
    bnd = hm & (np.abs(det_j) >= 1e29)
    for o, color in zip([0, 1, 2], ["steelblue", "darkorange", "forestgreen"]):
        m = hm & (order == o)
        if m.any():
            ax.scatter(x_s[m], y_s[m], s=0.3, c=color, alpha=0.15,
                       linewidths=0, label=f"order={o}")
    for m, col, label in [
        (crit & (order == 0), "red", "fold caustic (order 0)"),
        (crit & (order == 1), "magenta", "fold caustic (order 1)"),
        (bnd, "black", "order boundary"),
    ]:
        if m.any():
            ax.scatter(x_s[m], y_s[m], s=1.5, c=col, linewidths=0,
                       label=label, zorder=5)
    lim = np.nanpercentile(np.abs(np.concatenate([x_s[hm], y_s[hm]])), 98) if hm.any() else zoom
    ax.set_xlim(-lim, lim)
    ax.set_ylim(-lim, lim)
    ax.set_aspect("equal")
    ax.set_xlabel("x_s (rg)")
    ax.set_ylabel("y_s (rg)")
    ax.set_title("Source plane — caustic structure", fontsize=9)
    ax.legend(loc="upper right", fontsize=7, markerscale=4)

    cmap_order = matplotlib.colormaps["tab10"].resampled(5)
    img_zoom(axes[2], np.where(hm, order.astype(float), np.nan),
             cmap_order, -0.5, 4.5, "Image plane — image order")

    fig.suptitle(
        f"Kerr BH caustics — source plane (spin={phdr.get('SPIN', '?')}, "
        f"incl={phdr.get('INCL', '?')}, z_s={phdr.get('Z_S', '?')})", fontsize=11,
    )
    fig.tight_layout()
    fig.savefig(out, dpi=150, bbox_inches="tight")
    print(f"Saved {out}")


if __name__ == "__main__":
    main()

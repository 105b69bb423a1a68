"""Disc-plane caustic overview — counterpart of the reference's
``python/plot_caustic_discplane.py`` (3 panels: image-plane parity map,
critical curves mapped onto the disc coloured by image order, image-order
map) and ``python/caustic_discplane.py`` (the 3x3 summary; enable with
``--summary``). Reads the FITS written by rt-caustic-discplane.

Usage:
    python analysis/plot_caustic_discplane.py <caustic_discplane.fits> [out.png] [--summary]
"""

from __future__ import annotations

import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from raytrace_tpu.io import read_fits

SENTINEL = 1e30


def _axes_from_header(hdr):
    x0, xmax = float(hdr["X0"]), float(hdr["XMAX"])
    y0, ymax = float(hdr["Y0"]), float(hdr["YMAX"])
    nx, ny = int(hdr["NX"]), int(hdr["NY"])
    return np.linspace(x0, xmax, nx), np.linspace(y0, ymax, ny)


def _img_zoom(ax, x, y, data, cmap, vmin, vmax, title, zoom):
    ix0, ix1 = np.searchsorted(x, -zoom), np.searchsorted(x, zoom)
    iy0, iy1 = np.searchsorted(y, -zoom), np.searchsorted(y, zoom)
    im = ax.pcolormesh(
        x[ix0:ix1], y[iy0:iy1], data[ix0:ix1, iy0:iy1].T,
        cmap=cmap, vmin=vmin, vmax=vmax, rasterized=True,
    )
    ax.set_title(title, fontsize=9)
    ax.set_aspect("equal")
    ax.set_xlabel("x_img (rg)")
    ax.set_ylabel("y_img (rg)")
    plt.colorbar(im, ax=ax, fraction=0.046, pad=0.04)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    summary = "--summary" in argv
    argv = [a for a in argv if a != "--summary"]
    path = argv[0] if argv else "dat/caustic_discplane.fits"
    out = argv[1] if len(argv) > 1 else path.rsplit(".", 1)[0] + ".png"

    maps = read_fits(path)
    hdr = maps["_headers"].get("DET_J", {})
    phdr = maps["_headers"].get(0, {})
    det_j, sign_j = maps["DET_J"], maps["SIGN_J"]
    order, hit = maps["ORDER"], maps["HIT"]
    x_disc, y_disc = maps["X_DISC"], maps["Y_DISC"]
    x_img, y_img = _axes_from_header(hdr)
    hit_mask = hit > 0.5
    r_isco = float(phdr.get("ISCO", "nan"))

    print(f"Loaded {path}")
    print("ORDER distribution (rays that hit disc):")
    for o in range(-1, 5):
        n = int(np.sum(order[hit_mask] == o))
        if n:
            print(f"  order={o}: {n:7d} pixels ({100 * n / hit_mask.sum():.1f}%)")
    r_img = np.sqrt(x_img[:, None] ** 2 + y_img[None, :] ** 2)
    outer = (r_img > 8) & hit_mask & np.isfinite(sign_j)
    print(
        f"Outer region (r_img > 8 rg): sign=+1: {int((sign_j[outer] > 0).sum())},"
        f" sign=-1: {int((sign_j[outer] < 0).sum())}"
    )

    zoom = min(abs(x_img[0]), x_img[-1], abs(y_img[0]), y_img[-1])
    ncols = 3
    fig, axes = plt.subplots(1, ncols, figsize=(17, 5.5))

    _img_zoom(axes[0], x_img, y_img, np.where(hit_mask, sign_j, np.nan),
              "bwr", -1, 1, "Image plane — parity sign(det J)", zoom)

    # disc-plane caustics: hit pixels coloured by order, critical pixels
    # (|det J| near zero) and order boundaries (SENTINEL) overlaid
    ax = axes[1]
    fin = hit_mask & np.isfinite(det_j) & (np.abs(det_j) < 1e29)
    scale = np.nanpercentile(np.abs(det_j[fin]), 90) if fin.any() else 1.0
    crit = fin & (np.abs(det_j) < 0.01 * scale)
    bnd = hit_mask & (np.abs(det_j) >= 1e29)
    for o, color in zip([0, 1, 2], ["steelblue", "darkorange", "forestgreen"]):
        m = hit_mask & (order == o) & np.isfinite(sign_j)
        if m.any():
            ax.scatter(x_disc[m], y_disc[m], s=0.3, c=color, alpha=0.15,
                       linewidths=0, label=f"order={o}")
    for m, col, label in [
        (crit & (order == 0), "red", "fold caustic (order 0)"),
        (crit & (order == 1), "magenta", "fold caustic (order 1)"),
        (bnd, "black", "order boundary"),
    ]:
        if m.any():
            ax.scatter(x_disc[m], y_disc[m], s=1.5, c=col, linewidths=0,
                       label=label, zorder=5)
    if np.isfinite(r_isco):
        th = np.linspace(0, 2 * np.pi, 300)
        ax.plot(r_isco * np.cos(th), r_isco * np.sin(th), "k--", lw=0.8,
                alpha=0.5, label=f"ISCO ({r_isco:.2f} rg)")
    ax.set_xlim(-zoom, zoom)
    ax.set_ylim(-zoom, zoom)
    ax.set_aspect("equal")
    ax.set_xlabel("x_disc (rg)")
    ax.set_ylabel("y_disc (rg)")
    ax.set_title("Disc plane — caustic structure", fontsize=9)
    ax.legend(loc="upper right", fontsize=7, markerscale=4)

    cmap_order = matplotlib.colormaps["tab10"].resampled(5)
    _img_zoom(axes[2], x_img, y_img,
              np.where(hit_mask, order.astype(float), np.nan),
              cmap_order, -0.5, 4.5, "Image plane — image order", zoom)

    fig.suptitle(
        f"Kerr BH caustic structure — disc (spin={phdr.get('SPIN', '?')}, "
        f"incl={phdr.get('INCL', '?')})", fontsize=11,
    )
    fig.tight_layout()
    fig.savefig(out, dpi=150, bbox_inches="tight")
    print(f"Saved {out}")

    if summary:
        # 3x3 summary (python/caustic_discplane.py): order / detJ /
        # critical curves; zoomed order / zoomed detJ / parity; disc radius
        # / disc phi / redshift
        rad, phi, red = maps["RADIUS"], maps["PHI"], maps["REDSHIFT"]
        fig, axs = plt.subplots(3, 3, figsize=(15, 14))
        with np.errstate(divide="ignore"):
            mag = np.where(fin & (det_j != 0), np.log10(np.abs(det_j)), np.nan)
        panels = [
            (np.where(hit_mask, order.astype(float), np.nan), cmap_order, -0.5, 4.5, "order"),
            (mag, "magma", None, None, "log10 |det J|"),
            (np.where(crit | bnd, 1.0, np.nan), "Greys", 0, 1, "critical curves"),
        ]
        for ax, (d, cm, v0, v1, t) in zip(axs[0], panels):
            _img_zoom(ax, x_img, y_img, d, cm, v0, v1, t, zoom)
        for ax, (d, cm, v0, v1, t) in zip(axs[1], panels[:2] + [
            (np.where(hit_mask, sign_j, np.nan), "bwr", -1, 1, "parity")
        ]):
            _img_zoom(ax, x_img, y_img, d, cm, v0, v1, t + " (zoom)", min(8.0, zoom))
        for ax, (d, cm, t) in zip(axs[2], [
            (np.where(hit_mask, rad, np.nan), "viridis", "disc radius"),
            (np.where(hit_mask, phi, np.nan), "twilight", "disc phi"),
            (np.where(hit_mask, red, np.nan), "coolwarm", "redshift"),
        ]):
            _img_zoom(ax, x_img, y_img, d, cm, None, None, t, zoom)
        fig.tight_layout()
        sout = out.rsplit(".", 1)[0] + "_summary.png"
        fig.savefig(sout, dpi=150, bbox_inches="tight")
        print(f"Saved {sout}")


if __name__ == "__main__":
    main()

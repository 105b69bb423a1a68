"""Relativistic line profile from a disc image — counterpart of the
reference's ``python/line_from_image.ipynb``: read ENSHIFT + RADIUS from a
traced disc image, paint a broken power-law rest-frame emissivity on the
disc, boost per-pixel flux by g^3, and histogram pixel energies into an
observed line profile. Writes the profile as 2-column text and a figure
(energy-shift map, flux image, line profile).

Usage:
    python analysis/line_from_image.py <disc_image.fits> [out_prefix]
        [--line-en=6.4] [--q1=3] [--rbreak=5] [--q2=3] [--r-in=0]
"""

from __future__ import annotations

import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.colors as colors
import matplotlib.pyplot as plt
import numpy as np

from raytrace_tpu.io import read_fits


def broken_pl(r, q1, rbreak, q2):
    """Broken power-law emissivity (line_from_image.ipynb cell 7)."""
    pl = np.zeros_like(r)
    lo = (r > 0) & (r <= rbreak)
    hi = r > rbreak
    pl[lo] = r[lo] ** -q1
    pl[hi] = rbreak ** (q2 - q1) * r[hi] ** -q2
    return pl


def line_profile(enshift, disc_r, *, line_en=6.4, q1=3.0, rbreak=5.0, q2=3.0,
                 r_in=0.0, bin_edges=None):
    """(energy, line) from per-pixel energy shift and disc radius maps."""
    enshift = np.nan_to_num(np.asarray(enshift, float))
    disc_r = np.asarray(disc_r, float)
    disc_emis = broken_pl(disc_r, q1, rbreak, q2)
    disc_flux = np.nan_to_num(disc_emis * enshift ** 3)
    if r_in > 0:
        disc_flux[disc_r < r_in] = 0
    if bin_edges is None:
        bin_edges = np.arange(1, 10, 0.1)
    line, en_edges = np.histogram(
        line_en * enshift.ravel(), bins=bin_edges, weights=disc_flux.ravel()
    )
    energy = 0.5 * (en_edges[1:] + en_edges[:-1])
    return energy, line, disc_flux


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    opts = {a.split("=")[0][2:].replace("-", "_"): float(a.split("=")[1])
            for a in argv if a.startswith("--")}
    args = [a for a in argv if not a.startswith("--")]
    path = args[0]
    prefix = args[1] if len(args) > 1 else path.rsplit(".", 1)[0] + "_line"

    maps = read_fits(path)
    enshift, disc_r = maps["ENSHIFT"], maps["RADIUS"]
    energy, line, disc_flux = line_profile(
        enshift, disc_r,
        line_en=opts.get("line_en", 6.4), q1=opts.get("q1", 3.0),
        rbreak=opts.get("rbreak", 5.0), q2=opts.get("q2", 3.0),
        r_in=opts.get("r_in", 0.0),
    )
    np.savetxt(prefix + ".dat", np.column_stack([energy, line]),
               header="energy_keV  flux")

    fig, axes = plt.subplots(1, 3, figsize=(16, 5))
    axes[0].imshow(np.flipud(np.nan_to_num(enshift).T),
                   norm=colors.Normalize(0.01, 1.2), cmap="RdYlBu_r")
    axes[0].set_title("energy shift g")
    fm = disc_flux.max() if disc_flux.size else 1.0
    axes[1].imshow(np.flipud(np.clip(disc_flux, 1e-6 * fm, None).T),
                   norm=colors.LogNorm(1e-6 * fm, 0.1 * fm), cmap="hot")
    axes[1].set_title("disc flux (g^3-boosted)")
    axes[2].plot(energy, line)
    axes[2].set_xlabel("Energy / keV")
    axes[2].set_ylabel("Count rate")
    axes[2].set_title("line profile")
    fig.tight_layout()
    fig.savefig(prefix + ".png", dpi=130)
    print(f"Saved {prefix}.dat and {prefix}.png")


if __name__ == "__main__":
    main()

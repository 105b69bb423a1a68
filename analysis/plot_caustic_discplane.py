"""Disc-plane caustic report.

Renders the rt-caustic-discplane output (caustic_discplane.cpp capability)
as a three-panel diagnostic — Jacobian parity over the image plane, the
caustic locus mapped onto the disc (landing points classified by image
multiplicity, with the near-critical and undefined-Jacobian loci
highlighted and the ISCO drawn), and the image-multiplicity map — plus an
optional ``--summary`` grid adding |det J| magnitude, the critical-curve
mask and the physical landing maps (radius / phi / redshift). Same
scientific content as the reference's python/plot_caustic_discplane.py and
python/caustic_discplane.py figures, built on this repo's own panel
toolkit (analysis/caustic_report.py).

Usage:
    python analysis/plot_caustic_discplane.py <caustic_discplane.fits> [out.png] [--summary]
"""

from __future__ import annotations

import os
import sys

import numpy as np

if __package__ in (None, ""):  # direct script invocation
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analysis.caustic_report import (
    LocusPanel,
    MapPanel,
    image_extent,
    keyword,
    near_critical,
    primary_header,
    render,
    report_far_field_parity,
    report_multiplicity,
    undefined_jacobian,
)
from raytrace_tpu.io import read_fits


def _disc_locus(maps, hit, r_isco):
    det, order = maps["DET_J"], maps["ORDER"]
    crit = near_critical(det, hit)
    return LocusPanel(
        "caustic locus on the disc",
        field=None,
        mask=hit & np.isfinite(maps["SIGN_J"]),
        x=maps["X_DISC"], y=maps["Y_DISC"], classes=maps["ORDER"],
        highlights=[
            (crit & (order == 0),
             dict(s=2.0, c="crimson", linewidths=0, label="critical, m=0")),
            (crit & (order == 1),
             dict(s=2.0, c="deeppink", linewidths=0, label="critical, m=1")),
            (undefined_jacobian(det, hit),
             dict(s=2.0, c="k", linewidths=0, label="branch boundary")),
        ],
        circle=(r_isco, f"ISCO {r_isco:.2f} $r_g$") if np.isfinite(r_isco) else None,
        axis_name="disc",
    )


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    summary = "--summary" in argv
    argv = [a for a in argv if a != "--summary"]
    path = argv[0] if argv else "dat/caustic_discplane.fits"
    out = argv[1] if len(argv) > 1 else path.rsplit(".", 1)[0] + ".png"

    maps = read_fits(path)
    hdr = maps["_headers"]["DET_J"]
    top = primary_header(maps)
    hit = maps["HIT"] > 0.5
    order, det = maps["ORDER"], maps["DET_J"]
    try:
        r_isco = float(str(top.get("ISCO", "nan")).strip().strip("'"))
    except ValueError:
        r_isco = float("nan")

    report_multiplicity(order, hit, what="rays on the disc")
    report_far_field_parity(maps["SIGN_J"], hit, hdr)

    extent = image_extent(hdr)
    view = min(abs(v) for v in extent)
    parity = MapPanel("parity of det J", maps["SIGN_J"], cmap="coolwarm",
                      span=(-1, 1), mask=hit)
    mult = MapPanel("image multiplicity", order, cmap="tab10",
                    span=(-0.5, 4.5), mask=hit)
    headline = (f"caustics on the accretion disc — spin {keyword(top, 'SPIN')}"
                f", incl {keyword(top, 'INCL')}, r_disc {keyword(top, 'RDISC')}")
    render([parity, _disc_locus(maps, hit, r_isco), mult],
           extent=extent, view=view, headline=headline, out_path=out)

    if summary:
        finite = hit & np.isfinite(det) & (np.abs(det) < 1e29) & (det != 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            log_mag = np.where(finite, np.log10(np.abs(det)), np.nan)
        crit_or_bnd = near_critical(det, hit) | undefined_jacobian(det, hit)
        extra = [
            parity, mult,
            MapPanel("log10 |det J|", log_mag, cmap="magma"),
            MapPanel("critical curves", crit_or_bnd.astype(float),
                     cmap="gray_r", span=(0, 1)),
            MapPanel("landing radius", maps["RADIUS"], cmap="viridis",
                     mask=hit),
            MapPanel("landing phi", maps["PHI"], cmap="twilight", mask=hit),
            MapPanel("redshift g", maps["REDSHIFT"], cmap="coolwarm",
                     mask=hit),
            _disc_locus(maps, hit, r_isco),
        ]
        render(extra, extent=extent, view=view, ncols=3,
               headline=headline + " (summary)",
               out_path=out.rsplit(".", 1)[0] + "_summary.png")


if __name__ == "__main__":
    main()

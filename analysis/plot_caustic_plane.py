"""Flat-source-plane caustic report.

Renders the rt-caustic-plane output (FlatPlane destination at depth z_s
behind the hole — caustic_plane.cpp capability) as a three-panel
diagnostic: Jacobian parity over the image plane, the caustic locus
projected onto the source plane (landing points classified by image
multiplicity, near-critical and undefined-Jacobian loci highlighted), and
the image-multiplicity map. Same scientific content as the reference's
python/plot_caustic_plane.py figure, built on this repo's own panel
toolkit (analysis/caustic_report.py).

Usage:
    python analysis/plot_caustic_plane.py <caustic_plane.fits> [out.png]
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


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    path = argv[0] if argv else "dat/caustic_plane.fits"
    out = argv[1] if len(argv) > 1 else path.rsplit(".", 1)[0] + ".png"

    maps = read_fits(path)
    hdr = maps["_headers"]["DET_J"]
    top = primary_header(maps)
    hit = maps["HIT_PLANE"] > 0.5
    order, det = maps["ORDER"], maps["DET_J"]

    report_multiplicity(order, hit, what="rays on the source plane")
    report_far_field_parity(maps["SIGN_J"], hit, hdr)

    crit = near_critical(det, hit)
    locus = LocusPanel(
        "caustic locus on the source plane",
        field=None,
        mask=hit,
        x=maps["X_S"], y=maps["Y_S"], classes=order,
        highlights=[
            (crit & (order == 0),
             dict(s=2.0, c="crimson", linewidths=0, label="critical, m=0")),
            (crit & (order == 1),
             dict(s=2.0, c="deeppink", linewidths=0, label="critical, m=1")),
            (undefined_jacobian(det, hit),
             dict(s=2.0, c="k", linewidths=0, label="branch boundary")),
        ],
        axis_name="source plane",
    )

    extent = image_extent(hdr)
    view = min(abs(v) for v in extent)
    panels = [
        MapPanel("parity of det J", maps["SIGN_J"], cmap="coolwarm",
                 span=(-1, 1), mask=hit),
        locus,
        MapPanel("image multiplicity", order, cmap="tab10",
                 span=(-0.5, 4.5), mask=hit),
    ]
    headline = (f"caustics on the flat source plane — spin {keyword(top, 'SPIN')}"
                f", incl {keyword(top, 'INCL')}, z_s {keyword(top, 'Z_S')}")
    render(panels, extent=extent, view=view, headline=headline, out_path=out)


if __name__ == "__main__":
    main()

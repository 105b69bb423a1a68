"""Source-sphere caustic report.

Renders the rt-caustic-sourceplane output (far sphere at r_lim, no
destination surface — caustic_sourceplane.cpp capability) as a three-panel
diagnostic: Jacobian parity, image multiplicity and the escape mask over
the image plane, preceded by the multiplicity census and the far-field
parity sanity check. Same scientific content as the reference's
python/plot_caustics.py figure, built on this repo's own panel toolkit
(analysis/caustic_report.py).

Usage:
    python analysis/plot_caustics.py <caustic_sourceplane.fits> [out.png]
"""

from __future__ import annotations

import os
import sys

import numpy as np

if __package__ in (None, ""):  # direct script invocation
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analysis.caustic_report import (
    MapPanel,
    image_extent,
    keyword,
    primary_header,
    render,
    report_far_field_parity,
    report_multiplicity,
)
from raytrace_tpu.io import read_fits


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    path = argv[0] if argv else "dat/caustic_sourceplane.fits"
    out = argv[1] if len(argv) > 1 else path.rsplit(".", 1)[0] + ".png"

    maps = read_fits(path)
    hdr = maps["_headers"]["DET_J"]
    top = primary_header(maps)
    escaped = maps["ESCAPED"] > 0.5
    order = maps["ORDER"]

    report_multiplicity(order, escaped, what="escaped rays")
    report_far_field_parity(maps["SIGN_J"], escaped, hdr)

    extent = image_extent(hdr)
    view = min(10.0, min(abs(v) for v in extent))
    panels = [
        MapPanel("parity of det J", maps["SIGN_J"], cmap="coolwarm",
                 span=(-1, 1), mask=escaped),
        MapPanel("image multiplicity", order, cmap="tab10",
                 span=(-0.5, 4.5), mask=escaped),
        MapPanel("escaped to the source sphere", escaped.astype(float),
                 cmap="cividis", span=(0, 1)),
    ]
    headline = (f"caustics on the source sphere — spin {keyword(top, 'SPIN')}"
                f", incl {keyword(top, 'INCL')}")
    render(panels, extent=extent, view=view, headline=headline, out_path=out)


if __name__ == "__main__":
    main()

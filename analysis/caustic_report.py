"""Declarative figure/stats toolkit for the caustic diagnostic reports.

The three caustic apps (rt-caustic-discplane / rt-caustic-plane /
rt-caustic-sourceplane) emit the same family of lensing-Jacobian maps onto
different target surfaces. The scripts in this directory turn those FITS
files into diagnostic figures with the same scientific content as the
reference's python/ plotting layer (parity of det J in the image plane,
image multiplicity, the caustic locus on the target surface, census
statistics) — rebuilt here on a small declarative panel framework of this
repo's own design.

Conventions: all maps arrive from ``raytrace_tpu.io.read_fits`` in (x, y)
orientation; figures render them with ``imshow(data.T, origin="lower",
extent=...)`` and crop by axis limits rather than slicing.
"""

from __future__ import annotations

import dataclasses

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

#: value the caustic apps store where a Jacobian is undefined
#: (satellites straddling a geodesic branch/order boundary)
UNDEFINED_J = 1e29


@dataclasses.dataclass
class MapPanel:
    """An image-plane map: ``field`` is (nx, ny), masked cells become NaN."""

    label: str
    field: np.ndarray
    cmap: str | object = "viridis"
    span: tuple | None = None
    mask: np.ndarray | None = None

    def draw(self, ax, extent, view):
        data = np.asarray(self.field, dtype=float)
        if self.mask is not None:
            data = np.where(self.mask, data, np.nan)
        lo, hi = self.span if self.span else (None, None)
        im = ax.imshow(data.T, origin="lower", extent=extent, cmap=self.cmap,
                       vmin=lo, vmax=hi, interpolation="nearest",
                       rasterized=True)
        ax.figure.colorbar(im, ax=ax, shrink=0.85)
        ax.set_xlabel(r"image plane $\alpha$ ($r_g$)")
        ax.set_ylabel(r"image plane $\beta$ ($r_g$)")
        self._finish(ax, view)

    def _finish(self, ax, view):
        ax.set_xlim(-view, view)
        ax.set_ylim(-view, view)
        ax.set_aspect(1.0)
        ax.set_title(self.label, fontsize=10)


@dataclasses.dataclass
class LocusPanel(MapPanel):
    """Landing-point cloud on the target surface, classified by a per-pixel
    integer (image multiplicity), with optional highlighted subsets and a
    reference circle (e.g. the ISCO)."""

    x: np.ndarray = None
    y: np.ndarray = None
    classes: np.ndarray = None
    n_classes: int = 3
    highlights: list = dataclasses.field(default_factory=list)  # (mask, style)
    circle: tuple | None = None  # (radius, label)
    axis_name: str = "target"

    def draw(self, ax, extent, view):
        base = self.mask if self.mask is not None else np.ones(self.x.shape, bool)
        cmap = matplotlib.colormaps["tab10"].resampled(self.n_classes)
        sc = ax.scatter(self.x[base], self.y[base], c=self.classes[base],
                        cmap=cmap, vmin=-0.5, vmax=self.n_classes - 0.5,
                        s=1.5, alpha=0.5, linewidths=0, rasterized=True)
        cb = ax.figure.colorbar(sc, ax=ax, shrink=0.85,
                                ticks=range(self.n_classes))
        cb.set_label("image multiplicity")
        cb.solids.set(alpha=1.0)
        for hmask, style in self.highlights:
            if np.any(hmask):
                ax.scatter(self.x[hmask], self.y[hmask], zorder=4, **style)
        if self.circle is not None:
            radius, label = self.circle
            t = np.linspace(0.0, 2.0 * np.pi, 256)
            ax.plot(radius * np.cos(t), radius * np.sin(t), ls=":", lw=1.0,
                    color="k", label=label)
        if self.highlights or self.circle:
            ax.legend(loc="lower left", fontsize=7, markerscale=3,
                      framealpha=0.9)
        ax.set_xlabel(f"{self.axis_name} x ($r_g$)")
        ax.set_ylabel(f"{self.axis_name} y ($r_g$)")
        self._finish(ax, view)


def render(panels, *, extent, view, headline, out_path, ncols=None):
    """Lay the panels out in one row (or a grid) and write the figure."""
    n = len(panels)
    ncols = ncols or n
    nrows = -(-n // ncols)
    fig, axes = plt.subplots(nrows, ncols, figsize=(5.4 * ncols, 5.0 * nrows),
                             squeeze=False)
    for ax in axes.flat[n:]:
        ax.set_axis_off()
    for panel, ax in zip(panels, axes.flat):
        panel.draw(ax, extent, view)
    fig.suptitle(headline, fontsize=11)
    fig.tight_layout(rect=(0, 0, 1, 0.95))
    fig.savefig(out_path, dpi=140)
    plt.close(fig)
    print(f"wrote {out_path}")


# ---------------------------------------------------------------------------
# map geometry + census statistics

def primary_header(maps):
    """The primary HDU's card dictionary from a read_fits result."""
    return maps["_headers"].get("PRIMARY", maps["_headers"].get(0, {}))


def keyword(hdr, name, default="?"):
    """A header value as a compact display string ('9.98E-1' -> '0.998')."""
    v = hdr.get(name)
    if v is None:
        return default
    v = str(v).strip().strip("'").strip()
    try:
        return f"{float(v):g}"
    except ValueError:
        return v


def image_extent(hdr):
    """(x0, xmax, y0, ymax) of the image plane from an extension header."""
    return (float(hdr["X0"]), float(hdr["XMAX"]),
            float(hdr["Y0"]), float(hdr["YMAX"]))


def impact_parameter(hdr):
    """|b| = sqrt(alpha^2 + beta^2) on the (nx, ny) pixel grid."""
    x0, xmax, y0, ymax = image_extent(hdr)
    a = np.linspace(x0, xmax, int(hdr["NX"]))
    b = np.linspace(y0, ymax, int(hdr["NY"]))
    return np.hypot(a[:, None], b[None, :])


def report_multiplicity(order, mask, what="rays on target"):
    """Print the image-multiplicity census over the masked pixels."""
    total = max(int(mask.sum()), 1)
    tags = {0: "direct", 1: "photon ring", -1: "unclassified"}
    print(f"multiplicity census ({total} {what}):")
    for value in sorted(np.unique(order[mask]).astype(int)):
        n = int((order[mask] == value).sum())
        tag = tags.get(value, f"winding {value}")
        print(f"   m = {value:2d} [{tag:>12s}]  {n:7d}  ({100.0 * n / total:5.1f}%)")


def report_far_field_parity(sign_j, mask, hdr, b_min=8.0):
    """Far-field sanity: pixels at |b| > b_min should be overwhelmingly
    even-parity (weak-deflection direct images preserve orientation)."""
    far = mask & np.isfinite(sign_j) & (impact_parameter(hdr) > b_min)
    even, odd = int((sign_j[far] > 0).sum()), int((sign_j[far] < 0).sum())
    print(f"far-field parity (|b| > {b_min:g} r_g): {even} even / {odd} odd")
    return even, odd


def near_critical(det_j, mask, frac=0.01):
    """Pixels whose |det J| has collapsed below ``frac`` of the map's bulk
    scale — the critical curves, where magnification diverges."""
    finite = mask & np.isfinite(det_j) & (np.abs(det_j) < UNDEFINED_J)
    if not finite.any():
        return finite
    bulk = np.percentile(np.abs(det_j[finite]), 90)
    return finite & (np.abs(det_j) < frac * bulk)


def undefined_jacobian(det_j, mask):
    """Pixels where the bundle Jacobian was marked undefined (satellites on
    different geodesic branches)."""
    return mask & ~(np.abs(det_j) < UNDEFINED_J)

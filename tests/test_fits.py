"""Strict FITS 4.0 standard validation of the pure-numpy writer.

astropy is not on this image, so the writer's output is validated against an
independent card-level parser implementing the mandatory-keyword rules of the
FITS standard directly (block structure, card syntax, fixed-format values,
mandatory keyword order, data sizes, big-endian encoding) — stricter than a
lenient reader roundtrip, and independent of io/fits.py's own read_fits.
"""

import numpy as np

from raytrace_tpu.io import FITSOutput, read_fits

_BLOCK = 2880
_CARD = 80


def _parse_strict(path):
    """Parse a FITS file enforcing the standard's structural rules; returns
    [(header_dict, data_bytes)] per HDU."""
    raw = open(path, "rb").read()
    assert len(raw) % _BLOCK == 0, "file is not a whole number of 2880-byte blocks"
    hdus = []
    pos = 0
    first = True
    while pos < len(raw):
        cards = []
        end_seen = False
        while not end_seen:
            block = raw[pos : pos + _BLOCK]
            assert len(block) == _BLOCK, "truncated header block"
            # header blocks are restricted to printable ASCII (std §3.2)
            assert all(32 <= b <= 126 for b in block), "non-ASCII byte in header"
            pos += _BLOCK
            for i in range(0, _BLOCK, _CARD):
                card = block[i : i + _CARD].decode("ascii")
                if end_seen:
                    # cards after END must be blank fill (std §4.4.1)
                    assert card == " " * _CARD
                    continue
                if card.startswith("END") and card[3:8] == "     ":
                    assert card == "END" + " " * 77, "END card has trailing text"
                    end_seen = True
                    continue
                cards.append(card)
        hdr = {}
        for c in cards:
            kw = c[:8]
            # keyword charset: uppercase alnum, dash, underscore, space-padded
            assert all(
                ch.isdigit() or ("A" <= ch <= "Z") or ch in " -_" for ch in kw
            ), f"bad keyword {kw!r}"
            assert kw == kw.rstrip() + " " * (8 - len(kw.rstrip())), kw
            if c[8:10] == "= ":
                hdr.setdefault(kw.strip(), c[10:])

        # mandatory keywords in mandatory order (std §4.4.1)
        if first:
            assert cards[0][:10] == "SIMPLE  = " and cards[0][29] == "T"
        else:
            assert cards[0][:8] == "XTENSION"
        assert cards[1][:8] == "BITPIX  "
        assert cards[2][:8] == "NAXIS   "
        naxis = int(hdr["NAXIS"])
        for i in range(naxis):
            assert cards[3 + i][:8] == f"NAXIS{i + 1}".ljust(8)
        if not first:
            assert cards[3 + naxis][:8] == "PCOUNT  "
            assert cards[4 + naxis][:8] == "GCOUNT  "
            if "BINTABLE" in hdr["XTENSION"]:
                assert cards[5 + naxis][:8] == "TFIELDS "

        bitpix = int(hdr["BITPIX"])
        assert bitpix in (8, 16, 32, 64, -32, -64), bitpix
        shape = [int(hdr[f"NAXIS{i + 1}"]) for i in range(naxis)]
        nbytes = abs(bitpix) // 8
        for s in shape:
            nbytes *= s
        if naxis == 0:
            nbytes = 0
        nblocks = -(-nbytes // _BLOCK)
        data = raw[pos : pos + nbytes]
        # data fill must be zero bytes (std §3.3.2)
        pad = raw[pos + nbytes : pos + nblocks * _BLOCK]
        assert pad == b"\x00" * len(pad), "data block padding is not zero-filled"
        pos += nblocks * _BLOCK
        hdus.append((hdr, data))
        first = False
    return hdus


def test_image_file_is_standard_compliant(tmp_path):
    path = str(tmp_path / "img.fits")
    img = np.arange(12.0).reshape(3, 4)  # (x, y) in the app convention
    cube = np.arange(24, dtype=np.int32).reshape(2, 3, 4)
    with FITSOutput(path) as f:
        f.write_image(img, extname="FLUX")
        f.set_keyword("SPIN", 0.998, "black hole spin")
        f.set_keyword("NRAYS", 12345)
        f.set_keyword("SRC", "lamppost", "source type")
        f.set_keyword("REVERSE", True)
        f.write_comment("provenance comment")
        f.write_image(cube, extname="CUBE", transpose=False)

    hdus = _parse_strict(path)
    assert len(hdus) == 3

    # primary: headerless empty HDU with EXTEND
    ph, pdata = hdus[0]
    assert int(ph["NAXIS"]) == 0 and pdata == b""
    assert ph["EXTEND"].split("/")[0].strip() == "T"

    # image extension: big-endian f8, Fortran axis order (NAXIS1 = image x)
    ih, idata = hdus[1]
    assert int(ih["BITPIX"]) == -64
    assert int(ih["NAXIS1"]) == 3 and int(ih["NAXIS2"]) == 4
    arr = np.frombuffer(idata, dtype=">f8").reshape(4, 3)  # C-read of F-order
    np.testing.assert_array_equal(arr.T, img)
    # typed keywords in fixed format
    assert float(ih["SPIN"].split("/")[0]) == 0.998
    assert int(ih["NRAYS"].split("/")[0]) == 12345
    assert ih["SRC"].split("/")[0].strip().strip("'").strip() == "lamppost"
    # boolean T in column 30 of the card (index 19 of the value field)
    assert ih["REVERSE"][:20].rstrip().endswith("T")
    assert ih["EXTNAME"].strip().strip("'").strip() == "FLUX"

    # 3-D cube kept in C order when transpose=False: NAXIS1 = last numpy axis
    ch, cdata = hdus[2]
    assert [int(ch[f"NAXIS{i}"]) for i in (1, 2, 3)] == [4, 3, 2]
    cval = np.frombuffer(cdata, dtype=">i4").reshape(2, 3, 4)
    np.testing.assert_array_equal(cval, cube)


def test_bintable_is_standard_compliant(tmp_path):
    path = str(tmp_path / "tab.fits")
    cols = {
        "RADIUS": np.linspace(1.0, 30.0, 7),
        "COUNT": np.arange(7, dtype=np.int32),
        "INDEX": np.arange(7, dtype=np.int64) * 10,
    }
    with FITSOutput(path) as f:
        f.write_table(cols, extname="PROFILE")

    hdus = _parse_strict(path)
    th, tdata = hdus[1]
    assert "BINTABLE" in th["XTENSION"]
    assert int(th["TFIELDS"].split("/")[0]) == 3
    forms = [th[f"TFORM{i}"].strip().strip("'").strip() for i in (1, 2, 3)]
    assert forms == ["D", "J", "K"]
    names = [th[f"TTYPE{i}"].strip().strip("'").strip() for i in (1, 2, 3)]
    assert names == ["RADIUS", "COUNT", "INDEX"]
    rowbytes = int(th["NAXIS1"].split("/")[0])
    assert rowbytes == 8 + 4 + 8
    rec = np.frombuffer(
        tdata, dtype=[("RADIUS", ">f8"), ("COUNT", ">i4"), ("INDEX", ">i8")]
    )
    np.testing.assert_array_equal(rec["RADIUS"], cols["RADIUS"])
    np.testing.assert_array_equal(rec["COUNT"], cols["COUNT"])
    np.testing.assert_array_equal(rec["INDEX"], cols["INDEX"])


def test_reader_roundtrip_matches_writer(tmp_path):
    """io.read_fits (used by the analysis layer) returns the writer's (x, y)
    orientation and the header keywords."""
    path = str(tmp_path / "rt.fits")
    img = np.random.default_rng(0).normal(size=(5, 9))
    with FITSOutput(path) as f:
        f.write_image(img, extname="G")
        f.set_keyword("INCL", 60.0)
    out = read_fits(path)
    np.testing.assert_array_equal(out["G"], img)
    assert float(out["_headers"]["G"]["INCL"]) == 60.0

"""Analysis & plotting layer (L4): scripts reading the apps' FITS/text
outputs — the counterpart of the reference's python/ directory."""

"""Output writers: column text and FITS."""

from raytrace_tpu.io.text import TextOutput
from raytrace_tpu.io.fits import FITSOutput, read_fits

__all__ = ["TextOutput", "FITSOutput", "read_fits"]

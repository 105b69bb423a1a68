"""Terminal progress reporting for multi-phase runs.

The reference shows a per-ray progress bar inside its OpenMP loop
(src/include/progress_bar.h); compiled lock-step batches complete as a
unit, so progress here is per phase/chunk — used by the compacted drivers
and by apps looping over launch radii.
"""

from __future__ import annotations

import shutil
import sys
import time


class ProgressBar:
    def __init__(self, total: int, label: str = "", enabled: bool = True):
        self.total = max(total, 1)
        self.label = label
        self.enabled = enabled and sys.stderr.isatty()
        self.t0 = time.time()

    def show(self, done: int):
        if not self.enabled:
            return
        width = max(shutil.get_terminal_size((80, 20)).columns - 30, 10)
        frac = min(done / self.total, 1.0)
        filled = int(frac * width)
        bar = "=" * filled + ">" + " " * (width - filled)
        sys.stderr.write(
            f"\r{self.label} [{bar}] {100*frac:5.1f}% ({time.time()-self.t0:.1f}s)"
        )
        sys.stderr.flush()

    def done(self):
        if self.enabled:
            self.show(self.total)
            sys.stderr.write("\n")

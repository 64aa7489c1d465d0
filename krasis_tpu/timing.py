"""Timing / diagnostics flags (reference python/krasis/timing.py parity).

Env-gated singletons, all off by default:
  KRASIS_TPU_DECODE_TIMING=1  — per-step decode timing lines
  KRASIS_TPU_PREFILL_TIMING=1 — prefill phase breakdown
  KRASIS_TPU_DIAG=1           — per-layer activation RMS diagnostics
  KRASIS_TPU_TIMING_INTERVAL  — decode report interval (steps, default 50)
"""

from __future__ import annotations

import os


class _Timing:
    def __init__(self):
        self.decode = os.environ.get("KRASIS_TPU_DECODE_TIMING", "") == "1"
        self.prefill = os.environ.get("KRASIS_TPU_PREFILL_TIMING", "") == "1"
        self.diag = os.environ.get("KRASIS_TPU_DIAG", "") == "1"
        self.interval = int(os.environ.get("KRASIS_TPU_TIMING_INTERVAL", "50"))


TIMING = _Timing()

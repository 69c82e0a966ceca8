"""Process-level state helpers.

Parity target: reference `utils/general_utils.py:112-133` `safe_state` —
wraps stdout so every line carries a timestamp (unless quiet) and seeds
the host RNGs for reproducibility. The CUDA device pinning of the
reference has no TPU analogue (device selection is the runtime's job).
"""
from __future__ import annotations

import random
import sys
from datetime import datetime

import numpy as np


class _TimestampedStream:
    def __init__(self, stream, silent: bool):
        self.stream = stream
        self.silent = silent

    def write(self, text: str):
        if self.silent:
            return
        if text.endswith("\n"):
            stamp = datetime.now().strftime("%d/%m %H:%M:%S")
            text = text.replace("\n", f" [{stamp}]\n")
        self.stream.write(text)

    def flush(self):
        self.stream.flush()

    def __getattr__(self, name):
        return getattr(self.stream, name)


def safe_state(silent: bool = False, seed: int = 0) -> None:
    """Seed host RNGs and timestamp stdout lines (suppress them entirely
    when `silent`). Device-side randomness uses explicit jax PRNG keys
    threaded by the callers, so only the host generators are seeded here."""
    sys.stdout = _TimestampedStream(sys.stdout, silent)
    random.seed(seed)
    np.random.seed(seed)

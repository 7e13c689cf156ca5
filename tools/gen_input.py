"""Deterministic synthetic YUV input generation shared by tests and tools."""

from __future__ import annotations

import numpy as np


def make_input_yuv(path: str, width: int, height: int, depth: int, fmt: int,
                   frames: int, seed: int = 1234) -> None:
    """Write a deterministic planar YUV file covering the full sample range
    (including near-max values that exercise the legal-range clamp)."""
    rng = np.random.default_rng(seed)
    subx = 1 if fmt == 2 else 2
    suby = 1 if fmt >= 1 else 2
    cw, ch = width // subx, height // suby
    hi = 255 if depth == 8 else 1023
    dt = np.uint8 if depth == 8 else np.dtype("<u2")
    with open(path, "wb") as f:
        for _ in range(frames):
            for w, h in ((width, height), (cw, ch), (cw, ch)):
                plane = rng.integers(0, hi + 1, size=(h, w))
                plane.astype(dt).tofile(f)

"""YUV preview utilities for the designer (reference: fgc-designer.py:228-303).

Pure numpy: single-frame YUV reading, chroma upsampling to 4:4:4 with a
separable half-band interpolation filter, and BT.709 limited-range YUV->RGB.
"""

from __future__ import annotations

import numpy as np

from ..utils import yuv as yuvio

# Half-band interpolator taps for chroma upsampling (windowed sinc).
_TAPS = np.array([-4, 54, 16, -2], dtype=np.int32)  # /64, for phase 0.5


def read_yuv_frame(filename: str, frame: int, width: int, height: int,
                   depth: int, fmt: int):
    """Read one (Y, U, V) frame from a planar YUV file."""
    with open(filename, "rb") as f:
        yuvio.skip_frames(f, frame, width, height, depth, fmt)
        planes = yuvio.read_frame(f, width, height, depth, fmt)
    if planes is None:
        raise EOFError(f"frame {frame} beyond end of {filename}")
    return planes


def _upsample_axis(p: np.ndarray, axis: int) -> np.ndarray:
    """2x co-sited upsample along ``axis`` with a 4-tap half-band filter."""
    p = np.moveaxis(p, axis, 0).astype(np.int32)
    n = p.shape[0]
    idx = np.arange(n)
    pm1 = p[np.maximum(idx - 1, 0)]
    pp1 = p[np.minimum(idx + 1, n - 1)]
    pp2 = p[np.minimum(idx + 2, n - 1)]
    half = (pm1 * _TAPS[0] + p * _TAPS[1] + pp1 * _TAPS[2]
            + pp2 * _TAPS[3] + 32) >> 6
    out = np.empty((2 * n,) + p.shape[1:], dtype=np.int32)
    out[0::2] = p
    out[1::2] = half
    return np.moveaxis(out, 0, axis)


def upsample_chroma(y: np.ndarray, u: np.ndarray, v: np.ndarray, fmt: int):
    """Upsample U/V to luma resolution (4:4:4)."""
    for _ in range(2):
        if u.shape[1] < y.shape[1]:
            u = _upsample_axis(u, 1)
            v = _upsample_axis(v, 1)
        if u.shape[0] < y.shape[0]:
            u = _upsample_axis(u, 0)
            v = _upsample_axis(v, 0)
    return u[:y.shape[0], :y.shape[1]], v[:y.shape[0], :y.shape[1]]


def yuv_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray, depth: int,
               fmt: int) -> np.ndarray:
    """BT.709 limited-range YUV -> float RGB in [0, 1] for display."""
    u, v = upsample_chroma(y, u, v, fmt)
    scale = float(1 << (depth - 8))
    yf = (y.astype(np.float32) / scale - 16.0) / 219.0
    uf = (u.astype(np.float32) / scale - 128.0) / 224.0
    vf = (v.astype(np.float32) / scale - 128.0) / 224.0
    r = yf + 1.5748 * vf
    g = yf - 0.18733 * uf - 0.46813 * vf
    b = yf + 1.8556 * uf
    return np.clip(np.stack([r, g, b], axis=-1), 0.0, 1.0)

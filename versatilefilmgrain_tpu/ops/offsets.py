"""Derive per-block pattern offsets + sign from LFSR state words.

Replicates vfgs_hw.c:99-138 (get_offset_y/u/v): each color component extracts
disjoint bit fields from the same 32-bit state to decorrelate Y/U/V.  X offsets
fall in {0,4,...,48} (13 bins x 4) and Y offsets in {0,4,...,44} (12 bins x 4),
scaled by 4/csub for chroma.

Pure uint32 arithmetic -- the same code vectorizes over numpy and jax arrays of
any shape (one call per (block-row, block-col) lattice).
"""

from __future__ import annotations

import numpy as np


def block_offsets(val, c: int, csubx: int, csuby: int):
    """Return ``(sign, ox, oy)`` for component ``c`` from state word(s) ``val``.

    ``sign`` is +1/-1 (int32), ``ox``/``oy`` are int32 pattern offsets.
    """
    if c == 0:
        sign_bit = (val >> 31) & 1
        xbf = val & 0x3FF
        ybf = (val >> 14) & 0x3FF
        xmul, ymul = 4, 4
    elif c == 1:
        sign_bit = (val >> 2) & 1
        xbf = (val >> 10) & 0x3FF
        ybf = ((val >> 24) & 0x0FF) | ((val << 8) & 0x300)
        xmul, ymul = 4 // csubx, 4 // csuby
    else:
        sign_bit = (val >> 15) & 1
        xbf = (val >> 20) & 0x3FF
        ybf = (val >> 4) & 0x3FF
        xmul, ymul = 4 // csubx, 4 // csuby

    s = 1 - 2 * sign_bit.astype(np.int32)
    ox = (((xbf * 13) >> 10) * xmul).astype(np.int32)
    oy = (((ybf * 12) >> 10) * ymul).astype(np.int32)
    return s, ox, oy

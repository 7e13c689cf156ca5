"""31-bit LFSR pseudo-random generator as a GF(2) linear map, with jump-ahead.

The reference advances one 32-bit register serially, once per 16-pixel block
column (vfgs_hw.c:74-79, 288-312), with a per-block-row backup/restore schedule
(vfgs_hw.c:291-298) and carry-over across frames (the state is never reset
between frames).  Working out that schedule gives a closed form: with
``C = ceil(width/16)`` block columns and ``R = ceil(height/16)`` block rows, the
register value used for block (frame f, block-row r, block-col c) is

    state(f, r, c) = A^((f*(R-1) + r)*C + c) . S0

where ``S0 = seed << 1`` (vfgs_hw.c:339-344) and ``A`` is the one-step LFSR
transition, a linear map over GF(2)^32.  (Frame f's block-row 0 reuses frame
f-1's last block-row state because the backup only triggers for ``y > 0``,
hence the ``R-1`` factor.)  The "upper block" register ``rnd_up`` used for
vertical overlap is the same lattice shifted one block-row up:
``state_up(f, r, c) = state(f, r-1, c)``, i.e. exponent minus ``C``.

This module computes ``A^e`` by square-and-multiply on a column representation
(32 uint32 columns; applying the matrix is 32 select-XOR ops, which vectorizes
over arbitrarily-shaped state arrays in both numpy and JAX).  That replaces the
serial dependency with an embarrassingly parallel per-(frame, row, col) state
lattice -- the key enabler for sharding frames and tile rows across TPU chips
with zero communication while staying bit-exact with the C model.
"""

from __future__ import annotations

import functools

import numpy as np

MASK32 = np.uint32(0xFFFFFFFF)


def lfsr_step(x):
    """One LFSR step: bit-reversed SMPTE RDD-5 polynomial (vfgs_hw.c:74-79).

    Works on python ints, numpy uint32 scalars/arrays, and jax uint32 arrays.
    """
    s = ((x << 30) ^ (x << 2)) & 0x80000000
    return (s | (x >> 1)) & 0xFFFFFFFF


def _identity_cols() -> np.ndarray:
    return (np.uint32(1) << np.arange(32, dtype=np.uint32)).astype(np.uint32)


def step_matrix_cols() -> np.ndarray:
    """Column representation of A: cols[j] = A applied to basis vector e_j."""
    return np.array([lfsr_step(1 << j) for j in range(32)], dtype=np.uint32)


def apply_cols(cols, x):
    """Apply a GF(2) matrix (column rep) to state(s) ``x`` (uint32, any shape).

    Pure arithmetic (mul by 0/1 + xor), so the same code runs in numpy and
    under jax tracing.
    """
    out = x & 0  # zeros of x's shape/dtype
    for j in range(32):
        out = out ^ (np.uint32(cols[j]) * ((x >> j) & 1))
    return out


def matmul_cols(a_cols: np.ndarray, b_cols: np.ndarray) -> np.ndarray:
    """Compose: result = A . B in column representation (numpy only)."""
    return apply_cols(a_cols, b_cols.astype(np.uint32))


@functools.lru_cache(maxsize=None)
def jump_cols_pow2(k: int) -> np.ndarray:
    """Column rep of A^(2^k) (cached)."""
    if k == 0:
        return step_matrix_cols()
    m = jump_cols_pow2(k - 1)
    m2 = matmul_cols(m, m)
    m2.setflags(write=False)
    return m2


def power_cols(e: int) -> np.ndarray:
    """Column rep of A^e for a non-negative python int exponent."""
    assert e >= 0
    cols = _identity_cols()
    k = 0
    while e:
        if e & 1:
            cols = matmul_cols(jump_cols_pow2(k), cols)
        e >>= 1
        k += 1
    return cols


def advance(state, e: int):
    """A^e . state for python-int e >= 0 (numpy path)."""
    if e == 0:
        return state
    return apply_cols(power_cols(e), state)


def state_lattice_np(base: int, rows: int, cols: int) -> np.ndarray:
    """(rows, cols) uint32 lattice: L[r, c] = A^(r*cols + c) . base  (numpy)."""
    e = np.arange(rows * cols, dtype=np.uint32).reshape(rows, cols)
    state = np.full((rows, cols), np.uint32(base), dtype=np.uint32)
    nbits = max(1, (rows * cols - 1).bit_length())
    for k in range(nbits):
        jumped = apply_cols(jump_cols_pow2(k), state)
        bit = (e >> k) & 1
        state = np.where(bit.astype(bool), jumped, state)
    return state


@functools.lru_cache(maxsize=8)
def _lattice_matrix_table(rows: int, cols: int) -> np.ndarray:
    """Static (rows, cols, 32) table: entry [r, c] is the column rep of
    A^(r*cols + c).

    Built on the host once per lattice shape by composing per-row and
    per-column exponent matrices: A^(r*cols+c) = A^(r*cols) . A^c.  Each
    factor family is computed with the same square-multiply-on-batches trick
    as :func:`state_lattice_np`, so construction is O(log(n)) numpy passes.
    """
    def _exp_family(n: int, stride: int) -> np.ndarray:
        """(n, 32) uint32: row e holds the column rep of A^(e*stride)."""
        fam = np.broadcast_to(_identity_cols(), (n, 32)).copy()
        e = np.arange(n, dtype=np.uint64) * stride
        nbits = max(1, int(e.max()).bit_length()) if n > 1 else 1
        for k in range(nbits):
            jumped = apply_cols(jump_cols_pow2(k), fam)
            bit = ((e >> k) & 1).astype(bool)[:, None]
            fam = np.where(bit, jumped, fam)
        return fam.astype(np.uint32)

    arow = _exp_family(rows, cols)      # A^(r*cols)
    acol = _exp_family(cols, 1)         # A^c
    # compose: out[r, c, i] = XOR_j arow[r, j] * bit_j(acol[c, i])
    out = np.zeros((rows, cols, 32), np.uint32)
    for j in range(32):
        out ^= arow[:, None, None, j] * ((acol[None, :, :] >> j) & 1)
    out.setflags(write=False)
    return out


def state_lattice_jax(base, rows: int, cols: int):
    """Same as :func:`state_lattice_np` but jit-traceable (base may be traced).

    ``rows``/``cols`` are static, so the per-exponent matrices A^(r*cols+c)
    are a host-precomputed constant table and the device work is just the
    32 select-XOR contraction against ``base``'s bits (~15x cheaper than
    square-multiplying on device per lattice point).
    """
    import jax.numpy as jnp

    m = _lattice_matrix_table(rows, cols)           # (rows, cols, 32) static
    base = jnp.asarray(base, jnp.uint32)
    state = jnp.zeros((rows, cols), jnp.uint32)
    for j in range(32):
        state = state ^ (m[:, :, j] * ((base >> j) & jnp.uint32(1)))
    return state


def frame_base_exponent(frame: int, rows: int, cols: int) -> int:
    """Exponent of the lattice base state for ``frame`` frames after a seed set."""
    return frame * (rows - 1) * cols

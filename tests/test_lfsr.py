"""LFSR jump-ahead unit tests: closed-form state lattice vs serial emulation
of the reference schedule (vfgs_hw.c:288-312)."""

import numpy as np

from versatilefilmgrain_tpu.ops import lfsr


def test_jump_matches_serial():
    x = 0xDEADBEEF
    s = x
    for _ in range(12345):
        s = lfsr.lfsr_step(s)
    assert int(lfsr.advance(np.uint32(x), 12345)) == s


def test_lattice_np_and_jax_match_serial():
    base = 0x12345678 << 1
    lat = lfsr.state_lattice_np(base, 5, 9)
    s = base
    for r in range(5):
        for c in range(9):
            assert int(lat[r, c]) == s
            s = lfsr.lfsr_step(s)
    lat_j = np.asarray(lfsr.state_lattice_jax(np.uint32(base), 5, 9))
    assert np.array_equal(lat, lat_j)


def _serial_schedule(seed, R, C, frames):
    """Emulate vfgs_add_grain_line's register schedule; return per-(f,r,c)
    (rnd, rnd_up) at the first line of each block row."""
    rnd = rnd_up = line_rnd = line_rnd_up = seed
    out = {}
    for f in range(frames):
        for y in range(R * 16):
            if y and (y & 0xF) == 0:
                line_rnd_up = line_rnd
                line_rnd = rnd
            rnd_up = line_rnd_up
            rnd = line_rnd
            for c in range(C):
                if (y & 0xF) == 0:
                    out[(f, y >> 4, c)] = (rnd, rnd_up)
                rnd = lfsr.lfsr_step(rnd)
                rnd_up = lfsr.lfsr_step(rnd_up)
    return out


def test_closed_form_matches_reference_schedule():
    seed = 0xDEADBEEF
    R, C, F = 4, 5, 3
    serial = _serial_schedule(seed, R, C, F)
    for f in range(F):
        e0 = lfsr.frame_base_exponent(f, R, C)
        base = int(lfsr.advance(np.uint32(seed), e0))
        lat = lfsr.state_lattice_np(base, R, C)
        base_up = int(lfsr.advance(np.uint32(seed), e0 - C)) if e0 else seed
        lat_up = np.vstack([lfsr.state_lattice_np(base_up, 1, C), lat[:-1]])
        for r in range(R):
            for c in range(C):
                assert int(lat[r, c]) == serial[(f, r, c)][0], (f, r, c)
                if f > 0 or r > 0:
                    assert int(lat_up[r, c]) == serial[(f, r, c)][1], (f, r, c)

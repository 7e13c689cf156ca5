"""Pallas TPU kernel for the grain engine hot path (bit-exact, VMEM-resident).

The XLA formulation (ops/grain_fast.py) is gather- and layout-bound: the
coarse `lax.gather` over the window table and the (R, 8, bh, C, bw) layout
gymnastics materialize multi-frame int32 intermediates in HBM.  This kernel
keeps every intermediate in VMEM (bench.py measures both engines
head-to-head on the real chip and reports the numbers; there is exactly one
source of perf truth and this docstring is not it):

* **Tiled layout.**  Each (frame, 16-line block row) strip is processed as a
  (bh*bw, C) tile — sublanes enumerate the in-block pixel (y*bw + i), lanes
  enumerate the block column.  In this layout every per-pixel quantity
  vectorizes and the per-block quantities (offset window, sign) broadcast
  along sublanes.  The strip transpose in/out of this layout is done by XLA
  around the kernel (Mosaic cannot relayout lanes in-kernel).

* **Window assembly on the MXU.**  Block offsets quantize to 156 possible
  windows (vfgs_hw.c:99-138), so fetching pattern windows for a whole strip is
  `L[p*bh*bw + y*bw + i, w] @ onehot[w, c]` — an int8 matmul with contraction
  over the 156 windows, producing all 8 pattern candidates for every pixel of
  the strip directly in the tiled layout.  No gather anywhere.

* **VPU for the rest.**  The intensity->(scale, pattern) LUT pair is the same
  run-length compare/add chain as the fast path (vfgs_fw.c:597-639 structure),
  the 8-way pattern mux is a 3-bit binary select tree, vertical overlap
  (vfgs_hw.c:223-229) is arithmetic on the first n_ov*bw sublane rows, and the
  horizontal deblock (vfgs_hw.c:250-258) uses lane rolls to reach the
  x-neighbour across the block boundary.

Identical integers to ops/grain_jnp.py come out; tests/test_pallas_engine.py
checks bit-exactness against the fast engine in interpret mode (engine- and
pipeline-level), and bench.py runs the real Mosaic path on TPU.  Reachable
via ``--engine pallas`` on the CLI / ``GrainPipeline(engine="pallas")``.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import lfsr
from .offsets import block_offsets
from .grain_fast import build_window_table, build_segments

N_WINDOWS = 12 * 13
_PACK_SHIFT = 9  # scale in bits 0..8, pattern index in bits 9..12


# ---------------------------------------------------------------------------
# Host-side table packaging
# ---------------------------------------------------------------------------

def _pack_L(win: np.ndarray) -> np.ndarray:
    """(156, 8, rows, bw) window table -> (8*rows*bw, 156) GEMM operand."""
    return np.ascontiguousarray(
        win.transpose(1, 2, 3, 0).reshape(-1, N_WINDOWS))


def pallas_tables(regs) -> dict:
    """Kernel-ready packaging of the register file (cf. fast_tables)."""
    csubx, csuby = regs.csubx, regs.csuby
    win_l, win_l_up = build_window_table(regs.pattern[0], 16, 16, 2, 4, 4)
    bh_c, bw_c = 16 // csuby, 16 // csubx
    n_ov_c = 1 if csuby == 2 else 2
    win_c, win_c_up = build_window_table(regs.pattern[1], bh_c, bw_c, n_ov_c,
                                         4 // csuby, 4 // csubx)
    seg = [build_segments(regs.slut[c], regs.plut[c]) for c in range(3)]
    S = max(len(s) for s, _ in seg)
    S = -(-S // 8) * 8
    starts = np.zeros((3, S), np.int32)
    deltas = np.zeros((3, S), np.int32)
    for c, (s, d) in enumerate(seg):
        starts[c, :len(s)] = s
        deltas[c, :len(d)] = d
    return dict(
        L_luma=_pack_L(win_l), L_luma_up=_pack_L(win_l_up),
        L_chroma=_pack_L(win_c), L_chroma_up=_pack_L(win_c_up),
        seg_starts=starts, seg_deltas=deltas,
        scale_shift=int(regs.scale_shift),
        y_min=int(regs.y_min), y_max=int(regs.y_max),
        c_min=int(regs.c_min), c_max=int(regs.c_max),
        bh_c=bh_c, bw_c=bw_c, n_ov_c=n_ov_c,
    )


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _mux8_rows(W8, pi):
    """Select among 8 stacked pattern planes with a 3-bit binary tree.

    W8: (8, S, C) int32; pi: (S, C) int32 in 0..7.
    """
    b0 = (pi & 1) == 1
    b1 = (pi & 2) == 2
    b2 = (pi & 4) == 4
    a = jnp.where(b0, W8[1], W8[0])
    b = jnp.where(b0, W8[3], W8[2])
    c = jnp.where(b0, W8[5], W8[4])
    d = jnp.where(b0, W8[7], W8[6])
    e = jnp.where(b1, b, a)
    f = jnp.where(b1, d, c)
    return jnp.where(b2, f, e)


def _plane_kernel(xt_ref, widx_ref, sign_ref, widxu_ref, signu_ref,
                  segs_ref, segd_ref, L_ref, Lup_ref, out_ref, *,
                  bh: int, bw: int, n_ov: int, nseg: int,
                  bs: int, scale_shift: int, imin: int, imax: int,
                  C: int):
    """One (frame, block-row) strip in tiled (bh*bw, C) layout."""
    S = bh * bw
    r = pl.program_id(1)

    x = xt_ref[0, 0].astype(jnp.int32)                     # (S, C)
    inten = (x >> bs) & 0xFF

    # Packed (scale | pattern<<9) via run-length compare/add chain.
    acc = jnp.zeros_like(inten)
    for k in range(nseg):
        acc = acc + jnp.where(inten >= segs_ref[k], segd_ref[k], 0)
    sc = acc & ((1 << _PACK_SHIFT) - 1)
    pi = acc >> _PACK_SHIFT

    # One-hot window selectors (window index per block column).
    widx = widx_ref[0, 0]                                  # (1, C) int32
    widxu = widxu_ref[0, 0]
    wio = jax.lax.broadcasted_iota(jnp.int32, (N_WINDOWS, C), 0)
    A = (wio == widx).astype(jnp.int8)                     # (156, C)
    Au = (wio == widxu).astype(jnp.int8)

    # All 8 pattern candidates for the whole strip, assembled on the MXU.
    Wc = jax.lax.dot_general(L_ref[:], A, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    Wu = jax.lax.dot_general(Lup_ref[:], Au, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)

    sign = sign_ref[0, 0]                                  # (1, C)
    signu = signu_ref[0, 0]
    P = _mux8_rows(Wc.reshape(8, S, C), pi) * sign
    nov = n_ov * bw
    Pu = _mux8_rows(Wu.reshape(8, nov, C), pi[:nov]) * signu

    # Vertical overlap on the first n_ov pixel rows (vfgs_hw.c:223-229),
    # active for every block row but the frame's first.  Coefficient pairs
    # (12,24)/(24,12) for suby=1 rows 0/1, (20,20) for suby=2.
    if n_ov == 1:
        oc1 = oc2 = 20
    else:
        row = jax.lax.broadcasted_iota(jnp.int32, (nov, C), 0)
        first = row < bw
        oc1 = jnp.where(first, 12, 24)
        oc2 = jnp.where(first, 24, 12)
    blend = (P[:nov] * oc1 + Pu * oc2 + 16) >> 5
    top = jnp.where(r > 0, blend, P[:nov])
    P = jnp.concatenate([top, P[nov:]], axis=0)

    # Horizontal deblock at inner block boundaries (vfgs_hw.c:250-258): both
    # new edge values are computed from pre-deblock grain.
    P3 = P.reshape(bh, bw, C)
    i0 = P3[:, 0, :]
    i1 = P3[:, 1, :]
    il1 = P3[:, bw - 2, :]
    il0 = P3[:, bw - 1, :]
    r0m = pltpu.roll(i0, shift=C - 1, axis=1)    # lane c holds r0 of block c+1
    l0p = pltpu.roll(il0, shift=1, axis=1)       # lane c holds l0 of block c-1
    new_l0 = (il1 + 3 * il0 + r0m + 2) >> 2
    new_r0 = (l0p + 3 * i0 + i1 + 2) >> 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (bh, C), 1)
    new_l0 = jnp.where(lane < C - 1, new_l0, il0)
    new_r0 = jnp.where(lane > 0, new_r0, i0)
    sub = jax.lax.broadcasted_iota(jnp.int32, (bh, bw, C), 1)
    P3 = jnp.where(sub == 0, new_r0[:, None, :], P3)
    P3 = jnp.where(sub == bw - 1, new_l0[:, None, :], P3)
    P = P3.reshape(S, C)

    # Scale, round, add, clip (vfgs_hw.c:266-276).
    g = (sc * P + (1 << (scale_shift - 1))) >> scale_shift
    res = jnp.clip(x + g, imin << bs, imax << bs)
    out_ref[0, 0] = res.astype(out_ref.dtype)


def _plane_pallas(xt, widx, sign, widxu, signu, segs, segd, L, Lup, *,
                  bh, bw, n_ov, suby, nseg, bs, scale_shift, imin, imax,
                  interpret=False):
    """pallas_call wrapper: xt (F, R, bh*bw, C) tiled strips -> same shape."""
    F, R, S, C = xt.shape
    kern = functools.partial(
        _plane_kernel, bh=bh, bw=bw, n_ov=n_ov,
        nseg=nseg, bs=bs, scale_shift=scale_shift, imin=imin, imax=imax,
        C=C)

    strip = pl.BlockSpec((1, 1, S, C), lambda f, r: (f, r, 0, 0),
                         memory_space=pltpu.VMEM)
    percol = pl.BlockSpec((1, 1, 1, C), lambda f, r: (f, r, 0, 0),
                          memory_space=pltpu.VMEM)
    const2 = lambda a: pl.BlockSpec(a.shape, lambda f, r: (0, 0),
                                    memory_space=pltpu.VMEM)
    smem1 = lambda a: pl.BlockSpec(a.shape, lambda f, r: (0,),
                                   memory_space=pltpu.SMEM)

    return pl.pallas_call(
        kern,
        grid=(F, R),
        in_specs=[strip, percol, percol, percol, percol,
                  smem1(segs), smem1(segd), const2(L), const2(Lup)],
        out_specs=strip,
        out_shape=jax.ShapeDtypeStruct(xt.shape, xt.dtype),
        interpret=interpret,
    )(xt, widx, sign, widxu, signu, segs, segd, L, Lup)


# ---------------------------------------------------------------------------
# XLA wrapper: layout transposes + state lattice + offsets
# ---------------------------------------------------------------------------

def _tile(p, F, R, bh, C, bw):
    """(F, R*bh, C*bw) -> (F, R, bh*bw, C) tiled strips."""
    return (p.reshape(F, R, bh, C, bw).transpose(0, 1, 2, 4, 3)
            .reshape(F, R, bh * bw, C))


def _untile(t, F, R, bh, C, bw):
    return (t.reshape(F, R, bh, bw, C).transpose(0, 1, 2, 4, 3)
            .reshape(F, R * bh, C * bw))


def _offset_arrays(states, states_up, c, csubx, csuby):
    """Per-block window index + sign (each (F, R, 1, C) int32)."""
    subx = csubx if c else 1
    suby = csuby if c else 1
    ymul, xmul = 4 // suby, 4 // subx
    s, ox, oy = block_offsets(states, c, csubx, csuby)
    su, oxu, oyu = block_offsets(states_up, c, csubx, csuby)
    widx = (oy // ymul) * 13 + ox // xmul
    widxu = (oyu // ymul) * 13 + oxu // xmul
    ex = lambda a: a.astype(jnp.int32)[:, :, None, :]
    return ex(widx), ex(s), ex(widxu), ex(su)


def add_grain_batch_pallas(y, u, v, bases, bases_up, tables: dict, *,
                           height: int, width: int, bs: int, csubx: int,
                           csuby: int, interpret: bool = False):
    """Batched whole-frame grain, Pallas engine.

    y: (F, R*16, C*16) uint8/uint16 padded planes; u, v: chroma planes padded
    to the chroma block grid.  bases/bases_up: (F,) uint32 lattice bases (same
    semantics as ops/grain_fast.add_grain_frame_fast).
    """
    F = y.shape[0]
    R = -(-height // 16)
    C = -(-width // 16)

    lat = jax.vmap(lambda b: lfsr.state_lattice_jax(b, R, C))(bases)
    row0u = jax.vmap(lambda b: lfsr.state_lattice_jax(b, 1, C))(bases_up)
    lat_up = jnp.concatenate([row0u, lat[:, :-1]], axis=1)

    bh_c, bw_c = tables["bh_c"], tables["bw_c"]
    n_ov_c = tables["n_ov_c"]
    segs = jnp.asarray(tables["seg_starts"])
    segd = jnp.asarray(tables["seg_deltas"])
    nseg = int(tables["seg_starts"].shape[1])
    ss = tables["scale_shift"]

    out = []
    for c, plane in ((0, y), (1, u), (2, v)):
        if c == 0:
            bh, bw, n_ov, suby = 16, 16, 2, 1
            L, Lup = tables["L_luma"], tables["L_luma_up"]
            imin, imax = tables["y_min"], tables["y_max"]
        else:
            bh, bw, n_ov, suby = bh_c, bw_c, n_ov_c, csuby
            L, Lup = tables["L_chroma"], tables["L_chroma_up"]
            imin, imax = tables["c_min"], tables["c_max"]
        widx, sign, widxu, signu = _offset_arrays(lat, lat_up, c,
                                                  csubx, csuby)
        xt = _tile(plane, F, R, bh, C, bw)
        yt = _plane_pallas(
            xt, widx, sign, widxu, signu, segs[c], segd[c],
            jnp.asarray(L), jnp.asarray(Lup),
            bh=bh, bw=bw, n_ov=n_ov, suby=suby, nseg=nseg, bs=bs,
            scale_shift=ss, imin=imin, imax=imax, interpret=interpret)
        out.append(_untile(yt, F, R, bh, C, bw))
    return tuple(out)


def make_batched_step(tables: dict, *, height: int, width: int, bs: int,
                      csubx: int, csuby: int, interpret: bool = False,
                      donate: bool = False):
    """jit-compiled batched step closure over static config tables.

    ``donate`` donates the three input planes so XLA writes outputs in
    place (callers must pass fresh arrays per call, as run_file does)."""
    fn = functools.partial(
        add_grain_batch_pallas, tables=tables, height=height, width=width,
        bs=bs, csubx=csubx, csuby=csuby, interpret=interpret)
    return jax.jit(fn, donate_argnums=(0, 1, 2) if donate else ())

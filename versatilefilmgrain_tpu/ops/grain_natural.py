"""Natural-layout Pallas TPU kernel for the grain engine (bit-exact).

The first Pallas engine (ops/grain_pallas.py) computes in a (bh*bw, C) tiled
layout, which needs XLA-side tile/untile transposes around every call; on the
target chip those relayouts materialize at a fraction of copy bandwidth and
dominate the step (~75% of wall time, tools/perf_probe.py).  This kernel never
changes layout: HBM traffic is the frame in natural (row, x) layout and
nothing else, and the "relayout" happens implicitly inside the MXU contraction
that assembles pattern windows:

* **Fused window one-hot.**  Block offsets are quantized (ox = kq*xmul,
  oy = lq*ymul; vfgs_hw.c:99-138 via ops/offsets.py), so the pattern value a
  pixel needs is pattern[p, lq*ymul + y, ox + x%bw] -- fully determined by a
  per-lane index t[x] = lq[x//bw]*KC + ox[x//bw] + x%bw with KC = 16*xmul.
  Contracting pattern2 (M, K) against the one-hot (k == t[x]) on the MXU
  (int8 x int8 -> int32) yields all pattern candidates for a whole strip
  directly in natural lane order: the matmul IS the relayout.

* **Byte-packed one-hot build.**  The VPU has no sub-32-bit compares on this
  chip (Mosaic: "Target does not support this comparison" for packed i8/i16
  cmps), so a naive (K, W) int32 iota-compare is the kernel's single most
  expensive VPU pass.  Instead the one-hot is built as (K/4, W) int32 words
  -- where(k4 == t>>2, 1 << (8*(t&3)), 0), one compare + one select over a
  QUARTER of the elements -- and bit-cast to the (K, W) int8 MXU operand.
  ``pltpu.bitcast`` maps word row k4 byte j to int8 row 4*k4 + j (verified on
  hardware and in interpret mode, tools/probe_r4.py), which is exactly
  k == 4*(t>>2) + (t&3) == t.  Measured: ~2.2x faster one-hot build.

* **One kernel for all three planes.**  Luma and chroma share the grid --
  one block row of 16 luma lines is one block row of 16/csuby chroma lines
  for every subsampling -- so a single pallas_call processes (Y, U, V)
  strips per grid step.  Chroma's work is almost entirely VPU (its MXU
  contraction is tiny), so fusing lets Mosaic hide it under the luma dot:
  measured 4.04 ms -> 3.29 ms per 8-frame 4K step vs three calls.

* **Packed per-lane metadata.**  The XLA-side state lattice collapses to
  ONE int32 word per lane -- t | (sign<0)<<10 -- halving the per-lane HBM
  traffic vs separate t/sign arrays.  The block->lane broadcast-reshape
  this prep pays for is a tiled relayout; the measured-and-rejected
  alternatives (int16 words, XLA matmul expansion, three in-kernel
  expansion schemes, the chunked butterfly) are in _lane_words_xla's
  docstring and docs/DESIGN.md 3.2.

* **Overlap rows ride a VMEM carry.**  Vertical overlap needs the previous
  block row's window rows bh..bh+n_ov-1 at the previous row's offsets
  (vfgs_hw.c:206,223-229).  Those rows extend the same matmul (M = n_pat
  x (bh + n_ov) rows) at strip r-1 and persist in VMEM scratch across grid
  steps -- the TPU grid is sequential with the block-row dimension innermost,
  so step (f, r) consumes the carry written by (f, r-1).  Row 0 of a frame
  never blends (mirrors ops/grain_fast.py rmask), so stale carry at frame
  boundaries is masked out and no "up" lattice is needed at all.

* **Natural-lane epilogue.**  The intensity->(scale, pattern) LUT pair is the
  run-length compare/add chain (vfgs_fw.c:597-639 structure) with the TRUE
  per-component segment count (chroma LUTs are shorter than luma's; the
  shared padded table is only a storage format), the pattern mux is a binary
  select tree on static row slices, and the horizontal deblock
  (vfgs_hw.c:250-258) is a masked 3-tap over lane rolls whose
  block-boundary mask is hoisted to a constant input (it only depends on
  the lane index).

* **Direct piecewise-linear path for dense LUTs.**  AFGS1's scale LUT
  (vfgs_fw.c:648-660 via models/fw.py make_lut_piecewise_linear) changes
  value at ~every intensity, so its run-length decomposition degenerates to
  >100 segments and the compare/add chain becomes the step's dominant VPU
  cost (measured: 1,102 fps vs 2,328 for the 8-pattern SEI default).  Such
  LUTs are exactly piecewise-linear in ~10-20 segments, so the kernel
  evaluates the ORIGINAL integer lerp per pixel instead of the 256-entry
  table: a DP fit (``fit_pwl``) recovers minimal exact segments host-side,
  two shared-predicate select chains recover the active segment's packed
  constants, and the C truncating division becomes a per-segment magic
  multiply whose exactness the fit verifies entry-by-entry before use
  (measured: 1,448 -> 2,737 fps on the AFGS1 conformance config).  Dense
  LUTs with no compact PWL form (random fuzz configs) fall back to the
  **LUT-dot path**: the 256-entry LUT as one byte-packed one-hot MXU
  contraction per strip row -- one-hot(intensity) (256, W) int8 against
  the packed LUT's (lo, hi) byte rows (2, 256) int8.

* **Zero-scale plane skip.**  A component whose scale LUT is identically
  zero gets grain exactly 0 (the C rounding bias vanishes under the
  scale shift), so its whole plane is clip(x): the kernel skips that
  plane's one-hot/dot/LUT/epilogue statically and the prep skips its
  lane words.  This is the common luma-only-grain case
  (comp_model_present = [1,0,0] leaves both chroma sLUTs zeroed in the
  register file); the reference still runs its full per-pixel loop and
  clips (vfgs_hw.c:266-276 with sLUT == 0).  Measured: SEI-AR 4K
  5,465 -> ~6,900 fps.

Identical integers to ops/grain_jnp.py come out; tests/test_natural_engine.py
checks bit-exactness against the fast engine in interpret mode, and bench.py
measures the real Mosaic path on TPU head-to-head with the other engines.
Reachable via ``--engine natural`` on the CLI / ``GrainPipeline``.
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
from .grain_fast import build_segments

_PACK_SHIFT = 9  # scale in bits 0..8, pattern index in bits 9..12

# word_mode "chunk": block rows of lane words butterfly-expanded into VMEM
# scratch per this many grid steps (one full-sublane-occupancy pass).
_WCHUNK = 8

# Above this run-length segment count, a component's (scale, pattern) LUT is
# evaluated as a per-row one-hot MXU contraction instead of the compare/add
# chain (chain cost is ~2*nseg VPU passes vs a fixed ~128 word-ops + one tiny
# dot for the LUT-dot path; crossover measured on v5e, tools/probe_budget.py).
LUT_DOT_THRESHOLD = 40

# A dense LUT that is exactly piecewise-linear in at most this many segments
# (AFGS1's scale LUTs are built that way, vfgs_fw.c:648-660) is evaluated
# with the direct PWL formula instead of the LUT-dot: two packed constant
# chains + a magic-multiplier truncating division, ~5 VPU ops per segment
# vs the LUT-dot's 32 per-row M=2 mini-dots per grid step.
PWL_MAX_SEGS = 40
_PWL_SHIFTS = range(16, 23)  # magic-division shifts tried per segment;
                             # exactness is host-verified, an*M stays < 2^31


def _pwl_try_span(slut, plut_pi, lo: int, end: int):
    """Magic constants for one candidate PWL segment [lo, end) of the packed
    LUT, or None if the segment cannot reproduce it exactly.

    The kernel evaluates, per pixel with intensity x in [lo, end):
        i  = x - lo
        n  = dy*i + h                       (h = dx//2, C rounding bias)
        q  = sign(n) * ((|n| * M) >> sh)    (magic trunc-division by dx)
        sc = (y0 + q) & 0xFF
    which mirrors the reference's integer lerp (vfgs_fw.c:648-660) with the
    division replaced by a per-segment multiplier/shift.  Exactness is
    VERIFIED here over the segment's whole domain (sh is raised until the
    magic rounds identically to the true division), so any rounding corner
    case simply rejects the span instead of shipping a wrong value."""
    pi = int(plut_pi[lo])
    if np.any(plut_pi[lo:end] != pi):
        return None
    y0 = int(slut[lo])
    span = end - lo
    # Denominator: the fitted span for interior segments; for a segment
    # reaching 255 use its natural width (>=1 so the magic stays finite).
    dx = max(1, span - 1) if end == 256 else span
    dy0 = int(slut[end] if end < 256 else slut[255]) - y0
    h = dx // 2
    if not (0 <= pi <= 7 and 0 <= h <= 127):
        return None   # out-of-pack-range constants: let the caller fall back
    i = np.arange(span, dtype=np.int64)
    want = slut[lo:end].astype(np.int64)
    # Interior breakpoints store the next segment's exact start value, so
    # dy0 is the true slope numerator there; but the TOP endpoint stores
    # y0 + trunc(dout*din + din//2, din), which for decreasing output is
    # y1 + 1 (vfgs_fw.c:648-660 with num < 0), so the last segment's
    # original dout can differ by one from the value difference.
    for dy in ((dy0, dy0 - 1, dy0 + 1) if end == 256 else (dy0,)):
        if not -255 <= dy <= 255:
            continue
        n = dy * i + h
        an = np.abs(n)
        qtrue = np.where(n < 0, -(an // dx), an // dx)
        if not np.array_equal((y0 + qtrue) & 0xFF, want):
            continue
        for sh in _PWL_SHIFTS:
            M = -(-(1 << sh) // dx)          # ceil(2^sh / dx)
            if M >= (1 << 21) or np.any(an * M >= (1 << 31)):
                break                        # larger sh only overflows more
            if np.array_equal((an * M) >> sh, an // dx):
                return (lo | (h << 8) | (y0 << 15) | (pi << 23)
                        | (sh << 26)), (dy + 256) | (M << 10)
    return None


_pwl_fit_cache: dict = {}


def fit_pwl(slut, plut, max_segs: int = PWL_MAX_SEGS):
    """Minimal exact piecewise-linear fit of a component's packed LUT.

    Returns (packA, packB) tuples of per-segment packed constants (segment s
    covers intensities [lo_s, lo_{s+1})), or None if more than ``max_segs``
    segments would be needed.  Fields: packA = lo | h<<8 | y0<<15 | pi<<23 |
    sh<<26, packB = (dy+256) | M<<10.  The kernel recovers the active
    segment's constants with one compare/select chain pair sharing each
    predicate (lo is increasing, so the last true ``inten >= lo_s`` select
    wins).  Segmentation is a shortest-path DP over valid spans (greedy
    longest-span overshoots breakpoints and fragments the tail: 22 vs 15
    segments on the AFGS1 conformance luma LUT), with each span's kernel
    formula verified entry-exact by _pwl_try_span before use."""
    slut = np.asarray(slut, np.int64) & 0xFF
    plut_pi = (np.asarray(plut, np.int64) & 0xFF) >> 4
    key = (slut.tobytes(), plut_pi.tobytes(), max_segs)
    if key in _pwl_fit_cache:   # the DP costs ~0.5 s/LUT; configs repeat
        return _pwl_fit_cache[key]
    INF = 1 << 20
    best = [INF] * 257
    best[256] = 0
    choice = [None] * 256
    for lo in range(255, -1, -1):
        for end in range(256, lo, -1):
            if best[end] + 1 >= best[lo]:
                continue   # cannot improve on the current choice
            seg = _pwl_try_span(slut, plut_pi, lo, end)
            if seg is not None:
                best[lo] = best[end] + 1
                choice[lo] = (end, seg)
    if best[0] > max_segs:
        _pwl_fit_cache[key] = None
        return None
    segs, lo = [], 0
    while lo < 256:
        end, seg = choice[lo]
        segs.append(seg)
        lo = end
    out = tuple(zip(*segs))  # (packA tuple, packB tuple)
    _pwl_fit_cache[key] = out
    return out


# ---------------------------------------------------------------------------
# Host-side table packaging
# ---------------------------------------------------------------------------

def _pack_pattern2(pattern_class: np.ndarray, bh: int, bw: int, n_ov: int,
                   ymul: int, xmul: int, n_pat: int) -> np.ndarray:
    """(n_pat*(bh+n_ov), 12*KC) GEMM operand, KC = 16*xmul.

    Row p*(bh+n_ov)+y, column lq*KC+kc holds pattern[p, lq*ymul + y, kc]:
    contracting against the (k == t[x]) one-hot with
    t[x] = (oy//ymul)*KC + ox + x%bw reproduces the window fetch
    pattern[p, oy + y, ox + x%bw] exactly (kc = ox + x%bw <= 12*xmul + bw - 1
    < KC, rows lq*ymul + y <= 11*ymul + bh + n_ov - 1 < 64).

    ``n_pat`` is the number of pattern planes the pLUT can actually select
    (max pLUT index + 1): the MXU contraction is linear in M = n_pat*rows,
    so configs with few patterns (e.g. the default chroma bank: 1) skip the
    unreachable planes entirely.
    """
    KC = 16 * xmul
    rows = bh + n_ov
    out = np.zeros((n_pat * rows, 12 * KC), np.int8)
    for p in range(n_pat):
        for y in range(rows):
            for lq in range(12):
                out[p * rows + y, lq * KC:(lq + 1) * KC] = \
                    pattern_class[p, lq * ymul + y, :KC]
    return out


def natural_tables(regs, *, lut_dot_threshold: int = LUT_DOT_THRESHOLD,
                   pwl_max_segs: int = PWL_MAX_SEGS,
                   force_lut_path=None) -> dict:
    """Kernel-ready packaging of the register file (cf. fast_tables).

    Per-component (scale, pattern) LUT evaluation path ("lut_mode"):

    * "chain"  -- run-length compare/add chain; picked when the LUT has at
      most ``lut_dot_threshold`` run-length segments.
    * "pwl"    -- direct piecewise-linear formula (two packed constant
      chains + magic trunc-division); picked for denser LUTs that
      ``fit_pwl`` reproduces exactly in <= ``pwl_max_segs`` segments
      (AFGS1's LUTs by construction, vfgs_fw.c:648-660).
    * "lutdot" -- per-row one-hot MXU contraction; the fallback for dense
      LUTs with no compact exact PWL form.

    ``lut_dot_threshold=0`` forces the LUT-dot path everywhere (tests use
    it to cross-validate the paths); ``force_lut_path`` ("chain"/"pwl"/
    "lutdot", or a 3-tuple of those) overrides the choice per component.
    """
    csubx, csuby = regs.csubx, regs.csuby
    n_pat_l = (int(np.max(np.asarray(regs.plut[0]))) >> 4) + 1
    n_pat_c = (max(int(np.max(np.asarray(regs.plut[1]))),
                   int(np.max(np.asarray(regs.plut[2])))) >> 4) + 1
    pat2_l = _pack_pattern2(regs.pattern[0], 16, 16, 2, 4, 4, n_pat_l)
    bh_c, bw_c = 16 // csuby, 16 // csubx
    n_ov_c = 1 if csuby == 2 else 2
    pat2_c = _pack_pattern2(regs.pattern[1], bh_c, bw_c, n_ov_c,
                            4 // csuby, 4 // csubx, n_pat_c)
    seg = [build_segments(regs.slut[c], regs.plut[c]) for c in range(3)]
    nseg_per = tuple(len(s) for s, _ in seg)
    if force_lut_path is not None:
        modes = ((force_lut_path,) * 3 if isinstance(force_lut_path, str)
                 else tuple(force_lut_path))
        pwl = tuple(fit_pwl(regs.slut[c], regs.plut[c], max_segs=256)
                    if modes[c] == "pwl" else None for c in range(3))
        for c in range(3):
            if modes[c] == "pwl" and pwl[c] is None:
                raise ValueError(
                    f"force_lut_path='pwl': component {c}'s LUT has no "
                    f"exact PWL form (a pattern index > 7 exceeds the "
                    f"pack's 3-bit field, or no segment reproduces the "
                    f"values); use 'chain' or 'lutdot' for this config")
    else:
        modes, pwl = [], []
        for c, n in enumerate(nseg_per):
            fit = None
            if n > lut_dot_threshold:
                fit = (fit_pwl(regs.slut[c], regs.plut[c],
                               max_segs=pwl_max_segs)
                       if lut_dot_threshold > 0 else None)
            modes.append("chain" if n <= lut_dot_threshold
                         else ("pwl" if fit else "lutdot"))
            pwl.append(fit)
        modes, pwl = tuple(modes), tuple(pwl)
    S = max((n for n, m in zip(nseg_per, modes) if m == "chain"), default=1)
    S = -(-S // 8) * 8
    starts = np.zeros((3, S), np.int32)
    deltas = np.zeros((3, S), np.int32)
    for c, (s, d) in enumerate(seg):
        if modes[c] != "chain":
            continue   # this component never runs the chain
        starts[c, :len(s)] = s
        deltas[c, :len(d)] = d
    # Packed (scale | pattern<<_PACK_SHIFT) LUT as (lo, hi) int8 byte rows
    # per component: the LUT-dot path contracts one-hot(intensity) against
    # rows (2c, 2c+1); exactly the values the chain would accumulate.
    lut_bytes = np.zeros((6, 256), np.int8)
    for c in range(3):
        packed = (np.asarray(regs.slut[c], np.int32)
                  | ((np.asarray(regs.plut[c], np.int32) >> 4) << _PACK_SHIFT))
        lut_bytes[2 * c] = (packed & 0xFF).astype(np.uint8).view(np.int8)
        lut_bytes[2 * c + 1] = ((packed >> 8) & 0xFF).astype(
            np.uint8).view(np.int8)
    # A component whose scale LUT is identically zero contributes grain
    # g = round(0 * P) = 0 exactly (scale_shift >= 1 always holds: the
    # kernel's rounding bias is 1 << (scale_shift - 1)), so its whole plane
    # reduces to clip(x) -- the reference still runs the full per-pixel
    # loop and clips (vfgs_hw.c:266-276 with sLUT == 0); we skip the
    # one-hot build, window dot, and epilogue statically.  This is the
    # common "comp_model_present = 0" case: luma-only SEI grain leaves
    # both chroma sLUTs zero (models/fw.py SEI init writes only present
    # components into the persistent register file).
    zero_scale = tuple(bool(np.all(np.asarray(regs.slut[c]) == 0))
                       for c in range(3))
    return dict(
        pat2_luma=pat2_l, pat2_chroma=pat2_c,
        seg_starts=starts, seg_deltas=deltas, nseg_per=nseg_per,
        lut_mode=modes, pwl=pwl, zero_scale=zero_scale,
        lutdot=tuple(m == "lutdot" for m in modes), lut_bytes=lut_bytes,
        scale_shift=int(regs.scale_shift),
        y_min=int(regs.y_min), y_max=int(regs.y_max),
        c_min=int(regs.c_min), c_max=int(regs.c_max),
        bh_c=bh_c, bw_c=bw_c, n_ov_c=n_ov_c,
    )


def _deblock_mask(bh: int, bw: int, Wp: int) -> np.ndarray:
    """(bh, Wp) int32 deblock-position mask (vfgs_hw.c:250-258): both
    samples adjacent to an interior block boundary, excluding the frame
    edges.  Depends only on the lane index, so it is a constant kernel
    input instead of a per-strip iota recompute."""
    x = np.arange(Wp)
    i = x & (bw - 1)
    m = ((i == 0) & (x > 0)) | ((i == bw - 1) & (x < Wp - 1))
    return np.broadcast_to(m, (bh, Wp)).astype(np.int32)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _mux(planes, pi):
    """Select among len(planes) same-shape planes with a binary select tree.

    ``pi`` is bounded by len(planes)-1 (it comes from the same pLUT the
    plane list was sized from), so odd levels pad with their last entry.
    """
    cur = list(planes)
    bit = 1
    while len(cur) > 1:
        if len(cur) % 2:
            cur.append(cur[-1])
        sel = (pi & bit) == bit
        cur = [jnp.where(sel, cur[i + 1], cur[i])
               for i in range(0, len(cur), 2)]
        bit <<= 1
    return cur[0]


def _expand_lane_words(wrows, bw: int, Wp: int):
    """(n, C) block words -> (n, Wp) lane words, in-kernel.

    Same pull-based butterfly as _expand_words_pallas (see its docstring
    for the exactness argument), run on the strip's own rows so the
    lane-word stream can stay at block granularity (C = Wp/bw words) --
    1/bw of the HBM traffic of streaming expanded words.  Cost is ~12
    roll+select lane passes over the (n, Wp) tile, so callers should
    batch n >= 8 rows per expansion to run at full sublane occupancy
    (the n = 1 per-strip form was measured 2.5 ms/step slower at 4K)."""
    n = wrows.shape[0]
    C = Wp // bw
    lb = bw.bit_length() - 1
    e = jnp.concatenate(
        [wrows, jnp.zeros((n, Wp - C), jnp.int32)], axis=1) \
        if Wp > C else wrows
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, Wp), 1)
    disp = lane - (lane >> lb)
    dmax = (Wp - 1) - ((Wp - 1) >> lb)
    for k in reversed(range(dmax.bit_length())):
        e = jnp.where(((disp >> k) & 1) != 0,
                      pltpu.roll(e, 1 << k, axis=1), e)
    return e + (lane & (bw - 1))


def _build_onehot(w, K: int, Wp: int):
    """(K, Wp) int8 one-hot of t from the packed lane word ``w`` (1, Wp),
    plus the decoded per-lane sign.

    Built as (K/4, Wp) int32 words -- one compare + one select over a quarter
    of the elements -- and bit-cast to int8 rows (word k4 byte j -> row
    4*k4+j, i.e. row t)."""
    qv = (w >> 2) & 0xFF
    pow_ = jnp.int32(1) << ((w & 3) << 3)       # 1 << (8 * (t & 3))
    sg = 1 - ((w >> 9) & 2)
    k4io = jax.lax.broadcasted_iota(jnp.int32, (K // 4, Wp), 0)
    onehot = pltpu.bitcast(jnp.where(k4io == qv, pow_, 0), jnp.int8)
    return onehot, sg


def _eval_lut(inten, segs_ref, segd_ref, lut_ref, *, bh, Wp, nseg,
              lut_path, pwl):
    """Packed (scale | pattern<<_PACK_SHIFT) per pixel from the intensity.

    The single implementation both the production kernel and the budget
    probe (tools/probe_budget.py) trace, so ablation measurements cannot
    drift from shipping behaviour.  Three paths (natural_tables
    docstring): run-length compare/add chain, direct piecewise-linear
    formula, or per-row one-hot MXU contraction."""
    if lut_path == "lutdot":
        # One-hot LUT contraction: per row, byte-packed one-hot of the
        # intensity against the LUT's byte rows.
        q4io = jax.lax.broadcasted_iota(jnp.int32, (64, Wp), 0)
        lrows = []
        for yy in range(bh):
            iv = inten[yy:yy + 1]
            w64 = jnp.where(q4io == (iv >> 2),
                            jnp.int32(1) << ((iv & 3) << 3), 0)
            oh = pltpu.bitcast(w64, jnp.int8)                  # (256, Wp)
            lh = jax.lax.dot_general(lut_ref[:], oh,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)
            lrows.append((lh[0:1] & 0xFF) | ((lh[1:2] & 0xFF) << 8))
        return jnp.concatenate(lrows, axis=0)
    if lut_path == "pwl":
        # Direct piecewise-linear formula (fit_pwl docstring): recover
        # the active segment's packed constants with two select chains
        # sharing one predicate, then evaluate the reference's integer
        # lerp (vfgs_fw.c:648-660) with the truncating division done as
        # a per-segment magic multiply whose exactness fit_pwl verified
        # host-side.
        pA, pB = pwl
        accA = jnp.full_like(inten, pA[0])
        accB = jnp.full_like(inten, pB[0])
        for s in range(1, len(pA)):
            m = inten >= (pA[s] & 0xFF)
            if pA[s] != pA[s - 1]:
                accA = jnp.where(m, pA[s], accA)
            if pB[s] != pB[s - 1]:
                accB = jnp.where(m, pB[s], accB)
        lo = accA & 0xFF
        h = (accA >> 8) & 0x7F
        y0 = (accA >> 15) & 0xFF
        piw = (accA >> 23) & 7
        sh = accA >> 26
        dy = (accB & 0x3FF) - 256
        mM = accB >> 10
        n = dy * (inten - lo) + h
        qa = (jnp.abs(n) * mM) >> sh
        sc_ = (y0 + jnp.where(n < 0, -qa, qa)) & 0xFF
        return sc_ | (piw << _PACK_SHIFT)
    # Run-length compare/add chain.
    acc = jnp.zeros_like(inten)
    for k in range(nseg):
        acc = acc + jnp.where(inten >= segs_ref[k], segd_ref[k], 0)
    return acc


def _strip_body(r0, x_ref, w, segs_ref, segd_ref, pat_ref, mask_ref,
                lut_ref, out_ref, carry_ref, *, bh, bw, n_ov, n_pat, nseg,
                K, bs, scale_shift, imin, imax, Wp, lut_path="chain",
                pwl=None, expand_words=False, boot=None, zero_scale=False):
    """Grain one (bh, Wp) strip of one plane; carry persists across the
    sequential grid.  ``w``: the plane's (1, Wp) packed lane word (loaded
    from the lane-word input stream).  ``boot`` (shard_map path) is
    (wup, patup_ref, blend0_ref): the shard's first block row seeds the
    carry from the up-state's lane word instead of a previous grid step.
    ``lut_path`` selects how the packed (scale, pattern) LUT is evaluated:
    the run-length chain ("chain"), the direct piecewise-linear formula
    ("pwl", constants baked from ``pwl``), or the one-hot MXU contraction
    ("lutdot", ``lut_ref``: the LUT's (lo, hi) int8 byte rows)."""
    if zero_scale:
        # Identically-zero scale LUT: grain is exactly 0, only the final
        # clip applies (natural_tables docstring).  The strip's other
        # inputs are wired but never read; Mosaic DCEs the dead loads.
        x = x_ref[0].astype(jnp.int32)
        out_ref[0] = jnp.clip(x, imin << bs, imax << bs).astype(
            out_ref.dtype)
        return
    rows = bh + n_ov
    if expand_words:   # lane-word stream is at block granularity
        w = _expand_lane_words(w, bw, Wp)
    if boot is not None:
        wup, patup_ref, blend0_ref = boot

        @pl.when(r0 == 0)
        def _seed():
            # Zero halo: the up row's candidates derive from states, not
            # neighbouring pixels (cf. ops/grain_fast.py plane_grain_fast).
            ohu, sgu = _build_onehot(wup, K, Wp)
            cu = jax.lax.dot_general(patup_ref[:], ohu,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)
            carry_ref[:] = cu * sgu

    x = x_ref[0].astype(jnp.int32)                             # (bh, Wp)
    inten = (x >> bs) & 0xFF

    # All n_pat pattern candidates (plus the next strip's overlap rows),
    # assembled on the MXU directly in natural lane order: the contraction
    # over the (k == t) one-hot IS the window fetch + relayout.  Issued
    # FIRST so the LUT evaluation below runs on the VPU while the MXU
    # crunches (measured -0.12 ms/step, tools/probe_budget.py).
    onehot, sg = _build_onehot(w, K, Wp)
    cand = jax.lax.dot_general(pat_ref[:], onehot,
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)

    acc = _eval_lut(inten, segs_ref, segd_ref, lut_ref, bh=bh, Wp=Wp,
                    nseg=nseg, lut_path=lut_path, pwl=pwl)
    sc = acc & ((1 << _PACK_SHIFT) - 1)
    pi = acc >> _PACK_SHIFT

    # Pattern mux on static row slices (lane layout untouched).  The
    # per-lane sign is uniform across candidate rows, so it commutes with
    # the mux: applying it post-mux (bh + n_pat*n_ov rows) instead of to
    # all M rows saves most of the multiplies.
    P = _mux([cand[p * rows:p * rows + bh] for p in range(n_pat)], pi) * sg
    up_prev = carry_ref[:]                                     # (n_pat*n_ov,)
    Pu = _mux([up_prev[p * n_ov:(p + 1) * n_ov] for p in range(n_pat)],
              pi[:n_ov])
    carry_ref[:] = jnp.concatenate(
        [cand[p * rows + bh:(p + 1) * rows] for p in range(n_pat)],
        axis=0) * sg if n_pat > 1 else cand[bh:rows] * sg

    # Vertical overlap on the first n_ov rows (vfgs_hw.c:223-229), active
    # for every block row but the frame's first.  Coefficient pairs
    # (12,24)/(24,12) for suby=1 rows 0/1, (20,20) for suby=2.
    if n_ov == 1:
        oc1 = oc2 = 20
    else:
        row = jax.lax.broadcasted_iota(jnp.int32, (n_ov, Wp), 0)
        first = row < 1
        oc1 = jnp.where(first, 12, 24)
        oc2 = jnp.where(first, 24, 12)
    blend = (P[:n_ov] * oc1 + Pu * oc2 + 16) >> 5
    do_blend = r0 > 0
    if boot is not None:
        do_blend = do_blend | (blend0_ref[0] != 0)
    top = jnp.where(do_blend, blend, P[:n_ov])
    P = jnp.concatenate([top, P[n_ov:]], axis=0)

    # Horizontal deblock at inner block boundaries (vfgs_hw.c:250-258):
    # a masked 3-tap over lane rolls; both edge values use pre-deblock
    # grain.
    left = pltpu.roll(P, shift=1, axis=1)                      # P[x-1]
    right = pltpu.roll(P, shift=Wp - 1, axis=1)                # P[x+1]
    sm = (left + 3 * P + right + 2) >> 2
    P = jnp.where(mask_ref[:] != 0, sm, P)

    # Scale, round, add, clip (vfgs_hw.c:266-276).
    g = (sc * P + (1 << (scale_shift - 1))) >> scale_shift
    res = jnp.clip(x + g, imin << bs, imax << bs)
    out_ref[0] = res.astype(out_ref.dtype)


def _fused_pallas(planes, words, segs3, segd3, pat_l, pat_c, *, meta,
                  interpret=False, boot=None):
    """One pallas_call graining all three planes per (frame, block row).

    ``planes``: (y, u, v) natural (F, R*bh_c, Wp_c) arrays; ``words``: the
    three packed lane-word arrays (F, R, 1, Wp_c); ``meta``: static
    per-call config (bh/bw/n_ov per plane class, nseg per component, clip
    ranges, scale shift, bs); ``boot`` (shard_map path):
    (words_up, blend0)."""
    y, u, v = planes
    F, Hp, Wp = y.shape
    R = Hp // 16
    Wc = u.shape[2]
    bh_c, bw_c, n_ov_c = meta["bh_c"], meta["bw_c"], meta["n_ov_c"]
    K_l, K_c = int(pat_l.shape[1]), int(pat_c.shape[1])
    n_pat_l = int(pat_l.shape[0]) // 18
    n_pat_c = int(pat_c.shape[0]) // (bh_c + n_ov_c)
    mask_l = jnp.asarray(_deblock_mask(16, 16, Wp))
    mask_c = jnp.asarray(_deblock_mask(bh_c, bw_c, Wc))

    lut_mode = meta.get("lut_mode", ("chain",) * 3)
    pwl = meta.get("pwl", (None,) * 3)
    zs = meta.get("zero_scale", (False,) * 3)
    expand = meta.get("word_mode", "stream") == "kernel"
    pcommon = dict(bs=meta["bs"], scale_shift=meta["scale_shift"],
                   expand_words=expand)
    pl_luma = dict(bh=16, bw=16, n_ov=2, n_pat=n_pat_l, K=K_l, Wp=Wp,
                   nseg=meta["nseg_per"][0], imin=meta["y_min"],
                   imax=meta["y_max"], lut_path=lut_mode[0], pwl=pwl[0],
                   zero_scale=zs[0], **pcommon)
    pl_chroma = [dict(bh=bh_c, bw=bw_c, n_ov=n_ov_c, n_pat=n_pat_c, K=K_c,
                      Wp=Wc, nseg=meta["nseg_per"][c], imin=meta["c_min"],
                      imax=meta["c_max"], lut_path=lut_mode[c], pwl=pwl[c],
                      zero_scale=zs[c], **pcommon)
                 for c in (1, 2)]
    lut6 = jnp.asarray(meta["lut_bytes"])
    wmode = meta.get("word_mode", "stream")

    def _wrow(ref):
        """Load a lane-word stream block as the (1, W) strip row."""
        return ref[0, 0, 0:1]

    def _wload(wref, ws_ref, bw, Wl, r0):
        """The strip's (1, Wl) lane words.  word_mode "chunk": the stream
        is block-granular (C words/row); every _WCHUNK-th step butterfly-
        expands the next _WCHUNK rows into VMEM scratch in one full-
        sublane-occupancy pass, and each step reads its row back -- 1/bw
        of the HBM traffic of "stream" without the 1/8-occupancy penalty
        of per-strip expansion ("kernel" mode)."""
        if wmode != "chunk":
            return _wrow(wref)

        @pl.when(r0 % _WCHUNK == 0)
        def _expand():
            ws_ref[...] = _expand_lane_words(wref[0], bw, Wl)

        return ws_ref[pl.ds(r0 % _WCHUNK, 1)]

    def kernel(*refs):
        (y_ref, u_ref, v_ref, wy_ref, wu_ref, wv_ref,
         sy_ref, dy_ref, su_ref, du_ref, sv_ref, dv_ref,
         patl_ref, patc_ref, ml_ref, mc_ref, lut6_ref) = refs[:17]
        k = 17
        if boot is not None:
            (wyu_ref, wuu_ref, wvu_ref, patlu_ref, patcu_ref,
             b0_ref) = refs[k:k + 6]
            k += 6
        oy_ref, ou_ref, ov_ref, cy_ref, cu_ref, cv_ref = refs[k:k + 6]
        wscr = refs[k + 6:k + 9] if wmode == "chunk" else (None,) * 3
        r0 = pl.program_id(1)
        boots = [None] * 3
        if boot is not None:
            boots = [(_wrow(wr), patlu_ref if c == 0 else patcu_ref, b0_ref)
                     for c, wr in enumerate((wyu_ref, wuu_ref, wvu_ref))]
        wgeom = ((16, Wp), (bw_c, Wc), (bw_c, Wc))
        wvals = [None if zs[c] else
                 _wload(wr, wscr[c], wgeom[c][0], wgeom[c][1], r0)
                 for c, wr in enumerate((wy_ref, wu_ref, wv_ref))]
        _strip_body(r0, y_ref, wvals[0], sy_ref, dy_ref, patl_ref,
                    ml_ref, lut6_ref[0:2], oy_ref, cy_ref, boot=boots[0],
                    **pl_luma)
        _strip_body(r0, u_ref, wvals[1], su_ref, du_ref, patc_ref,
                    mc_ref, lut6_ref[2:4], ou_ref, cu_ref, boot=boots[1],
                    **pl_chroma[0])
        _strip_body(r0, v_ref, wvals[2], sv_ref, dv_ref, patc_ref,
                    mc_ref, lut6_ref[4:6], ov_ref, cv_ref, boot=boots[2],
                    **pl_chroma[1])

    ystrip = pl.BlockSpec((1, 16, Wp), lambda f, r: (f, r, 0),
                          memory_space=pltpu.VMEM)
    cstrip = pl.BlockSpec((1, bh_c, Wc), lambda f, r: (f, r, 0),
                          memory_space=pltpu.VMEM)
    # Lane-word streams: full lane width (word_mode "stream"), or block
    # granularity (Wp/bw words per row) expanded in-kernel per strip
    # ("kernel") or per _WCHUNK rows into scratch ("chunk").
    if wmode == "chunk":
        Cl, Cc = int(words[0].shape[2]), int(words[1].shape[2])
        ylane = pl.BlockSpec((1, _WCHUNK, Cl),
                             lambda f, r: (f, r // _WCHUNK, 0),
                             memory_space=pltpu.VMEM)
        clane = pl.BlockSpec((1, _WCHUNK, Cc),
                             lambda f, r: (f, r // _WCHUNK, 0),
                             memory_space=pltpu.VMEM)
    else:
        Lw_y, Lw_u, Lw_v = (int(w.shape[3]) for w in words)
        ylane = pl.BlockSpec((1, 1, 1, Lw_y), lambda f, r: (f, r, 0, 0),
                             memory_space=pltpu.VMEM)
        clane = pl.BlockSpec((1, 1, 1, Lw_u), lambda f, r: (f, r, 0, 0),
                             memory_space=pltpu.VMEM)
    const2 = lambda a: pl.BlockSpec(a.shape, lambda f, r: (0, 0),
                                    memory_space=pltpu.VMEM)
    smem1 = lambda a: pl.BlockSpec(a.shape, lambda f, r: (0,),
                                   memory_space=pltpu.SMEM)

    if wmode == "chunk":
        wy, wu, wv = words
    else:
        wy, wu, wv = (w.reshape(w.shape[0], R, 1, w.shape[3])
                      for w in words)
    in_specs = [ystrip, cstrip, cstrip, ylane, clane, clane,
                smem1(segs3[0]), smem1(segd3[0]), smem1(segs3[1]),
                smem1(segd3[1]), smem1(segs3[2]), smem1(segd3[2]),
                const2(pat_l), const2(pat_c), const2(mask_l), const2(mask_c),
                const2(lut6)]
    args = [y, u, v, wy, wu, wv, segs3[0], segd3[0], segs3[1], segd3[1],
            segs3[2], segd3[2], pat_l, pat_c, mask_l, mask_c, lut6]
    if boot is not None:
        words_up, blend0 = boot
        patu_l = _up_rows(pat_l, 16, 2, n_pat_l)
        patu_c = _up_rows(pat_c, bh_c, n_ov_c, n_pat_c)
        yframe = pl.BlockSpec((1, 1, 1, Wp), lambda f, r: (f, 0, 0, 0),
                              memory_space=pltpu.VMEM)
        cframe = pl.BlockSpec((1, 1, 1, Wc), lambda f, r: (f, 0, 0, 0),
                              memory_space=pltpu.VMEM)
        in_specs += [yframe, cframe, cframe, const2(patu_l), const2(patu_c),
                     smem1(blend0)]
        args += [words_up[0].reshape(F, 1, 1, Wp),
                 words_up[1].reshape(F, 1, 1, Wc),
                 words_up[2].reshape(F, 1, 1, Wc), patu_l, patu_c, blend0]

    scratch = [pltpu.VMEM((n_pat_l * 2, Wp), jnp.int32),
               pltpu.VMEM((n_pat_c * n_ov_c, Wc), jnp.int32),
               pltpu.VMEM((n_pat_c * n_ov_c, Wc), jnp.int32)]
    if wmode == "chunk":
        scratch += [pltpu.VMEM((_WCHUNK, Wp), jnp.int32),
                    pltpu.VMEM((_WCHUNK, Wc), jnp.int32),
                    pltpu.VMEM((_WCHUNK, Wc), jnp.int32)]
    # Dimension semantics stay at the default ("arbitrary", "arbitrary"):
    # declaring the frame axis "parallel" is valid (the carry flows only
    # (f, r-1) -> (f, r) and a frame's first row masks stale carry) but
    # measured bit-exact-and-slower on all three workload classes
    # (default 3.429 -> 3.472 ms, sei_ar 1.099 -> 1.137, afgs1 ~flat).
    return pl.pallas_call(
        kernel,
        grid=(F, R),
        in_specs=in_specs,
        out_specs=[ystrip, cstrip, cstrip],
        out_shape=[jax.ShapeDtypeStruct(p.shape, p.dtype)
                   for p in (y, u, v)],
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)


def _up_rows(pat2, bh, n_ov, n_pat):
    """(n_pat*n_ov, K) operand holding only the overlap rows of ``pat2``."""
    rows = bh + n_ov
    return jnp.concatenate(
        [pat2[p * rows + bh:(p + 1) * rows] for p in range(n_pat)], axis=0)


# ---------------------------------------------------------------------------
# XLA wrapper: state lattice + packed per-lane kernel words
# ---------------------------------------------------------------------------

def _block_words(lat, c, csubx, csuby):
    """Packed per-BLOCK kernel word for component c, (F, R, C) int32:
    bits 0..9 = base t of the block's first lane (one-hot row), bit 10 =
    sign<0.  Lane x's word is block_word[x >> log2(bw)] + (x & (bw-1));
    the expansion to lanes is done by ``_expand_words_pallas`` (TPU path)
    or ``_lane_words_xla`` (reference path / tiny arrays)."""
    subx = csubx if c else 1
    suby = csuby if c else 1
    bw = 16 // subx
    ymul, xmul = 4 // suby, 4 // subx
    KC = 16 * xmul
    s, ox, oy = block_offsets(lat, c, csubx, csuby)
    baset = ((oy // ymul) * KC + ox).astype(jnp.int32)     # (F, R, C)
    return baset | (jnp.where(s < 0, 1, 0) << 10), bw


def _lane_words_xla(wblk, bw: int):
    """Block->lane expansion with an XLA broadcast-add + reshape.

    This was the round-4 transport: simple, but the (..., C, bw)
    intermediate lives at bw-lane occupancy, so XLA's reshape to (C*bw,)
    lanes is a tiled relayout costing ~0.8 ms/step at 4K -- the step's
    single largest non-compute cost and config-independent (DESIGN.md
    3.1).  Kept for tiny arrays (the shard-map ``words_up`` boot row) and
    as the cross-check reference for the Pallas expansion.  Round-4
    alternatives, all measured neutral-to-worse on hardware (chained 4K
    8-frame step, baseline 3.40 ms): int16 words (3.50 ms), expanding via
    a batched int8 matmul in XLA (3.46 ms), and expanding inside the
    MAIN kernel -- per plane (3.86), as one merged dot (4.03), or
    software-pipelined one strip ahead into VMEM scratch (4.18) -- the
    skinny (M=6) expansion dot streams its (Cp, W) one-hot operand through
    the MXU for only ~12 M MACs of useful work, stalling the pipeline.
    The round-5 fix (``_expand_words_pallas``) is none of those: a
    separate full-occupancy butterfly kernel."""
    i = np.arange(bw, dtype=np.int32)
    F, R, C = wblk.shape
    return (wblk[..., None] + i).reshape(F, R, 1, C * bw)


_EXPAND_CHUNK = 64  # block rows per grid step of the expansion kernel


def _expand_words_pallas(wblks, bws, *, interpret=False):
    """Block->lane word expansion as ONE Pallas butterfly kernel.

    ``wblks``: per-plane (F, R, C_p) int32 block words; returns per-plane
    (F, R, 1, C_p*bw_p) int32 lane words, bit-identical to
    ``_lane_words_xla`` but ~5x cheaper: lane x needs source block
    s(x) = x >> log2(bw), i.e. a pull displacement D(x) = x - s(x), and a
    pull-based butterfly realizes it exactly -- stage k replaces e with
    roll(e, 2^k) on lanes whose D has bit k set, processed HIGH bit to
    LOW.  Correctness invariant (needs high->low order): after the stages
    above k, every lane z holds v[z - H(z)] with H(z) = the processed
    high bits of D(z); when lane x pulls from y = x - 2^k, D's
    monotone-Lipschitz-1 shape gives D(x) - 2^k <= D(y) <= D(x) while
    bit k of D(x) is set, so y's high bits H(y) equal H(x) and the pull
    lands on v[x - H(x) - 2^k] exactly.  No intermediate ever reads below
    lane 0 (partial displacements are bounded by D(x) <= x).
    Unlike the XLA broadcast-reshape (a bw-lane-occupancy relayout) or the
    measured-and-rejected expansion matmuls (_lane_words_xla docstring),
    the butterfly runs ~12 roll+select passes over full (CHUNK, Wp)
    tiles -- a handful of VPU passes at 8/8 sublane occupancy."""
    F, R = wblks[0].shape[:2]
    FR = F * R
    FRp = -(-FR // _EXPAND_CHUNK) * _EXPAND_CHUNK
    ins, shapes = [], []
    for w, bw in zip(wblks, bws):
        C = int(w.shape[2])
        flat = w.reshape(FR, C)
        if FRp != FR:
            flat = jnp.pad(flat, ((0, FRp - FR), (0, 0)))
        ins.append(flat)
        shapes.append((C, C * bw))

    n_planes = len(ins)

    def kernel(*refs):
        in_refs, out_refs = refs[:n_planes], refs[n_planes:]
        for ref, oref, (C, Wp), bw in zip(in_refs, out_refs, shapes, bws):
            oref[...] = _expand_lane_words(ref[...], bw, Wp)

    grid = (FRp // _EXPAND_CHUNK,)
    in_specs = [pl.BlockSpec((_EXPAND_CHUNK, C), lambda i: (i, 0),
                             memory_space=pltpu.VMEM) for C, _ in shapes]
    out_specs = [pl.BlockSpec((_EXPAND_CHUNK, Wp), lambda i: (i, 0),
                              memory_space=pltpu.VMEM) for _, Wp in shapes]
    outs = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((FRp, Wp), jnp.int32)
                   for _, Wp in shapes],
        interpret=interpret,
    )(*ins)
    return [o[:FR].reshape(F, R, 1, o.shape[1]) for o in outs]


# Default lane-word transport (A/B-tested on hardware, tools/probe_r5.py
# and the round-5 in-situ sweep recorded in docs/DESIGN.md 3.2):
#   "xla"    -- expanded lane words via XLA broadcast-reshape (the
#               default: in the full step its removable cost is only
#               ~0.15 ms -- the 0.77 ms it shows in isolation overlaps
#               with the kernel's own HBM streaming)
#   "chunk"  -- block-granular stream, butterfly-expanded into VMEM
#               scratch every _WCHUNK grid steps; 1/bw the HBM traffic,
#               but the 12 roll+select lane passes cost ~0.28 ms/step
#               (lane rotates are multi-pass), a measured net loss
#   "pallas" -- expanded lane words via the butterfly prep kernel
#   "kernel" -- block-granular stream, per-strip butterfly in the main
#               kernel (1/8 sublane occupancy; kept as a cross-check)
WORD_EXPAND = "xla"


def _lane_words3(lat, csubx, csuby, *, interpret=False, expand="xla",
                 active=(True, True, True)):
    """All three planes' lane-word streams from the state lattice.

    ``active``: planes whose scale LUT is identically zero never read
    their words (zero-scale skip) -- their stream is a zeros placeholder
    so the prep pays nothing for them."""
    F, R, C = lat.shape
    blk = [_block_words(lat, c, csubx, csuby) if a else
           (None, 16 // (csubx if c else 1))
           for c, a in enumerate(active)]
    if expand == "chunk":
        Rp = -(-R // _WCHUNK) * _WCHUNK
        return [jnp.zeros((F, Rp, C), jnp.int32) if b is None else
                (jnp.pad(b, ((0, 0), (0, Rp - R), (0, 0)))
                 if Rp > R else b)
                for b, _ in blk]
    if expand == "kernel":
        return [jnp.zeros((F, R, 1, C), jnp.int32) if b is None else
                b.reshape(F, R, 1, C) for b, _ in blk]
    if expand == "pallas":
        idx = [c for c in range(3) if blk[c][0] is not None]
        exp = dict(zip(idx, _expand_words_pallas(
            [blk[c][0] for c in idx], [blk[c][1] for c in idx],
            interpret=interpret))) if idx else {}
        return [exp[c] if blk[c][0] is not None else
                jnp.zeros((F, R, 1, C * blk[c][1]), jnp.int32)
                for c in range(3)]
    return [jnp.zeros((F, R, 1, C * bw), jnp.int32) if b is None else
            _lane_words_xla(b, bw) for b, bw in blk]


def _call_meta(tables: dict, bs: int) -> dict:
    segs = jnp.asarray(tables["seg_starts"])
    nseg_per = tables.get("nseg_per") or (int(segs.shape[1]),) * 3
    lut_mode = tables.get("lut_mode")
    if lut_mode is None:   # legacy tables dicts: only chain/lutdot existed
        lut_mode = tuple("lutdot" if ld else "chain" for ld in
                         tables.get("lutdot", (False, False, False)))
    return dict(
        bs=bs, scale_shift=tables["scale_shift"],
        nseg_per=tuple(int(n) for n in nseg_per),
        lut_mode=tuple(lut_mode), pwl=tuple(tables.get("pwl", (None,) * 3)),
        zero_scale=tuple(tables.get("zero_scale", (False,) * 3)),
        lut_bytes=tables["lut_bytes"],
        y_min=tables["y_min"], y_max=tables["y_max"],
        c_min=tables["c_min"], c_max=tables["c_max"],
        bh_c=tables["bh_c"], bw_c=tables["bw_c"], n_ov_c=tables["n_ov_c"])


def add_grain_batch_natural(y, u, v, bases, bases_up, tables: dict, *,
                            height: int, width: int, bs: int, csubx: int,
                            csuby: int, interpret: bool = False,
                            word_expand: str | None = None):
    """Batched whole-frame grain, natural-layout engine.

    Same contract as ops.grain_pallas.add_grain_batch_pallas.  ``bases_up``
    is accepted for interface parity but unused: the first block row of a
    frame never blends vertically (ops/grain_fast.py rmask semantics), and
    every other row's "up" offsets equal the previous row's own offsets,
    which this engine carries in VMEM across grid steps.

    ``word_expand``: lane-word transport -- "xla" (broadcast-reshape),
    "pallas" (butterfly prep kernel), "kernel" (block-granular stream with
    in-main-kernel butterfly), or None for the measured default
    (WORD_EXPAND); tests cross-check all paths bit-exactly.
    """
    del bases_up
    word_expand = word_expand or WORD_EXPAND
    lat = jax.vmap(
        lambda b: lfsr.state_lattice_jax(b, y.shape[1] // 16,
                                         y.shape[2] // 16))(bases)
    segs = jnp.asarray(tables["seg_starts"])
    segd = jnp.asarray(tables["seg_deltas"])
    active = tuple(not z for z in tables.get("zero_scale", (False,) * 3))
    words = _lane_words3(lat, csubx, csuby, interpret=interpret,
                         expand=word_expand, active=active)
    meta = _call_meta(tables, bs)
    meta["word_mode"] = (word_expand if word_expand in ("kernel", "chunk")
                         else "stream")
    return tuple(_fused_pallas(
        (y, u, v), words, [segs[c] for c in range(3)],
        [segd[c] for c in range(3)], jnp.asarray(tables["pat2_luma"]),
        jnp.asarray(tables["pat2_chroma"]), meta=meta,
        interpret=interpret))


def make_batched_step(tables: dict, *, height: int, width: int, bs: int,
                      csubx: int, csuby: int, interpret: bool = False,
                      donate: bool = False, word_expand: str | None = None):
    """jit-compiled batched step closure over static config tables.

    ``donate`` donates the three input planes so XLA writes outputs in
    place (callers must pass fresh arrays per call, as run_file does)."""
    fn = functools.partial(
        add_grain_batch_natural, tables=tables, height=height, width=width,
        bs=bs, csubx=csubx, csuby=csuby, interpret=interpret,
        word_expand=word_expand)
    return jax.jit(fn, donate_argnums=(0, 1, 2) if donate else ())


def add_grain_shard_natural(y, u, v, states, states_up, ov_mask,
                            tables: dict, *, bs: int, csubx: int, csuby: int,
                            interpret: bool = False,
                            word_expand: str | None = None):
    """Per-shard natural-engine step (a ``shard_map`` body; parallel/mesh.py).

    ``states``/``states_up``: (F, R_local, C) uint32 lattices for the local
    frame x block-row shard (only row 0 of ``states_up`` is consumed -- the
    carry covers every later row); ``ov_mask``: (R_local,) bool, whose first
    entry says whether the shard's first block row blends vertically (tile
    shards below the frame top do).  Zero halo: the up row's candidates are
    recomputed from ``states_up`` on this shard, exactly like
    ops.grain_fast.plane_grain_fast does.
    """
    segs = jnp.asarray(tables["seg_starts"])
    segd = jnp.asarray(tables["seg_deltas"])
    blend0 = ov_mask[0].astype(jnp.int32).reshape(1)
    word_expand = word_expand or WORD_EXPAND
    active = tuple(not z for z in tables.get("zero_scale", (False,) * 3))
    words = _lane_words3(states, csubx, csuby, interpret=interpret,
                         expand=word_expand, active=active)
    # The boot row is one block row per frame -- too small for the
    # butterfly kernel to pay off; the XLA expansion is fine there.
    words_up = [_lane_words_xla(*_block_words(states_up[:, :1], c,
                                              csubx, csuby))
                for c in range(3)]
    meta = _call_meta(tables, bs)
    meta["word_mode"] = (word_expand if word_expand in ("kernel", "chunk")
                         else "stream")
    return tuple(_fused_pallas(
        (y, u, v), words, [segs[c] for c in range(3)],
        [segd[c] for c in range(3)], jnp.asarray(tables["pat2_luma"]),
        jnp.asarray(tables["pat2_chroma"]), meta=meta,
        interpret=interpret, boot=(words_up, blend0)))

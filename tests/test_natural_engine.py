"""Natural-layout engine must match the fast (XLA) engine bit-exactly.

Runs the kernel in interpret mode on the CPU test mesh; the real Mosaic path
is exercised by bench.py on TPU (same kernel code, interpret=False).  Covers
SEI-FF / SEI-AR / AFGS1 configs, 4:2:0 / 4:2:2 / 4:4:4, 8/10-bit, the VMEM
overlap carry across block rows and frames, plus the pipeline-level
`engine="natural"` wiring.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from versatilefilmgrain_tpu.ops import lfsr
from versatilefilmgrain_tpu.ops.grain_fast import (add_grain_frame_fast_jit,
                                                   fast_args, fast_tables)
from versatilefilmgrain_tpu.ops.grain_natural import (add_grain_batch_natural,
                                                      natural_tables)

from test_fast_engine import _regs_for


@pytest.mark.parametrize("kind", ["sei_ff", "sei_ar", "afgs1"])
@pytest.mark.parametrize("depth,csub", [(10, (2, 2)), (8, (2, 2)),
                                        (10, (2, 1)), (8, (1, 1))])
def test_natural_matches_fast(kind, depth, csub):
    H, W = 144, 256
    R, C = H // 16, W // 16
    csubx, csuby = csub
    bs = depth - 8
    regs = _regs_for(kind, depth, csub)
    hi = (1 << depth) - 1
    rng = np.random.default_rng(7)
    dt = np.uint8 if depth == 8 else np.uint16
    y = rng.integers(0, hi + 1, (R * 16, C * 16)).astype(dt)
    u = rng.integers(0, hi + 1,
                     (R * (16 // csuby), C * (16 // csubx))).astype(dt)
    v = rng.integers(0, hi + 1,
                     (R * (16 // csuby), C * (16 // csubx))).astype(dt)

    frames = (0, 1, 3)
    bases, bases_up = [], []
    for f in frames:
        e0 = lfsr.frame_base_exponent(f, R, C)
        bases.append(int(lfsr.advance(np.uint32(regs.seed_state), e0)))
        bases_up.append(int(lfsr.advance(np.uint32(regs.seed_state), e0 - C))
                        if e0 else bases[-1])

    # Natural engine: one batched call over all three frames (also exercises
    # carry invalidation at frame boundaries within the grid).
    nt = natural_tables(regs)
    nout = add_grain_batch_natural(
        jnp.asarray(np.stack([y] * len(frames))),
        jnp.asarray(np.stack([u] * len(frames))),
        jnp.asarray(np.stack([v] * len(frames))),
        jnp.asarray(np.array(bases, np.uint32)),
        jnp.asarray(np.array(bases_up, np.uint32)),
        nt, height=H, width=W, bs=bs, csubx=csubx, csuby=csuby,
        interpret=True)

    ft = fast_tables(regs)
    for fi, f in enumerate(frames):
        fast = add_grain_frame_fast_jit(
            jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
            jnp.uint32(bases[fi]), jnp.uint32(bases_up[fi]), *fast_args(ft),
            height=H, width=W, bs=bs, csubx=csubx, csuby=csuby)
        for p, (r, q) in enumerate(zip(fast, nout)):
            assert np.array_equal(np.asarray(r), np.asarray(q)[fi]), \
                f"{kind} d{depth} csub{csub} frame {f} plane {p}"


def test_pipeline_engine_natural_matches_fast():
    """engine="natural" through GrainPipeline produces identical frames,
    including unaligned dimensions (padding path) and multi-frame state."""
    from versatilefilmgrain_tpu.pipeline import GrainPipeline
    from versatilefilmgrain_tpu.utils import yuv

    Wd, Hd = 250, 140  # unaligned: exercises pad_plane + crop
    rng = np.random.default_rng(11)
    framesets = []
    for _ in range(3):
        yp = rng.integers(0, 1024, (Hd, Wd)).astype(np.uint16)
        up = rng.integers(0, 1024, (Hd // 2, Wd // 2)).astype(np.uint16)
        vp = rng.integers(0, 1024, (Hd // 2, Wd // 2)).astype(np.uint16)
        framesets.append((yp, up, vp))

    pf = GrainPipeline(Wd, Hd, 10, yuv.YUV_420, engine="fast")
    pn = GrainPipeline(Wd, Hd, 10, yuv.YUV_420, engine="natural")
    for n, planes in enumerate(framesets):
        of = pf.process_frame(tuple(p.copy() for p in planes), n)
        on = pn.process_frame(tuple(p.copy() for p in planes), n)
        for c, (a, b) in enumerate(zip(of, on)):
            assert np.array_equal(a, b), f"frame {n} plane {c}"


def test_run_file_engine_natural(tmp_path):
    """Batched run_file with the natural engine is bit-identical to fast."""
    from versatilefilmgrain_tpu.pipeline import GrainPipeline
    from versatilefilmgrain_tpu.utils import yuv

    Wd, Hd, nfr = 256, 144, 5
    rng = np.random.default_rng(23)
    src = tmp_path / "in.yuv"
    raw = rng.integers(0, 1024, nfr * Wd * Hd * 3 // 2, dtype=np.uint16)
    raw.tofile(src)

    outs = {}
    for engine in ("fast", "natural"):
        dst = tmp_path / f"out_{engine}.yuv"
        pipe = GrainPipeline(Wd, Hd, 10, yuv.YUV_420, engine=engine)
        n = pipe.run_file(str(src), str(dst), frames=0, batch=2)
        assert n == nfr
        outs[engine] = dst.read_bytes()
    assert outs["fast"] == outs["natural"]


def _random_sei(rng):
    """A random legal FGC SEI: random interval count/bounds (exercises nseg
    and n_pat variation), FF cutoffs or AR coefficients, random scale shift."""
    from versatilefilmgrain_tpu.models import config as cfgmod

    sei = cfgmod.default_sei()
    sei.model_id = int(rng.integers(0, 2))
    sei.log2_scale_factor = int(rng.integers(2, 8))
    sei.comp_model_present_flag = [1, int(rng.integers(0, 2)),
                                   int(rng.integers(0, 2))]
    for c in range(3):
        n = int(rng.integers(1, 17))
        sei.num_intensity_intervals[c] = n
        bounds = np.sort(rng.choice(256, size=2 * n, replace=False))
        sei.intensity_interval_lower_bound[c, :n] = bounds[0::2]
        sei.intensity_interval_upper_bound[c, :n] = bounds[1::2]
        sei.comp_model_value[c, :, :] = 0
        if sei.model_id == 0:
            sei.num_model_values[c] = 3
            for i in range(n):
                sei.comp_model_value[c, i, :3] = [
                    int(rng.integers(0, 256)), int(rng.integers(2, 15)),
                    int(rng.integers(2, 15))]
        else:
            sei.num_model_values[c] = 6
            for i in range(n):
                sei.comp_model_value[c, i, :6] = [
                    int(rng.integers(0, 200)), int(rng.integers(-20, 21)),
                    int(rng.integers(-10, 11)), int(rng.integers(-20, 21)),
                    int(rng.integers(0, 64)), int(rng.integers(-10, 11))]
    return sei


@pytest.mark.parametrize("kind", ["sei_ff", "sei_ar"])
@pytest.mark.parametrize("mode", ["chunk", "pallas", "kernel"])
def test_word_transport_modes_match(kind, mode):
    """Every lane-word transport produces identical pixels to the default
    "xla" broadcast-reshape: "chunk" (block-granular stream, butterfly
    into VMEM scratch every _WCHUNK rows -- H=144 gives R=9, exercising
    the non-multiple-of-_WCHUNK tail), "pallas" (prep-kernel butterfly),
    and "kernel" (per-strip in-kernel butterfly).  sei_ar additionally
    runs the zero-scale chroma skip through every transport."""
    H, W = 144, 256
    R, C = H // 16, W // 16
    regs = _regs_for(kind, 10, (2, 2))
    rng = np.random.default_rng(23)
    F = 2
    planes = (jnp.asarray(rng.integers(0, 1024, (F, H, W), np.uint16)),
              jnp.asarray(rng.integers(0, 1024, (F, H // 2, W // 2),
                                       np.uint16)),
              jnp.asarray(rng.integers(0, 1024, (F, H // 2, W // 2),
                                       np.uint16)))
    bases, bases_up = [], []
    for f in range(F):
        e0 = lfsr.frame_base_exponent(f, R, C)
        bases.append(int(lfsr.advance(np.uint32(regs.seed_state), e0)))
        bases_up.append(int(lfsr.advance(np.uint32(regs.seed_state), e0 - C))
                        if e0 else bases[-1])
    cargs = (jnp.asarray(np.array(bases, np.uint32)),
             jnp.asarray(np.array(bases_up, np.uint32)))
    nt = natural_tables(regs)
    if kind == "sei_ar":
        assert nt["zero_scale"] == (False, True, True)
    kw = dict(height=H, width=W, bs=2, csubx=2, csuby=2, interpret=True)
    ref = add_grain_batch_natural(*planes, *cargs, nt, word_expand="xla",
                                  **kw)
    out = add_grain_batch_natural(*planes, *cargs, nt, word_expand=mode,
                                  **kw)
    for p, (a, b) in enumerate(zip(ref, out)):
        assert np.array_equal(np.asarray(a), np.asarray(b)), \
            f"{kind} word_expand={mode} plane {p}"


@pytest.mark.parametrize("mode", ["xla", "chunk", "pallas", "kernel"])
def test_all_components_absent(mode):
    """comp_model_present = [0,0,0] zero-scales every plane: the engine
    must reduce to clip(x) on all three planes through every word
    transport (the "pallas" expansion kernel used to be called with an
    empty plane list here)."""
    from versatilefilmgrain_tpu.models import config as cfgmod
    from versatilefilmgrain_tpu.models import fw
    from versatilefilmgrain_tpu.models.hw import HwRegs

    regs = HwRegs()
    regs.set_depth(10)
    regs.set_chroma_subsampling(2, 2)
    sei = cfgmod.default_sei()
    sei.comp_model_present_flag = [0, 0, 0]
    fw.init_sei(sei, regs)
    nt = natural_tables(regs)
    assert nt["zero_scale"] == (True, True, True)
    H, W, F = 80, 160, 2
    rng = np.random.default_rng(3)
    planes = (jnp.asarray(rng.integers(0, 1024, (F, H, W), np.uint16)),
              jnp.asarray(rng.integers(0, 1024, (F, H // 2, W // 2),
                                       np.uint16)),
              jnp.asarray(rng.integers(0, 1024, (F, H // 2, W // 2),
                                       np.uint16)))
    cargs = (jnp.zeros(F, jnp.uint32), jnp.zeros(F, jnp.uint32))
    out = add_grain_batch_natural(*planes, *cargs, nt, height=H, width=W,
                                  bs=2, csubx=2, csuby=2, interpret=True,
                                  word_expand=mode)
    lims = [(regs.y_min, regs.y_max), (regs.c_min, regs.c_max),
            (regs.c_min, regs.c_max)]
    for p, (a, (lo, hi)) in enumerate(zip(out, lims)):
        want = np.clip(np.asarray(planes[p], np.int32), lo << 2, hi << 2)
        assert np.array_equal(np.asarray(a, np.int32), want), \
            f"plane {p} mode {mode}"


def test_force_pwl_unfittable_fails_fast(monkeypatch):
    """force_lut_path="pwl" on a LUT with no exact PWL form raises at
    table-build time instead of dying inside the kernel trace.  (With
    max_segs=256 every real register file fits — single-point segments
    are always exact and MAX_PATTERNS=8 bounds the pattern index to the
    pack's 3-bit field — so the unfittable case is simulated by stubbing
    the fitter; the guard is defensive.)"""
    from versatilefilmgrain_tpu.ops import grain_natural as gn

    regs = _regs_for("sei_ff", 10, (2, 2))
    natural_tables(regs, force_lut_path=("pwl", "chain", "chain"))  # fits
    monkeypatch.setattr(gn, "fit_pwl", lambda *a, **k: None)
    with pytest.raises(ValueError, match="no exact PWL form"):
        gn.natural_tables(regs, force_lut_path=("pwl", "chain", "chain"))


@pytest.mark.parametrize("seed", range(6))
def test_natural_matches_fast_random_cfg(seed):
    """Differential fuzz: random SEI configs (random interval counts, pattern
    counts, scale shifts, FF and AR modes) through both engines."""
    from versatilefilmgrain_tpu.models import fw
    from versatilefilmgrain_tpu.models.hw import HwRegs

    rng = np.random.default_rng(1000 + seed)
    depth = int(rng.choice([8, 10]))
    csub = [(2, 2), (2, 1), (1, 1)][int(rng.integers(0, 3))]
    H, W = 96, 192
    R, C = H // 16, W // 16
    csubx, csuby = csub
    bs = depth - 8

    regs = HwRegs()
    regs.set_depth(depth)
    regs.set_chroma_subsampling(csubx, csuby)
    try:
        fw.init_sei(_random_sei(rng), regs)
    except ValueError:
        pytest.skip("random config rejected by init (legal-range check)")

    hi = (1 << depth) - 1
    dt = np.uint8 if depth == 8 else np.uint16
    y = rng.integers(0, hi + 1, (R * 16, C * 16)).astype(dt)
    u = rng.integers(0, hi + 1,
                     (R * (16 // csuby), C * (16 // csubx))).astype(dt)
    v = rng.integers(0, hi + 1,
                     (R * (16 // csuby), C * (16 // csubx))).astype(dt)

    frames = (0, 2)
    bases, bases_up = [], []
    for f in frames:
        e0 = lfsr.frame_base_exponent(f, R, C)
        bases.append(int(lfsr.advance(np.uint32(regs.seed_state), e0)))
        bases_up.append(int(lfsr.advance(np.uint32(regs.seed_state), e0 - C))
                        if e0 else bases[-1])

    ft = fast_tables(regs)
    # threshold=default exercises the path split the config would get in
    # production; threshold=0 forces the LUT-dot path and force="pwl" the
    # piecewise-linear path on every component, differentially fuzzing both
    # across random LUT shapes.
    for thr in (None, 0, "pwl"):
        nt = (natural_tables(regs) if thr is None
              else natural_tables(regs, lut_dot_threshold=0) if thr == 0
              else natural_tables(regs, force_lut_path="pwl"))
        nout = add_grain_batch_natural(
            jnp.asarray(np.stack([y] * len(frames))),
            jnp.asarray(np.stack([u] * len(frames))),
            jnp.asarray(np.stack([v] * len(frames))),
            jnp.asarray(np.array(bases, np.uint32)),
            jnp.asarray(np.array(bases_up, np.uint32)),
            nt, height=H, width=W, bs=bs, csubx=csubx, csuby=csuby,
            interpret=True)
        for fi, f in enumerate(frames):
            fast = add_grain_frame_fast_jit(
                jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                jnp.uint32(bases[fi]), jnp.uint32(bases_up[fi]),
                *fast_args(ft),
                height=H, width=W, bs=bs, csubx=csubx, csuby=csuby)
            for p, (r, q) in enumerate(zip(fast, nout)):
                assert np.array_equal(np.asarray(r), np.asarray(q)[fi]), \
                    f"seed {seed} thr {thr} frame {f} plane {p}"


def test_lut_paths_match_chain():
    """Forcing the LUT-dot and PWL evaluations on a config that would
    normally run the compare/add chain produces identical integers, and the
    default threshold actually splits SEI (chain) from AFGS1 (PWL)."""
    H, W = 144, 256
    R, C = H // 16, W // 16
    regs = _regs_for("sei_ff", 10, (2, 2))
    nt_chain = natural_tables(regs)
    nt_dot = natural_tables(regs, lut_dot_threshold=0)
    nt_pwl = natural_tables(regs, force_lut_path="pwl")
    assert nt_chain["lut_mode"] == ("chain", "chain", "chain")
    assert nt_dot["lut_mode"] == ("lutdot", "lutdot", "lutdot")
    assert nt_pwl["lut_mode"] == ("pwl", "pwl", "pwl")
    afgs = _regs_for("afgs1", 10, (2, 2))
    # luma/Cr ramps degenerate the run-length chain and are exactly
    # piecewise-linear (AFGS1 builds them that way, vfgs_fw.c:648-660);
    # Cb's constant 60->60 scaling stays cheap and keeps the chain -- a
    # per-component decision.
    assert natural_tables(afgs)["lut_mode"] == ("pwl", "chain", "pwl")

    rng = np.random.default_rng(5)
    y = rng.integers(0, 1024, (2, H, W)).astype(np.uint16)
    u = rng.integers(0, 1024, (2, H // 2, W // 2)).astype(np.uint16)
    v = rng.integers(0, 1024, (2, H // 2, W // 2)).astype(np.uint16)
    bases = []
    for f in (0, 2):
        e0 = lfsr.frame_base_exponent(f, R, C)
        bases.append(int(lfsr.advance(np.uint32(regs.seed_state), e0)))
    b = jnp.asarray(np.array(bases, np.uint32))
    outs = []
    for nt in (nt_chain, nt_dot, nt_pwl):
        outs.append(add_grain_batch_natural(
            jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), b, b, nt,
            height=H, width=W, bs=2, csubx=2, csuby=2, interpret=True))
    for p, (a, bb, cc) in enumerate(zip(*outs)):
        assert np.array_equal(np.asarray(a), np.asarray(bb)), f"plane {p}"
        assert np.array_equal(np.asarray(a), np.asarray(cc)), f"plane {p}"

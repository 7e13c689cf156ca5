"""Probe: software-pipeline the one-hot BUILD one strip ahead.

Hypothesis: the byte-packed one-hot build (~0.56 ms/step of VPU work,
serialized before the window dot) can hide under the PREVIOUS strip's MXU
dot if built one grid step early into a double-buffered VMEM scratch —
the same mechanism that hides chroma's VPU work under the luma dot.  The
round-4 dead end pipelined the lane-word EXPANSION DOT (a skinny matmul
that stalls the MXU); this pipelines pure VPU work, which is different.

Forked fused kernel: per grid step g (flattened (f, r)), the dot consumes
one-hot buffer g%2 (built at step g-1), then the VPU builds strip g+1's
one-hot into buffer (g+1)%2.  Step 0 additionally builds its own buffer.
Carry/blend/deblock/epilogue identical to production; bit-exactness is
checked against the production engine on device.

Run on TPU from the repo root:
  python tools/probe_ohpipe.py [default sei_ar afgs1]
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_vfg")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _chain_fps, _regs_from_cfg, H, W, FRAMES_BATCH  # noqa: E402
from versatilefilmgrain_tpu.ops import lfsr  # noqa: E402
from versatilefilmgrain_tpu.ops.grain_natural import (  # noqa: E402
    _PACK_SHIFT, _build_onehot, _deblock_mask, _eval_lut, _lane_words3,
    _mux, _call_meta, natural_tables, make_batched_step)
from __graft_entry__ import _default_regs, _frame_bases  # noqa: E402

CFGDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "tests", "golden", "cfg")


def _strip_body_pipe(g0, r0, x_ref, w, w_next, segs_ref, segd_ref, pat_ref,
                     mask_ref, lut_ref, out_ref, carry_ref, oh_ref, *, bh, bw,
                     n_ov, n_pat, nseg, K, bs, scale_shift, imin, imax, Wp,
                     lut_path, pwl, zero_scale):
    if zero_scale:
        x = x_ref[0].astype(jnp.int32)
        out_ref[0] = jnp.clip(x, imin << bs, imax << bs).astype(
            out_ref.dtype)
        return
    rows = bh + n_ov
    x = x_ref[0].astype(jnp.int32)
    inten = (x >> bs) & 0xFF
    par = g0 % 2
    dot = lambda oh: jax.lax.dot_general(
        pat_ref[:], oh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    sg = 1 - ((w >> 9) & 2)

    if VARIANT == "dyn":
        # Double buffer addressed by parity (dynamic leading-dim index;
        # measured 2-3x SLOWER: the dynamic slice materializes copies).
        @pl.when(g0 == 0)
        def _init():
            oh_ref[0] = _build_onehot(w, K, Wp)[0]

        cand = dot(oh_ref[par])
        oh_ref[1 - par] = _build_onehot(w_next, K, Wp)[0]
    elif VARIANT == "war":
        # Single buffer: dot reads this strip's one-hot, then the build
        # overwrites it with the next strip's (write-after-read within
        # one sequential kernel body — safe; overlap depends on Mosaic's
        # hazard granularity).
        @pl.when(g0 == 0)
        def _init():
            oh_ref[0] = _build_onehot(w, K, Wp)[0]

        cand = dot(oh_ref[0])
        oh_ref[0] = _build_onehot(w_next, K, Wp)[0]
    else:
        # Dual static buffers selected by pl.when; cand through scratch.
        ohA, ohB, cand_ref = oh_ref

        @pl.when(g0 == 0)
        def _init():
            ohA[...] = _build_onehot(w, K, Wp)[0]

        @pl.when(par == 0)
        def _even():
            cand_ref[...] = dot(ohA[...])
            ohB[...] = _build_onehot(w_next, K, Wp)[0]

        @pl.when(par == 1)
        def _odd():
            cand_ref[...] = dot(ohB[...])
            ohA[...] = _build_onehot(w_next, K, Wp)[0]

        cand = cand_ref[...]

    acc = _eval_lut(inten, segs_ref, segd_ref, lut_ref, bh=bh, Wp=Wp,
                    nseg=nseg, lut_path=lut_path, pwl=pwl)
    sc = acc & ((1 << _PACK_SHIFT) - 1)
    pi = acc >> _PACK_SHIFT

    P = _mux([cand[p * rows:p * rows + bh] for p in range(n_pat)], pi) * sg
    up_prev = carry_ref[:]
    Pu = _mux([up_prev[p * n_ov:(p + 1) * n_ov] for p in range(n_pat)],
              pi[:n_ov])
    carry_ref[:] = jnp.concatenate(
        [cand[p * rows + bh:(p + 1) * rows] for p in range(n_pat)],
        axis=0) * sg if n_pat > 1 else cand[bh:rows] * sg

    if n_ov == 1:
        oc1 = oc2 = 20
    else:
        row = jax.lax.broadcasted_iota(jnp.int32, (n_ov, Wp), 0)
        first = row < 1
        oc1 = jnp.where(first, 12, 24)
        oc2 = jnp.where(first, 24, 12)
    blend = (P[:n_ov] * oc1 + Pu * oc2 + 16) >> 5
    top = jnp.where(r0 > 0, blend, P[:n_ov])
    P = jnp.concatenate([top, P[n_ov:]], axis=0)

    left = pltpu.roll(P, shift=1, axis=1)
    right = pltpu.roll(P, shift=Wp - 1, axis=1)
    sm = (left + 3 * P + right + 2) >> 2
    P = jnp.where(mask_ref[:] != 0, sm, P)

    g = (sc * P + (1 << (scale_shift - 1))) >> scale_shift
    res = jnp.clip(x + g, imin << bs, imax << bs)
    out_ref[0] = res.astype(out_ref.dtype)


def _fused_pipe(planes, words, segs3, segd3, pat_l, pat_c, lut6, *, meta):
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
    pcommon = dict(bs=meta["bs"], scale_shift=meta["scale_shift"])
    pl_luma = dict(bh=16, bw=16, n_ov=2, n_pat=n_pat_l, K=K_l, Wp=Wp,
                   nseg=meta["nseg_per"][0], imin=meta["y_min"],
                   imax=meta["y_max"], lut_path=lut_mode[0], pwl=pwl[0],
                   zero_scale=zs[0], **pcommon)
    pl_chroma = [dict(bh=bh_c, bw=bw_c, n_ov=n_ov_c, n_pat=n_pat_c, K=K_c,
                      Wp=Wc, nseg=meta["nseg_per"][c], imin=meta["c_min"],
                      imax=meta["c_max"], lut_path=lut_mode[c], pwl=pwl[c],
                      zero_scale=zs[c], **pcommon) for c in (1, 2)]

    noh = {"dyn": 1, "war": 1, "dual": 3}[VARIANT]

    def kernel(*refs):
        (y_ref, u_ref, v_ref, wy_ref, wu_ref, wv_ref,
         wyn_ref, wun_ref, wvn_ref,
         sy_ref, dy_ref, su_ref, du_ref, sv_ref, dv_ref,
         patl_ref, patc_ref, ml_ref, mc_ref, lut6_ref,
         oy_ref, ou_ref, ov_ref, cy_ref, cu_ref, cv_ref) = refs[:26]
        ohs = refs[26:]
        oh3 = [ohs[c * noh] if noh == 1 else tuple(ohs[c * noh:(c + 1) * noh])
               for c in range(3)]
        f0 = pl.program_id(0)
        r0 = pl.program_id(1)
        g0 = f0 * R + r0
        wrow = lambda ref: ref[0, 0, 0:1]
        _strip_body_pipe(g0, r0, y_ref, wrow(wy_ref), wrow(wyn_ref),
                         sy_ref, dy_ref, patl_ref, ml_ref, lut6_ref[0:2],
                         oy_ref, cy_ref, oh3[0], **pl_luma)
        _strip_body_pipe(g0, r0, u_ref, wrow(wu_ref), wrow(wun_ref),
                         su_ref, du_ref, patc_ref, mc_ref, lut6_ref[2:4],
                         ou_ref, cu_ref, oh3[1], **pl_chroma[0])
        _strip_body_pipe(g0, r0, v_ref, wrow(wv_ref), wrow(wvn_ref),
                         sv_ref, dv_ref, patc_ref, mc_ref, lut6_ref[4:6],
                         ov_ref, cv_ref, oh3[2], **pl_chroma[1])

    ystrip = pl.BlockSpec((1, 16, Wp), lambda f, r: (f, r, 0),
                          memory_space=pltpu.VMEM)
    cstrip = pl.BlockSpec((1, bh_c, Wc), lambda f, r: (f, r, 0),
                          memory_space=pltpu.VMEM)
    G = F * R
    Lw_y, Lw_u, Lw_v = (int(w.shape[3]) for w in words)

    def lane_cur(L):
        return pl.BlockSpec((1, 1, 1, L), lambda f, r: (f * R + r, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def lane_nxt(L):
        return pl.BlockSpec(
            (1, 1, 1, L),
            lambda f, r: (jnp.minimum(f * R + r + 1, G - 1), 0, 0, 0),
            memory_space=pltpu.VMEM)

    const2 = lambda a: pl.BlockSpec(a.shape, lambda f, r: (0, 0),
                                    memory_space=pltpu.VMEM)
    smem1 = lambda a: pl.BlockSpec(a.shape, lambda f, r: (0,),
                                   memory_space=pltpu.SMEM)
    wflat = [w.reshape(G, 1, 1, w.shape[3]) for w in words]
    in_specs = [ystrip, cstrip, cstrip,
                lane_cur(Lw_y), lane_cur(Lw_u), lane_cur(Lw_v),
                lane_nxt(Lw_y), lane_nxt(Lw_u), lane_nxt(Lw_v),
                smem1(segs3[0]), smem1(segd3[0]), smem1(segs3[1]),
                smem1(segd3[1]), smem1(segs3[2]), smem1(segd3[2]),
                const2(pat_l), const2(pat_c), const2(mask_l), const2(mask_c),
                const2(lut6)]
    args = [y, u, v, *wflat, *wflat, segs3[0], segd3[0], segs3[1], segd3[1],
            segs3[2], segd3[2], pat_l, pat_c, mask_l, mask_c, lut6]
    scratch = [pltpu.VMEM((n_pat_l * 2, Wp), jnp.int32),
               pltpu.VMEM((n_pat_c * n_ov_c, Wc), jnp.int32),
               pltpu.VMEM((n_pat_c * n_ov_c, Wc), jnp.int32)]
    rows_c = bh_c + n_ov_c
    for K_p, W_p, M_p in ((K_l, Wp, n_pat_l * 18),
                          (K_c, Wc, n_pat_c * rows_c),
                          (K_c, Wc, n_pat_c * rows_c)):
        if VARIANT == "dyn":
            scratch.append(pltpu.VMEM((2, K_p, W_p), jnp.int8))
        elif VARIANT == "war":
            scratch.append(pltpu.VMEM((1, K_p, W_p), jnp.int8))
        else:
            scratch += [pltpu.VMEM((K_p, W_p), jnp.int8),
                        pltpu.VMEM((K_p, W_p), jnp.int8),
                        pltpu.VMEM((M_p, W_p), jnp.int32)]
    return pl.pallas_call(
        kernel,
        grid=(F, R),
        in_specs=in_specs,
        out_specs=[ystrip, cstrip, cstrip],
        out_shape=[jax.ShapeDtypeStruct(p.shape, p.dtype)
                   for p in (y, u, v)],
        scratch_shapes=scratch,
    )(*args)


def make_pipe_step(tables, *, height, width, bs=2, csubx=2, csuby=2):
    meta = _call_meta(tables, bs)
    segs = jnp.asarray(tables["seg_starts"])
    segd = jnp.asarray(tables["seg_deltas"])
    pat_l = jnp.asarray(tables["pat2_luma"])
    pat_c = jnp.asarray(tables["pat2_chroma"])
    lut6 = jnp.asarray(tables["lut_bytes"])
    active = tuple(not z for z in tables.get("zero_scale", (False,) * 3))

    @jax.jit
    def step(y, u, v, bases, bases_up):
        lat = jax.vmap(
            lambda b: lfsr.state_lattice_jax(b, y.shape[1] // 16,
                                             y.shape[2] // 16))(bases)
        words = _lane_words3(lat, csubx, csuby, active=active)
        return _fused_pipe((y, u, v), words, [segs[c] for c in range(3)],
                           [segd[c] for c in range(3)], pat_l, pat_c, lut6,
                           meta=meta)

    return step


def run_config(kind, state0, F):
    if kind == "default":
        regs = _default_regs()
    else:
        regs = _regs_from_cfg(os.path.join(CFGDIR, {
            "sei_ar": "fgs_sei_ar_test1.cfg",
            "afgs1": "fgs_afgs1_test1.cfg"}[kind]))
    tables = natural_tables(regs)
    R, C = H // 16, W // 16
    bases, bases_up = _frame_bases(regs, F, R, C)
    cargs = (jnp.asarray(bases), jnp.asarray(bases_up))
    prod = make_batched_step(tables, height=H, width=W, bs=2, csubx=2,
                             csuby=2)
    pipe = make_pipe_step(tables, height=H, width=W)
    f_prod = _chain_fps(prod, state0, cargs)
    f_pipe = _chain_fps(pipe, state0, cargs)
    a, b = prod(*state0, *cargs), pipe(*state0, *cargs)
    ok = all(bool(jnp.array_equal(x, y)) for x, y in zip(a, b))
    print(f"{kind:8s} prod={f_prod:8.1f} fps ({1e3*F/f_prod:.3f} ms)  "
          f"pipe={f_pipe:8.1f} fps ({1e3*F/f_pipe:.3f} ms)  "
          f"{'bit-exact' if ok else '*** DIVERGES ***'}", flush=True)


def main():
    global VARIANT
    args = sys.argv[1:]
    variants = [a for a in args if a in ("dyn", "war", "dual")] \
        or ["war", "dual"]
    kinds = [a for a in args if a not in ("dyn", "war", "dual")] \
        or ["default"]
    R, C = H // 16, W // 16
    F = FRAMES_BATCH
    rng = np.random.default_rng(0)
    state0 = (
        jnp.asarray(rng.integers(0, 1024, (F, R * 16, C * 16),
                                 dtype=np.uint16)),
        jnp.asarray(rng.integers(0, 1024, (F, R * 8, C * 8),
                                 dtype=np.uint16)),
        jnp.asarray(rng.integers(0, 1024, (F, R * 8, C * 8),
                                 dtype=np.uint16)))
    for v in variants:
        VARIANT = v
        print(f"--- variant {v} ---", flush=True)
        for kind in kinds:
            run_config(kind, state0, F)


if __name__ == "__main__":
    main()

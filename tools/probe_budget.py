"""Per-stage budget of the fused natural-layout kernel (chained timing).

Ablation probe: re-implements ops/grain_natural.py's strip body with each
stage individually removable, measures every variant with bench.py's
chained-dependency methodology at the headline workload (4K 10-bit 4:2:0,
8-frame batch), and prints the deltas as a budget table.  Variants produce
WRONG pixels by construction — this file measures cost, never correctness.

Stages:
  prep      XLA-side state lattice + packed lane words (no pallas call)
  onehot    byte-packed one-hot build, per plane
  dot       the MXU window contraction, per plane
  lut       the intensity->(scale,pattern) evaluation — run-length chain,
            direct PWL formula, or LUT-dot, whichever the config selects
  mux       pattern candidate select tree + sign
  blend     vertical overlap rows + carry maintenance
  deblock   horizontal masked 3-tap
  epilogue  scale/round/add/clip + store

Also measures a "reorder" variant (dot issued before the LUT chain so the
VPU chain can overlap the MXU) and batch=16, to answer whether instruction
order or batching buys anything.

Run on TPU from the repo root:
  python tools/probe_budget.py [default sei_ar afgs1]
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
    _mux, natural_tables)
from __graft_entry__ import _default_regs, _frame_bases  # noqa: E402

CFGDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "tests", "golden", "cfg")


def _strip_body_abl(r0, x_ref, w_ref, segs_ref, segd_ref, pat_ref, mask_ref,
                    lut_ref, out_ref, carry_ref, *, bh, bw, n_ov, n_pat, nseg,
                    K, bs, scale_shift, imin, imax, Wp, lut_path, pwl, skip,
                    reorder, zero_scale=False):
    rows = bh + n_ov
    x = x_ref[0].astype(jnp.int32)
    if zero_scale:   # mirror the production kernel's zero-scale skip
        out_ref[0] = jnp.clip(x, imin << bs, imax << bs).astype(
            out_ref.dtype)
        return
    inten = (x >> bs) & 0xFF

    def do_lut():
        if "lut" in skip:
            return inten & 0xFF, inten & max(n_pat - 1, 0)
        # The SAME traced evaluation as production (grain_natural._eval_lut),
        # so the probe cannot drift from shipping behaviour.
        acc = _eval_lut(inten, segs_ref, segd_ref, lut_ref, bh=bh, Wp=Wp,
                        nseg=nseg, lut_path=lut_path, pwl=pwl)
        return acc & ((1 << _PACK_SHIFT) - 1), acc >> _PACK_SHIFT

    def do_dot():
        if "onehot" in skip:
            return jnp.broadcast_to(w_ref[0, 0, 0:1] & 1,
                                    (n_pat * rows, Wp)), 1
        onehot, sg = _build_onehot(w_ref[0, 0, 0:1], K, Wp)
        if "dot" in skip:
            return onehot[:n_pat * rows].astype(jnp.int32), sg
        return jax.lax.dot_general(pat_ref[:], onehot,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32), sg

    if reorder:
        cand, sg = do_dot()
        sc, pi = do_lut()
    else:
        sc, pi = do_lut()
        cand, sg = do_dot()

    if "mux" in skip:
        P = cand[:bh] * sg
        Pu = cand[:n_ov] * sg
        carry_ref[:] = cand[:n_pat * n_ov]
    else:
        P = _mux([cand[p * rows:p * rows + bh] for p in range(n_pat)],
                 pi) * sg
        up_prev = carry_ref[:]
        Pu = _mux([up_prev[p * n_ov:(p + 1) * n_ov] for p in range(n_pat)],
                  pi[:n_ov])
        carry_ref[:] = jnp.concatenate(
            [cand[p * rows + bh:(p + 1) * rows] for p in range(n_pat)],
            axis=0) * sg if n_pat > 1 else cand[bh:rows] * sg

    if "blend" not in skip:
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

    if "deblock" not in skip:
        left = pltpu.roll(P, shift=1, axis=1)
        right = pltpu.roll(P, shift=Wp - 1, axis=1)
        sm = (left + 3 * P + right + 2) >> 2
        P = jnp.where(mask_ref[:] != 0, sm, P)

    if "epilogue" in skip:
        out_ref[0] = (x + P).astype(out_ref.dtype)
    else:
        g = (sc * P + (1 << (scale_shift - 1))) >> scale_shift
        res = jnp.clip(x + g, imin << bs, imax << bs)
        out_ref[0] = res.astype(out_ref.dtype)


def _fused_abl(planes, words, segs3, segd3, pat_l, pat_c, lut6, *, meta, skip,
               reorder):
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
    pcommon = dict(bs=meta["bs"], scale_shift=meta["scale_shift"],
                   skip=skip, reorder=reorder)
    pl_luma = dict(bh=16, bw=16, n_ov=2, n_pat=n_pat_l, K=K_l, Wp=Wp,
                   nseg=meta["nseg_per"][0], imin=meta["y_min"],
                   imax=meta["y_max"], lut_path=lut_mode[0], pwl=pwl[0],
                   zero_scale=zs[0], **pcommon)
    pl_chroma = [dict(bh=bh_c, bw=bw_c, n_ov=n_ov_c, n_pat=n_pat_c, K=K_c,
                      Wp=Wc, nseg=meta["nseg_per"][c], imin=meta["c_min"],
                      imax=meta["c_max"], lut_path=lut_mode[c], pwl=pwl[c],
                      zero_scale=zs[c], **pcommon) for c in (1, 2)]

    def kernel(*refs):
        (y_ref, u_ref, v_ref, wy_ref, wu_ref, wv_ref,
         sy_ref, dy_ref, su_ref, du_ref, sv_ref, dv_ref,
         patl_ref, patc_ref, ml_ref, mc_ref, lut6_ref,
         oy_ref, ou_ref, ov_ref, cy_ref, cu_ref, cv_ref) = refs
        r0 = pl.program_id(1)
        _strip_body_abl(r0, y_ref, wy_ref, sy_ref, dy_ref, patl_ref, ml_ref,
                        lut6_ref[0:2], oy_ref, cy_ref, **pl_luma)
        if "chroma" not in skip:
            _strip_body_abl(r0, u_ref, wu_ref, su_ref, du_ref, patc_ref,
                            mc_ref, lut6_ref[2:4], ou_ref, cu_ref,
                            **pl_chroma[0])
            _strip_body_abl(r0, v_ref, wv_ref, sv_ref, dv_ref, patc_ref,
                            mc_ref, lut6_ref[4:6], ov_ref, cv_ref,
                            **pl_chroma[1])
        else:
            ou_ref[0] = u_ref[0]
            ov_ref[0] = v_ref[0]

    ystrip = pl.BlockSpec((1, 16, Wp), lambda f, r: (f, r, 0),
                          memory_space=pltpu.VMEM)
    cstrip = pl.BlockSpec((1, bh_c, Wc), lambda f, r: (f, r, 0),
                          memory_space=pltpu.VMEM)
    ylane = pl.BlockSpec((1, 1, 1, Wp), lambda f, r: (f, r, 0, 0),
                         memory_space=pltpu.VMEM)
    clane = pl.BlockSpec((1, 1, 1, Wc), lambda f, r: (f, r, 0, 0),
                         memory_space=pltpu.VMEM)
    const2 = lambda a: pl.BlockSpec(a.shape, lambda f, r: (0, 0),
                                    memory_space=pltpu.VMEM)
    smem1 = lambda a: pl.BlockSpec(a.shape, lambda f, r: (0,),
                                   memory_space=pltpu.SMEM)

    wy, wu, wv = (w.reshape(w.shape[0], R, 1, w.shape[3]) for w in words)
    in_specs = [ystrip, cstrip, cstrip, ylane, clane, clane,
                smem1(segs3[0]), smem1(segd3[0]), smem1(segs3[1]),
                smem1(segd3[1]), smem1(segs3[2]), smem1(segd3[2]),
                const2(pat_l), const2(pat_c), const2(mask_l), const2(mask_c),
                const2(lut6)]
    args = [y, u, v, wy, wu, wv, segs3[0], segd3[0], segs3[1], segd3[1],
            segs3[2], segd3[2], pat_l, pat_c, mask_l, mask_c, lut6]
    return pl.pallas_call(
        kernel,
        grid=(F, R),
        in_specs=in_specs,
        out_specs=[ystrip, cstrip, cstrip],
        out_shape=[jax.ShapeDtypeStruct(p.shape, p.dtype)
                   for p in (y, u, v)],
        scratch_shapes=[pltpu.VMEM((n_pat_l * 2, Wp), jnp.int32),
                        pltpu.VMEM((n_pat_c * n_ov_c, Wc), jnp.int32),
                        pltpu.VMEM((n_pat_c * n_ov_c, Wc), jnp.int32)],
    )(*args)


def make_step(tables, *, skip=frozenset(), reorder=False, prep_only=False,
              lattice_only=False):
    from versatilefilmgrain_tpu.ops.grain_natural import _call_meta

    meta = _call_meta(tables, 2)
    segs = jnp.asarray(tables["seg_starts"])
    segd = jnp.asarray(tables["seg_deltas"])
    pat_l = jnp.asarray(tables["pat2_luma"])
    pat_c = jnp.asarray(tables["pat2_chroma"])
    lut6 = jnp.asarray(tables["lut_bytes"])

    @jax.jit
    def step(y, u, v, bases, bases_up):
        lat = jax.vmap(
            lambda b: lfsr.state_lattice_jax(b, y.shape[1] // 16,
                                             y.shape[2] // 16))(bases)
        if lattice_only:
            s = lat[:, :1, :1].astype(jnp.uint16)
            return y ^ s, u ^ s, v ^ s
        words = _lane_words3(lat, 2, 2)
        if prep_only:
            return (y ^ words[0][:, :1, 0, :1].astype(jnp.uint16),
                    u ^ words[1][:, :1, 0, :1].astype(jnp.uint16),
                    v ^ words[2][:, :1, 0, :1].astype(jnp.uint16))
        return _fused_abl((y, u, v), words, [segs[c] for c in range(3)],
                          [segd[c] for c in range(3)], pat_l, pat_c, lut6,
                          meta=meta, skip=skip, reorder=reorder)

    return step


def run_config(kind: str, state0, F):
    if kind == "default":
        regs = _default_regs()
    else:
        fname = {"sei_ar": "fgs_sei_ar_test1.cfg",
                 "afgs1": "fgs_afgs1_test1.cfg"}[kind]
        regs = _regs_from_cfg(os.path.join(CFGDIR, fname))
    tables = natural_tables(regs)
    R, C = H // 16, W // 16
    bases, bases_up = _frame_bases(regs, F, R, C)
    cargs = (jnp.asarray(bases), jnp.asarray(bases_up))

    def ms(fps):
        return 1e3 * F / fps

    print(f"\n=== config {kind}: n_pat_l="
          f"{tables['pat2_luma'].shape[0] // 18}, "
          f"lut_mode={tables['lut_mode']} ===", flush=True)
    results = {}
    variants = [
        ("full", dict()),
        ("reorder", dict(reorder=True)),
        ("prep-only", dict(prep_only=True)),
        ("prep-lattice", dict(lattice_only=True)),
        ("no-lut", dict(skip=frozenset({"lut"}))),
        ("no-mux", dict(skip=frozenset({"mux"}))),
        ("no-blend", dict(skip=frozenset({"blend"}))),
        ("no-deblock", dict(skip=frozenset({"deblock"}))),
        ("no-epilogue", dict(skip=frozenset({"epilogue"}))),
        ("no-dot", dict(skip=frozenset({"dot"}))),
        ("no-dot-onehot", dict(skip=frozenset({"dot", "onehot"}))),
        ("no-chroma", dict(skip=frozenset({"chroma"}))),
    ]
    for name, kw in variants:
        step = make_step(tables, **kw)
        fps = _chain_fps(step, state0, cargs)
        results[name] = fps
        print(f"{name:16s} {fps:8.1f} fps  {ms(fps):6.3f} ms/step",
              flush=True)

    full = ms(results["full"])
    print(f"\nbudget [{kind}] (delta vs full, ms/step of {F} frames):")
    for name, fps in results.items():
        if name == "full":
            continue
        print(f"  {name:16s} {full - ms(fps):+7.3f} ms")

    # production engine cross-check (same numbers expected as `full`)
    from versatilefilmgrain_tpu.ops.grain_natural import make_batched_step
    prod = make_batched_step(tables, height=H, width=W, bs=2, csubx=2,
                             csuby=2)
    print(f"production engine [{kind}]: "
          f"{_chain_fps(prod, state0, cargs):.1f} fps", flush=True)
    return results


def main():
    kinds = [a for a in sys.argv[1:] if not a.startswith("--")] \
        or ["default", "sei_ar", "afgs1"]
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
    for kind in kinds:
        run_config(kind, state0, F)


if __name__ == "__main__":
    main()

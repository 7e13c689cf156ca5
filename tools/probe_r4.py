"""Round-4 perf attribution + optimization A/B for the natural engine.

Chained-dependency timing (bench.py methodology) in ONE process so variants
are comparable to ~0.01 ms.  Two flaws in the round-3 attribution are fixed
here:

* ablation variants consume every intermediate they build (a 1-row dot over
  the one-hot, adding candidate rows into the output) so Mosaic cannot
  dead-code-eliminate the piece being measured;
* chain spans adapt until the differenced device work is >= MIN_SPAN so the
  tunnel RTT jitter (tens of ms) cannot dominate cheap variants.

Usage: python3 tools/probe_r4.py [attr] [ab] [chroma]
"""

from __future__ import annotations

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_vfg")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from versatilefilmgrain_tpu.ops import lfsr
from versatilefilmgrain_tpu.ops.grain_natural import (
    _lane_arrays, _plane_pallas, _mux, natural_tables, _PACK_SHIFT)
from __graft_entry__ import _default_regs, _frame_bases

H, W = 2160, 3840
F = 8
R, C = H // 16, W // 16
MIN_SPAN = 0.4
N1 = 4


def chain_ms(step, state0):
    def chain(n):
        state = state0
        t0 = time.perf_counter()
        for _ in range(n):
            state = step(state)
        _ = int(jax.tree_util.tree_leaves(state)[0].reshape(-1)[0])
        return time.perf_counter() - t0

    chain(1)
    n2 = 16
    for _ in range(8):
        t1 = chain(N1)
        t2 = chain(n2)
        if t2 - t1 >= MIN_SPAN or n2 >= 2048:
            break
        n2 = min(2048, 2 * n2)
    slopes = []
    for _ in range(3):
        t1 = chain(N1)
        t2 = chain(n2)
        slopes.append((t2 - t1) / (n2 - N1))
    return 1e3 * sorted(slopes)[1]


def report(name, ms):
    print(f"{name:32s} {ms:8.3f} ms/step  {1e3 * F / ms:8.1f} fps",
          flush=True)


regs = _default_regs()
bases, _ = _frame_bases(regs, F, R, C)
bases = jnp.asarray(bases)
rng = np.random.default_rng(0)
y = jnp.asarray(rng.integers(0, 1024, (F, R * 16, C * 16), np.uint16))
u = jnp.asarray(rng.integers(0, 1024, (F, R * 8, C * 8), np.uint16))
v = jnp.asarray(rng.integers(0, 1024, (F, R * 8, C * 8), np.uint16))
nt = natural_tables(regs)
segs = jnp.asarray(nt["seg_starts"])
segd = jnp.asarray(nt["seg_deltas"])
nseg = int(nt["seg_starts"].shape[1])
ss = nt["scale_shift"]
pat_l = jnp.asarray(nt["pat2_luma"])
pat_c = jnp.asarray(nt["pat2_chroma"])

lat = jax.vmap(lambda x: lfsr.state_lattice_jax(x, R, C))(bases)
t_l, sg_l = _lane_arrays(lat, 0, 2, 2)
t_l, sg_l = jax.device_put(t_l), jax.device_put(sg_l)
t_u, sg_u = map(jax.device_put, _lane_arrays(lat, 1, 2, 2))
t_v, sg_v = map(jax.device_put, _lane_arrays(lat, 2, 2, 2))


# ---------------------------------------------------------------------------
# Part 1: non-DCE-able ablation of the luma kernel
# ---------------------------------------------------------------------------

def abl_kernel(x_ref, t_ref, sign_ref, segs_ref, segd_ref, pat_ref,
               out_ref, carry_ref, *, stage, onehot_dtype=jnp.int8,
               iota_dtype=jnp.int32):
    bh, bw, n_ov, K, bs, Wp = 16, 16, 2, 768, 2, W
    n_pat, rows = 8, 18
    r0 = pl.program_id(1)
    x = x_ref[0].astype(jnp.int32)
    extra = 0

    inten = (x >> bs) & 0xFF
    if stage >= 1:   # LUT compare/add chain
        acc = jnp.zeros_like(inten)
        for k in range(nseg):
            acc = acc + jnp.where(inten >= segs_ref[k], segd_ref[k], 0)
        sc = acc & ((1 << _PACK_SHIFT) - 1)
        pi = acc >> _PACK_SHIFT
        extra = extra + sc + pi
    if stage >= 2:   # one-hot build (consumed by a 1-pattern-row dot)
        t = t_ref[0, 0].astype(iota_dtype)
        kio = jax.lax.broadcasted_iota(iota_dtype, (K, Wp), 0)
        onehot = (kio == t).astype(onehot_dtype)
        if stage == 2:
            tiny = jax.lax.dot_general(
                pat_ref[0:8], onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            extra = extra + tiny[0:1]
    if stage >= 3:   # the full dot
        cand = jax.lax.dot_general(
            pat_ref[:], onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        if stage == 3:
            extra = extra + cand[0:bh]
    if stage >= 4:   # 8-way mux
        P = _mux([cand[p * rows:p * rows + bh] for p in range(n_pat)], pi)
        if stage == 4:
            extra = extra + P
    if stage >= 5:   # sign + carry + vertical blend
        sg = sign_ref[0, 0]
        P = P * sg
        up_prev = carry_ref[:]
        Pu = _mux([up_prev[p * n_ov:(p + 1) * n_ov] for p in range(n_pat)],
                  pi[:n_ov])
        carry_ref[:] = jnp.concatenate(
            [cand[p * rows + bh:(p + 1) * rows] for p in range(n_pat)],
            axis=0) * sg
        row = jax.lax.broadcasted_iota(jnp.int32, (n_ov, Wp), 0)
        oc1 = jnp.where(row < 1, 12, 24)
        oc2 = jnp.where(row < 1, 24, 12)
        blend = (P[:n_ov] * oc1 + Pu * oc2 + 16) >> 5
        top = jnp.where(r0 > 0, blend, P[:n_ov])
        P = jnp.concatenate([top, P[n_ov:]], axis=0)
        if stage == 5:
            extra = extra + P
    if stage >= 6:   # h-deblock
        left = pltpu.roll(P, shift=1, axis=1)
        right = pltpu.roll(P, shift=Wp - 1, axis=1)
        sm = (left + 3 * P + right + 2) >> 2
        lane = jax.lax.broadcasted_iota(jnp.int32, (bh, Wp), 1)
        i = lane & (bw - 1)
        mask = ((i == 0) & (lane > 0)) | ((i == bw - 1) & (lane < Wp - 1))
        P = jnp.where(mask, sm, P)
        extra = extra + P
    if stage >= 7:   # scale/round/add/clip (the real epilogue; extra unused)
        g = (sc * P + (1 << (ss - 1))) >> ss
        res = jnp.clip(x + g, 0, 1023 << bs)
        out_ref[0] = res.astype(out_ref.dtype)
        return
    res = jnp.clip(x + extra, 0, 1023 << bs)
    out_ref[0] = res.astype(out_ref.dtype)


def luma_variant(kern):
    strip = pl.BlockSpec((1, 16, W), lambda f, r: (f, r, 0),
                         memory_space=pltpu.VMEM)
    perlane = pl.BlockSpec((1, 1, 1, W), lambda f, r: (f, r, 0, 0),
                           memory_space=pltpu.VMEM)
    const2 = pl.BlockSpec(pat_l.shape, lambda f, r: (0, 0),
                          memory_space=pltpu.VMEM)
    smem1 = lambda a: pl.BlockSpec(a.shape, lambda f, r: (0,),
                                   memory_space=pltpu.SMEM)

    @jax.jit
    def vstep(s):
        (yy,) = s
        o = pl.pallas_call(
            kern, grid=(F, R),
            in_specs=[strip, perlane, perlane, smem1(segs[0]),
                      smem1(segd[0]), const2],
            out_specs=strip,
            out_shape=jax.ShapeDtypeStruct(yy.shape, yy.dtype),
            scratch_shapes=[pltpu.VMEM((16, W), jnp.int32)],
        )(yy, t_l, sg_l, segs[0], segd[0], pat_l)
        return (o,)

    return vstep


def part_attr():
    print("== attribution (luma, non-DCE ablation) ==", flush=True)
    names = ["0 io_only", "1 +lut", "2 +onehot(tinydot)", "3 +dot",
             "4 +mux", "5 +sign_carry_blend", "6 +deblock", "7 full"]
    for stage, name in enumerate(names):
        kern = functools.partial(abl_kernel, stage=stage)
        report(f"luma {name}", chain_ms(luma_variant(kern), (y,)))

    # production kernels for cross-checking against the ablation's stage 7
    @jax.jit
    def luma_prod(s):
        (yy,) = s
        return (_plane_pallas(yy, t_l, sg_l, segs[0], segd[0], pat_l,
                              bh=16, bw=16, n_ov=2, nseg=nseg, bs=2,
                              scale_shift=ss, imin=nt["y_min"],
                              imax=nt["y_max"]),)

    report("luma production", chain_ms(luma_prod, (y,)))

    @jax.jit
    def chroma_pair(s):
        uu, vv = s
        ou = _plane_pallas(uu, t_u, sg_u, segs[1], segd[1], pat_c,
                           bh=8, bw=8, n_ov=1, nseg=nseg, bs=2,
                           scale_shift=ss, imin=nt["c_min"], imax=nt["c_max"])
        ov = _plane_pallas(vv, t_v, sg_v, segs[2], segd[2], pat_c,
                           bh=8, bw=8, n_ov=1, nseg=nseg, bs=2,
                           scale_shift=ss, imin=nt["c_min"], imax=nt["c_max"])
        return (ou, ov)

    report("chroma pair production", chain_ms(chroma_pair, (u, v)))

    @jax.jit
    def prep_step(s):
        (b,) = s
        la = jax.vmap(lambda q: lfsr.state_lattice_jax(q, R, C))(b)
        outs = []
        for c in (0, 1, 2):
            t, sg = _lane_arrays(la, c, 2, 2)
            outs.append(t.sum() + sg.sum())
        return (b + jnp.uint32(outs[0] + outs[1] + outs[2]),)

    report("xla prep (lattice+t/sign)", chain_ms(prep_step, (bases,)))

    from versatilefilmgrain_tpu.ops.grain_natural import make_batched_step
    full = make_batched_step(nt, height=H, width=W, bs=2, csubx=2, csuby=2)

    @jax.jit
    def full_step(s):
        yy, uu, vv = s
        return full(yy, uu, vv, bases, None)

    report("FULL natural step", chain_ms(full_step, (y, u, v)))


# ---------------------------------------------------------------------------
# Part 2: luma A/B variants
# ---------------------------------------------------------------------------

def part_ab():
    print("== luma A/B ==", flush=True)
    # (a) int16 iota/compare for the one-hot (t < 768 fits int16)
    kern = functools.partial(abl_kernel, stage=7, iota_dtype=jnp.int16)
    try:
        report("full, int16 onehot cmp", chain_ms(luma_variant(kern), (y,)))
    except Exception as e:
        print(f"  int16 onehot: {type(e).__name__}: {e}", flush=True)

    # (b) rc>1: multiple block rows per grid step (scheduler overlap)
    import versatilefilmgrain_tpu.ops.grain_natural as gn
    orig = gn._pick_rc
    for rc in (3, 5):
        gn._pick_rc = lambda R_, cap=1, rc=rc: rc if R % rc == 0 else 1

        @jax.jit
        def luma_rc(s):
            (yy,) = s
            return (_plane_pallas(yy, t_l, sg_l, segs[0], segd[0], pat_l,
                                  bh=16, bw=16, n_ov=2, nseg=nseg, bs=2,
                                  scale_shift=ss, imin=nt["y_min"],
                                  imax=nt["y_max"]),)

        report(f"luma production rc={rc}", chain_ms(luma_rc, (y,)))
        gn._pick_rc = orig


# ---------------------------------------------------------------------------
# Part 3: chroma variants
# ---------------------------------------------------------------------------

def packed_chroma_kernel(x_ref, t_ref, sign_ref, segs_ref, segd_ref, pat_ref,
                         out_ref, carry_ref, *, nseg_c, Wsub):
    """U|V lane-packed chroma strip (n_pat=1 fast path), 4:2:0 shapes."""
    bh, bw, n_ov, K, bs = 8, 8, 1, 384, 2
    Wp = 2 * Wsub
    r0 = pl.program_id(1)
    x = x_ref[0].astype(jnp.int32)
    inten = (x >> bs) & 0xFF
    acc = jnp.zeros_like(inten)
    for k in range(nseg_c):
        acc = acc + jnp.where(inten >= segs_ref[k:k + 1, :], segd_ref[k:k + 1, :], 0)
    sc = acc & ((1 << _PACK_SHIFT) - 1)

    t = t_ref[0, 0]
    kio = jax.lax.broadcasted_iota(jnp.int32, (K, Wp), 0)
    onehot = (kio == t).astype(jnp.int8)
    cand = jax.lax.dot_general(pat_ref[:], onehot, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    sg = sign_ref[0, 0]
    P = cand[0:bh] * sg
    Pu = carry_ref[:]
    carry_ref[:] = cand[bh:bh + n_ov] * sg
    blend = (P[:n_ov] * 20 + Pu * 20 + 16) >> 5
    top = jnp.where(r0 > 0, blend, P[:n_ov])
    P = jnp.concatenate([top, P[n_ov:]], axis=0)

    left = pltpu.roll(P, shift=1, axis=1)
    right = pltpu.roll(P, shift=Wp - 1, axis=1)
    sm = (left + 3 * P + right + 2) >> 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (bh, Wp), 1)
    i = lane & (bw - 1)
    xin = lane % Wsub
    mask = ((i == 0) & (xin > 0)) | ((i == bw - 1) & (xin < Wsub - 1))
    P = jnp.where(mask, sm, P)
    g = (sc * P + (1 << (ss - 1))) >> ss
    res = jnp.clip(x + g, nt["c_min"] << bs, nt["c_max"] << bs)
    out_ref[0] = res.astype(out_ref.dtype)


def part_chroma():
    print("== chroma variants ==", flush=True)
    Wsub = W // 2
    uv = jnp.concatenate([u, v], axis=2)                    # (F, H/2, W)
    t_uv = jnp.concatenate([t_u, t_v], axis=3)
    sg_uv = jnp.concatenate([sg_u, sg_v], axis=3)
    # lane-dependent seg tables: U's chain on lanes [0,Wsub), V's on the rest
    segs_lane = jnp.concatenate(
        [jnp.broadcast_to(segs[1][:, None], (nseg, Wsub)),
         jnp.broadcast_to(segs[2][:, None], (nseg, Wsub))], axis=1)
    segd_lane = jnp.concatenate(
        [jnp.broadcast_to(segd[1][:, None], (nseg, Wsub)),
         jnp.broadcast_to(segd[2][:, None], (nseg, Wsub))], axis=1)
    nseg_c = 5

    kern = functools.partial(packed_chroma_kernel, nseg_c=nseg_c, Wsub=Wsub)
    Rc = (H // 2) // 8
    strip = pl.BlockSpec((1, 8, W), lambda f, r: (f, r, 0),
                         memory_space=pltpu.VMEM)
    perlane = pl.BlockSpec((1, 1, 1, W), lambda f, r: (f, r, 0, 0),
                           memory_space=pltpu.VMEM)
    const2 = lambda a: pl.BlockSpec(a.shape, lambda f, r: (0, 0),
                                    memory_space=pltpu.VMEM)

    @jax.jit
    def packed_step(s):
        (xuv,) = s
        o = pl.pallas_call(
            kern, grid=(F, Rc),
            in_specs=[strip, perlane, perlane, const2(segs_lane),
                      const2(segd_lane), const2(pat_c)],
            out_specs=strip,
            out_shape=jax.ShapeDtypeStruct(xuv.shape, xuv.dtype),
            scratch_shapes=[pltpu.VMEM((1, W), jnp.int32)],
        )(xuv, t_uv, sg_uv, segs_lane, segd_lane, pat_c)
        return (o,)

    report("chroma packed U|V 1 call", chain_ms(packed_step, (uv,)))

    # correctness vs production
    @jax.jit
    def chroma_pair(s):
        uu, vv = s
        ou = _plane_pallas(uu, t_u, sg_u, segs[1], segd[1], pat_c,
                           bh=8, bw=8, n_ov=1, nseg=nseg, bs=2,
                           scale_shift=ss, imin=nt["c_min"], imax=nt["c_max"])
        ov = _plane_pallas(vv, t_v, sg_v, segs[2], segd[2], pat_c,
                           bh=8, bw=8, n_ov=1, nseg=nseg, bs=2,
                           scale_shift=ss, imin=nt["c_min"], imax=nt["c_max"])
        return (ou, ov)

    (packed_out,) = packed_step((uv,))
    ou, ov = chroma_pair((u, v))
    ok = (jnp.array_equal(packed_out[:, :, :Wsub], ou)
          and jnp.array_equal(packed_out[:, :, Wsub:], ov))
    print(f"packed chroma bit-exact vs pair: {bool(ok)}", flush=True)
    report("chroma pair production", chain_ms(chroma_pair, (u, v)))


if __name__ == "__main__":
    want = set(sys.argv[1:]) or {"attr", "ab", "chroma"}
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} backend={jax.default_backend()}",
          flush=True)
    if "attr" in want:
        part_attr()
    if "ab" in want:
        part_ab()
    if "chroma" in want:
        part_chroma()


# ---------------------------------------------------------------------------
# Part 4: optimization prototypes (hoisted int16 iota compare, int16 dot
# output, fused 3-plane kernel)
# ---------------------------------------------------------------------------

def opt_kernel(x_ref, kio_ref, t_ref, sign_ref, segs_ref, segd_ref, pat_ref,
               out_ref, carry_ref, *, cand_dtype=jnp.int32, ep16=False):
    """Luma kernel with hoisted int16 iota-column compare."""
    bh, bw, n_ov, K, bs, Wp = 16, 16, 2, 768, 2, W
    n_pat, rows = 8, 18
    r0 = pl.program_id(1)
    x = x_ref[0].astype(jnp.int32)
    inten = (x >> bs) & 0xFF
    acc = jnp.zeros_like(inten)
    for k in range(nseg):
        acc = acc + jnp.where(inten >= segs_ref[k], segd_ref[k], 0)
    sc = acc & ((1 << _PACK_SHIFT) - 1)
    pi = acc >> _PACK_SHIFT

    t16 = t_ref[0, 0].astype(jnp.int16)                       # (1, Wp) int16
    kio16 = kio_ref[:, 0:1]                                   # (K, 1) int16
    onehot = (kio16 == t16).astype(jnp.int8)
    cand = jax.lax.dot_general(pat_ref[:], onehot, (((1,), (0,)), ((), ())),
                               preferred_element_type=cand_dtype)
    sg = sign_ref[0, 0]
    if ep16:
        sg = sg.astype(jnp.int16)
        pi16 = pi.astype(jnp.int16)
        P = _mux([cand[p * rows:p * rows + bh] for p in range(n_pat)],
                 pi16) * sg
        up_prev = carry_ref[:]
        Pu = _mux([up_prev[p * n_ov:(p + 1) * n_ov] for p in range(n_pat)],
                  pi16[:n_ov])
        carry_ref[:] = jnp.concatenate(
            [cand[p * rows + bh:(p + 1) * rows] for p in range(n_pat)],
            axis=0) * sg
        row = jax.lax.broadcasted_iota(jnp.int32, (n_ov, Wp), 0)
        oc1 = jnp.where(row < 1, 12, 24).astype(jnp.int16)
        oc2 = jnp.where(row < 1, 24, 12).astype(jnp.int16)
        blend = ((P[:n_ov] * oc1 + Pu * oc2 + 16).astype(jnp.int16)) >> 5
        top = jnp.where(r0 > 0, blend, P[:n_ov])
        P = jnp.concatenate([top, P[n_ov:]], axis=0)
        left = pltpu.roll(P, shift=1, axis=1)
        right = pltpu.roll(P, shift=Wp - 1, axis=1)
        sm = (left + 3 * P + right + 2) >> 2
        lane = jax.lax.broadcasted_iota(jnp.int32, (bh, Wp), 1)
        i = lane & (bw - 1)
        mask = ((i == 0) & (lane > 0)) | ((i == bw - 1) & (lane < Wp - 1))
        P = jnp.where(mask, sm, P)
        g = ((sc.astype(jnp.int16) * P + (1 << (ss - 1)))
             >> ss).astype(jnp.int32)
    else:
        P = _mux([cand[p * rows:p * rows + bh] for p in range(n_pat)],
                 pi) * sg
        up_prev = carry_ref[:]
        Pu = _mux([up_prev[p * n_ov:(p + 1) * n_ov] for p in range(n_pat)],
                  pi[:n_ov])
        carry_ref[:] = jnp.concatenate(
            [cand[p * rows + bh:(p + 1) * rows] for p in range(n_pat)],
            axis=0) * sg
        row = jax.lax.broadcasted_iota(jnp.int32, (n_ov, Wp), 0)
        oc1 = jnp.where(row < 1, 12, 24)
        oc2 = jnp.where(row < 1, 24, 12)
        blend = (P[:n_ov] * oc1 + Pu * oc2 + 16) >> 5
        top = jnp.where(r0 > 0, blend, P[:n_ov])
        P = jnp.concatenate([top, P[n_ov:]], axis=0)
        left = pltpu.roll(P, shift=1, axis=1)
        right = pltpu.roll(P, shift=Wp - 1, axis=1)
        sm = (left + 3 * P + right + 2) >> 2
        lane = jax.lax.broadcasted_iota(jnp.int32, (bh, Wp), 1)
        i = lane & (bw - 1)
        mask = ((i == 0) & (lane > 0)) | ((i == bw - 1) & (lane < Wp - 1))
        P = jnp.where(mask, sm, P)
        g = (sc * P + (1 << (ss - 1))) >> ss
    res = jnp.clip(x + g, 0, 1023 << bs)
    out_ref[0] = res.astype(out_ref.dtype)


def part_opt():
    print("== optimization prototypes (luma) ==", flush=True)
    K = 768
    kio16 = jnp.broadcast_to(
        jnp.arange(K, dtype=jnp.int16)[:, None], (K, 128))
    strip = pl.BlockSpec((1, 16, W), lambda f, r: (f, r, 0),
                         memory_space=pltpu.VMEM)
    perlane = pl.BlockSpec((1, 1, 1, W), lambda f, r: (f, r, 0, 0),
                           memory_space=pltpu.VMEM)
    const2 = lambda a: pl.BlockSpec(a.shape, lambda f, r: (0, 0),
                                    memory_space=pltpu.VMEM)
    smem1 = lambda a: pl.BlockSpec(a.shape, lambda f, r: (0,),
                                   memory_space=pltpu.SMEM)

    def mk(cand_dtype, ep16, carry_dtype):
        kern = functools.partial(opt_kernel, cand_dtype=cand_dtype, ep16=ep16)

        @jax.jit
        def vstep(s):
            (yy,) = s
            o = pl.pallas_call(
                kern, grid=(F, R),
                in_specs=[strip, const2(kio16), perlane, perlane,
                          smem1(segs[0]), smem1(segd[0]), const2(pat_l)],
                out_specs=strip,
                out_shape=jax.ShapeDtypeStruct(yy.shape, yy.dtype),
                scratch_shapes=[pltpu.VMEM((16, W), carry_dtype)],
            )(yy, kio16, t_l, sg_l, segs[0], segd[0], pat_l)
            return (o,)

        return vstep

    # production path for reference output
    @jax.jit
    def luma_prod(s):
        (yy,) = s
        return (_plane_pallas(yy, t_l, sg_l, segs[0], segd[0], pat_l,
                              bh=16, bw=16, n_ov=2, nseg=nseg, bs=2,
                              scale_shift=ss, imin=nt["y_min"],
                              imax=nt["y_max"]),)

    (ref_out,) = luma_prod((y,))

    for name, cd, ep16, cdt in (
            ("hoist16 cmp, i32 ep", jnp.int32, False, jnp.int32),
            ("hoist16 cmp, i16 dot+ep", jnp.int16, True, jnp.int16)):
        try:
            step = mk(cd, ep16, cdt)
            (o,) = step((y,))
            ok = bool(jnp.array_equal(o, ref_out))
            ms = chain_ms(step, (y,))
            report(f"luma {name} exact={ok}", ms)
        except Exception as e:
            print(f"  {name}: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__" and "opt" in sys.argv:
    part_opt()

"""Attribute the natural-engine step cost: XLA prep vs per-plane kernels."""

from __future__ import annotations

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

H, W = 2160, 3840
F = 8
R, C = H // 16, W // 16


def chain_ms(step, state0, n1=4, n2=16):
    def chain(n):
        state = state0
        t0 = time.perf_counter()
        for _ in range(n):
            state = step(state)
        _ = int(jax.tree_util.tree_leaves(state)[0].reshape(-1)[0])
        return time.perf_counter() - t0

    chain(1)
    t1 = chain(n1)
    t2 = chain(n2)
    return 1e3 * (t2 - t1) / (n2 - n1)


def main():
    from versatilefilmgrain_tpu.ops import lfsr
    from versatilefilmgrain_tpu.ops.grain_natural import (
        _lane_arrays, _plane_pallas, natural_tables)
    from __graft_entry__ import _default_regs, _frame_bases

    regs = _default_regs()
    bases, _ = _frame_bases(regs, F, R, C)
    bases = jnp.asarray(bases)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.integers(0, 1024, (F, R * 16, C * 16), np.uint16))
    u = jnp.asarray(rng.integers(0, 1024, (F, R * 8, C * 8), np.uint16))
    nt = natural_tables(regs)
    segs = jnp.asarray(nt["seg_starts"])
    segd = jnp.asarray(nt["seg_deltas"])
    nseg = int(nt["seg_starts"].shape[1])
    ss = nt["scale_shift"]

    # 1. XLA prep alone: lattice + offsets + t/sign for all 3 components,
    #    feeding back a scalar-ish dependency.
    @jax.jit
    def prep(s):
        b, = s
        lat = jax.vmap(lambda x: lfsr.state_lattice_jax(x, R, C))(b)
        outs = []
        for c in (0, 1, 2):
            t, sg = _lane_arrays(lat, c, 2, 2)
            outs.append(t.sum() + sg.sum())
        return (b + jnp.uint32(outs[0] + outs[1] + outs[2]),)

    print(f"xla_prep          {chain_ms(prep, (bases,)):8.2f} ms", flush=True)

    # 2. luma kernel alone, fixed t/sign
    lat = jax.vmap(lambda x: lfsr.state_lattice_jax(x, R, C))(bases)
    t_l, sg_l = _lane_arrays(lat, 0, 2, 2)
    t_l, sg_l = jax.device_put(t_l), jax.device_put(sg_l)
    pat_l = jnp.asarray(nt["pat2_luma"])
    pat_c = jnp.asarray(nt["pat2_chroma"])

    @jax.jit
    def luma_step(s):
        (yy,) = s
        o = _plane_pallas(yy, t_l, sg_l, segs[0], segd[0], pat_l,
                          bh=16, bw=16, n_ov=2, nseg=nseg, bs=2,
                          scale_shift=ss, imin=nt["y_min"], imax=nt["y_max"])
        return (o,)

    print(f"luma_kernel       {chain_ms(luma_step, (y,)):8.2f} ms",
          flush=True)

    # 3. chroma kernel alone (one plane)
    t_c, sg_c = _lane_arrays(lat, 1, 2, 2)

    @jax.jit
    def chroma_step(s):
        (uu,) = s
        o = _plane_pallas(uu, t_c, sg_c, segs[1], segd[1], pat_c,
                          bh=8, bw=8, n_ov=1, nseg=nseg, bs=2,
                          scale_shift=ss, imin=nt["c_min"], imax=nt["c_max"])
        return (o,)

    print(f"chroma_kernel_1pl {chain_ms(chroma_step, (u,)):8.2f} ms",
          flush=True)

    # 4. luma kernel variants: skip pieces to attribute in-kernel cost.
    from versatilefilmgrain_tpu.ops.grain_natural import _mux8, _PACK_SHIFT
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def var_kernel(x_ref, t_ref, sign_ref, segs_ref, segd_ref, pat_ref,
                   out_ref, carry_ref, *, mode):
        bh, bw, n_ov, K, bs2, Wp = 16, 16, 2, 768, 2, W
        rows = bh + n_ov
        x = x_ref[0].astype(jnp.int32)
        inten = (x >> bs2) & 0xFF
        acc = jnp.zeros_like(inten)
        if mode >= 1:
            for k in range(nseg):
                acc = acc + jnp.where(inten >= segs_ref[k], segd_ref[k], 0)
        sc = acc & ((1 << _PACK_SHIFT) - 1)
        pi = acc >> _PACK_SHIFT
        if mode >= 2:
            t = t_ref[0, 0]
            kio = jax.lax.broadcasted_iota(jnp.int32, (K, Wp), 0)
            onehot = (kio == t).astype(jnp.int8)
        if mode >= 3:
            cand = jax.lax.dot_general(
                pat_ref[:], onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            cand = cand * sign_ref[0, 0]
        else:
            cand = (inten * 3)[:1]  # dummy
        if mode >= 4:
            P = _mux8([cand[p * rows:p * rows + bh] for p in range(8)], pi)
        else:
            P = x + sc + pi + cand.sum()
        res = jnp.clip(x + P, 0, 1023 << 2)
        out_ref[0] = res.astype(out_ref.dtype)

    for mode, name in ((0, "io_only"), (1, "io+lut"), (2, "io+lut+onehot"),
                       (3, "+dot"), (4, "+mux")):
        kern = functools.partial(var_kernel, mode=mode)
        strip = pl.BlockSpec((1, 16, W), lambda f, r: (f, r, 0),
                             memory_space=pltpu.VMEM)
        perlane = pl.BlockSpec((1, 1, 1, W), lambda f, r: (f, r, 0, 0),
                               memory_space=pltpu.VMEM)
        const2 = pl.BlockSpec(pat_l.shape, lambda f, r: (0, 0),
                              memory_space=pltpu.VMEM)
        smem1 = lambda a: pl.BlockSpec(a.shape, lambda f, r: (0,),
                                       memory_space=pltpu.SMEM)

        @jax.jit
        def vstep(s, kern=kern, strip=strip, perlane=perlane, const2=const2):
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

        print(f"luma_{name:<13s} {chain_ms(vstep, (y,)):8.2f} ms",
              flush=True)


if __name__ == "__main__" and "--bisect" not in sys.argv:
    main()


def bisect():
    """Bisect the composition gap: which combination reproduces 15.5 ms?"""
    from versatilefilmgrain_tpu.ops import lfsr
    from versatilefilmgrain_tpu.ops.grain_natural import (
        _lane_arrays, _plane_pallas, natural_tables)
    from __graft_entry__ import _default_regs, _frame_bases

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

    lat0 = jax.vmap(lambda x: lfsr.state_lattice_jax(x, R, C))(bases)
    pre = {}
    for c in (0, 1, 2):
        t, sg = _lane_arrays(lat0, c, 2, 2)
        pre[c] = (jax.device_put(t), jax.device_put(sg))

    def luma(yy, t, sg):
        return _plane_pallas(yy, t, sg, segs[0], segd[0], pat_l,
                             bh=16, bw=16, n_ov=2, nseg=nseg, bs=2,
                             scale_shift=ss, imin=nt["y_min"],
                             imax=nt["y_max"])

    def chroma(pp, t, sg, c):
        return _plane_pallas(pp, t, sg, segs[c], segd[c], pat_c,
                             bh=8, bw=8, n_ov=1, nseg=nseg, bs=2,
                             scale_shift=ss, imin=nt["c_min"],
                             imax=nt["c_max"])

    # A: 3 kernels, precomputed t/sign
    @jax.jit
    def stepA(s):
        yy, uu, vv = s
        return (luma(yy, *pre[0]), chroma(uu, *pre[1], 1),
                chroma(vv, *pre[2], 2))

    print(f"A 3kernels_pre_tsign  {chain_ms(stepA, (y, u, v)):8.2f} ms",
          flush=True)

    # B: in-jit prep + 3 kernels (full step equivalent)
    @jax.jit
    def stepB(s):
        yy, uu, vv, b = s
        lat = jax.vmap(lambda x: lfsr.state_lattice_jax(x, R, C))(b)
        outs = []
        for c, pp in ((0, yy), (1, uu), (2, vv)):
            t, sg = _lane_arrays(lat, c, 2, 2)
            if c == 0:
                outs.append(luma(pp, t, sg))
            else:
                outs.append(chroma(pp, t, sg, c))
        return (*outs, b)

    print(f"B full_in_jit         {chain_ms(stepB, (y, u, v, bases)):8.2f} ms",
          flush=True)

    # C: luma only, precomputed
    @jax.jit
    def stepC(s):
        (yy,) = s
        return (luma(yy, *pre[0]),)

    print(f"C luma_pre            {chain_ms(stepC, (y,)):8.2f} ms", flush=True)

    # D: luma + in-jit prep for its t/sign
    @jax.jit
    def stepD(s):
        yy, b = s
        lat = jax.vmap(lambda x: lfsr.state_lattice_jax(x, R, C))(b)
        t, sg = _lane_arrays(lat, 0, 2, 2)
        return (luma(yy, t, sg), b)

    print(f"D luma_injit_prep     {chain_ms(stepD, (y, bases)):8.2f} ms",
          flush=True)

    # E: 2 chroma kernels, precomputed
    @jax.jit
    def stepE(s):
        uu, vv = s
        return (chroma(uu, *pre[1], 1), chroma(vv, *pre[2], 2))

    print(f"E 2chroma_pre         {chain_ms(stepE, (u, v)):8.2f} ms",
          flush=True)


if __name__ == "__main__" and "--bisect" in sys.argv:
    bisect()

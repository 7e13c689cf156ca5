"""Component-level perf probe for the Pallas engine on the real TPU.

Chained-dependency timing (same methodology as bench.py): each variant is a
jitted step whose output feeds back as its input; one dependent scalar fetch
at the end; t_iter from differencing two chain lengths cancels the tunnel
RTT.  Prints ms/frame for each component so kernel work targets the real
bottleneck instead of a guess.

Usage:  python3 tools/perf_probe.py [variants...]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

H, W = 2160, 3840
F = 8
N1, N2 = 4, 16


def chain_ms(step, state0, nwarm=1):
    """ms per step invocation via chain differencing."""
    def chain(n):
        state = state0
        t0 = time.perf_counter()
        for _ in range(n):
            state = step(state)
        leaf = jax.tree_util.tree_leaves(state)[0]
        _ = int(leaf.reshape(-1)[0])
        return time.perf_counter() - t0

    for _ in range(nwarm):
        chain(1)
    t1 = chain(N1)
    t2 = chain(N2)
    return 1e3 * (t2 - t1) / (N2 - N1)


def main():
    global jax
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from versatilefilmgrain_tpu.ops import lfsr
    from versatilefilmgrain_tpu.ops.grain_pallas import (
        pallas_tables, add_grain_batch_pallas, _tile, _untile,
        _offset_arrays, _plane_pallas)
    from __graft_entry__ import _default_regs, _frame_bases

    want = set(sys.argv[1:]) or None
    regs = _default_regs()
    R, C = H // 16, W // 16
    bases, bases_up = _frame_bases(regs, F, R, C)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.integers(0, 1024, (F, R * 16, C * 16), np.uint16))
    u = jnp.asarray(rng.integers(0, 1024, (F, R * 8, C * 8), np.uint16))
    v = jnp.asarray(rng.integers(0, 1024, (F, R * 8, C * 8), np.uint16))
    b = jnp.asarray(bases)
    bu = jnp.asarray(bases_up)
    pt = pallas_tables(regs)

    res = {}

    def run(name, step, state0):
        if want and name not in want:
            return
        ms = chain_ms(step, state0)
        res[name] = ms
        print(f"{name:28s} {ms:8.2f} ms/step  {1e3 * F / ms:8.1f} fps",
              flush=True)

    # 1. pure copy (roofline)
    @jax.jit
    def copy_step(s):
        y, u, v = s
        return (y ^ jnp.uint16(1), u ^ jnp.uint16(1), v ^ jnp.uint16(1))

    run("copy", copy_step, (y, u, v))

    # 2. full pallas step
    @jax.jit
    def full_step(s):
        yy, uu, vv = s
        return add_grain_batch_pallas(yy, uu, vv, b, bu, pt, height=H,
                                      width=W, bs=2, csubx=2, csuby=2)

    run("pallas_full", full_step, (y, u, v))

    # 3. tile+untile transposes only (no kernel)
    @jax.jit
    def tile_step(s):
        yy, uu, vv = s
        a = _untile(_tile(yy, F, R, 16, C, 16), F, R, 16, C, 16)
        bb = _untile(_tile(uu, F, R, 8, C, 8), F, R, 8, C, 8)
        cc = _untile(_tile(vv, F, R, 8, C, 8), F, R, 8, C, 8)
        return (a ^ jnp.uint16(1), bb ^ jnp.uint16(1), cc ^ jnp.uint16(1))

    run("tile_untile", tile_step, (y, u, v))

    # 4. lattice + offsets preamble only
    @jax.jit
    def lat_step(s):
        yy, uu, vv = s
        lat = jax.vmap(lambda q: lfsr.state_lattice_jax(q, R, C))(b)
        row0u = jax.vmap(lambda q: lfsr.state_lattice_jax(q, 1, C))(bu)
        lat_up = jnp.concatenate([row0u, lat[:, :-1]], axis=1)
        acc = 0
        for c in range(3):
            widx, sign, widxu, signu = _offset_arrays(lat, lat_up, c, 2, 2)
            acc = acc + widx.sum() + sign.sum() + widxu.sum() + signu.sum()
        mark = (acc & 1).astype(jnp.uint16)
        return (yy ^ mark, uu ^ mark, vv ^ mark)

    run("lattice_offsets", lat_step, (y, u, v))

    # 5. kernel only, pre-tiled planes (keeps state tiled; no transposes)
    lat0 = jax.vmap(lambda q: lfsr.state_lattice_jax(q, R, C))(b)
    row0u0 = jax.vmap(lambda q: lfsr.state_lattice_jax(q, 1, C))(bu)
    lat_up0 = jnp.concatenate([row0u0, lat0[:, :-1]], axis=1)
    segs = jnp.asarray(pt["seg_starts"])
    segd = jnp.asarray(pt["seg_deltas"])
    nseg = int(pt["seg_starts"].shape[1])
    offs = [_offset_arrays(lat0, lat_up0, c, 2, 2) for c in range(3)]
    offs = jax.device_put(offs)
    Ll = jnp.asarray(pt["L_luma"])
    Llu = jnp.asarray(pt["L_luma_up"])
    Lc = jnp.asarray(pt["L_chroma"])
    Lcu = jnp.asarray(pt["L_chroma_up"])

    def kern_plane(xt, c):
        widx, sign, widxu, signu = offs[c]
        if c == 0:
            return _plane_pallas(xt, widx, sign, widxu, signu,
                                 segs[0], segd[0], Ll, Llu,
                                 bh=16, bw=16, n_ov=2, suby=1, nseg=nseg,
                                 bs=2, scale_shift=pt["scale_shift"],
                                 imin=pt["y_min"], imax=pt["y_max"])
        return _plane_pallas(xt, widx, sign, widxu, signu,
                             segs[c], segd[c], Lc, Lcu,
                             bh=8, bw=8, n_ov=1, suby=2, nseg=nseg,
                             bs=2, scale_shift=pt["scale_shift"],
                             imin=pt["c_min"], imax=pt["c_max"])

    yt0 = jax.jit(lambda a: _tile(a, F, R, 16, C, 16))(y)
    ut0 = jax.jit(lambda a: _tile(a, F, R, 8, C, 8))(u)
    vt0 = jax.jit(lambda a: _tile(a, F, R, 8, C, 8))(v)

    @jax.jit
    def kern_step(s):
        yt, ut, vt = s
        return (kern_plane(yt, 0), kern_plane(ut, 1), kern_plane(vt, 2))

    run("kernel_only_all", kern_step, (yt0, ut0, vt0))

    @jax.jit
    def kern_luma(s):
        (yt,) = s
        return (kern_plane(yt, 0),)

    run("kernel_only_luma", kern_luma, (yt0,))

    # 5b. tile -> kernel(static offsets) -> untile, natural-state chained
    @jax.jit
    def tku_step(s):
        yy, uu, vv = s
        yt = _tile(yy, F, R, 16, C, 16)
        ut = _tile(uu, F, R, 8, C, 8)
        vt = _tile(vv, F, R, 8, C, 8)
        yo = kern_plane(yt, 0)
        uo = kern_plane(ut, 1)
        vo = kern_plane(vt, 2)
        return (_untile(yo, F, R, 16, C, 16),
                _untile(uo, F, R, 8, C, 8),
                _untile(vo, F, R, 8, C, 8))

    run("tile_kernel_untile", tku_step, (y, u, v))

    # 5c. full but with the lattice/offsets precomputed (static)
    @jax.jit
    def full_static_off(s):
        yy, uu, vv = s
        return tku_step((yy, uu, vv))

    # 5d. luma kernel on pre-tiled input, grid chunked over rows is covered
    # by kernel_only_luma; also measure luma in natural layout incl tiles
    @jax.jit
    def tku_luma(s):
        (yy,) = s
        yt = _tile(yy, F, R, 16, C, 16)
        return (_untile(kern_plane(yt, 0), F, R, 16, C, 16),)

    run("tile_kernel_untile_luma", tku_luma, (y,))

    # 6. XLA fast engine for contrast
    from versatilefilmgrain_tpu.ops.grain_fast import (
        add_grain_frame_fast, fast_args, fast_tables)
    ft = fast_tables(regs)
    fa = fast_args(ft)
    fn = functools.partial(add_grain_frame_fast, height=H, width=W, bs=2,
                           csubx=2, csuby=2)
    fast_inner = jax.jit(jax.vmap(fn, in_axes=(0, 0, 0, 0, 0) + (None,) * 11))

    @jax.jit
    def fast_step(s):
        yy, uu, vv = s
        return fast_inner(yy, uu, vv, b, bu, *fa)

    run("xla_fast", fast_step, (y, u, v))

    print("---")
    for k, v_ in sorted(res.items(), key=lambda kv: -kv[1]):
        print(f"{k:28s} {v_:8.2f} ms")


if __name__ == "__main__":
    main()

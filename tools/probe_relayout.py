"""Can Mosaic relayout natural (16, W) <-> tiled (256, C) in-kernel, and at
what cost?  Chained timing on the real TPU."""

from __future__ import annotations

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 2160, 3840
F = 8
R, C = H // 16, W // 16
N1, N2 = 4, 16


def chain_ms(step, state0):
    def chain(n):
        state = state0
        t0 = time.perf_counter()
        for _ in range(n):
            state = step(state)
        _ = int(jax.tree_util.tree_leaves(state)[0].reshape(-1)[0])
        return time.perf_counter() - t0

    chain(1)
    t1 = chain(N1)
    t2 = chain(N2)
    return 1e3 * (t2 - t1) / (N2 - N1)


def _passthrough_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] ^ jnp.uint16(1)


def _relayout_kernel(x_ref, o_ref, *, bh, bw, c):
    # natural (1, bh, c*bw) -> tiled (bh*bw, c) -> back
    x = x_ref[0]                                   # (bh, c*bw)
    t = x.reshape(bh, c, bw).transpose(0, 2, 1).reshape(bh * bw, c)
    t = t ^ jnp.uint16(1)
    o_ref[0] = t.reshape(bh, bw, c).transpose(0, 2, 1).reshape(bh, c * bw)


def _relayout_rows_kernel(x_ref, o_ref, *, bh, bw, c, rchunk):
    x = x_ref[0]                                   # (rchunk*bh, c*bw)
    t = (x.reshape(rchunk * bh, c, bw).transpose(0, 2, 1)
         .reshape(rchunk * bh * bw, c))
    t = t ^ jnp.uint16(1)
    o_ref[0] = (t.reshape(rchunk * bh, bw, c).transpose(0, 2, 1)
                .reshape(rchunk * bh, c * bw))


def main():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.integers(0, 1024, (F, H, W), np.uint16))

    # baseline: natural-in natural-out passthrough kernel, grid (F, R)
    spec = pl.BlockSpec((1, 16, W), lambda f, r: (f, r, 0),
                        memory_space=pltpu.VMEM)

    @jax.jit
    def pass_step(s):
        (yy,) = s
        o = pl.pallas_call(
            _passthrough_kernel,
            grid=(F, R),
            in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(yy.shape, yy.dtype),
        )(yy)
        return (o,)

    print(f"pallas_passthrough    {chain_ms(pass_step, (y,)):8.2f} ms",
          flush=True)

    # in-kernel relayout roundtrip
    kern = functools.partial(_relayout_kernel, bh=16, bw=16, c=C)

    @jax.jit
    def rel_step(s):
        (yy,) = s
        o = pl.pallas_call(
            kern,
            grid=(F, R),
            in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(yy.shape, yy.dtype),
        )(yy)
        return (o,)

    try:
        yy = rel_step((y,))[0]
        # correctness: must equal xor 1
        assert jnp.array_equal(yy, y ^ jnp.uint16(1)), "relayout wrong"
        print(f"pallas_relayout       {chain_ms(rel_step, (y,)):8.2f} ms",
              flush=True)
    except Exception as e:
        print(f"pallas_relayout FAILED: {type(e).__name__}: {e}",
              flush=True)

    # chunked: RCHUNK block rows per grid step
    for rchunk in (5, 15):
        kc = functools.partial(_relayout_rows_kernel, bh=16, bw=16, c=C,
                               rchunk=rchunk)
        specc = pl.BlockSpec((1, 16 * rchunk, W),
                             lambda f, r: (f, r, 0),
                             memory_space=pltpu.VMEM)

        @jax.jit
        def relc_step(s, kc=kc, specc=specc, rchunk=rchunk):
            (yy,) = s
            o = pl.pallas_call(
                kc,
                grid=(F, R // rchunk),
                in_specs=[specc], out_specs=specc,
                out_shape=jax.ShapeDtypeStruct(yy.shape, yy.dtype),
            )(yy)
            return (o,)

        try:
            yy = relc_step((y,))[0]
            assert jnp.array_equal(yy, y ^ jnp.uint16(1))
            print(f"pallas_relayout_r{rchunk:<3d} "
                  f"{chain_ms(relc_step, (y,)):8.2f} ms", flush=True)
        except Exception as e:
            print(f"pallas_relayout_r{rchunk} FAILED: "
                  f"{type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()

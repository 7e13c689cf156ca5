"""Probe: in-kernel relayout via a free 5D XLA view + batched last-two-dim
transpose.  The XLA-side reshape (F, R*16, C*16) -> (F, R, 16, C, 16) is a
pure view (no data movement); the kernel block arrives as (16, C, 16) and the
in-kernel op is transpose(0, 2, 1) + leading-dim collapse -- no lane-splitting
reshape, which Mosaic rejects.  Measures the roundtrip cost on the real TPU.
"""

from __future__ import annotations

import functools
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


def _kernel_5d(x_ref, o_ref, *, bh, bw, c):
    # block (1, 1, bh, c, bw): natural layout view
    x = x_ref[0, 0]                              # (bh, c, bw)
    t = x.transpose(0, 2, 1)                     # (bh, bw, c)
    t = t.reshape(bh * bw, c)                    # leading collapse
    t = t ^ jnp.uint16(1)
    # back: (bh*bw, c) -> (bh, bw, c) leading split -> transpose -> 5d out
    o_ref[0, 0] = t.reshape(bh, bw, c).transpose(0, 2, 1)


def _kernel_5d_notr(x_ref, o_ref, *, bh, bw, c):
    # control: same 5D view blocks, no transpose at all
    o_ref[0, 0] = x_ref[0, 0] ^ jnp.uint16(1)


def main():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.integers(0, 1024, (F, H, W), np.uint16))

    spec5 = pl.BlockSpec((1, 1, 16, C, 16), lambda f, r: (f, r, 0, 0, 0),
                         memory_space=pltpu.VMEM)

    for name, kern in (("5d_passthrough", _kernel_5d_notr),
                       ("5d_transpose  ", _kernel_5d)):
        k = functools.partial(kern, bh=16, bw=16, c=C)

        @jax.jit
        def step(s, k=k):
            (yy,) = s
            y5 = yy.reshape(F, R, 16, C, 16)     # free view
            o = pl.pallas_call(
                k,
                grid=(F, R),
                in_specs=[spec5], out_specs=spec5,
                out_shape=jax.ShapeDtypeStruct(y5.shape, y5.dtype),
            )(y5)
            return (o.reshape(F, H, W),)

        try:
            out = step((y,))[0]
            assert jnp.array_equal(out, y ^ jnp.uint16(1)), f"{name} wrong"
            print(f"{name}  {chain_ms(step, (y,)):8.2f} ms", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            print(f"{name} FAILED: {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()

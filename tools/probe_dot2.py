"""Is the in-kernel one-hot dot hitting the MXU?  Time dtype variants."""

from __future__ import annotations

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

H, W = 2160, 3840
F = 8
R, C = H // 16, W // 16
K, M = 768, 144


def chain_ms(step, state0, n1=8, n2=136):
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


def kernel(x_ref, t_ref, pat_ref, const_ref, out_ref, *, mode):
    x = x_ref[0].astype(jnp.int32)
    t = t_ref[0, 0]
    kio = jax.lax.broadcasted_iota(jnp.int32, (K, W), 0)
    if mode == "int8":
        onehot = (kio == t).astype(jnp.int8)
        cand = jax.lax.dot_general(pat_ref[:], onehot,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
    elif mode == "bf16":
        onehot = (kio == t).astype(jnp.bfloat16)
        cand = jax.lax.dot_general(pat_ref[:].astype(jnp.bfloat16), onehot,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        cand = cand.astype(jnp.int32)
    elif mode == "f32":
        onehot = (kio == t).astype(jnp.float32)
        cand = jax.lax.dot_general(pat_ref[:].astype(jnp.float32), onehot,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        cand = cand.astype(jnp.int32)
    elif mode == "build":
        onehot = (kio == t).astype(jnp.int8)
        # consume without a dot: sum 8 static row-slices
        cand = jnp.zeros((M, W), jnp.int32)
        for p in range(8):
            cand = cand.at[:].get() if False else cand
        s8 = onehot[0:16].astype(jnp.int32)
        for p in range(1, 8):
            s8 = s8 + onehot[p * 96:p * 96 + 16].astype(jnp.int32)
        cand = jnp.broadcast_to(s8, (M, W)) if False else jnp.concatenate(
            [s8] * (M // 16), axis=0)
    elif mode == "dotconst":
        cand = jax.lax.dot_general(pat_ref[:], const_ref[:],
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
    else:  # none
        cand = jnp.zeros((M, W), jnp.int32)
    # consume all rows so nothing is DCE'd
    s = cand[0:16]
    for p in range(1, 8):
        s = s + cand[p * 18:p * 18 + 16]
    res = jnp.clip(x + s, 0, 1023 << 2)
    out_ref[0] = res.astype(out_ref.dtype)


def main():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.integers(0, 1024, (F, H, W), np.uint16))
    t = jnp.asarray(rng.integers(0, K, (F, R, 1, W), np.int32))
    pat = jnp.asarray(rng.integers(-128, 128, (M, K), np.int8))

    strip = pl.BlockSpec((1, 16, W), lambda f, r: (f, r, 0),
                         memory_space=pltpu.VMEM)
    perlane = pl.BlockSpec((1, 1, 1, W), lambda f, r: (f, r, 0, 0),
                           memory_space=pltpu.VMEM)
    const2 = pl.BlockSpec((M, K), lambda f, r: (0, 0),
                          memory_space=pltpu.VMEM)

    constoh = jnp.asarray((rng.integers(0, 2, (K, W)) * rng.integers(0, 2, (K, W))).astype(np.int8))
    constspec = pl.BlockSpec((K, W), lambda f, r: (0, 0), memory_space=pltpu.VMEM)
    for mode in ("none", "int8", "build", "dotconst"):
        kern = functools.partial(kernel, mode=mode)

        @jax.jit
        def step(s, kern=kern):
            (yy,) = s
            o = pl.pallas_call(
                kern, grid=(F, R),
                in_specs=[strip, perlane, const2, constspec],
                out_specs=strip,
                out_shape=jax.ShapeDtypeStruct(yy.shape, yy.dtype),
            )(yy, t, pat, constoh)
            return (o,)

        try:
            ms = chain_ms(step, (y,))
            print(f"dot_{mode:<5s} {ms:8.2f} ms/step", flush=True)
        except Exception as e:
            print(f"dot_{mode} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)



if __name__ == "__main__":
    main()

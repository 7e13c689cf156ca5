"""Dot cost scaling law: time (M,768)@(768,3840) int8 for varying M."""
import functools, sys, time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo")
H, W, F = 2160, 3840, 8
R = H // 16
K = 768

def chain_ms(step, state0, n1=8, n2=136):
    def chain(n):
        state = state0
        t0 = time.perf_counter()
        for _ in range(n):
            state = step(state)
        _ = int(jax.tree_util.tree_leaves(state)[0].reshape(-1)[0])
        return time.perf_counter() - t0
    chain(1); t1 = chain(n1); t2 = chain(n2)
    return 1e3 * (t2 - t1) / (n2 - n1)

def kernel(x_ref, pat_ref, oh_ref, out_ref, *, M):
    x = x_ref[0].astype(jnp.int32)
    cand = jax.lax.dot_general(pat_ref[:], oh_ref[:],
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    s = cand[0:16]
    for m0 in range(16, M, 16):
        s = s + cand[m0:m0 + 16]
    out_ref[0] = jnp.clip(x + s, 0, 4095).astype(out_ref.dtype)

def main():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.integers(0, 1024, (F, H, W), np.uint16))
    oh = jnp.asarray((rng.integers(0, 2, (K, W))).astype(np.int8))
    strip = pl.BlockSpec((1, 16, W), lambda f, r: (f, r, 0),
                         memory_space=pltpu.VMEM)
    ohspec = pl.BlockSpec((K, W), lambda f, r: (0, 0),
                          memory_space=pltpu.VMEM)
    for M in (16, 64, 128, 144, 160, 256):
        pat = jnp.asarray(rng.integers(-128, 128, (M, K), np.int8))
        patspec = pl.BlockSpec((M, K), lambda f, r: (0, 0),
                               memory_space=pltpu.VMEM)
        kern = functools.partial(kernel, M=M)
        @jax.jit
        def step(s, kern=kern, patspec=patspec, pat=pat):
            (yy,) = s
            o = pl.pallas_call(
                kern, grid=(F, R),
                in_specs=[strip, patspec, ohspec],
                out_specs=strip,
                out_shape=jax.ShapeDtypeStruct(yy.shape, yy.dtype),
            )(yy, pat, oh)
            return (o,)
        print(f"M={M:<4d} {chain_ms(step, (y,)):8.2f} ms/step", flush=True)

if __name__ == "__main__":
    main()

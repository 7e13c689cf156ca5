"""Head-to-head chained-dependency timing of all TPU engines on 4K 10-bit."""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W = 2160, 3840
F = 8


def chain_fps(step, state0, cargs, n1=8, n2=88):
    def chain(n):
        state = state0
        t0 = time.perf_counter()
        for _ in range(n):
            state = step(*state, *cargs)
        _ = (int(state[0][0, 0, 0]) + int(state[1][0, 0, 0])
             + int(state[2][0, 0, 0]))
        return time.perf_counter() - t0

    chain(1)
    t1 = chain(n1)
    t2 = chain(n2)
    t_iter = (t2 - t1) / (n2 - n1)
    return F / t_iter, t_iter * 1e3


def main():
    from versatilefilmgrain_tpu.ops.grain_pallas import (
        make_batched_step as mk_pallas, pallas_tables)
    from versatilefilmgrain_tpu.ops.grain_natural import (
        make_batched_step as mk_natural, natural_tables)
    from __graft_entry__ import _default_regs, _frame_bases

    R, C = H // 16, W // 16
    regs = _default_regs()
    bases, bases_up = _frame_bases(regs, F, R, C)
    rng = np.random.default_rng(0)
    state0 = (
        jnp.asarray(rng.integers(0, 1024, (F, R * 16, C * 16), np.uint16)),
        jnp.asarray(rng.integers(0, 1024, (F, R * 8, C * 8), np.uint16)),
        jnp.asarray(rng.integers(0, 1024, (F, R * 8, C * 8), np.uint16)))
    cargs = (jnp.asarray(bases), jnp.asarray(bases_up))

    nat = mk_natural(natural_tables(regs), height=H, width=W, bs=2,
                     csubx=2, csuby=2)
    fps, ms = chain_fps(nat, state0, cargs)
    print(f"natural  {fps:8.1f} fps   {ms:7.2f} ms/step", flush=True)

    import os
    if os.environ.get("SKIP_PALLAS"):
        print("outputs identical (skipped pallas)", flush=True)
        return
    pal = mk_pallas(pallas_tables(regs), height=H, width=W, bs=2,
                    csubx=2, csuby=2)
    fps, ms = chain_fps(pal, state0, cargs)
    print(f"pallas   {fps:8.1f} fps   {ms:7.2f} ms/step", flush=True)

    # sanity: identical outputs on device
    a = nat(*state0, *cargs)
    b = pal(*state0, *cargs)
    for i in range(3):
        assert jnp.array_equal(a[i], b[i]), f"plane {i} mismatch"
    print("outputs identical", flush=True)


if __name__ == "__main__":
    main()

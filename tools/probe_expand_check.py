"""One-off: cross-check _expand_words_pallas vs _lane_words_xla in interpret
mode at small shapes.  Not a product component."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from versatilefilmgrain_tpu.ops.grain_natural import (
    _expand_words_pallas, _lane_words_xla)

rng = np.random.default_rng(0)
F, R = 2, 5
for Cs, bws in (((24, 12, 12), (16, 8, 8)), ((24, 24, 24), (16, 16, 16))):
    wblks = [jnp.asarray(rng.integers(0, 1 << 11, (F, R, C), dtype=np.int32))
             for C in Cs]
    got = _expand_words_pallas(wblks, list(bws), interpret=True)
    want = [_lane_words_xla(w, bw) for w, bw in zip(wblks, bws)]
    for c in range(3):
        g, w = np.asarray(got[c]), np.asarray(want[c])
        if not np.array_equal(g, w):
            bad = np.argwhere(g != w)
            print(f"C={Cs[c]} bw={bws[c]} MISMATCH at {bad[:5]}:")
            for idx in bad[:5]:
                print("  got", g[tuple(idx)], "want", w[tuple(idx)])
            break
    else:
        print(f"Cs={Cs} bws={bws}: OK")
        continue
    break

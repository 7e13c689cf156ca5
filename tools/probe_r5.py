"""Round-5 perf probes on real TPU: lane-word expansion paths and (later)
the AFGS1 LUT evaluation paths.  Chained-dependency timing via bench._chain_fps.

Usage: python tools/probe_r5.py [default sei_ar afgs1] [--expand both|pallas|xla]
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_vfg")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import H, W, FRAMES_BATCH, _chain_fps, _regs_from_cfg
from __graft_entry__ import _default_regs, _frame_bases
from versatilefilmgrain_tpu.ops.grain_natural import (
    make_batched_step, natural_tables)

CFGDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "tests", "golden", "cfg")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    expand = "xla,kernel"
    for a in sys.argv[1:]:
        if a.startswith("--expand="):
            expand = a.split("=", 1)[1]
    kinds = args or ["default", "sei_ar", "afgs1"]
    modes = expand.split(",")

    R, C = H // 16, W // 16
    F = FRAMES_BATCH
    rng = np.random.default_rng(0)
    state0 = (
        jnp.asarray(rng.integers(0, 1024, (F, R * 16, C * 16), np.uint16)),
        jnp.asarray(rng.integers(0, 1024, (F, R * 8, C * 8), np.uint16)),
        jnp.asarray(rng.integers(0, 1024, (F, R * 8, C * 8), np.uint16)))

    for kind in kinds:
        if kind == "default":
            regs = _default_regs()
        else:
            fname = {"sei_ar": "fgs_sei_ar_test1.cfg",
                     "afgs1": "fgs_afgs1_test1.cfg"}[kind]
            regs = _regs_from_cfg(os.path.join(CFGDIR, fname))
        nt = natural_tables(regs)
        bases, bases_up = _frame_bases(regs, F, R, C)
        cargs = (jnp.asarray(bases), jnp.asarray(bases_up))
        outs = {}
        for mode in modes:
            step = make_batched_step(nt, height=H, width=W, bs=2,
                                     csubx=2, csuby=2, word_expand=mode)
            fps = _chain_fps(step, state0, cargs)
            outs[mode] = step(*state0, *cargs)
            print(f"probe: {kind:8s} expand={mode:6s} {fps:8.1f} fps "
                  f"({1000 * F / fps:.3f} ms/step)", flush=True)
        ref = outs[modes[0]]
        for mode in modes[1:]:
            for p in range(3):
                assert jnp.array_equal(ref[p], outs[mode][p]), \
                    f"{kind}: {mode} diverges from {modes[0]} on-device " \
                    f"(plane {p})"
        if len(modes) > 1:
            print(f"probe: {kind:8s} all modes agree on-device: OK",
                  flush=True)


if __name__ == "__main__":
    main()

"""Round-5: time lane-word generation alone (XLA broadcast-reshape vs the
Pallas butterfly), chained methodology.  Usage: python tools/probe_wordgen.py
[chunk ...]

CAVEAT (docs/DESIGN.md 3.2): isolated wordgen numbers are artifacts in
both directions -- the reduction feedback here lets XLA fuse away the
25 MB materialization the real kernel reads (reads ~0.32 ms), while a
prep-only ablation serializes work the full step overlaps (~0.77 ms).
The honest transport cost is the in-situ delta between full steps
(~0.15 ms); use tools/probe_budget.py + the word_expand= A/B for
decisions, not this file alone."""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_vfg")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench
from bench import H, W, FRAMES_BATCH, _chain_fps
from __graft_entry__ import _default_regs, _frame_bases
from versatilefilmgrain_tpu.ops import grain_natural as gn
from versatilefilmgrain_tpu.ops import lfsr

R, C = H // 16, W // 16
F = FRAMES_BATCH
regs = _default_regs()
bases, bases_up = _frame_bases(regs, F, R, C)
cargs = (jnp.asarray(bases),)

# Feedback state: a tiny uint32 vector the step mixes words into, so the
# chain has a true device dependency without re-streaming frames.
state0 = (jnp.zeros((F, 8, 128), jnp.int32),) * 3


def make_step(expand):
    def step(s0, s1, s2, b):
        lat = jax.vmap(lambda bb: lfsr.state_lattice_jax(bb, R, C))(b)
        words = gn._lane_words3(lat, 2, 2, expand=expand)
        outs = []
        for s, w in zip((s0, s1, s2), words):
            # Fold the ENTIRE word plane into the small state: a full
            # reduction, so XLA cannot slice away any part of the expansion.
            outs.append(s ^ jnp.sum(w, axis=(1, 2, 3))[:, None, None])
        return tuple(outs)
    return jax.jit(step)


if __name__ == "__main__":
    for arg in (sys.argv[1:] or ["64"]):
        gn._EXPAND_CHUNK = int(arg)
        for expand in ("xla", "pallas"):
            fps = _chain_fps(make_step(expand), state0, cargs)
            print(f"wordgen: expand={expand:6s} chunk={gn._EXPAND_CHUNK:4d} "
                  f"{1000 * F / fps:.3f} ms/step ({fps:.0f} fps-equiv)",
                  flush=True)

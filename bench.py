"""Benchmark: 4K 10-bit 4:2:0 grain synthesis frames/s on one chip.

Prints ONE JSON line:
  {"metric": "fps_4k_10b_420", "value": N, "unit": "frames/s",
   "vs_baseline": N / reference_fps}

The baseline is the reference C model (single-threaded `vfgs` binary, -O2
-mavx2) measured on this machine over the same workload; the reference
publishes no numbers of its own (BASELINE.md).  The baseline is re-measured
live when /root/reference is present, else a stored measurement is used.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

H, W = 2160, 3840
FRAMES_BATCH = 8  # measured sweet spot on v5e (amortizes dispatch + lattice)
# vfgs fps measured on this machine (gcc -O2 -mavx2, single thread, tmpfs IO);
# used only if /root/reference is unavailable for a live measurement.
STORED_BASELINE_FPS = None


def bench_reference() -> float | None:
    vfgs = "/tmp/refbuild/vfgs"
    if not os.path.exists(vfgs):
        if not os.path.isdir("/root/reference/src"):
            return STORED_BASELINE_FPS
        os.makedirs("/tmp/refbuild", exist_ok=True)
        r = subprocess.run(
            ["gcc", "-O2", "-mavx2", "-o", vfgs]
            + sorted(__import__("glob").glob("/root/reference/src/*.c"))
            + ["-lm"], capture_output=True)
        if r.returncode != 0:
            return STORED_BASELINE_FPS
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    inp = os.path.join(base, "bench4k.yuv")
    nframes = 3
    fsize = (W * H * 3 // 2) * 2
    if not (os.path.exists(inp) and os.path.getsize(inp) == fsize * nframes):
        rng = np.random.default_rng(42)
        with open(inp, "wb") as f:
            for _ in range(nframes):
                rng.integers(0, 1024, fsize // 2, dtype=np.uint16).tofile(f)
    out = os.path.join(base, "bench4k_out.yuv")
    # warm once (page cache), then measure
    args = [vfgs, "-w", str(W), "-h", str(H), "-b", "10", "-n", str(nframes),
            inp, out]
    subprocess.run(args, check=True, capture_output=True)
    t0 = time.perf_counter()
    subprocess.run(args, check=True, capture_output=True)
    dt = time.perf_counter() - t0
    os.unlink(out)
    return nframes / dt


def bench_tpu() -> float:
    import functools

    import jax
    import jax.numpy as jnp
    from versatilefilmgrain_tpu.ops.grain_fast import (add_grain_frame_fast,
                                                       fast_args, fast_tables)
    from __graft_entry__ import _default_regs, _frame_bases

    R, C = H // 16, W // 16
    regs = _default_regs()
    ft = fast_tables(regs)
    F = FRAMES_BATCH
    bases, bases_up = _frame_bases(regs, F, R, C)

    # Same batched single-chip step as pipeline.run_file.
    fn = functools.partial(add_grain_frame_fast, height=H, width=W, bs=2,
                           csubx=2, csuby=2)
    step = jax.jit(jax.vmap(fn, in_axes=(0, 0, 0, 0, 0) + (None,) * 11))

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.integers(0, 1024, (F, R * 16, C * 16),
                                 dtype=np.uint16))
    u = jnp.asarray(rng.integers(0, 1024, (F, R * 8, C * 8), dtype=np.uint16))
    v = jnp.asarray(rng.integers(0, 1024, (F, R * 8, C * 8), dtype=np.uint16))
    cargs = (jnp.asarray(bases), jnp.asarray(bases_up)) + fast_args(ft)

    jax.block_until_ready(step(y, u, v, *cargs))  # compile + warm
    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(y, u, v, *cargs)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return F * iters / dt


def main():
    ours = bench_tpu()
    try:
        ref = bench_reference()
    except Exception:
        ref = STORED_BASELINE_FPS
    vs = (ours / ref) if ref else None
    print(json.dumps({
        "metric": "fps_4k_10b_420",
        "value": round(ours, 2),
        "unit": "frames/s",
        "vs_baseline": round(vs, 2) if vs else None,
    }))


if __name__ == "__main__":
    sys.exit(main())

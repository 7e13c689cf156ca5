"""Multi-device scaling benchmark: frames/s at 1..N chips.

Run on a multi-chip host (or pod slice; initialize jax.distributed first for
multi-host).  Measures the sharded grain step at each device count and
reports scaling efficiency vs 1 chip.  The steady-state kernel has no
collectives (zero-halo design), so efficiency should track the hardware.

On this repo's single-chip dev machine it degenerates to the 1-chip number;
use `--cpu N` to exercise the code path on N virtual CPU devices
(correctness/overhead only -- CPU numbers are not throughput claims).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", type=int, default=0,
                    help="force N virtual CPU devices (dev only)")
    ap.add_argument("--height", type=int, default=2160)
    ap.add_argument("--width", type=int, default=3840)
    ap.add_argument("--frames-per-device", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import os
    if args.cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_count={args.cpu}")
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from versatilefilmgrain_tpu.parallel import mesh as pmesh
    from versatilefilmgrain_tpu.ops.grain_fast import fast_args, fast_tables
    from __graft_entry__ import _default_regs, _frame_bases

    H, W = args.height, args.width
    R, C = -(-H // 16), -(-W // 16)
    regs = _default_regs()
    ft = fast_tables(regs)
    devices = jax.devices()
    results = {}
    base_fps = None

    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    for n in counts:
        nd, nt = n, 1   # throughput scaling: pure frame parallelism
        F = nd * args.frames_per_device
        m = pmesh.make_mesh(nd, nt, devices[:n])
        step = pmesh.make_grain_step(m, height=H, width=W, bs=2, csubx=2,
                                     csuby=2)
        bases, bases_up = _frame_bases(regs, F, R, C)
        rng = np.random.default_rng(0)
        y = jnp.asarray(rng.integers(0, 1024, (F, R * 16, C * 16), dtype=np.uint16))
        u = jnp.asarray(rng.integers(0, 1024, (F, R * 8, C * 8), dtype=np.uint16))
        v = jnp.asarray(rng.integers(0, 1024, (F, R * 8, C * 8), dtype=np.uint16))
        cargs = (jnp.asarray(bases), jnp.asarray(bases_up)) + fast_args(ft)
        jax.block_until_ready(step(y, u, v, *cargs))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = step(y, u, v, *cargs)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        fps = F * args.iters / dt
        if base_fps is None:
            base_fps = fps
        results[str(n)] = dict(
            fps=round(fps, 1), mesh=f"data={nd},tile={nt}",
            efficiency=round(fps / (base_fps * n), 3))
        print(json.dumps({"devices": n, **results[str(n)]}))

    print(json.dumps({"metric": "scaling", "results": results}))


if __name__ == "__main__":
    main()

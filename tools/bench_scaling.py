"""Multi-device scaling benchmark: frames/s at 1..N chips.

Run on a multi-chip host (or pod slice; initialize jax.distributed first for
multi-host).  Measures the sharded grain step at each device count and
reports scaling efficiency vs 1 chip.  The steady-state kernel has no
collectives (zero-halo design), so efficiency should track the hardware.

Timing is chained-dependency (each iteration consumes the previous
iteration's output; one dependent scalar fetched at the end) — the only
methodology that is trustworthy on tunneled dev platforms and still correct
on real pods (see bench.py).

On this repo's single-chip dev machine it degenerates to the 1-chip number;
use `--cpu N` to exercise the code path on N virtual CPU devices
(correctness/overhead only -- CPU numbers are not throughput claims).
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", type=int, default=0,
                    help="force N virtual CPU devices (dev only)")
    ap.add_argument("--height", type=int, default=2160)
    ap.add_argument("--width", type=int, default=3840)
    ap.add_argument("--frames-per-device", type=int, default=4)
    ap.add_argument("--engine", choices=("natural", "fast"), default="natural",
                    help="per-shard engine (natural = production Pallas "
                         "kernel; falls back to fast off-TPU)")
    args = ap.parse_args()

    import os
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_vfg")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
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
    from versatilefilmgrain_tpu.ops.grain_natural import natural_tables
    from __graft_entry__ import _default_regs, _frame_bases

    H, W = args.height, args.width
    R, C = -(-H // 16), -(-W // 16)
    regs = _default_regs()
    on_tpu = jax.default_backend() == "tpu"
    devices = jax.devices()
    results = {}
    base_fps = None

    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    for n in counts:
        nd, nt = n, 1   # throughput scaling: pure frame parallelism
        F = nd * args.frames_per_device
        m = pmesh.make_mesh(nd, nt, devices[:n])
        if args.engine == "natural":
            step = pmesh.make_grain_step(
                m, height=H, width=W, bs=2, csubx=2, csuby=2,
                engine="natural", tables=natural_tables(regs),
                interpret=not on_tpu)
            cargs = ()
        else:
            step = pmesh.make_grain_step(m, height=H, width=W, bs=2,
                                         csubx=2, csuby=2)
            cargs = fast_args(fast_tables(regs))
        bases, bases_up = _frame_bases(regs, F, R, C)
        rng = np.random.default_rng(0)
        state = (
            jnp.asarray(rng.integers(0, 1024, (F, R * 16, C * 16),
                                     dtype=np.uint16)),
            jnp.asarray(rng.integers(0, 1024, (F, R * 8, C * 8),
                                     dtype=np.uint16)),
            jnp.asarray(rng.integers(0, 1024, (F, R * 8, C * 8),
                                     dtype=np.uint16)))
        b, bu = jnp.asarray(bases), jnp.asarray(bases_up)

        # Adaptive chained-dependency timing (same methodology as bench.py:
        # grow the long chain until the differenced span swamps RTT jitter,
        # then take the median of three slopes).
        import bench as _bench

        def stepper(y_, u_, v_, b_, bu_):
            return step(y_, u_, v_, b_, bu_, *cargs)

        fps = _bench._chain_fps(stepper, state, (b, bu))
        if base_fps is None:
            base_fps = fps
        results[str(n)] = dict(
            fps=round(fps, 1), mesh=f"data={nd},tile={nt}",
            efficiency=round(fps / (base_fps * n), 3))
        print(json.dumps({"devices": n, **results[str(n)]}))

    print(json.dumps({"metric": "scaling", "engine": args.engine,
                      "results": results}))


if __name__ == "__main__":
    main()

"""Multi-host deployment helpers.

The engine's zero-halo design (see parallel/mesh.py) means multi-host scaling
is pure data parallelism over frames: each process grains its own frame
subset with closed-form LFSR bases, no collectives in the steady state, and
the concatenated output is bit-identical to a single-host run.

Two deployment shapes:

* **Multi-controller** (`init_distributed` + `make_global_mesh`): one JAX
  process per host, global mesh over all devices; frames ride the `data`
  axis (DCN across hosts, ICI within).  Host h feeds frames where
  ``frame_index % num_processes == h`` (or contiguous shards via
  :func:`frame_shard`); the per-frame lattice bases make any assignment
  bit-exact.
* **Embarrassingly parallel**: independent jobs over disjoint frame ranges
  using ``GrainPipeline(seek=N, grain_offset=N)`` (CLI: ``-s N
  --grain-offset N``).  ``grain_offset`` computes the state lattice at the
  *global* frame index (the reference's ``-s`` only seeks the input,
  restarting grain state from the seed -- replicated when grain_offset=0),
  so shard outputs concatenate bit-identically to a single full run, AFGS1
  mid-stream reseeds included (tests/test_shard_recovery.py).  A crashed
  shard is simply re-run from its start frame: checkpoint/resume needs no
  state files at all.
"""

from __future__ import annotations

import jax

from .mesh import make_mesh


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize jax.distributed (no-op when single-process / already up)."""
    if num_processes in (None, 1):
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_global_mesh(tile: int = 1):
    """Mesh over every device of every process: ('data', 'tile')."""
    n = len(jax.devices())
    assert n % tile == 0
    return make_mesh(n // tile, tile)


def frame_shard(num_frames: int, num_shards: int, shard: int) -> range:
    """Contiguous frame range for one shard (balanced)."""
    base = num_frames // num_shards
    extra = num_frames % num_shards
    start = shard * base + min(shard, extra)
    return range(start, start + base + (1 if shard < extra else 0))

"""Multi-host helper tests (single-process: init no-op, shard math, global
mesh over the virtual CPU devices)."""

import jax

from versatilefilmgrain_tpu.parallel import distributed


def test_init_noop_single_process():
    distributed.init_distributed()          # must not raise
    distributed.init_distributed(num_processes=1)


def test_frame_shard_partition():
    for nf, ns in ((10, 3), (8, 8), (5, 2), (7, 1)):
        seen = []
        for s in range(ns):
            seen.extend(distributed.frame_shard(nf, ns, s))
        assert seen == list(range(nf))


def test_global_mesh_shapes():
    n = len(jax.devices())
    m = distributed.make_global_mesh(tile=1)
    assert m.devices.size == n
    if n % 2 == 0:
        m2 = distributed.make_global_mesh(tile=2)
        assert m2.shape == {"data": n // 2, "tile": 2}

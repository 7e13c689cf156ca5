"""Worker process for the 2-process jax.distributed test.

Spawned by tests/test_distributed.py with a localhost coordinator.  Each
worker:

1. initializes the distributed backend (the real
   ``jax.distributed.initialize`` branch of
   parallel/distributed.init_distributed);
2. asserts the global process/device topology;
3. grains its contiguous frame shard through the full CLI-equivalent
   pipeline (``seek=start, grain_offset=start`` — the stateless data-parallel
   deployment mode);
4. runs a real cross-process collective (process_allgather of the shard
   output digests) and records what it saw, so the parent can verify the
   collective actually moved data between processes.

Usage: distributed_worker.py <coord> <nproc> <pid> <input.yuv> <outdir>
"""

import hashlib
import json
import os
import sys


def main():
    coord, nproc, pid, inp, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
        sys.argv[5])

    from versatilefilmgrain_tpu.parallel import distributed
    distributed.init_distributed(coordinator_address=coord,
                                 num_processes=nproc, process_id=pid)

    import jax
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid, jax.process_index()
    assert len(jax.devices()) == nproc * jax.local_device_count(), \
        (len(jax.devices()), jax.local_device_count())

    from versatilefilmgrain_tpu.pipeline import GrainPipeline
    from versatilefilmgrain_tpu.utils import yuv

    NF = 6
    shard = distributed.frame_shard(NF, nproc, pid)
    out = os.path.join(outdir, f"out_{pid}.yuv")
    pipe = GrainPipeline(256, 192, 10, yuv.YUV_420, seek=shard.start,
                         grain_offset=shard.start)
    n = pipe.run_file(inp, out, frames=len(shard), batch=2)
    assert n == len(shard), (n, len(shard))

    # Real collective across the two processes: allgather each shard's
    # digest and record the global view.
    import numpy as np
    from jax.experimental import multihost_utils
    digest = hashlib.sha256(open(out, "rb").read()).hexdigest()
    local = np.frombuffer(bytes.fromhex(digest), dtype=np.uint8)
    gathered = multihost_utils.process_allgather(local)
    assert gathered.shape == (nproc, 32), gathered.shape
    with open(os.path.join(outdir, f"gathered_{pid}.json"), "w") as f:
        json.dump({"pid": pid,
                   "digests": [bytes(row).hex() for row in gathered]}, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()

"""Multi-host tests: single-process helper checks (init no-op, shard math,
global mesh) plus a real 2-process jax.distributed run (subprocess-spawned,
coordinator on localhost) proving end-to-end frame-shard concat equality."""

import hashlib
import json
import os
import socket
import subprocess
import sys

import jax

from versatilefilmgrain_tpu.parallel import distributed

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


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


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed(tmp_path):
    """Spawn 2 real JAX processes with a localhost coordinator; each inits
    jax.distributed, grains its contiguous frame shard, and allgathers the
    shard digests across processes.  The concatenated shard outputs must be
    bit-identical to a single-process full run."""
    from gen_input import make_input_yuv
    from versatilefilmgrain_tpu.pipeline import GrainPipeline
    from versatilefilmgrain_tpu.utils import yuv

    NF, nproc = 6, 2
    inp = str(tmp_path / "in.yuv")
    make_input_yuv(inp, 256, 192, 10, 0, NF)

    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ,
               JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               PYTHONPATH=REPO)
    worker = os.path.join(REPO, "tests", "distributed_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, coord, str(nproc), str(pid), inp,
         str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(nproc)]
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"

    # Concat equality vs a single-process full run.
    full = str(tmp_path / "full.yuv")
    pipe = GrainPipeline(256, 192, 10, yuv.YUV_420)
    assert pipe.run_file(inp, full, frames=NF, batch=2) == NF
    full_bytes = open(full, "rb").read()
    parts = b"".join(
        open(str(tmp_path / f"out_{pid}.yuv"), "rb").read()
        for pid in range(nproc))
    assert parts == full_bytes

    # The allgather collective really ran: every process saw every shard's
    # digest, in shard order.
    digests = [hashlib.sha256(
        open(str(tmp_path / f"out_{pid}.yuv"), "rb").read()).hexdigest()
        for pid in range(nproc)]
    for pid in range(nproc):
        rec = json.load(open(str(tmp_path / f"gathered_{pid}.json")))
        assert rec["digests"] == digests

"""Headless designer tests: model round-trip, interval editing, preview
conversion, and the in-process regrain path producing reference-identical
output for the default design."""

import os
import subprocess

import numpy as np
import pytest

from versatilefilmgrain_tpu.designer import (FgcSeiDesign, upsample_chroma,
                                             yuv_to_rgb)
from versatilefilmgrain_tpu.utils import yuv as yuvio


def test_split_toggle_remove():
    d = FgcSeiDesign()
    n0 = d.num_intervals(0)
    assert d.split(0, 0, 20)
    assert d.num_intervals(0) == n0 + 1
    assert d.lower[0][1] == 20 and d.upper[0][0] == 19
    assert d.values[0][1] == d.values[0][0]
    d.toggle(0, 1)
    assert not d.enable[0][1]
    assert d.remove(0, 1)
    assert d.num_intervals(0) == n0


def test_save_load_roundtrip(tmp_path):
    d = FgcSeiDesign()
    d.split(0, 2, 70)
    d.values[0][3][0] = 77
    d.log2_scale_factor = 6
    p = str(tmp_path / "design.cfg")
    d.save(p)
    d2 = FgcSeiDesign()
    d2.load(p)
    assert d2.log2_scale_factor == 6
    assert d2.lower[0] == d.lower[0]
    assert d2.upper[0] == d.upper[0]
    assert [v[0] for v in d2.values[0]] == [v[0] for v in d.values[0]]


def test_saved_cfg_accepted_by_reference_binary(tmp_path):
    vfgs = "/tmp/refbuild/vfgs"
    if not os.path.exists(vfgs):
        pytest.skip("reference binary not built")
    d = FgcSeiDesign()
    d.split(0, 0, 25)
    cfg = str(tmp_path / "d.cfg")
    d.save(cfg)
    # reference must parse and run it
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    from gen_input import make_input_yuv
    inp = str(tmp_path / "in.yuv")
    make_input_yuv(inp, 256, 192, 10, 0, 1)
    out_ref = str(tmp_path / "ref.yuv")
    r = subprocess.run([vfgs, "-w", "256", "-h", "192", "-b", "10", "-n", "1",
                        "-c", cfg, inp, out_ref], capture_output=True)
    assert r.returncode == 0, r.stderr

    # and our in-process regrain must match it bit-exactly
    with open(inp, "rb") as f:
        planes = yuvio.read_frame(f, 256, 192, 10, yuvio.YUV_420)
    out = d.apply_to_frame(planes, 256, 192, 10, yuvio.YUV_420)
    ref = open(out_ref, "rb").read()
    got = b"".join(np.ascontiguousarray(p).tobytes() for p in out)
    assert got == ref


def test_yuv_to_rgb_shapes():
    y = np.full((32, 64), 512, np.uint16)
    u = np.full((16, 32), 512, np.uint16)
    v = np.full((16, 32), 512, np.uint16)
    uu, vv = upsample_chroma(y, u, v, yuvio.YUV_420)
    assert uu.shape == y.shape and vv.shape == y.shape
    rgb = yuv_to_rgb(y, u, v, 10, yuvio.YUV_420)
    assert rgb.shape == (32, 64, 3)
    # mid-gray: all channels near equal
    assert np.allclose(rgb[0, 0], rgb[0, 0][0], atol=0.02)

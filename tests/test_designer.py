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


def test_sinc_upsampler_matches_reference_transcription():
    """The preview's windowed-sinc chroma upsample must match a direct
    scipy transcription of the reference's yuv444
    (/root/reference/fgc-designer.py:253-272): horizontal co-sited
    (f = sinc(-1.5..1.5) normalized, odd columns interleaved), vertical
    midpoint (f = [0, sinc(-1.25..1.75)] normalized, both phases)."""
    scipy_ndimage = pytest.importorskip("scipy.ndimage")
    from versatilefilmgrain_tpu.designer.preview import upsample_chroma_sinc

    rng = np.random.default_rng(7)
    yf = rng.normal(size=(24, 40)).astype(np.float64)
    uf = rng.normal(size=(12, 20)).astype(np.float64)
    vf = rng.normal(size=(12, 20)).astype(np.float64)

    def ref_yuv444(Y, U, V):
        if 2 * np.shape(U)[1] == np.shape(Y)[1]:
            f = np.sinc(np.arange(-1.5, 1.6))
            f /= np.sum(f)
            sz = list(U.shape)
            sz[1] *= 2
            U = np.reshape(np.vstack(
                (U, scipy_ndimage.convolve1d(U, f, axis=1, mode="nearest"))),
                sz, order="F")
            V = np.reshape(np.vstack(
                (V, scipy_ndimage.convolve1d(V, f, axis=1, mode="nearest"))),
                sz, order="F")
        if 2 * np.shape(U)[0] == np.shape(Y)[0]:
            f = np.append(0, np.sinc(np.arange(-1.25, 1.76)))
            f /= np.sum(f)
            sz = list(U.shape)
            sz[0] *= 2
            U = np.reshape(np.hstack(
                (scipy_ndimage.convolve1d(U, f, axis=0, mode="nearest"),
                 scipy_ndimage.convolve1d(U, np.flip(f), axis=0,
                                          mode="nearest"))), sz, order="C")
            V = np.reshape(np.hstack(
                (scipy_ndimage.convolve1d(V, f, axis=0, mode="nearest"),
                 scipy_ndimage.convolve1d(V, np.flip(f), axis=0,
                                          mode="nearest"))), sz, order="C")
        return U, V

    want_u, want_v = ref_yuv444(yf, uf, vf)
    got_u, got_v = upsample_chroma_sinc(yf, uf, vf)
    assert np.allclose(got_u, want_u, atol=1e-12)
    assert np.allclose(got_v, want_v, atol=1e-12)

    # 4:2:2 (horizontal only) and 4:4:4 (no-op) paths
    uf2 = rng.normal(size=(24, 20))
    got_u2, _ = upsample_chroma_sinc(yf, uf2, uf2.copy())
    want_u2, _ = ref_yuv444(yf, uf2, uf2.copy())
    assert np.allclose(got_u2, want_u2, atol=1e-12)
    got_u3, _ = upsample_chroma_sinc(yf, yf.copy(), yf.copy())
    assert np.array_equal(got_u3, yf)

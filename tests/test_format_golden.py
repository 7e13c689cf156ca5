"""Engine-level golden parity for 4:2:2 / 4:4:4 (luma-only grain).

The reference CLI rejects these formats at startup (its built-in default
config carries chroma grain), but its FW/HW layers support them; goldens come
from a harness driving those layers directly (tools/gen_golden_formats.c,
regenerate with tools/gen_golden_formats.py).  We replay through our library
API (HwRegs + fw init + fast engine) and byte-compare."""

import hashlib
import json
import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from versatilefilmgrain_tpu.models import config as cfgmod
from versatilefilmgrain_tpu.models import fw
from versatilefilmgrain_tpu.models.hw import HwRegs
from versatilefilmgrain_tpu.ops import lfsr
from versatilefilmgrain_tpu.ops.grain_fast import (add_grain_frame_fast_jit,
                                                   fast_args, fast_tables)
from versatilefilmgrain_tpu.utils import yuv as yuvio

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
from gen_input import make_input_yuv  # noqa: E402

GOLDEN = json.load(open(os.path.join(REPO, "tests", "golden",
                                     "format_checksums.json")))


def _sei_cfg():
    """Must match the harness config (tools/gen_golden_formats.c)."""
    sei = cfgmod.FgsSei()
    sei.model_id = 0
    sei.log2_scale_factor = 5
    sei.comp_model_present_flag = [1, 0, 0]
    sei.num_intensity_intervals = [4, 0, 0]
    sei.num_model_values = [3, 0, 0]
    sei.intensity_interval_lower_bound[0, :4] = [0, 60, 120, 180]
    sei.intensity_interval_upper_bound[0, :4] = [59, 119, 179, 255]
    sei.comp_model_value[0, :4, :3] = [[90, 4, 6], [120, 8, 8],
                                       [140, 11, 9], [160, 14, 14]]
    return sei


def _afgs1_cfg():
    a = cfgmod.FgsAfgs1()
    a.grain_seed = 7391
    a.num_y_points = 3
    a.point_y_values[:3] = [0, 100, 255]
    a.point_y_scaling[:3] = [60, 100, 30]
    a.grain_scaling = 9
    a.ar_coeff_lag = 2
    a.ar_coeffs_y[:12] = [4, -3, 2, 1, -2, 8, 40, 10, -5, 2, 1, 0]
    a.ar_coeff_shift = 7
    a.grain_scale_shift = 1
    a.clip_to_restricted_range = 1
    return a


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_format_golden(name, tmp_path):
    e = GOLDEN[name]
    w, h, depth = e["w"], e["h"], e["depth"]
    subx, suby = e["subx"], e["suby"]
    fmt = 0 if suby == 2 else (1 if subx == 2 else 2)
    bs = depth - 8
    R, C = -(-h // 16), -(-w // 16)
    bh, bw = 16 // suby, 16 // subx

    regs = HwRegs()
    regs.set_depth(depth)
    regs.set_chroma_subsampling(subx, suby)
    if e["mode"] == "sei":
        fw.init_sei(_sei_cfg(), regs)
    else:
        fw.init_afgs1(_afgs1_cfg(), regs)
    ft = fast_tables(regs)

    inp = str(tmp_path / "in.yuv")
    make_input_yuv(inp, w, h, depth, fmt, e["frames"])
    out = bytearray()
    with open(inp, "rb") as f:
        for n in range(e["frames"]):
            planes = yuvio.read_frame(f, w, h, depth, fmt)
            e0 = lfsr.frame_base_exponent(n, R, C)
            base = int(lfsr.advance(np.uint32(regs.seed_state), e0))
            base_up = (int(lfsr.advance(np.uint32(regs.seed_state), e0 - C))
                       if e0 else base)
            y, u, v = planes
            yp = yuvio.pad_plane(y, R * 16, C * 16)
            up = yuvio.pad_plane(u, R * bh, C * bw)
            vp = yuvio.pad_plane(v, R * bh, C * bw)
            o = add_grain_frame_fast_jit(
                jnp.asarray(yp), jnp.asarray(up), jnp.asarray(vp),
                jnp.uint32(base), jnp.uint32(base_up), *fast_args(ft),
                height=h, width=w, bs=bs, csubx=subx, csuby=suby)
            cw, ch = w // subx, h // suby
            out += np.asarray(o[0])[:h, :w].tobytes()
            out += np.asarray(o[1])[:ch, :cw].tobytes()
            out += np.asarray(o[2])[:ch, :cw].tobytes()
    assert hashlib.sha256(bytes(out)).hexdigest() == e["sha256"], name

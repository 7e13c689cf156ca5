"""GrainPipeline with injected initial configs: 4:2:2/4:4:4 end-to-end
through run_file (batched path), cross-checked against the per-frame engine
path used by test_format_golden."""

import os
import sys

import numpy as np
import pytest

from versatilefilmgrain_tpu.models import config as cfgmod
from versatilefilmgrain_tpu.pipeline import GrainPipeline
from versatilefilmgrain_tpu.utils import yuv as yuvio

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
from gen_input import make_input_yuv  # noqa: E402


def _luma_only_sei():
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


def test_default_config_rejects_422():
    from versatilefilmgrain_tpu.utils.parsers import ConfigError
    with pytest.raises(ConfigError):
        GrainPipeline(320, 192, 10, yuvio.YUV_422)


@pytest.mark.parametrize("fmt", [yuvio.YUV_422, yuvio.YUV_444])
def test_run_file_formats(fmt, tmp_path):
    w, h, frames = 320, 192, 3
    inp = str(tmp_path / "in.yuv")
    make_input_yuv(inp, w, h, 10, fmt, frames)

    pipe = GrainPipeline(w, h, 10, fmt, initial_sei=_luma_only_sei())
    out_b = str(tmp_path / "b.yuv")
    assert pipe.run_file(inp, out_b, frames=frames, batch=2) == frames

    # per-frame path must agree byte-for-byte
    pipe2 = GrainPipeline(w, h, 10, fmt, initial_sei=_luma_only_sei())
    out = b""
    with open(inp, "rb") as f:
        for n in range(frames):
            planes = yuvio.read_frame(f, w, h, 10, fmt)
            o = pipe2.process_frame(planes, n)
            out += b"".join(np.ascontiguousarray(p).tobytes() for p in o)
    assert out == open(out_b, "rb").read()

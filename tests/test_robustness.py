"""Regression tests for review findings: gain edge cases, malformed configs,
unusual input sources."""

import os
import signal

import numpy as np
import pytest

from versatilefilmgrain_tpu.models import config as cfgmod
from versatilefilmgrain_tpu.pipeline import (GrainPipeline, apply_gain,
                                             FatalConfigError)
from versatilefilmgrain_tpu.utils import parsers


def test_negative_gain_terminates():
    """Negative gain wraps unsigned like the C reference and must not hang."""
    sei = cfgmod.default_sei()
    afgs1 = cfgmod.default_afgs1()
    apply_gain(-5, sei, afgs1)          # C: (unsigned)-5, ~25 halvings
    assert 0 <= sei.log2_scale_factor <= 255


def test_negative_gain_cli_fails_cleanly():
    """With the default config, the wrapped gain drives scale_shift out of
    range: the reference aborts; we must raise a fatal config error."""
    with pytest.raises(FatalConfigError):
        GrainPipeline(256, 192, 10, 0, gain=-5)


def test_gain_zero_scales_to_zero():
    sei = cfgmod.default_sei()
    apply_gain(0, sei, cfgmod.default_afgs1())
    assert int(sei.comp_model_value[0][0][0]) == 0


def test_unsigned_gain_multiply_wraps():
    """(int)v * (unsigned)gain / 100 semantics for negative model values."""
    sei = cfgmod.default_sei()
    sei.comp_model_value[0][0][0] = -250
    apply_gain(50, sei, cfgmod.default_afgs1())
    # C: ((unsigned)(-250*50)) / 100 = (2**32 - 12500)//100 -> int16 wrap
    expect = ((2**32 - 12500) // 100 + 0x8000) % 0x10000 - 0x8000
    assert int(sei.comp_model_value[0][0][0]) == expect


def test_atoi_rejects_unicode_digits():
    assert parsers.atoi("²3") == 0        # superscript two
    assert parsers.atoi(" +42x") == 42
    assert parsers.atoi("-") == 0


def test_malformed_cfg_mid_stream_continues(tmp_path, capsys):
    """Binary garbage / counter-overflow configs must not kill the run."""
    bad = tmp_path / "bad.cfg"
    bad.write_bytes(b"\x80\xff\xfe SEIFGCModelId : 1\n"
                    b"fg_comp_model_present_flag[c]: 1\n" * 5)
    pipe = GrainPipeline(256, 192, 10, 0,
                         configs=[f"0:{bad}"])
    y = np.random.default_rng(0).integers(0, 1024, (192, 256)).astype("<u2")
    u = v = np.zeros((96, 128), "<u2")
    out = pipe.process_frame((y, u, v), 0)     # must not raise
    assert out[0].shape == (192, 256)


def test_width_128_rejected():
    """Lock the boundary-width policy: the reference hard-asserts
    width > 128 in the hot path (vfgs_hw.c:167-170) and aborts at 128; we
    reject it as a config error.  129+ is accepted (fuzzed in
    tools/fuzz_cfg.py --boundary)."""
    from versatilefilmgrain_tpu.utils.parsers import ConfigError
    with pytest.raises(ConfigError):
        GrainPipeline(128, 192, 10, 0)
    GrainPipeline(130, 192, 10, 0)      # must not raise


def test_fifo_input(tmp_path):
    """FIFO sources work like the reference's fopen (vfgs_main.c:711)."""
    import subprocess
    import sys
    fifo = str(tmp_path / "in.fifo")
    os.mkfifo(fifo)
    out = str(tmp_path / "out.yuv")
    rng = np.random.default_rng(5)
    data = rng.integers(0, 1024, 256 * 192 * 3 // 2, dtype="<u2").tobytes()

    import threading

    def feed():
        with open(fifo, "wb") as f:
            f.write(data)

    t = threading.Thread(target=feed)
    t.start()
    from versatilefilmgrain_tpu.cli import main
    rc = main(["vfgs-tpu", "-w", "256", "-h", "192", "-b", "10", "-n", "1",
               fifo, out])
    t.join()
    assert rc == 0
    assert os.path.getsize(out) == len(data)

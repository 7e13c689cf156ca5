"""End-to-end demo: synthesize a test frame, add film grain with the default
FGC SEI config and an AFGS1 config, and save before/after PNGs.

Run:  python3 examples/demo.py [outdir]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from versatilefilmgrain_tpu import GrainPipeline
from versatilefilmgrain_tpu.designer.preview import yuv_to_rgb


def make_test_frame(width: int, height: int):
    """10-bit 4:2:0 frame: horizontal luma ramp + smooth color field."""
    xs = np.linspace(64, 940, width)
    ys = np.linspace(0.8, 1.2, height)[:, None]
    y = np.clip(xs[None, :] * ys, 0, 1023).astype("<u2")
    cw, ch = width // 2, height // 2
    u = (512 + 300 * np.sin(np.linspace(0, 3, cw))[None, :]
         * np.cos(np.linspace(0, 2, ch))[:, None]).astype("<u2")
    v = (512 + 300 * np.cos(np.linspace(0, 2.5, cw))[None, :]
         * np.sin(np.linspace(0, 3.5, ch))[:, None]).astype("<u2")
    return y, u, v


def main(outdir: str = "/tmp/vfg_demo") -> int:
    os.makedirs(outdir, exist_ok=True)
    W, H = 640, 384
    planes = make_test_frame(W, H)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.image as mpimg

    mpimg.imsave(os.path.join(outdir, "clean.png"),
                 yuv_to_rgb(*planes, 10, 0))

    # Default FGC SEI frequency-filtering grain.
    pipe = GrainPipeline(W, H, 10, 0)
    grained = pipe.process_frame(planes, 0)
    mpimg.imsave(os.path.join(outdir, "sei_ff.png"),
                 yuv_to_rgb(*grained, 10, 0))

    # An AFGS1 auto-regressive config from the reference vectors, if present.
    cfg = "/root/reference/cfg/fgs_afgs1_test1.cfg"
    if os.path.exists(cfg):
        pipe2 = GrainPipeline(W, H, 10, 0, configs=[cfg])
        grained2 = pipe2.process_frame(planes, 0)
        mpimg.imsave(os.path.join(outdir, "afgs1_ar.png"),
                     yuv_to_rgb(*grained2, 10, 0))

    print(f"wrote PNGs to {outdir}")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))

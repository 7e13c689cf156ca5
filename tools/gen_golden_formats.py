"""Generate engine-level golden outputs for 4:2:2 / 4:4:4 (luma-only grain)
by driving the reference FW/HW layers directly (tools/gen_golden_formats.c),
since the reference CLI rejects those formats at startup.

Writes tests/golden/format_checksums.json.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(__file__))
from gen_input import make_input_yuv  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HARNESS = "/tmp/refbuild/goldfmt"

CASES = [
    # name, mode, w, h, depth, subx, suby, frames
    ("sei_420_10b", "sei", 320, 192, 10, 2, 2, 3),
    ("sei_422_10b", "sei", 320, 192, 10, 2, 1, 3),
    ("sei_444_10b", "sei", 320, 192, 10, 1, 1, 3),
    ("sei_422_8b", "sei", 320, 192, 8, 2, 1, 3),
    ("afgs1_422_10b", "afgs1", 320, 192, 10, 2, 1, 3),
    ("afgs1_444_8b", "afgs1", 320, 192, 8, 1, 1, 3),
]


def build_harness():
    os.makedirs("/tmp/refbuild", exist_ok=True)
    subprocess.run(
        ["gcc", "-O2", os.path.join(REPO, "tools", "gen_golden_formats.c"),
         "/root/reference/src/vfgs_fw.c", "/root/reference/src/vfgs_hw.c",
         "-I/root/reference/src", "-o", HARNESS], check=True)


def fmt_of(subx, suby):
    return 0 if suby == 2 else (1 if subx == 2 else 2)


def main():
    build_harness()
    out_json = {}
    for name, mode, w, h, depth, subx, suby, frames in CASES:
        inp = f"/tmp/vfg_golden/fmt_{name}_in.yuv"
        os.makedirs(os.path.dirname(inp), exist_ok=True)
        make_input_yuv(inp, w, h, depth, fmt_of(subx, suby), frames)
        out = f"/tmp/vfg_golden/fmt_{name}_out.yuv"
        subprocess.run([HARNESS, mode, str(w), str(h), str(depth), str(subx),
                        str(suby), str(frames), inp, out], check=True)
        digest = hashlib.sha256(open(out, "rb").read()).hexdigest()
        out_json[name] = dict(mode=mode, w=w, h=h, depth=depth, subx=subx,
                              suby=suby, frames=frames, sha256=digest)
        print(f"OK {name}: {digest[:16]}")
    dst = os.path.join(REPO, "tests", "golden", "format_checksums.json")
    with open(dst, "w") as f:
        json.dump(out_json, f, indent=1, sort_keys=True)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()

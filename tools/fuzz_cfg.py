"""Differential fuzzing: random film-grain configs + CLI options through the
reference binary and our CLI, byte-comparing outputs (and exit codes for
invalid configs).

Usage:  python3 tools/fuzz_cfg.py [n_cases] [seed]

Every case writes a random config file, runs both implementations over a
deterministic small YUV input, and compares.  Divergences are saved under
/tmp/vfg_fuzz/fail_* for inspection.
"""

from __future__ import annotations

import os
import random
import subprocess
import sys

sys.path.insert(0, os.path.dirname(__file__))
from gen_input import make_input_yuv  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VFGS = "/tmp/refbuild/vfgs"
WORK = "/tmp/vfg_fuzz"


def gen_sei_ff(rng: random.Random) -> str:
    nint = rng.randint(1, 10)
    bounds = sorted(rng.sample(range(0, 256), nint * 2))
    lower = [bounds[2 * i] for i in range(nint)]
    upper = [bounds[2 * i + 1] for i in range(nint)]
    nmv = rng.choice([1, 2, 3])
    lines = [
        "SEIFGCModelId                          : 0",
        f"SEIFGCLog2ScaleFactor                  : {rng.randint(2, 7)}",
        "SEIFGCCompModelPresentComp0            : 1",
    ]
    chroma = rng.random() < 0.7
    lines += [f"SEIFGCCompModelPresentComp1            : {int(chroma)}",
              f"SEIFGCCompModelPresentComp2            : {int(chroma)}"]
    comps = [0] + ([1, 2] if chroma else [])
    for c in comps:
        vals = []
        for _ in range(nint):
            row = [rng.randint(0, 255)]
            if nmv >= 2:
                row.append(rng.randint(2, 14))
            if nmv >= 3:
                row.append(rng.randint(2, 14))
            vals.extend(row)
        lines += [
            f"SEIFGCNumIntensityIntervalMinus1Comp{c}  : {nint - 1}",
            f"SEIFGCNumModelValuesMinus1Comp{c}        : {nmv - 1}",
            f"SEIFGCIntensityIntervalLowerBoundComp{c} : "
            + " ".join(map(str, lower)),
            f"SEIFGCIntensityIntervalUpperBoundComp{c} : "
            + " ".join(map(str, upper)),
            f"SEIFGCCompModelValuesComp{c}             : "
            + " ".join(map(str, vals)),
        ]
    return "\n".join(lines) + "\n"


def gen_sei_ar(rng: random.Random) -> str:
    nint = rng.randint(1, 4)
    bounds = sorted(rng.sample(range(0, 256), nint * 2))
    vals = []
    for _ in range(nint):
        vals.extend([rng.randint(0, 255), rng.randint(-120, 120), 0,
                     rng.randint(-120, 120), rng.randint(0, 64),
                     rng.randint(-100, 100)])
    return "\n".join([
        "SEIFGCModelId                          : 1",
        f"SEIFGCLog2ScaleFactor                  : {rng.randint(5, 7)}",
        "SEIFGCCompModelPresentComp0            : 1",
        "SEIFGCCompModelPresentComp1            : 0",
        "SEIFGCCompModelPresentComp2            : 0",
        f"SEIFGCNumIntensityIntervalMinus1Comp0  : {nint - 1}",
        "SEIFGCNumModelValuesMinus1Comp0        : 5",
        "SEIFGCIntensityIntervalLowerBoundComp0 : "
        + " ".join(str(bounds[2 * i]) for i in range(nint)),
        "SEIFGCIntensityIntervalUpperBoundComp0 : "
        + " ".join(str(bounds[2 * i + 1]) for i in range(nint)),
        "SEIFGCCompModelValuesComp0             : " + " ".join(map(str, vals)),
    ]) + "\n"


def gen_afgs1(rng: random.Random) -> str:
    lag = rng.randint(1, 3)
    n = 2 * lag * (lag + 1)
    ny = rng.randint(1, 14)
    yvals = sorted(rng.sample(range(0, 256), ny))
    lines = [
        f"AFGS1GrainSeed             : {rng.randint(0, 65535)}",
        f"AFGS1NumYPoints            : {ny}",
        "AFGS1PointYValues          : " + " ".join(map(str, yvals)),
        "AFGS1PointYScaling         : "
        + " ".join(str(rng.randint(0, 255)) for _ in range(ny)),
        f"AFGS1GrainScaling          : {rng.randint(8, 11)}",
        f"AFGS1ARCoeffLag            : {lag}",
        "AFGS1ARCoeffsY             : "
        + " ".join(str(rng.randint(-60, 60)) for _ in range(n)),
        f"AFGS1ARCoeffShift          : {rng.randint(6, 9)}",
        f"AFGS1GrainScaleShift       : {rng.randint(0, 3)}",
        f"AFGS1ClipToRestrictedRange : {rng.randint(0, 1)}",
    ]
    chroma = rng.random() < 0.5
    csfl = rng.random() < 0.3
    lines.append(f"AFGS1ChromaScalingFromLuma : {int(csfl and not chroma)}")
    if chroma:
        for name in ("Cb", "Cr"):
            nc = rng.randint(1, 10)
            cvals = sorted(rng.sample(range(0, 256), nc))
            lines += [
                f"AFGS1Num{name}Points           : {nc}",
                f"AFGS1Point{name}Values         : " + " ".join(map(str, cvals)),
                f"AFGS1Point{name}Scaling        : "
                + " ".join(str(rng.randint(0, 255)) for _ in range(nc)),
                f"AFGS1ARCoeffs{name}            : "
                + " ".join(str(rng.randint(-60, 60)) for _ in range(n + 1)),
            ]
    return "\n".join(lines) + "\n"


def gen_dump(rng: random.Random) -> str:
    """VTM/HM SEI dump style with implicit c/i/j counters."""
    nmv = rng.choice([1, 2, 3])
    lines = ["fg_model_id: 0",
             f"fg_log2_scale_factor: {rng.randint(2, 7)}"]
    chroma = rng.random() < 0.6
    flags = [1, int(chroma), int(chroma)]
    for c in range(3):
        lines.append(f"fg_comp_model_present_flag[c]: {flags[c]}")
    for c in range(3):
        if not flags[c]:
            continue
        nint = rng.randint(1, 5)
        bounds = sorted(rng.sample(range(0, 256), nint * 2))
        lines.append(f"fg_num_intensity_intervals_minus1[c]: {nint - 1}")
        lines.append(f"fg_num_model_values_minus1[c]: {nmv - 1}")
        for i in range(nint):
            lines.append(f"fg_intensity_interval_lower_bound[c][i]: {bounds[2*i]}")
            lines.append(f"fg_intensity_interval_upper_bound[c][i]: {bounds[2*i+1]}")
            for j in range(nmv):
                v = rng.randint(0, 255) if j == 0 else rng.randint(2, 14)
                lines.append(f"fg_comp_model_value[c][i]: {v}")
    lines.append("fg_characteristics_persistence_flag: 1")
    lines.append("fg_ignored_tail_key: 123")  # after the stop marker
    return "\n".join(lines) + "\n"


def gen_tbl(rng: random.Random) -> str:
    lag = rng.randint(1, 3)
    n = 2 * lag * (lag + 1)
    ny = rng.randint(1, 14)
    yv = sorted(rng.sample(range(0, 256), ny))

    def pts(cnt):
        vs = sorted(rng.sample(range(0, 256), cnt))
        return " ".join(f"{v} {rng.randint(0, 255)}" for v in vs)

    ncb, ncr = rng.randint(0, 10), rng.randint(0, 10)
    return "\n".join([
        "filmgrn1",
        f"E 0 9223372036854775807 1 {rng.randint(0, 65535)} 1",
        f"p {lag} {rng.randint(6, 9)} {rng.randint(0, 3)} {rng.randint(8, 11)}"
        f" {0} {rng.randint(0, 1)} 128 192 256 128 192 256",
        f"sY {ny} " + pts(ny),
        f"sCb {ncb} " + pts(ncb),
        f"sCr {ncr} " + pts(ncr),
        "cY " + " ".join(str(rng.randint(-60, 60)) for _ in range(n)),
        "cCb " + " ".join(str(rng.randint(-60, 60)) for _ in range(n + 1)),
        "cCr " + " ".join(str(rng.randint(-60, 60)) for _ in range(n + 1)),
    ]) + "\n"


def run_case(i: int, rng: random.Random, inp: str,
             dims: tuple[int, int] | None = None) -> str | None:
    kind = rng.choice(["ff", "ff", "ar", "afgs1", "afgs1", "tbl", "multi",
                       "dump"])
    gens = {"ff": gen_sei_ff, "ar": gen_sei_ar, "afgs1": gen_afgs1,
            "tbl": gen_tbl, "dump": gen_dump}
    w, h = dims or (192, 160)
    args = ["-w", str(w), "-h", str(h), "-b", rng.choice(["8", "10"]),
            "-n", "3"]
    cfgs = []
    if kind == "multi":
        pocs = sorted(rng.sample(range(0, 3), rng.randint(1, 3)))
        for m, poc in enumerate(pocs):
            sub = rng.choice(["ff", "ar", "afgs1", "tbl"])
            cfg = os.path.join(WORK, f"case{i}_{m}.cfg")
            with open(cfg, "w") as f:
                f.write(gens[sub](rng))
            cfgs.append(cfg)
            args += ["-c", f"{poc}:{cfg}"]
    else:
        cfg = os.path.join(WORK, f"case{i}.cfg")
        with open(cfg, "w") as f:
            f.write(gens[kind](rng))
        cfgs.append(cfg)
        args += ["-c", cfg]
    if rng.random() < 0.3:
        args += ["-g", str(rng.randint(40, 200))]
    if rng.random() < 0.3:
        args += ["-r", str(rng.randint(1, 2**30))]
    if rng.random() < 0.2:
        args += ["-s", "1"]
    if rng.random() < 0.2 and args[5] == "10":
        args += ["--outdepth", "8"]
    inp_use = inp + (".8" if args[5] == "8" else ".10")
    ref_out = os.path.join(WORK, f"ref{i}.yuv")
    our_out = os.path.join(WORK, f"our{i}.yuv")
    r1 = subprocess.run([VFGS] + args + [inp_use, ref_out],
                        capture_output=True, timeout=60)
    r2 = subprocess.run(
        [sys.executable, "-m", "versatilefilmgrain_tpu.cli"] + args
        + [inp_use, our_out],
        capture_output=True, timeout=600, cwd=REPO,
        env={**os.environ, "JAX_PLATFORM_NAME": "cpu"})
    fail = None
    if (r1.returncode == 0) != (r2.returncode == 0):
        fail = (f"rc mismatch ref={r1.returncode} ours={r2.returncode} "
                f"{(r1.stdout + r1.stderr)[-120:]} / "
                f"{(r2.stdout + r2.stderr)[-120:]}")
    elif r1.returncode == 0:
        a = open(ref_out, "rb").read()
        b = open(our_out, "rb").read()
        if a != b:
            fail = f"output mismatch ({len(a)} vs {len(b)} bytes)"
    if fail:
        # keep every config of the case in place so the printed args replay
        return f"case {i} [{kind}] {' '.join(args)}: {fail} (cfgs: {cfgs})"
    for p in cfgs + [ref_out, our_out]:
        if os.path.exists(p):
            os.unlink(p)
    return None


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    rand_dims = len(sys.argv) > 3 and sys.argv[3] == "--dims"
    # --boundary: widths hugging the reference's `assert(width > 128)`
    # (vfgs_hw.c:167-170) — the smallest legal widths, every width % 16
    # residue in 130..160, including the 2-block-column minimum.
    boundary = len(sys.argv) > 3 and sys.argv[3] == "--boundary"
    os.makedirs(WORK, exist_ok=True)
    rng = random.Random(seed)
    fails = 0
    for i in range(n):
        if boundary:
            # even widths only (4:2:0 input); width==128 itself is locked by
            # tests/test_robustness.py (reference aborts, we reject).
            w = 2 * rng.randint(65, 80)   # 130..160
            h = 2 * rng.randint(65, 80)
        elif rand_dims:
            # random (even) dims incl. non-multiples of 16; w>128, h>=130
            w = 2 * rng.randint(66, 180)
            h = 2 * rng.randint(65, 140)
        else:
            w, h = 192, 160
        inp = os.path.join(WORK, f"fuzz_in_{w}x{h}.yuv")
        for d in (8, 10):
            if not os.path.exists(f"{inp}.{d}"):
                make_input_yuv(f"{inp}.{d}", w, h, d, 0, 4)
        msg = run_case(i, rng, inp, dims=(w, h))
        if msg:
            fails += 1
            print("FAIL", msg)
        else:
            print(f"ok {i}", end="\r")
    print(f"\n{n} cases, {fails} divergences")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())

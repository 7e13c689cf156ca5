"""Fast engine (gather-free) must match the reference jnp engine bit-exactly,
across chroma formats, bit depths, and config families."""

import numpy as np
import pytest

import jax.numpy as jnp

from versatilefilmgrain_tpu.models import config as cfgmod
from versatilefilmgrain_tpu.models import fw
from versatilefilmgrain_tpu.models.hw import HwRegs
from versatilefilmgrain_tpu.ops import lfsr
from versatilefilmgrain_tpu.ops.grain_fast import (add_grain_frame_fast_jit,
                                                   fast_args, fast_tables)
from versatilefilmgrain_tpu.ops.grain_jnp import add_grain_frame_jit


def _afgs1_cfg():
    a = cfgmod.default_afgs1()
    a.grain_seed = 4321
    a.num_y_points = 3
    a.point_y_values[:3] = [0, 128, 255]
    a.point_y_scaling[:3] = [40, 90, 20]
    a.num_cb_points = 2
    a.point_cb_values[:2] = [0, 255]
    a.point_cb_scaling[:2] = [60, 60]
    a.num_cr_points = 2
    a.point_cr_values[:2] = [0, 255]
    a.point_cr_scaling[:2] = [30, 80]
    a.grain_scaling = 9
    a.ar_coeff_lag = 2
    a.ar_coeffs_y[:12] = [4, -3, 2, 1, -2, 8, 40, 10, -5, 2, 1, 0]
    a.ar_coeffs_cb[:12] = [2, 0, 1, 0, -1, 3, 30, 5, -2, 1, 0, 0]
    a.ar_coeffs_cr[:12] = [1, 1, 0, 0, -1, 2, 25, 4, -1, 0, 0, 0]
    a.ar_coeff_shift = 7
    a.grain_scale_shift = 1
    a.clip_to_restricted_range = 1
    return a


def _regs_for(kind, depth, csub):
    regs = HwRegs()
    regs.set_depth(depth)
    regs.set_chroma_subsampling(*csub)
    if kind == "sei_ff":
        fw.init_sei(cfgmod.default_sei(), regs)
    elif kind == "sei_ar":
        sei = cfgmod.default_sei()
        sei.model_id = 1
        sei.comp_model_present_flag = [1, 0, 0]
        sei.log2_scale_factor = 6
        sei.comp_model_value[0, :8, :6] = np.array(
            [[100, 11, 0, -8, 32, -7]] * 8, np.int16)
        fw.init_sei(sei, regs)
    else:
        fw.init_afgs1(_afgs1_cfg(), regs)
    return regs


@pytest.mark.parametrize("kind", ["sei_ff", "sei_ar", "afgs1"])
@pytest.mark.parametrize("depth,csub", [(10, (2, 2)), (8, (2, 2)),
                                        (10, (2, 1)), (8, (1, 1))])
def test_fast_matches_ref(kind, depth, csub):
    H, W = 144, 256
    R, C = H // 16, W // 16
    csubx, csuby = csub
    bs = depth - 8
    regs = _regs_for(kind, depth, csub)
    hi = (1 << depth) - 1
    rng = np.random.default_rng(3)
    dt = np.uint8 if depth == 8 else np.uint16
    y = rng.integers(0, hi + 1, (R * 16, C * 16)).astype(dt)
    u = rng.integers(0, hi + 1, (R * (16 // csuby), C * (16 // csubx))).astype(dt)
    v = rng.integers(0, hi + 1, (R * (16 // csuby), C * (16 // csubx))).astype(dt)

    for f in (0, 1, 3):
        e0 = lfsr.frame_base_exponent(f, R, C)
        base = int(lfsr.advance(np.uint32(regs.seed_state), e0))
        base_up = (int(lfsr.advance(np.uint32(regs.seed_state), e0 - C))
                   if e0 else base)
        dp = regs.device_params()
        ref = add_grain_frame_jit(
            jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
            jnp.uint32(base), jnp.uint32(base_up),
            jnp.asarray(dp["pattern"]), jnp.asarray(dp["sluts"]),
            jnp.asarray(dp["pluts"]), dp["scale_shift"], dp["y_min"],
            dp["y_max"], dp["c_min"], dp["c_max"],
            height=H, width=W, bs=bs, csubx=csubx, csuby=csuby)
        ft = fast_tables(regs)
        fast = add_grain_frame_fast_jit(
            jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
            jnp.uint32(base), jnp.uint32(base_up), *fast_args(ft),
            height=H, width=W, bs=bs, csubx=csubx, csuby=csuby)
        for p, (r, q) in enumerate(zip(ref, fast)):
            assert np.array_equal(np.asarray(r), np.asarray(q)), \
                f"{kind} d{depth} csub{csub} frame {f} plane {p}"

"""Device-mesh sharding for the grain engine.

The reference is strictly serial (SURVEY.md section 2.6: no threads, SIMD, or
distributed backend).  The TPU build parallelizes on two mesh axes:

* ``data``  -- frames.  Grain state at any frame is closed-form in the frame
  index (ops/lfsr.py), so frames are embarrassingly parallel.
* ``tile``  -- 16-luma-line block rows within a frame.  Vertical overlap
  blends *pattern samples* selected by the ``rnd_up`` lattice, never
  neighbouring pixels, so row tiles need zero halo exchange.

Output is bit-identical under any mesh shape (test_sharding.py proves it on a
virtual 8-device CPU mesh); the steady-state kernel needs no collectives --
XLA only reshards the small state lattices (KBs) at the shard_map boundary.

Multi-host deployment: initialize ``jax.distributed`` and build the mesh over
``jax.devices()``; frames ride the ``data`` axis across hosts (DCN) and tile
rows stay within a host (ICI).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.4.35
    import inspect

    from jax import shard_map as _shard_map

    # pallas_call outputs (the natural engine) carry no varying-mesh-axes
    # annotation, so the vma/rep check must be off; the kwarg was renamed
    # check_rep -> check_vma across jax versions, so probe the signature.
    _params = inspect.signature(_shard_map).parameters
    _CHECK_KW = ({"check_vma": False} if "check_vma" in _params
                 else {"check_rep": False} if "check_rep" in _params
                 else None)

    def shard_map(f, mesh, in_specs, out_specs):
        if _CHECK_KW is not None:
            return _shard_map(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, **_CHECK_KW)
        # Neither kwarg visible in the signature (e.g. hidden behind
        # **kwargs): try them at call time rather than silently leaving the
        # vma check on, which rejects pallas_call outputs.
        for kw in ({"check_vma": False}, {"check_rep": False}, {}):
            try:
                return _shard_map(f, mesh=mesh, in_specs=in_specs,
                                  out_specs=out_specs, **kw)
            except TypeError:
                continue
        raise TypeError("jax.shard_map accepts neither check_vma nor "
                        "check_rep and rejects plain calls")
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=False)

from ..ops import lfsr
from ..ops.grain_fast import plane_grain_fast
from ..ops.grain_jnp import plane_grain


def make_mesh(n_data: int, n_tile: int, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = n_data * n_tile
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    return Mesh(np.array(devices[:n]).reshape(n_data, n_tile),
                ("data", "tile"))


def default_mesh_shape(n_devices: int, rows: int) -> tuple[int, int]:
    """Pick (data, tile) factors.

    Frames (data) are embarrassingly parallel so they get the larger share;
    tile only takes what divides the block-row count, keeping the mesh 2-D
    when possible (tile sharding is what cuts single-frame latency)."""
    best = (n_devices, 1)
    for t in range(2, min(n_devices, rows) + 1):
        if n_devices % t == 0 and rows % t == 0 and t <= n_devices // t:
            best = (n_devices // t, t)
    return best


def make_grain_step(mesh: Mesh, *, height: int, width: int, bs: int,
                    csubx: int, csuby: int, engine: str = "fast",
                    tables: dict | None = None, interpret: bool = False):
    """Build a jitted multi-device grain step over ``mesh``.

    Returned fn signature (fast engine, the default):
        step(y, u, v, bases, bases_up, win_luma, win_chroma, seg_starts,
             seg_deltas, scale_shift, y_min, y_max, c_min, c_max) -> (y, u, v)
    with y: (F, R*16, C*16) (F divisible by mesh 'data' size, R divisible by
    mesh 'tile' size), bases/bases_up: (F,) uint32 per-frame lattice bases.
    With engine="ref", the table args are (pattern, sluts, pluts) instead.

    With engine="natural", pass ``tables=natural_tables(regs)`` here and call
    ``step(y, u, v, bases, bases_up)`` -- each shard runs the natural-layout
    Pallas kernel (ops/grain_natural.py), the production single-chip engine,
    with its first local block row's overlap carry seeded from the up-state
    lattice (still zero halo).
    """
    R = -(-height // 16)
    C = -(-width // 16)

    plane_spec = P("data", "tile", None)
    state_spec = P("data", "tile", None)
    rep = P()

    if engine == "natural":
        import functools as _ft
        from ..ops.grain_natural import add_grain_shard_natural
        assert tables is not None, "engine='natural' needs tables="

        _step = _ft.partial(add_grain_shard_natural, tables=tables, bs=bs,
                            csubx=csubx, csuby=csuby, interpret=interpret)
        n_tables = None
    elif engine == "fast":
        def _step(y, u, v, states, states_up, ov_mask, win_luma, win_luma_up,
                  win_chroma, win_chroma_up, seg_starts, seg_deltas,
                  scale_shift, y_min, y_max, c_min, c_max):
            def one(c, plane, imin, imax):
                fn = functools.partial(
                    plane_grain_fast, c=c, csubx=csubx, csuby=csuby, bs=bs)
                return jax.vmap(
                    lambda p, s, su: fn(p, s, su,
                                        win_luma if c == 0 else win_chroma,
                                        win_luma_up if c == 0 else win_chroma_up,
                                        seg_starts[c], seg_deltas[c],
                                        scale_shift, imin, imax,
                                        ov_mask))(plane, states, states_up)

            return (one(0, y, y_min, y_max), one(1, u, c_min, c_max),
                    one(2, v, c_min, c_max))
        n_tables = 6
    else:
        def _step(y, u, v, states, states_up, ov_mask, pattern, sluts, pluts,
                  scale_shift, y_min, y_max, c_min, c_max):
            pat = pattern.reshape(2, 512 * 64)

            def one(c, plane, imin, imax):
                fn = functools.partial(
                    plane_grain, c=c, csubx=csubx, csuby=csuby, bs=bs)
                return jax.vmap(
                    lambda p, s, su: fn(p, s, su, pat[1 if c else 0],
                                        sluts[c], pluts[c], scale_shift,
                                        imin, imax,
                                        ov_mask))(plane, states, states_up)

            return (one(0, y, y_min, y_max), one(1, u, c_min, c_max),
                    one(2, v, c_min, c_max))
        n_tables = 3

    extra = (rep,) * (n_tables + 5) if n_tables is not None else ()
    sharded = shard_map(
        _step, mesh,
        in_specs=(plane_spec, plane_spec, plane_spec, state_spec, state_spec,
                  P("tile")) + extra,
        out_specs=(plane_spec, plane_spec, plane_spec))

    @jax.jit
    def run(y, u, v, bases, bases_up, *tables_and_scalars):
        states = jax.vmap(
            lambda b: lfsr.state_lattice_jax(b, R, C))(bases)
        row0 = jax.vmap(lambda b: lfsr.state_lattice_jax(b, 1, C))(bases_up)
        states_up = jnp.concatenate([row0, states[:, :-1]], axis=1)
        ov = np.zeros(R, dtype=bool)
        ov[1:] = True
        return sharded(y, u, v, states, states_up, jnp.asarray(ov),
                       *tables_and_scalars)

    return run

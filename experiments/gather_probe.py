"""Gather-strategy probes for the photometric sampling wall (round 5).

Questions, in order:
  P1  Which in-kernel gather idioms does Mosaic lower? (take_along_axis on
      lanes / rows, advanced indexing, jnp.take on sublanes)
  P2  XLA gather rate vs (table size, index sortedness, element vs row).
  P3  Device argsort cost at task-stream sizes (needed per iteration for
      tile sorting).
  P4  One-hot row-select + lane-select Pallas tile-gather prototype rate.

Run on the real TPU: python experiments/gather_probe.py
Prints one JSON line per result (flush) so progress is monitorable.
"""

import json
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def out(**kw):
    print(json.dumps(kw), flush=True)


out(devices=str(jax.devices()))


# ---------------------------------------------------------------------------
# P1: Mosaic lowering probes (tiny shapes; compile only + value check)
# ---------------------------------------------------------------------------


def probe(name, fn):
    try:
        r = fn()
        out(probe=name, ok=True, note=str(r)[:120])
    except Exception as e:  # noqa: BLE001
        out(probe=name, ok=False, err=repr(e)[:300])


def p_take_along_lanes_full():
    # per-row lane gather, full width: out[s, j] = rows[s, idx[s, j]]
    def k(rows_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(rows_ref[:], idx_ref[:], axis=1)

    rows = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
    idx = jnp.broadcast_to(jnp.arange(128, dtype=jnp.int32)[::-1], (64, 128))
    r = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(rows, idx)
    expect = np.asarray(rows)[np.arange(64)[:, None],
                              np.asarray(idx)]
    assert np.allclose(np.asarray(r), expect), "WRONG VALUES"
    return "values ok"


def p_take_along_sublanes():
    # per-lane sublane gather: out[s, j] = rows[idx[s, j], j]
    def k(rows_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(rows_ref[:], idx_ref[:], axis=0)

    rows = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
    idx = jnp.broadcast_to(jnp.arange(8, dtype=jnp.int32)[:, None] * 7,
                           (8, 128))
    r = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(rows, idx)
    expect = np.asarray(rows)[np.asarray(idx), np.arange(128)[None, :]]
    assert np.allclose(np.asarray(r), expect), "WRONG VALUES"
    return "values ok"


def p_jnp_take_rows():
    # row gather from a VMEM table: out[i, :] = table[idx[i], :]
    def k(tbl_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(tbl_ref[:], idx_ref[0, :], axis=0)

    tbl = jnp.arange(256 * 128, dtype=jnp.float32).reshape(256, 128)
    idx = jnp.asarray(np.random.RandomState(0).randint(0, 256, (1, 64)),
                      jnp.int32)
    r = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tbl, idx)
    expect = np.asarray(tbl)[np.asarray(idx)[0]]
    assert np.allclose(np.asarray(r), expect), "WRONG VALUES"
    return "values ok"


def p_advanced_2d():
    # full 2D advanced indexing: out[n] = tile[iy[n], ix[n]]
    def k(tile_ref, iy_ref, ix_ref, out_ref):
        out_ref[:] = tile_ref[iy_ref[:], ix_ref[:]]

    tile = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
    rng = np.random.RandomState(0)
    iy = jnp.asarray(rng.randint(0, 64, (8, 128)), jnp.int32)
    ix = jnp.asarray(rng.randint(0, 128, (8, 128)), jnp.int32)
    r = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tile, iy, ix)
    expect = np.asarray(tile)[np.asarray(iy), np.asarray(ix)]
    assert np.allclose(np.asarray(r), expect), "WRONG VALUES"
    return "values ok"


probe("take_along_lanes_full", p_take_along_lanes_full)
probe("take_along_sublanes", p_take_along_sublanes)
probe("jnp_take_rows", p_jnp_take_rows)
probe("advanced_2d", p_advanced_2d)


# ---------------------------------------------------------------------------
# P2: XLA gather rates (repeat-delta inside one dispatch via scan)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=())
def _gather_scan_elems(table, idxs):
    def body(c, i):
        return c + jnp.sum(table[i]), None

    c, _ = lax.scan(body, jnp.float32(0), idxs)
    return c


@partial(jax.jit, static_argnames=())
def _gather_scan_rows(table2, idxs):
    def body(c, i):
        return c + jnp.sum(table2[i]), None

    c, _ = lax.scan(body, jnp.float32(0), idxs)
    return c


def time_delta(fn, args1, argsR, label, work_bytes):
    """(T(R) - T(1)) / (R - 1) with value-fetch syncs."""
    float(np.asarray(fn(*args1)))  # compile+warm small
    float(np.asarray(fn(*argsR)))  # compile+warm big
    t0 = time.perf_counter()
    float(np.asarray(fn(*args1)))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(np.asarray(fn(*argsR)))
    tR = time.perf_counter() - t0
    R = argsR[1].shape[0]
    dt = (tR - t1) / (R - 1)
    out(bench=label, per_rep_s=round(dt, 6),
        gbps=round(work_bytes / dt / 1e9, 2))


rng = np.random.RandomState(0)
N = 4_000_000
R = 9
for T_elems in (262_144, 2_097_152, 8_388_608):
    table = jnp.asarray(rng.randn(T_elems).astype(np.float32))
    idx_rand = rng.randint(0, T_elems, (R, N)).astype(np.int32)
    idx_sort = np.sort(idx_rand, axis=1)
    for kind, idx in (("rand", idx_rand), ("sorted", idx_sort)):
        idxs = jnp.asarray(idx)
        time_delta(_gather_scan_elems, (table, idxs[:1]), (table, idxs),
                   f"xla_elem_gather_T{T_elems}_{kind}", N * 4)

# row gathers: (T_rows, 128) table
N_rows = 500_000
for T_rows in (4096, 65_536, 262_144):
    table2 = jnp.asarray(rng.randn(T_rows, 128).astype(np.float32))
    idx_rand = rng.randint(0, T_rows, (R, N_rows)).astype(np.int32)
    idx_sort = np.sort(idx_rand, axis=1)
    for kind, idx in (("rand", idx_rand), ("sorted", idx_sort)):
        idxs = jnp.asarray(idx)
        time_delta(_gather_scan_rows, (table2, idxs[:1]), (table2, idxs),
                   f"xla_row_gather_T{T_rows}_{kind}", N_rows * 128 * 4)


# ---------------------------------------------------------------------------
# P3: device sort cost (argsort int32 keys + apply permutation)
# ---------------------------------------------------------------------------


@jax.jit
def _argsort_scan(keys):  # keys (R, N)
    def body(c, k):
        p = jnp.argsort(k)
        return c + p[0] + p[-1], None

    c, _ = lax.scan(body, jnp.int32(0), keys)
    return c


for Nk in (1_000_000, 4_000_000):
    keys = rng.randint(0, 1 << 20, (R, Nk)).astype(np.int32)
    keysd = jnp.asarray(keys)
    time_delta(_argsort_scan, (keysd[:1],), (keysd,),
               f"argsort_N{Nk}", Nk * 4)


# ---------------------------------------------------------------------------
# P4: one-hot row-select tile-gather prototype.
# Tasks sorted by tile; per grid step: tile (8, 128) f32 streamed to VMEM,
# CAP tasks gather 2 rows via one-hot (CAP, 8) @ (8, 128) matmuls, then
# bilinear lane-select. Lane select variant chosen by the P1 probes:
# prefer take_along_axis, fall back to one-hot multiply+reduce.
# ---------------------------------------------------------------------------

TH, TW = 8, 128  # tile core+halo dims (halo handled by assignment)
CAP = 512


def _onehot(i, n, dtype=jnp.float32):
    return (jax.lax.broadcasted_iota(jnp.int32, (i.shape[0], n), 1)
            == i[:, None]).astype(dtype)


def _tile_gather_kernel(tile_ref, iy_ref, ix_ref, fy_ref, fx_ref, out_ref,
                        *, lane_mode: str):
    tile = tile_ref[0]  # (TH, TW)
    iy = iy_ref[0]  # (CAP,)
    ix = ix_ref[0]
    fy = fy_ref[0]
    fx = fx_ref[0]
    oh0 = _onehot(iy, TH)
    oh1 = _onehot(iy + 1, TH)
    rows0 = jnp.dot(oh0, tile, preferred_element_type=jnp.float32)
    rows1 = jnp.dot(oh1, tile, preferred_element_type=jnp.float32)
    blend = rows0 * (1.0 - fy)[:, None] + rows1 * fy[:, None]  # (CAP, TW)
    diff = rows1 - rows0
    if lane_mode == "take":
        l0 = jnp.take_along_axis(blend, ix[:, None], axis=1)[:, 0]
        l1 = jnp.take_along_axis(blend, ix[:, None] + 1, axis=1)[:, 0]
        d0 = jnp.take_along_axis(diff, ix[:, None], axis=1)[:, 0]
        d1 = jnp.take_along_axis(diff, ix[:, None] + 1, axis=1)[:, 0]
    else:
        ohx0 = _onehot(ix, TW)
        ohx1 = _onehot(ix + 1, TW)
        l0 = jnp.sum(blend * ohx0, axis=1)
        l1 = jnp.sum(blend * ohx1, axis=1)
        d0 = jnp.sum(diff * ohx0, axis=1)
        d1 = jnp.sum(diff * ohx1, axis=1)
    value = (1.0 - fx) * l0 + fx * l1
    ddx = l1 - l0
    ddy = (1.0 - fx) * d0 + fx * d1
    out_ref[0] = jnp.stack([value, ddx, ddy,
                            jnp.zeros_like(value)], axis=0)


@partial(jax.jit, static_argnames=("lane_mode", "n_tiles"))
def tile_gather(tiles, iy, ix, fy, fx, lane_mode: str, n_tiles: int):
    """tiles (n_tiles, TH, TW); per-tile CAP tasks: iy/ix/fy/fx
    (n_tiles, CAP). Returns (n_tiles, 4, CAP)."""
    return pl.pallas_call(
        partial(_tile_gather_kernel, lane_mode=lane_mode),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, TH, TW), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CAP), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CAP), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CAP), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CAP), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, CAP), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 4, CAP), jnp.float32),
    )(tiles, iy, ix, fy, fx)


def ref_bilinear(tiles, iy, ix, fy, fx):
    t = np.asarray(tiles)
    iyn, ixn = np.asarray(iy), np.asarray(ix)
    fyn, fxn = np.asarray(fy), np.asarray(fx)
    g = np.arange(t.shape[0])[:, None]
    tl = t[g, iyn, ixn]
    tr = t[g, iyn, ixn + 1]
    bl = t[g, iyn + 1, ixn]
    br = t[g, iyn + 1, ixn + 1]
    top = (1 - fxn) * tl + fxn * tr
    bot = (1 - fxn) * bl + fxn * br
    val = (1 - fyn) * top + fyn * bot
    ddx = (fyn * (br - bl) + (1 - fyn) * (tr - tl))
    ddy = bot - top
    return val, ddx, ddy


def bench_tile_gather(lane_mode, n_tiles=2048, reps=8):
    tiles = jnp.asarray(rng.randn(n_tiles, TH, TW).astype(np.float32))
    iy = jnp.asarray(rng.randint(0, TH - 1, (n_tiles, CAP)), jnp.int32)
    ix = jnp.asarray(rng.randint(0, TW - 1, (n_tiles, CAP)), jnp.int32)
    fy = jnp.asarray(rng.rand(n_tiles, CAP).astype(np.float32))
    fx = jnp.asarray(rng.rand(n_tiles, CAP).astype(np.float32))
    r = tile_gather(tiles, iy, ix, fy, fx, lane_mode, n_tiles)
    val, ddx, ddy = ref_bilinear(tiles, iy, ix, fy, fx)
    got = np.asarray(r)
    ok = (np.allclose(got[:, 0], val, atol=1e-4)
          and np.allclose(got[:, 1], ddx, atol=1e-4)
          and np.allclose(got[:, 2], ddy, atol=1e-4))
    out(probe=f"tile_gather_{lane_mode}_correct", ok=bool(ok))
    if not ok:
        return

    # repeat-delta via an outer scan over REPS distinct fx arrays
    @partial(jax.jit, static_argnames=())
    def scan_fn(tiles, iy, ix, fy, fxs):
        def body(c, fx):
            r = tile_gather(tiles, iy, ix, fy, fx, lane_mode, n_tiles)
            return c + r[0, 0, 0] + r[-1, 0, -1], None

        c, _ = lax.scan(body, jnp.float32(0), fxs)
        return c

    fxs = jnp.asarray(rng.rand(reps, n_tiles, CAP).astype(np.float32))
    float(np.asarray(scan_fn(tiles, iy, ix, fy, fxs[:1])))
    float(np.asarray(scan_fn(tiles, iy, ix, fy, fxs)))
    t0 = time.perf_counter()
    float(np.asarray(scan_fn(tiles, iy, ix, fy, fxs[:1])))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(np.asarray(scan_fn(tiles, iy, ix, fy, fxs)))
    tR = time.perf_counter() - t0
    dt = (tR - t1) / (reps - 1)
    tasks = n_tiles * CAP
    out(bench=f"tile_gather_{lane_mode}", per_rep_s=round(dt, 6),
        tasks_per_s=round(tasks / dt / 1e6, 1),
        note="Mtasks/s; each task = bilinear sample + dx,dy")


for mode in ("take", "onehot"):
    try:
        bench_tile_gather(mode)
    except Exception as e:  # noqa: BLE001
        out(probe=f"tile_gather_{mode}", ok=False, err=repr(e)[:300])

out(done=True)
